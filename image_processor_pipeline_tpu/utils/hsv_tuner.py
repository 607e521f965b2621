"""Interactive HSV threshold tuner (reference atomize/test_seuil.py:17-47).

A human-in-the-loop matplotlib viewer for picking cv2-scale inRange bounds:
shows original / mask / masked-result side by side.  Host-only utility —
gated on matplotlib being importable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np


def preview_hsv_mask(
    image_path: Path,
    lower: Sequence[float],
    upper: Sequence[float],
    show: bool = True,
):
    """Render (original, mask, result) panels for one HSV range.

    Returns the (image, mask, result) arrays; with ``show`` and matplotlib
    available, also opens the 3-panel figure like the reference tuner.
    """
    import jax.numpy as jnp

    from image_processor_pipeline_tpu.io.images import decode_image
    from image_processor_pipeline_tpu.ops import color as color_ops

    img = decode_image(Path(image_path), mode="RGB")
    hsv = np.asarray(color_ops.rgb_to_hsv_u8(jnp.asarray(img)))
    mask = np.asarray(color_ops.in_range(jnp.asarray(hsv), lower, upper))
    result = np.where(mask[..., None], img, 0).astype(np.uint8)

    if show:
        try:
            import matplotlib.pyplot as plt
        except ImportError:
            print("[hsv_tuner] matplotlib not available; returning arrays only")
            return img, mask, result
        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        axes[0].imshow(img)
        axes[0].set_title("original")
        axes[1].imshow(mask, cmap="gray")
        axes[1].set_title(f"mask {tuple(lower)}..{tuple(upper)}")
        axes[2].imshow(result)
        axes[2].set_title("result")
        for ax in axes:
            ax.axis("off")
        plt.tight_layout()
        plt.show()
    return img, mask, result
