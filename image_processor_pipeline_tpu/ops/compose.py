"""Alpha compositing: paste an RGBA overlay onto an RGB background at an
offset, with the overlay's alpha band as mask.

Parity target: reference overlays.py:138-139 —
``background.copy().paste(resized_overlay, (x, y), mask=resized_overlay)``
(PIL alpha-masked paste), including the paste-bbox YOLO label synthesis
inputs (the bbox itself is computed by the caller from (x, y, ow, oh)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def alpha_paste(bg_rgb, bg_h, bg_w, ov_rgba, ov_h, ov_w, py, px):
    """Paste overlay (valid region [0:ov_h, 0:ov_w] of its canvas) onto the
    background at (py, px).  Canvases must have identical static [H, W].

    PIL paste-with-RGBA-mask math, EXACT integer formulation (Paste.c
    BLEND): out = (bg*(255-a) + ov*a + 127) // 255 — byte-identical to
    ``background.paste(ov, (px, py), mask=ov)`` given identical inputs.
    """
    H, W = bg_rgb.shape[-3], bg_rgb.shape[-2]
    # move overlay content from canvas origin to the paste position
    ov = jnp.roll(ov_rgba, (py, px), axis=(-3, -2))
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (
        (iy >= py) & (iy < py + ov_h) & (ix >= px) & (ix < px + ov_w)
        & (iy < bg_h) & (ix < bg_w)
    )
    a = jnp.where(inside, ov[..., 3].astype(jnp.int32), 0)[..., None]
    bgi = bg_rgb[..., :3].astype(jnp.int32)
    ovi = ov[..., :3].astype(jnp.int32)
    out = (bgi * (255 - a) + ovi * a + 127) // 255
    return out.astype(bg_rgb.dtype)


alpha_paste_batch = jax.vmap(alpha_paste)
