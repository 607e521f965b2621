"""Overlay alpha-compositing + YOLO label synthesis — batched TPU transform.

Behavior parity with reference overlays.py:24-187
(paste_overlay_onto_background, the current non-deprecated variant):
  - overlay → RGBA, background → RGB (overlays.py:83-88)
  - target overlay diagonal = uniform(scale_min=0.15, scale_max=0.30) ×
    background diagonal, capped so the overlay fits at its aspect ratio
    (overlays.py:104-121); final dims via int() truncation of
    h = sqrt(d²/(ar²+1)), w = int(ar·h) (overlays.py:125-126)
  - LANCZOS resize (overlays.py:129) — here two MXU matmuls
  - uniform random placement, inclusive randint bounds (overlays.py:133-134)
  - PIL alpha paste (overlays.py:138-139)
  - one YOLO label line for the paste bbox, class ``yolo_class_id``
    (overlays.py:141-149); label has NO trailing newline (overlays.py:172-173)
  - outputs ``{overlay_stem}{background_suffix}`` and ``{overlay_stem}.txt``
    (overlays.py:165-166); partial outputs removed on save failure
    (overlays.py:182-187)
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from image_processor_pipeline_tpu.transforms.base import BatchTransform
from image_processor_pipeline_tpu.ops import bbox as bbox_ops
from image_processor_pipeline_tpu.ops import compose, geometry
from image_processor_pipeline_tpu.io.images import (
    decode_padded,
    encode_image,
    probe_padded,
)
from image_processor_pipeline_tpu.utils.utils import validate_dirs


def _paste_one(ov, ov_h, ov_w, bg, bg_h, bg_w, seed,
               scale_min: float, scale_max: float):
    key = jax.random.PRNGKey(seed)
    kr, kx, ky = jax.random.split(key, 3)

    bhf = bg_h.astype(jnp.float32)
    bwf = bg_w.astype(jnp.float32)
    ohf = ov_h.astype(jnp.float32)
    owf = ov_w.astype(jnp.float32)

    bg_diag = jnp.sqrt(bwf * bwf + bhf * bhf)
    ratio = jax.random.uniform(kr, (), minval=scale_min, maxval=scale_max)
    target_diag = bg_diag * ratio

    aspect = owf / ohf
    h_max = jnp.minimum(bwf / aspect, bhf)
    max_diag = jnp.sqrt((aspect * h_max) ** 2 + h_max ** 2)
    diag = jnp.minimum(target_diag, max_diag)

    new_h = jnp.floor(jnp.sqrt(diag * diag / (aspect * aspect + 1.0)))
    new_w = jnp.floor(aspect * new_h)
    new_hi = new_h.astype(jnp.int32)
    new_wi = new_w.astype(jnp.int32)
    ok = (new_hi > 0) & (new_wi > 0)

    Hb, Wb = bg.shape[0], bg.shape[1]
    resized = geometry.resize(
        ov, ov_h, ov_w, new_hi, new_wi, "lanczos", out_canvas=(Hb, Wb)
    )

    px = jax.random.randint(
        kx, (), 0, jnp.maximum(bg_w - new_wi, 0) + 1
    )
    py = jax.random.randint(
        ky, (), 0, jnp.maximum(bg_h - new_hi, 0) + 1
    )

    out = compose.alpha_paste(bg, bg_h, bg_w, resized, new_hi, new_wi, py, px)

    xyxy = jnp.stack([px, py, px + new_wi, py + new_hi]).astype(jnp.float32)
    xywhn = bbox_ops.xyxy2xywhn(xyxy, bwf, bhf)
    return {
        "image": out,
        "xywhn": xywhn,
        "ok": ok,
        "pos": jnp.stack([py, px]),
        "new_size": jnp.stack([new_hi, new_wi]),
    }


class PasteOverlayOntoBackground(BatchTransform):
    max_batch = 16

    def load_item(self, inputs: Tuple, options: Dict) -> Dict[str, Any]:
        ov_path, bg_path = Path(inputs[0]), Path(inputs[1])
        ov, ov_h, ov_w, ov_canvas = decode_padded(ov_path, mode="RGBA")
        bg, bg_h, bg_w, bg_canvas = decode_padded(bg_path, mode="RGB")
        if ov_h == 0:
            raise ValueError(f"overlay {ov_path.name} has invalid dimensions")
        return {
            "canvas": (*ov_canvas, *bg_canvas),
            "overlay": ov,
            "ov_size": np.asarray([ov_h, ov_w], np.int32),
            "background": bg,
            "bg_size": np.asarray([bg_h, bg_w], np.int32),
        }

    def probe_item(self, inputs: Tuple, options: Dict) -> Optional[Dict]:
        """Metadata-only load (native header probes, no pixel decode): a
        bucket of n items then decodes with exactly TWO native batch calls
        (overlay RGBA + background RGB — io/images.py:_fill_pending_multi)
        instead of 2n per-item Python-thread decodes."""
        ov_path, bg_path = Path(inputs[0]), Path(inputs[1])
        ov_meta = probe_padded(ov_path, mode="RGBA")
        bg_meta = probe_padded(bg_path, mode="RGB")
        if ov_meta is None or bg_meta is None:
            return None
        ov_h, ov_w, ov_canvas = ov_meta
        bg_h, bg_w, bg_canvas = bg_meta
        if ov_h == 0:
            raise ValueError(f"overlay {ov_path.name} has invalid dimensions")
        return {
            "canvas": (*ov_canvas, *bg_canvas),
            "ov_size": np.asarray([ov_h, ov_w], np.int32),
            "bg_size": np.asarray([bg_h, bg_w], np.int32),
            "_pending": {
                "overlay": (
                    str(ov_path), "RGBA", False, ov_canvas, ov_h, ov_w),
                "background": (
                    str(bg_path), "RGB", False, bg_canvas, bg_h, bg_w),
            },
        }

    def static_args(self, options: Dict, key: Tuple) -> Tuple:
        return (
            float(options.get("scale_min", 0.15)),
            float(options.get("scale_max", 0.30)),
        )

    def device_fn(self, batch, static):
        scale_min, scale_max = static
        return jax.vmap(
            lambda ov, ovs, bg, bgs, seed: _paste_one(
                ov, ovs[0], ovs[1], bg, bgs[0], bgs[1], seed,
                scale_min, scale_max,
            )
        )(batch["overlay"], batch["ov_size"], batch["background"],
          batch["bg_size"], batch["seed"])

    def save_item(
        self,
        out: Dict[str, np.ndarray],
        item: Dict,
        output_dirs: Sequence[Path],
        options: Dict,
    ) -> Optional[List[Path]]:
        img_dir, lbl_dir = validate_dirs(output_dirs, 2)
        ov_path = Path(item["_args"][0])
        bg_path = Path(item["_args"][1])
        if not bool(out["ok"]):
            print(f"[overlays] degenerate overlay size for {ov_path.name}")
            return None
        bh, bw = (int(x) for x in item["bg_size"])
        composite = out["image"][:bh, :bw]
        cx, cy, wn, hn = (float(x) for x in out["xywhn"])
        cls_id = options.get("yolo_class_id", 0)
        label_line = f"{cls_id} {cx:.6f} {cy:.6f} {wn:.6f} {hn:.6f}"

        img_out = Path(img_dir) / f"{ov_path.stem}{bg_path.suffix}"
        lbl_out = Path(lbl_dir) / f"{ov_path.stem}.txt"
        saved: List[Path] = []
        try:
            encode_image(composite, img_out)
            saved.append(img_out)
            lbl_out.write_text(label_line)
            saved.append(lbl_out)
            return saved
        except Exception as e:  # noqa: BLE001 — rollback partial outputs
            print(f"[overlays] save failed for {ov_path.name}: {e}")
            for p in saved:
                try:
                    if p.exists():
                        p.unlink()
                except OSError:
                    print(f"[overlays] could not clean up partial file {p}")
            return None
