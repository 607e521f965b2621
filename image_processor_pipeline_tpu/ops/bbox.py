"""YOLO bbox math as pure JAX functions (device-friendly, batched).

Replaces the reference's `ultralytics.utils.ops.xywhn2xyxy` / `xyxy2xywhn`
dependency (reference crop_square.py:8, overlays.py:8) with in-repo
implementations, plus the shift/clip/validity logic of the square-crop
transform (reference crop_square.py:201-217).

All functions work on float32 arrays of shape [..., 4] and are usable both
inside jit (jnp arrays) and on host (numpy arrays via jnp dispatch).
"""

from __future__ import annotations

import jax.numpy as jnp


def xywhn2xyxy(x, w, h, padw=0.0, padh=0.0):
    """Normalized center xywh -> absolute corner xyxy.

    Matches ultralytics semantics used at reference crop_square.py:167:
    x1 = w*(cx - bw/2) + padw, etc.
    """
    x = jnp.asarray(x, jnp.float32)
    cx, cy, bw, bh = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    x1 = w * (cx - bw / 2) + padw
    y1 = h * (cy - bh / 2) + padh
    x2 = w * (cx + bw / 2) + padw
    y2 = h * (cy + bh / 2) + padh
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def xyxy2xywhn(x, w, h, clip=False, eps=0.0):
    """Absolute corner xyxy -> normalized center xywh.

    Matches ultralytics semantics used at reference crop_square.py:217 and
    overlays.py:143-149.
    """
    x = jnp.asarray(x, jnp.float32)
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    cx = ((x1 + x2) / 2) / w
    cy = ((y1 + y2) / 2) / h
    bw = (x2 - x1) / w
    bh = (y2 - y1) / h
    return jnp.stack([cx, cy, bw, bh], axis=-1)


def clip_boxes(boxes, shape):
    """Clip xyxy boxes to image shape (h, w)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    h, w = shape
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def shift_boxes(boxes, dx, dy):
    """Translate xyxy boxes by (-dx, -dy) into a crop frame.

    Parity with reference crop_square.py:201-204 (bboxes - [x0, y0, x0, y0]).
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    offset = jnp.stack(
        [jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(dx), jnp.asarray(dy)],
        axis=-1,
    ).astype(jnp.float32)
    return boxes - offset


def valid_boxes(boxes, min_size=1.0):
    """Validity mask for xyxy boxes: strictly positive extent after clipping.

    Fixes the reference's ambiguous-truth defect (crop_square.py:210,
    SURVEY.md §2.7 #3) by doing the intended elementwise test:
    (x2 - x1 >= min_size) & (y2 - y1 >= min_size).
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    return ((boxes[..., 2] - boxes[..., 0]) >= min_size) & (
        (boxes[..., 3] - boxes[..., 1]) >= min_size
    )


def union_box(boxes, mask=None):
    """Union (enclosing) xyxy box over the boxes axis (-2).

    With ``mask`` (bool [..., N]), ignored boxes don't affect the union.
    Used for the square-crop placement bounds (reference crop_square.py:172-189).
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    big = jnp.float32(1e9)
    if mask is not None:
        m = mask[..., None]
        mins = jnp.where(m, boxes, big)
        maxs = jnp.where(m, boxes, -big)
    else:
        mins = maxs = boxes
    x1 = jnp.min(mins[..., 0], axis=-1)
    y1 = jnp.min(mins[..., 1], axis=-1)
    x2 = jnp.max(maxs[..., 2], axis=-1)
    y2 = jnp.max(maxs[..., 3], axis=-1)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
