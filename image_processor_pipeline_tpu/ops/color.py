"""Color-space ops: RGB→HSV (OpenCV uint8 conventions), multi-range HSV
masking with rectangular zones, and mask→alpha conversion.

Parity targets: reference filtres_liste.py:41-149 (cv2.cvtColor BGR2HSV +
cv2.inRange stacks + zone masks + inverted mask as alpha channel) and
atomize/gaine_jaune.py:10-44 (single-range chroma key).

The reference reads BGR with cv2; internally we are RGB everywhere — the HSV
math below is the standard (R, G, B) formulation, which is exactly what
cv2.cvtColor(BGR2HSV) computes on its channel-reversed view, so masks agree.

All pure elementwise math — XLA fuses the whole filter stack into one pass
over HBM (see also ops/pallas for the hand-fused kernel).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def rgb_to_hsv_u8(img):
    """uint8 RGB [..., 3] → uint8 HSV with cv2 8-bit ranges H∈[0,180), S,V∈[0,255].

    Matches OpenCV's 8U formulation: V = max, S = round(255(V-min)/V),
    H = round(deg/2) with the sector formula.
    """
    f = img.astype(jnp.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    s = jnp.where(v > 0, 255.0 * diff / jnp.where(v > 0, v, 1.0), 0.0)
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        v == r, 60.0 * (g - b) / safe,
        jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe),
    )
    h = jnp.where(diff > 0, h, 0.0)
    h = jnp.where(h < 0, h + 360.0, h)
    h8 = jnp.rint(h / 2.0)
    h8 = jnp.where(h8 >= 180.0, 0.0, h8)
    s8 = jnp.rint(s)
    v8 = jnp.rint(v)
    return jnp.stack([h8, s8, v8], axis=-1).astype(jnp.uint8)


def in_range(hsv, lower: Sequence[float], upper: Sequence[float]):
    """cv2.inRange: bool mask where lower <= hsv <= upper channelwise.

    Bounds may be floats (the reference's GIMP rescale produces unrounded
    *2.55 values, filtres_liste.py:32-37).  cv2.inRange saturate-casts the
    scalar bound array to the src dtype BEFORE comparing — round half to
    even (cvRound), clamped to [0, 255] — so e.g. a lower S bound of
    30*2.55 = 76.5 admits S = 76.  We replicate that exactly.
    """
    h = hsv.astype(jnp.float32)
    lo = jnp.clip(jnp.rint(jnp.asarray(lower, jnp.float32)), 0, 255)
    hi = jnp.clip(jnp.rint(jnp.asarray(upper, jnp.float32)), 0, 255)
    return jnp.all((h >= lo) & (h <= hi), axis=-1)


def zone_mask(H: int, W: int, h, w, top, bottom, left, right):
    """Bool mask restricted to a margin-inset rectangle of the valid region.

    Margins are absolute pixel counts computed host-side (reference
    filtres_liste.py:99-113 computes them from fractional or absolute specs).
    """
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return (iy >= top) & (iy < h - bottom) & (ix >= left) & (ix < w - right)


def color_mask_alpha(
    img_rgb,
    h,
    w,
    lowers,          # [F, 3] float/int arrays
    uppers,          # [F, 3]
    zones,           # [F, 4] int margins (top, bottom, left, right)
):
    """Accumulate F HSV in-range masks (each ANDed with its zone), OR them,
    invert, and return a uint8 alpha channel (255 = keep, 0 = masked out).

    Parity: reference filtres_liste.py:99-144 — per filter: inRange AND
    zone mask, OR-accumulated; final alpha = NOT(mask).
    """
    H, W = img_rgb.shape[-3], img_rgb.shape[-2]
    hsv = rgb_to_hsv_u8(img_rgb[..., :3])
    lowers = jnp.asarray(lowers, jnp.float32).reshape(-1, 3)
    uppers = jnp.asarray(uppers, jnp.float32).reshape(-1, 3)
    zones = jnp.asarray(zones, jnp.int32).reshape(-1, 4)

    def body(i, acc):
        m = in_range(hsv, lowers[i], uppers[i])
        z = zone_mask(H, W, h, w,
                      zones[i, 0], zones[i, 1], zones[i, 2], zones[i, 3])
        return acc | (m & z)

    acc = jax.lax.fori_loop(
        0, lowers.shape[0], body, jnp.zeros((H, W), jnp.bool_)
    )
    alpha = jnp.where(acc, jnp.uint8(0), jnp.uint8(255))
    # keep alpha zero outside the valid region
    from image_processor_pipeline_tpu.ops.geometry import valid_mask
    return jnp.where(valid_mask(h, w, H, W), alpha, jnp.uint8(0))


def gimp_to_cv_hsv(hsv_bound: Sequence[float]) -> Tuple[float, float, float]:
    """GIMP-scale HSV (H∈[0,360], S,V∈[0,100]) → cv2 8-bit scale.

    Parity: reference filtres_liste.py:8-39 (_rescale_filter): H floor-divided
    by 2, S and V multiplied by 2.55 *without rounding* here — cv2.inRange
    saturate-rounds the bounds to uint8 at compare time (see in_range).
    """
    h, s, v = hsv_bound
    if not (0 <= h <= 360 and 0 <= s <= 100 and 0 <= v <= 100):
        raise ValueError(f"HSV bound out of GIMP range: {hsv_bound}")
    return (h // 2, s * 2.55, v * 2.55)


def rescale_filter(filter_tuple, use_gimp_scale: bool = False):
    """Validate/convert one 6-tuple (Hmin,Smin,Vmin,Hmax,Smax,Vmax).

    Parity: reference filtres_liste.py:8-39 — OpenCV scale is validated
    (H <= 180, warn-only if S/V all <= 100); GIMP scale is converted.
    """
    mn_h, mn_s, mn_v, mx_h, mx_s, mx_v = filter_tuple
    if not use_gimp_scale:
        if mn_h > 180 or mx_h > 180:
            raise ValueError(
                f"H values ({mn_h}-{mx_h}) exceed the OpenCV range [0, 180]"
            )
        return tuple(filter_tuple)
    if any(sv > 100 for sv in (mn_s, mn_v, mx_s, mx_v)):
        raise ValueError(
            f"S/V values ({mn_s},{mn_v},{mx_s},{mx_v}) exceed the GIMP "
            "range [0, 100]"
        )
    return (mn_h // 2, mn_s * 2.55, mn_v * 2.55,
            mx_h // 2, mx_s * 2.55, mx_v * 2.55)
