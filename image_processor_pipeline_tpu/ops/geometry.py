"""Geometric device ops on padded images.

Representation: a padded canvas ``[H, W, C]`` (static shape under jit) holding
a valid region ``[0:h, 0:w]`` whose extents ``(h, w)`` may be traced values.
Invariant maintained by every op here: pixels outside the valid region are 0.

Batched variants are provided via jax.vmap (suffix ``_batch``).

Parity targets (behavior only, fresh TPU-first implementation):
  - dihedral flips          reference symmetry.py:114-119 (cv2.flip 1/0/-1)
  - square / border crops   reference crop_square.py:196, recadrages.py:13-61
  - rotate with expand      reference rotations.py:96-109 (PIL rotate(expand=True))
  - tight content bbox      reference recadrages.py:63-82 (PIL getbbox)
  - separable resize        reference overlays.py:129 (PIL LANCZOS resize),
                            done TPU-first as two MXU matmuls with
                            on-device interpolation-weight matrices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def valid_mask(h, w, H: int, W: int):
    """Boolean [H, W] mask of the valid region [0:h, 0:w]."""
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return (iy < h) & (ix < w)


def apply_mask(img, h, w):
    """Zero pixels outside the valid region."""
    H, W = img.shape[-3], img.shape[-2]
    m = valid_mask(h, w, H, W)
    return jnp.where(m[..., None], img, jnp.zeros((), img.dtype))


# ---------------------------------------------------------------------------
# dihedral flips (cv2.flip semantics: 1=horizontal/x, 0=vertical/y, -1=both)
# ---------------------------------------------------------------------------

def flip_h(img, h, w):
    """Horizontal mirror (flip around the vertical axis), size-preserving."""
    W = img.shape[-2]
    out = jnp.flip(img, axis=-2)
    return jnp.roll(out, w - W, axis=-2)


def flip_v(img, h, w):
    """Vertical mirror (flip around the horizontal axis), size-preserving."""
    H = img.shape[-3]
    out = jnp.flip(img, axis=-3)
    return jnp.roll(out, h - H, axis=-3)


def flip_hv(img, h, w):
    """180° rotation (both flips)."""
    return flip_h(flip_v(img, h, w), h, w)


def dihedral(img, h, w, sym: str):
    """Apply one of the reference's symmetry generators 'o'/'h'/'v'/'hv'.

    Parity: reference symmetry.py:114-119.
    """
    if sym == "o":
        return img
    if sym == "h":
        return flip_h(img, h, w)
    if sym == "v":
        return flip_v(img, h, w)
    if sym == "hv":
        return flip_hv(img, h, w)
    raise ValueError(f"unknown symmetry {sym!r}")


# ---------------------------------------------------------------------------
# crops
# ---------------------------------------------------------------------------

def crop(img, y0, x0, ch, cw):
    """Extract the window [y0:y0+ch, x0:x0+cw] to the canvas origin.

    The window must lie inside the valid region (callers guarantee this, as
    the reference does for its square crop at crop_square.py:179-193).
    Implemented as a circular roll — no wraparound can reach the new valid
    region because y0+ch <= h <= H — followed by a mask.
    """
    out = jnp.roll(img, (-y0, -x0), axis=(-3, -2))
    return apply_mask(out, ch, cw)


def border_crop(img, h, w, top, bottom, left, right):
    """Crop margins off each side (reference recadrages.py:13-61).

    Margins are absolute pixel counts (the fraction-vs-absolute decision of
    reference recadrages.py:7-10 happens host-side).  Returns (img, ch, cw).
    """
    ch = h - top - bottom
    cw = w - left - right
    return crop(img, top, left, ch, cw), ch, cw


def content_bbox(img, h, w):
    """Tight bbox (y0, x0, bh, bw) of pixels where any channel is nonzero.

    Parity: PIL Image.getbbox() as used at reference rotations.py:99-109 and
    recadrages.py:63-82.  Returns (0, 0, 0, 0) for an all-zero image.
    """
    H, W = img.shape[-3], img.shape[-2]
    nz = jnp.any(img != 0, axis=-1) & valid_mask(h, w, H, W)
    rows = jnp.any(nz, axis=-1)
    cols = jnp.any(nz, axis=-2)
    iy = jax.lax.iota(jnp.int32, H)
    ix = jax.lax.iota(jnp.int32, W)
    big = jnp.int32(1 << 30)
    y0 = jnp.min(jnp.where(rows, iy, big))
    y1 = jnp.max(jnp.where(rows, iy, -1))
    x0 = jnp.min(jnp.where(cols, ix, big))
    x1 = jnp.max(jnp.where(cols, ix, -1))
    any_nz = jnp.any(rows)
    y0 = jnp.where(any_nz, y0, 0)
    x0 = jnp.where(any_nz, x0, 0)
    bh = jnp.where(any_nz, y1 - y0 + 1, 0)
    bw = jnp.where(any_nz, x1 - x0 + 1, 0)
    return y0, x0, bh, bw


def fit_crop(img, h, w):
    """Tight-crop to content bbox; returns (img, bh, bw).

    Parity: reference recadrages.py:63-82 (fit_crop) and the post-rotation
    tight crop at rotations.py:99-109.
    """
    y0, x0, bh, bw = content_bbox(img, h, w)
    return crop(img, y0, x0, bh, bw), bh, bw


# ---------------------------------------------------------------------------
# arbitrary-angle rotation with expand (PIL semantics)
# ---------------------------------------------------------------------------

def rotated_size(h, w, angle_deg):
    """Expanded canvas extents after rotating (h, w) by angle (degrees CCW).

    Mirrors PIL's expand box (Image.rotate): transform the four corners
    around the center (w/2, h/2), then size = ceil(max) - floor(min) per
    axis.  A small epsilon snaps exact multiples of 90° (PIL handles those
    via its transpose fast path, never through this formula).
    """
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    c = jnp.abs(jnp.cos(theta))
    s = jnp.abs(jnp.sin(theta))
    hf = jnp.asarray(h, jnp.float32)
    wf = jnp.asarray(w, jnp.float32)
    ex = (wf * c + hf * s) / 2
    ey = (wf * s + hf * c) / 2
    cx = wf / 2
    cy = hf / 2
    eps = 1e-4
    w2 = (jnp.ceil(cx + ex - eps) - jnp.floor(cx - ex + eps)).astype(jnp.int32)
    h2 = (jnp.ceil(cy + ey - eps) - jnp.floor(cy - ey + eps)).astype(jnp.int32)
    return h2, w2


def rotate_expand(img, h, w, angle_deg, interpolation: str = "nearest"):
    """Rotate CCW by ``angle_deg`` with canvas expansion, fill transparent.

    Parity: PIL Image.rotate(angle, expand=True) at reference rotations.py:96
    (nearest by default there — bicubic is commented out; we offer nearest
    and bilinear).  The rotated content lands at the canvas origin with new
    extents (h2, w2) as returned.  Outside pixels are 0 (transparent for
    RGBA), matching PIL's fillcolor=None on RGBA.

    Returns (out_img, h2, w2).
    """
    H, W = img.shape[-3], img.shape[-2]
    C = img.shape[-1]
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    h2, w2 = rotated_size(h, w, angle_deg)

    cy_in = jnp.asarray(h, jnp.float32) / 2
    cx_in = jnp.asarray(w, jnp.float32) / 2
    # PIL places the output origin at floor(min corner coordinate), not at
    # a center-to-center alignment — keep the same subpixel offset.
    ex = (jnp.asarray(w, jnp.float32) * jnp.abs(cos)
          + jnp.asarray(h, jnp.float32) * jnp.abs(sin)) / 2
    ey = (jnp.asarray(w, jnp.float32) * jnp.abs(sin)
          + jnp.asarray(h, jnp.float32) * jnp.abs(cos)) / 2
    eps = 1e-4
    tx = jnp.floor(cx_in - ex + eps)
    ty = jnp.floor(cy_in - ey + eps)

    # output pixel centers in the pre-shift frame
    oy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32) + 0.5 + ty
    ox = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32) + 0.5 + tx
    dy = oy - cy_in
    dx = ox - cx_in
    # Inverse map of a visual-CCW rotation (image y axis points down):
    # src = R(-theta) @ dst  with screen coords, i.e.
    sx = cos * dx - sin * dy + cx_in
    sy = sin * dx + cos * dy + cy_in

    hf = jnp.asarray(h, jnp.float32)
    wf = jnp.asarray(w, jnp.float32)

    if interpolation == "nearest":
        ix = jnp.floor(sx).astype(jnp.int32)
        iy = jnp.floor(sy).astype(jnp.int32)
        inb = (sx >= 0) & (sx < wf) & (sy >= 0) & (sy < hf)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        flat = img.reshape(H * W, C)
        out = flat[(iyc * W + ixc).reshape(-1)].reshape(H, W, C)
        out = jnp.where(inb[..., None], out, jnp.zeros((), img.dtype))
    elif interpolation == "bilinear":
        # PIL parity (Image.rotate → transform(AFFINE, BILINEAR) →
        # ImagingGenericTransform + bilinear_filter, verified by probing):
        #   - output→input affine built with angle NEGATED, trig rounded to
        #     15 decimals, center (w/2, h/2), expand shift -(nw-w)/2
        #     (Image.py rotate; NO floor — unlike the nearest fast path
        #     above, whose floor convention is also PIL-probed)
        #   - fill (all-zero) where xin∉[0,w) or yin∉[0,h) BEFORE the -0.5
        #     pixel-center shift
        #   - taps CLAMP (replicate) at the valid-region borders
        #   - final store is a C (UINT8) cast: truncation toward zero
        ar = -theta
        ca = jnp.cos(ar)
        sa = jnp.sin(ar)
        cx = wf / 2
        cy = hf / 2
        c0 = ca * (-cx) + sa * (-cy) + cx
        f0 = -sa * (-cx) + ca * (-cy) + cy
        nwf = jnp.asarray(w2, jnp.float32)
        nhf = jnp.asarray(h2, jnp.float32)
        ex2 = -(nwf - wf) / 2
        ey2 = -(nhf - hf) / 2
        c1 = ca * ex2 + sa * ey2 + c0
        f1 = -sa * ex2 + ca * ey2 + f0
        X = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(
            jnp.float32) + 0.5
        Y = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(
            jnp.float32) + 0.5
        xin = ca * X + sa * Y + c1
        yin = -sa * X + ca * Y + f1
        inb = (xin >= 0) & (xin < wf) & (yin >= 0) & (yin < hf)

        fx = xin - 0.5
        fy = yin - 0.5
        x0f = jnp.floor(fx)
        y0f = jnp.floor(fy)
        tx_w = (fx - x0f)[..., None]
        ty_w = (fy - y0f)[..., None]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        is_int = jnp.issubdtype(img.dtype, jnp.integer)
        premult = is_int and C == 4
        if premult:
            # PIL transforms RGBA via premultiplied alpha (Image.transform
            # converts RGBA→RGBa first): c' = MULDIV255(c, a), exact uint8
            # convention probed against Pillow
            ci = img[..., :3].astype(jnp.int32)
            ai = img[..., 3:].astype(jnp.int32)
            tmp = ci * ai + 128
            pre = ((tmp >> 8) + tmp) >> 8
            work = jnp.concatenate([pre, ai], axis=-1)
        else:
            work = img
        flat = work.astype(jnp.float32).reshape(H * W, C)

        def sample(yy, xx):
            # replicate-clamp at the VALID extent (h, w), not the canvas
            yyc = jnp.clip(yy, 0, h - 1)
            xxc = jnp.clip(xx, 0, w - 1)
            return flat[(yyc * W + xxc).reshape(-1)].reshape(H, W, C)

        v00 = sample(y0, x0)
        v01 = sample(y0, x0 + 1)
        v10 = sample(y0 + 1, x0)
        v11 = sample(y0 + 1, x0 + 1)
        # PIL's BILINEAR macro is v = a + d*(b - a) — keep the same form
        top = v00 + tx_w * (v01 - v00)
        bot = v10 + tx_w * (v11 - v10)
        outf = top + ty_w * (bot - top)
        outf = jnp.where(inb[..., None], outf, 0.0)
        if is_int:
            # (UINT8)v — truncation toward zero (values are >= 0)
            out_i = jnp.clip(jnp.floor(outf), 0, 255).astype(jnp.int32)
            if premult:
                # RGBa→RGBA back-conversion: floor(c'*255 / a), 0 where a=0
                a_out = out_i[..., 3:]
                rgb = jnp.where(
                    a_out > 0,
                    jnp.clip((out_i[..., :3] * 255)
                             // jnp.maximum(a_out, 1), 0, 255),
                    0,
                )
                out_i = jnp.concatenate([rgb, a_out], axis=-1)
            out = out_i.astype(img.dtype)
        else:
            out = outf.astype(img.dtype)
    else:
        raise ValueError(f"unknown interpolation {interpolation!r}")

    out = apply_mask(out, h2, w2)
    return out, h2, w2


def rotate_fixed(img, h, w, angle_deg):
    """Rotate CCW about the valid-region center WITHOUT canvas expansion
    (PIL rotate(angle, expand=False) semantics): same (h, w), corners that
    leave the frame are cut, uncovered pixels are 0.  Nearest sampling.

    Used by the fused 512px benchmark chain where static shapes must stay
    flat through the whole program.
    """
    H, W = img.shape[-3], img.shape[-2]
    C = img.shape[-1]
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    cy = jnp.asarray(h, jnp.float32) / 2
    cx = jnp.asarray(w, jnp.float32) / 2
    oy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32) + 0.5
    ox = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32) + 0.5
    dy = oy - cy
    dx = ox - cx
    sx = cos * dx - sin * dy + cx
    sy = sin * dx + cos * dy + cy
    ix = jnp.floor(sx).astype(jnp.int32)
    iy = jnp.floor(sy).astype(jnp.int32)
    inb = (sx >= 0) & (sx < jnp.asarray(w, jnp.float32)) & \
          (sy >= 0) & (sy < jnp.asarray(h, jnp.float32))
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    flat = img.reshape(H * W, C)
    out = flat[(iyc * W + ixc).reshape(-1)].reshape(H, W, C)
    out = jnp.where(inb[..., None], out, jnp.zeros((), img.dtype))
    return apply_mask(out, h, w)


def shift_bits_for(size: int) -> int:
    """Bit passes needed so the shear-shift offset covers ±0.354*size
    (the worst-case Paeth shift at ±45°).  9 bits up to 720px, 10 to 1444..."""
    need = int(0.35356 * size) + 2
    bits = 1
    while (1 << (bits - 1)) < need:
        bits += 1
    return max(bits, 4)


def _row_shift(img, shifts, axis: int = 1, bits: int = 9):
    """Shift each row (axis=1) or column (axis=0) by a per-index amount,
    zero-filling vacated pixels — NO gather.

    The per-row shift t is decomposed into binary components of
    u = t + 2^(bits-1) >= 0: for each bit k the rows with that bit set take
    a UNIFORM circular roll by 2^k, selected per row (roll+select are pure
    VPU ops XLA fuses); a final constant roll removes the offset and an
    analytic validity mask kills wrapped pixels.  ~`bits` fused passes
    instead of a per-element gather — this is what makes arbitrary-angle
    rotation bandwidth-bound on TPU instead of gather-bound.
    """
    size = img.shape[axis]
    offset = 1 << (bits - 1)
    t = jnp.clip(shifts, -(offset - 1), offset - 1)
    u = t + offset

    # per-index selector broadcast over the shifted axis
    sel_shape = [1, 1, 1]
    sel_shape[1 - axis] = t.shape[0]
    out = img
    for k in range(bits):
        rolled = jnp.roll(out, 1 << k, axis=axis)
        mask = ((u >> k) & 1).astype(bool).reshape(sel_shape)
        out = jnp.where(mask, rolled, out)
    out = jnp.roll(out, -offset, axis=axis)

    # zero wrapped pixels: position x is valid iff x - t lies in [0, size)
    pos = jax.lax.broadcasted_iota(jnp.int32, (img.shape[0], img.shape[1]),
                                   axis)
    tt = t.reshape(sel_shape[0], sel_shape[1])
    valid = (pos >= tt) & (pos < size + tt)
    return jnp.where(valid[..., None], out, jnp.zeros((), img.dtype))


def rotate_square_shear(img, angle_deg):
    """Rotate a square, fully-valid image CCW about its center on a fixed
    canvas (expand=False) using Paeth's three-shear decomposition.

    Each shear is a per-row (or per-column, via transpose) integer shift —
    a pure pixel permutation, so no resampling artifacts beyond nearest
    rounding — executed as batched row dynamic-slices instead of the
    per-element gather of `rotate_fixed` (~50x faster on TPU; the gather
    path measured 1.7 ms/image at 512px on v5e, this path is bandwidth-bound).

    Multiples of 90° are handled exactly by rot90; the residual angle in
    [-45°, 45°] goes through the shears.  Pixels leaving the frame are cut,
    uncovered pixels are zero-filled — same contract as `rotate_fixed`.
    """
    H, W, C = img.shape
    if H != W:
        raise ValueError("rotate_square_shear requires a square canvas")
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    theta = jnp.mod(theta, 2 * jnp.pi)

    # quadrant reduction: visual-CCW quarter turns are exact
    quad = jnp.floor((theta + jnp.pi / 4) / (jnp.pi / 2)).astype(jnp.int32) % 4
    img = jax.lax.switch(
        quad,
        [
            lambda x: x,
            lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=0),   # 90° CCW
            lambda x: jnp.flip(jnp.flip(x, axis=0), axis=1),     # 180°
            lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=1),   # 270° CCW
        ],
        img,
    )
    phi = theta - quad.astype(jnp.float32) * (jnp.pi / 2)  # in [-45°, 45°]

    # Paeth: R(phi) = ShearX(a) · ShearY(b) · ShearX(a); with the image y
    # axis pointing down, visual-CCW needs a = tan(phi/2), b = -sin(phi)
    # (solve Sx·Sy·Sx = [[cos, sin], [-sin, cos]]).
    a = jnp.tan(phi / 2)
    b = -jnp.sin(phi)
    c = (jnp.float32(H) - 1.0) / 2.0
    iy = (jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
          .astype(jnp.float32)[:, 0] - c)

    sh1 = jnp.rint(a * iy).astype(jnp.int32)   # x-shift per row
    sh2 = jnp.rint(b * iy).astype(jnp.int32)   # y-shift per column
    bits = shift_bits_for(H)
    img = _row_shift(img, sh1, axis=1, bits=bits)
    img = _row_shift(img, sh2, axis=0, bits=bits)
    img = _row_shift(img, sh1, axis=1, bits=bits)
    return img


# ---------------------------------------------------------------------------
# separable resize via interpolation-matrix matmuls (MXU path)
# ---------------------------------------------------------------------------

def _filter_fn(name: str):
    if name == "bilinear":
        def f(x):
            ax = jnp.abs(x)
            return jnp.maximum(0.0, 1.0 - ax)
        return f, 1.0
    if name == "lanczos":
        def f(x):
            ax = jnp.abs(x)
            pix = jnp.pi * x
            # sinc(x) * sinc(x/3) on |x| < 3, 1 at 0
            safe = jnp.where(ax < 1e-7, 1.0, pix)
            val = (jnp.sin(safe) / safe) * (jnp.sin(safe / 3.0) / (safe / 3.0))
            val = jnp.where(ax < 1e-7, 1.0, val)
            return jnp.where(ax < 3.0, val, 0.0)
        return f, 3.0
    if name == "nearest":
        def f(x):
            return jnp.where((x >= -0.5) & (x < 0.5), 1.0, 0.0)
        return f, 0.5
    raise ValueError(f"unknown resize filter {name!r}")


def resize_matrix(in_size, out_size, In: int, Out: int, method: str):
    """Dense [Out, In] row-normalized interpolation matrix (PIL semantics).

    ``in_size``/``out_size`` may be traced; ``In``/``Out`` are the static
    canvas extents.  Rows >= out_size and columns >= in_size are zero.
    PIL convention: center = (i + 0.5) * scale, window support scaled by
    max(scale, 1), weights normalized over the in-bounds window.
    """
    f, support = _filter_fn(method)
    inf = jnp.asarray(in_size, jnp.float32)
    outf = jnp.asarray(out_size, jnp.float32)
    scale = inf / jnp.maximum(outf, 1.0)
    filterscale = jnp.maximum(scale, 1.0)
    sup = support * filterscale

    i = jax.lax.broadcasted_iota(jnp.int32, (Out, In), 0).astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (Out, In), 1).astype(jnp.float32)
    center = (i + 0.5) * scale
    x = (k + 0.5 - center) / filterscale
    wgt = f(x)
    # restrict to the window and to valid input columns
    wgt = jnp.where(jnp.abs(k + 0.5 - center) <= sup, wgt, 0.0)
    wgt = jnp.where(k < inf, wgt, 0.0)
    norm = jnp.sum(wgt, axis=1, keepdims=True)
    wgt = wgt / jnp.where(norm == 0, 1.0, norm)
    wgt = jnp.where(i < outf, wgt, 0.0)
    return wgt


def resize(img, h, w, out_h, out_w, method: str = "lanczos",
           out_canvas: Tuple[int, int] = None):
    """Separable resize of the valid region to (out_h, out_w).

    TPU-first: builds row/column interpolation matrices on device and runs
    two matmuls (MXU) instead of a gather-based warp.  Replaces PIL
    Image.resize(..., LANCZOS) at reference overlays.py:129.

    Returns the resized image on an ``out_canvas`` (defaults to the input
    canvas) with zeros outside [0:out_h, 0:out_w].
    """
    H, W = img.shape[-3], img.shape[-2]
    Ho, Wo = out_canvas if out_canvas is not None else (H, W)
    Ay = resize_matrix(h, out_h, H, Ho, method)          # [Ho, H]
    Ax = resize_matrix(w, out_w, W, Wo, method)          # [Wo, W]
    is_int = jnp.issubdtype(img.dtype, jnp.integer)
    imf = img.astype(jnp.float32)
    # PIL resamples horizontally first and materializes a rounded uint8
    # intermediate, then resamples vertically — match that rounding order.
    tmp = jnp.einsum("pw,hwc->hpc", Ax, imf, preferred_element_type=jnp.float32)
    if is_int:
        tmp = jnp.clip(jnp.rint(tmp), 0, 255)
    out = jnp.einsum("oh,hpc->opc", Ay, tmp, preferred_element_type=jnp.float32)
    if is_int:
        out = jnp.clip(jnp.rint(out), 0, 255).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    return apply_mask(out, out_h, out_w)


# ---------------------------------------------------------------------------
# batched wrappers
# ---------------------------------------------------------------------------

flip_h_batch = jax.vmap(flip_h)
flip_v_batch = jax.vmap(flip_v)
flip_hv_batch = jax.vmap(flip_hv)
crop_batch = jax.vmap(crop)
fit_crop_batch = jax.vmap(fit_crop)
rotate_expand_batch = jax.vmap(
    functools.partial(rotate_expand, interpolation="nearest")
)
rotate_expand_bilinear_batch = jax.vmap(
    functools.partial(rotate_expand, interpolation="bilinear")
)
