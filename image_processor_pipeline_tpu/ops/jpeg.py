"""Device-side JPEG decode finish: dequant + exact islow IDCT + fancy
chroma upsample + fixed-point YCbCr→RGB, all integer XLA ops.

The hybrid decode path: the host does ONLY the entropy decode
(native/ipp_io.cpp:ipp_read_jpeg_coefs — jpeg_read_coefficients), which is
~40% of a full libjpeg decode; the device finishes in one jitted program
per bucket.  This attacks the end-to-end wall the round-1 soak identified
(the host cannot feed >25k img/s/chip from per-file JPEG decode; reference
decodes fully on host via cv2.imread, reference crop_square.py:34).

Every stage replicates libjpeg's integer math bit-for-bit, so the output
is byte-identical to the engine's full host decode (and to cv2.imdecode):

  - jpeg_idct_islow (jidctint.c): CONST_BITS=13/PASS1_BITS=2 fixed-point
    Loeffler-Ligtenberg-Moshovitz butterflies, DESCALE round-half-up
    shifts, and the exact post-IDCT range-limit table (the `& 1023`
    wraparound included);
  - h2v1/h2v2 fancy upsampling (jdsample.c): 3:1 triangular filter with
    the 8/7 (resp. 1/2) rounding pair; the clamp-at-edge tap formulation
    is exactly libjpeg's duplicated-context-row behavior;
  - ycc_rgb_convert (jdcolor.c): SCALEBITS=16 tables
    FIX(1.40200)=91881, FIX(1.77200)=116131, FIX(0.34414)=22554,
    FIX(0.71414)=46802, with ONE_HALF pre-added where libjpeg does.

Intermediate int32 wrap-around matches libjpeg's 32-bit INT32 arithmetic
by construction (jnp int32 ops are modular), so even overflow-crafted
streams decode identically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# jidctint.c fixed-point constants (CONST_BITS = 13)
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172

_CONST_BITS = 13
_PASS1_BITS = 2


def _descale(x, n: int):
    """libjpeg DESCALE: round-half-up arithmetic shift."""
    return (x + (1 << (n - 1))) >> n


def _idct_butterfly(s, descale_bits: int):
    """One 1-D islow pass over 8 stacked slices s[0..7] (jidctint.c).

    Returns the 8 output slices, each descaled by ``descale_bits``.
    """
    z2, z3 = s[2], s[6]
    z1 = (z2 + z3) * _F_0_541196100
    tmp2 = z1 - z3 * _F_1_847759065
    tmp3 = z1 + z2 * _F_0_765366865
    z2, z3 = s[0], s[4]
    tmp0 = (z2 + z3) << _CONST_BITS
    tmp1 = (z2 - z3) << _CONST_BITS
    tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
    tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2

    t0, t1, t2, t3 = s[7], s[5], s[3], s[1]
    z1, z2 = t0 + t3, t1 + t2
    z3, z4 = t0 + t2, t1 + t3
    z5 = (z3 + z4) * _F_1_175875602
    t0 = t0 * _F_0_298631336
    t1 = t1 * _F_2_053119869
    t2 = t2 * _F_3_072711026
    t3 = t3 * _F_1_501321110
    z1 = z1 * -_F_0_899976223
    z2 = z2 * -_F_2_562915447
    z3 = z3 * -_F_1_961570560 + z5
    z4 = z4 * -_F_0_390180644 + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4

    return [
        _descale(tmp10 + t3, descale_bits),
        _descale(tmp11 + t2, descale_bits),
        _descale(tmp12 + t1, descale_bits),
        _descale(tmp13 + t0, descale_bits),
        _descale(tmp13 - t0, descale_bits),
        _descale(tmp12 - t1, descale_bits),
        _descale(tmp11 - t2, descale_bits),
        _descale(tmp10 - t3, descale_bits),
    ]


def _range_limit(v):
    """libjpeg's post-IDCT sample range limit, exactly (jdmaster.c).

    out = (sample_range_limit + CENTERJSAMPLE)[v & 1023]:
    [0,127]→v+128, [128,511]→255, [512,895]→0, [896,1023]→v-896 —
    the &1023 wraparound included, so even coefficient-overflow streams
    match libjpeg byte-for-byte.
    """
    i = v & 1023
    return jnp.where(i < 128, i + 128,
                     jnp.where(i < 512, 255,
                               jnp.where(i < 896, 0, i - 896)))


def idct_islow_blocks(coefs, qtab):
    """Dequantize + exact jpeg_idct_islow over a block grid.

    coefs: [..., by, bx, 64] int (natural frequency order);
    qtab:  [..., 64] uint16 broadcastable over the grid.
    Returns samples [..., by*8, bx*8] int32 in [0, 255].
    """
    x = coefs.astype(jnp.int32) * qtab.astype(jnp.int32)[..., None, None, :]
    by, bx = x.shape[-3], x.shape[-2]
    x = x.reshape(*x.shape[:-1], 8, 8)          # [..., by, bx, u, v]

    # pass 1: columns (axis u), output scaled up by PASS1_BITS
    cols = [x[..., u, :] for u in range(8)]
    cols = _idct_butterfly(cols, _CONST_BITS - _PASS1_BITS)
    # pass 2: rows (axis v), final descale + range limit
    rows = [jnp.stack(cols, axis=-2)[..., :, v] for v in range(8)]
    rows = _idct_butterfly(rows, _CONST_BITS + _PASS1_BITS + 3)
    out = jnp.stack([_range_limit(r) for r in rows], axis=-1)

    # [..., by, bx, u, v] → [..., by*8, bx*8]
    out = jnp.moveaxis(out, -2, -3)              # [..., by, u, bx, v]
    return out.reshape(*out.shape[:-4], by * 8, bx * 8)


def _extend_valid(arr, axis: int, n):
    """Replicate line n-1 along ``axis`` into the padding (same trick as
    photometric.gaussian_blur): edge-clamped taps then see the TRUE edge."""
    idx = jnp.minimum(jnp.arange(arr.shape[axis]), n - 1)
    return jnp.take(arr, idx, axis=axis)


def _fancy_h2(arr):
    """libjpeg h2v1 fancy upsampling along the last axis (jdsample.c),
    exactly: out[2x] = (3 in[x] + in[x-1] + 1) >> 2, out[2x+1] = (3 in[x]
    + in[x+1] + 2) >> 2, taps clamped at the array edge (== libjpeg's
    special-cased first/last columns: (4a+1)>>2 = (4a+2)>>2 = a)."""
    L = arr.shape[-1]
    pos = jnp.arange(L)
    prev = jnp.take(arr, jnp.maximum(pos - 1, 0), axis=-1)
    nxt = jnp.take(arr, jnp.minimum(pos + 1, L - 1), axis=-1)
    even = (3 * arr + prev + 1) >> 2
    odd = (3 * arr + nxt + 2) >> 2
    return jnp.stack([even, odd], axis=-1).reshape(*arr.shape[:-1], 2 * L)


def _fancy_h2v2(plane, ch, cw):
    """libjpeg h2v2 fancy upsampling of a chroma plane (jdsample.c).

    plane: [..., CH, CW] int32 on a padded canvas whose valid region is
    [0:ch, 0:cw].  Vertical 3:1 triangular colsums (context rows clamped at
    the valid edge), then horizontal 3:1 with the 8/7 rounding pair.
    Returns [..., 2*CH, 2*CW] int32; valid region [0:2*ch, 0:2*cw].
    """
    p = _extend_valid(_extend_valid(plane, -1, cw), -2, ch)
    CH, CW = p.shape[-2], p.shape[-1]
    pos = jnp.arange(CH)
    above = jnp.take(p, jnp.maximum(pos - 1, 0), axis=-2)
    below = jnp.take(p, jnp.minimum(pos + 1, CH - 1), axis=-2)
    cs_up = 3 * p + above                       # colsum for even output rows
    cs_dn = 3 * p + below                       # colsum for odd output rows

    def haxis(cs):
        posw = jnp.arange(CW)
        prev = jnp.take(cs, jnp.maximum(posw - 1, 0), axis=-1)
        nxt = jnp.take(cs, jnp.minimum(posw + 1, CW - 1), axis=-1)
        even = (3 * cs + prev + 8) >> 4
        odd = (3 * cs + nxt + 7) >> 4
        return jnp.stack([even, odd], axis=-1).reshape(
            *cs.shape[:-1], 2 * CW)

    rows_even = haxis(cs_up)
    rows_odd = haxis(cs_dn)
    out = jnp.stack([rows_even, rows_odd], axis=-2)   # [..., CH, 2, 2CW]
    return out.reshape(*out.shape[:-3], 2 * CH, 2 * CW)


def _ycc_to_rgb(y, cb, cr):
    """jdcolor.c ycc_rgb_convert, exactly (SCALEBITS=16 fixed point).

    y/cb/cr int32 in [0,255].  libjpeg's final range_limit here only ever
    sees [-256, 511], where it equals a plain clamp.
    """
    cbd = cb - 128
    crd = cr - 128
    r = y + ((91881 * crd + 32768) >> 16)
    b = y + ((116131 * cbd + 32768) >> 16)
    g = y + ((-22554 * cbd - 46802 * crd + 32768) >> 16)
    return (jnp.clip(r, 0, 255), jnp.clip(g, 0, 255), jnp.clip(b, 0, 255))


@functools.partial(jax.jit, static_argnames=("samp", "cap_h", "cap_w",
                                             "grayscale", "channels"))
def decode_finish(coefs_y, coefs_c, qtabs, h, w, *, samp: tuple,
                  cap_h: int, cap_w: int, grayscale: bool = False,
                  channels: int = 3):
    """Finish a batch of JPEG decodes on device.

    coefs_y: [B, cap_by, cap_bx, 64] int16 luma block grids;
    coefs_c: [B, 2, cap_by_c, cap_bx_c, 64] int16 Cb/Cr grids (zero-padded,
    from ipp_read_jpeg_coefs_batch); qtabs: [B, 3, 64] uint16; h/w: [B]
    valid dims; samp: the static (h_samp, v_samp) of the luma component —
    (1, 1), (2, 1), (1, 2) and (2, 2) are supported (chroma 1x1, the
    universal layout).  cap_h/cap_w: output canvas (multiples of 8·samp).
    Returns [B, cap_h, cap_w, channels] uint8, zero outside the valid
    region — byte-identical to the full libjpeg host decode.

    NOTE: the (1, 2) upsample replicates libjpeg-TURBO's
    h1v2_fancy_upsample.  Vanilla libjpeg has no h1v2 fancy path (it uses
    int_upsample replication), so on a host whose cv2/native stack links
    non-turbo libjpeg the byte-parity claim for 4:4:0 streams would not
    hold; the engine-equivalence tests (test_jpeg_device) verify the
    actual linked decoder at test time.
    """
    hs, vs = samp
    lby, lbx = cap_h // 8, cap_w // 8
    cby, cbx = cap_h // (8 * vs), cap_w // (8 * hs)

    y_plane = idct_islow_blocks(coefs_y[:, :lby, :lbx], qtabs[:, 0])
    if grayscale:
        r = g = b = y_plane
    else:
        cb_plane = idct_islow_blocks(coefs_c[:, 0, :cby, :cbx], qtabs[:, 1])
        cr_plane = idct_islow_blocks(coefs_c[:, 1, :cby, :cbx], qtabs[:, 2])
        # chroma caps may be tighter than cap/(8·samp) (the batch reader
        # sizes them for 4:2:0); zero-pad up to the pre-upsample size —
        # the valid data always fits (the reader rejects overflow with -3)
        # and _extend_valid replicates the true edge over the padding
        need_h, need_w = cap_h // vs, cap_w // hs
        ph = need_h - cb_plane.shape[-2]
        pw = need_w - cb_plane.shape[-1]
        if ph or pw:
            pad = ((0, 0), (0, ph), (0, pw))
            cb_plane = jnp.pad(cb_plane, pad)
            cr_plane = jnp.pad(cr_plane, pad)
        # chroma valid dims: ceil(valid / samp) (jdinput.c downscaled size)
        ch = (h + vs - 1) // vs
        cw = (w + hs - 1) // hs
        if (hs, vs) == (2, 2):
            cb = jax.vmap(_fancy_h2v2)(cb_plane, ch, cw)
            cr = jax.vmap(_fancy_h2v2)(cr_plane, ch, cw)
        elif (hs, vs) == (2, 1):
            cb = jax.vmap(
                lambda p, n: _fancy_h2(_extend_valid(p, -1, n)))(cb_plane, cw)
            cr = jax.vmap(
                lambda p, n: _fancy_h2(_extend_valid(p, -1, n)))(cr_plane, cw)
        elif (hs, vs) == (1, 2):
            # libjpeg-turbo h1v2_fancy_upsample: the h2v1 triangular filter
            # rotated to the vertical axis (probed: rounding +1 even/+2 odd)

            def v2(p, n):
                return jnp.swapaxes(
                    _fancy_h2(jnp.swapaxes(_extend_valid(p, -2, n), -1, -2)),
                    -1, -2)

            cb = jax.vmap(v2)(cb_plane, ch)
            cr = jax.vmap(v2)(cr_plane, ch)
        elif (hs, vs) == (1, 1):
            cb, cr = cb_plane, cr_plane
        else:  # pragma: no cover - gated by the caller
            raise ValueError(f"unsupported sampling {samp}")
        r, g, b = _ycc_to_rgb(y_plane, cb, cr)

    rgb = jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)
    if channels == 4:
        alpha = jnp.full((*rgb.shape[:-1], 1), 255, jnp.uint8)
        rgb = jnp.concatenate([rgb, alpha], axis=-1)
    # padded-canvas invariant: zero outside the valid region
    iy = jnp.arange(cap_h)[None, :, None, None]
    ix = jnp.arange(cap_w)[None, None, :, None]
    valid = (iy < h[:, None, None, None]) & (ix < w[:, None, None, None])
    return jnp.where(valid, rgb, 0)


@functools.partial(jax.jit, static_argnames=(
    "samp", "cap_h", "cap_w", "cap_by_c", "cap_bx_c", "grayscale",
    "channels"))
def decode_finish_sparse(idx, val, qtabs, h, w, *, samp: tuple,
                         cap_h: int, cap_w: int, cap_by_c: int,
                         cap_bx_c: int, grayscale: bool = False,
                         channels: int = 3):
    """decode_finish fed by sparse (COO) coefficient transport.

    idx/val: [B, cap_nnz] int32/int16 nonzero-coefficient pairs from
    ipp_read_jpeg_coefs_sparse_batch — idx is the linear position in the
    dense per-image layout (Y [cap_by, cap_bx, 64], then Cb and Cr
    [cap_by_c, cap_bx_c, 64] each).  A scatter-add reconstructs the dense
    grids ON DEVICE, so the host ships ~3x fewer bytes at q ≤ 92 (padding
    pairs are (0, 0): they add 0 to slot 0, a no-op).  Output is identical
    to decode_finish on the dense arrays.
    """
    B = idx.shape[0]
    cap_by, cap_bx = cap_h // 8, cap_w // 8
    ny = cap_by * cap_bx * 64
    nc = cap_by_c * cap_bx_c * 64
    flat = jnp.zeros((B, ny + 2 * nc), jnp.int16)
    flat = flat.at[jnp.arange(B)[:, None], idx].add(val)
    coefs_y = flat[:, :ny].reshape(B, cap_by, cap_bx, 64)
    coefs_c = flat[:, ny:].reshape(B, 2, cap_by_c, cap_bx_c, 64)
    return decode_finish(coefs_y, coefs_c, qtabs, h, w, samp=samp,
                         cap_h=cap_h, cap_w=cap_w, grayscale=grayscale,
                         channels=channels)
