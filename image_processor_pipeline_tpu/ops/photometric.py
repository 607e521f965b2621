"""Photometric enhancement ops (PIL ImageEnhance / ImageFilter semantics).

Parity targets: reference tranfo.py:9-55 — Brightness, Contrast, Color each
scaled by a random factor, optional GaussianBlur, optional per-channel RGB
gain.  The reference's per-intensity gain redraw (tranfo.py:48-50) is a
defect (SURVEY.md §2.7 #12); the intent — one gain per channel — is
implemented here.

All elementwise / small-conv math in float32, fused by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _luminance(rgb_f):
    """ITU-R 601-2 luma as used by PIL convert('L')."""
    return (rgb_f[..., 0] * 299.0 + rgb_f[..., 1] * 587.0
            + rgb_f[..., 2] * 114.0) / 1000.0


def brightness(img, factor):
    """PIL ImageEnhance.Brightness: blend(black, img, factor)."""
    f = img.astype(jnp.float32) * factor
    return jnp.clip(jnp.rint(f), 0, 255).astype(img.dtype)


def contrast(img, factor, h=None, w=None):
    """PIL ImageEnhance.Contrast: blend(gray(mean_L), img, factor).

    mean_L is the rounded mean of the L-channel over the valid region.
    """
    f = img.astype(jnp.float32)
    lum = jnp.rint(_luminance(f))
    # Sum the (integral) luma in integers: exact and ORDER-INDEPENDENT, so
    # the mean is identical no matter how the image is laid out (pre/post
    # flip, sharded, kernel-tiled).  PIL's ImageStat mean is an exact
    # integer sum too.  uint32 holds the sum only while H*W*255 < 2^32
    # (canvases beyond ~4096² exist — bucket_dim is unbounded), so large
    # canvases split the exact per-row sums into hi/lo uint32 accumulators
    # and combine the two exact scalars deterministically.
    H, W = img.shape[-3], img.shape[-2]
    lum_i = lum.astype(jnp.uint32)
    if h is not None:
        from image_processor_pipeline_tpu.ops.geometry import valid_mask
        m = valid_mask(h, w, H, W)
        n = jnp.maximum(jnp.sum(m), 1)
        lum_i = jnp.where(m, lum_i, 0)
    else:
        n = H * W
    if H * W * 255 < 2 ** 32:
        total = jnp.sum(lum_i).astype(jnp.float32)
    else:
        # per-row sums are exact (<= 255*W); split them so both partial
        # sums stay exact in uint32 regardless of image size
        rows = jnp.sum(lum_i, axis=-1)
        hi = jnp.sum(rows >> 16).astype(jnp.float32)
        lo = jnp.sum(rows & 0xFFFF).astype(jnp.float32)
        total = hi * 65536.0 + lo
    mean = jnp.floor(total / n + 0.5)  # PIL: int(mean + 0.5)
    out = mean + factor * (f - mean)
    return jnp.clip(jnp.rint(out), 0, 255).astype(img.dtype)


def color_balance(img, factor):
    """PIL ImageEnhance.Color: blend(grayscale, img, factor)."""
    f = img.astype(jnp.float32)
    lum = jnp.rint(_luminance(f))[..., None]
    out = lum + factor * (f - lum)
    return jnp.clip(jnp.rint(out), 0, 255).astype(img.dtype)


def _box_kernel(radius_f, max_radius: int):
    """Fractional-radius box kernel (Pillow BoxBlur semantics).

    Taps with |d| <= l get weight 1/(2r+1); taps at |d| == l+1 get the
    fractional weight a/(2r+1), where r = l + a is the fractional radius.
    Static length 2*max_radius+1; taps beyond are zero.
    """
    r = jnp.asarray(radius_f, jnp.float32)
    l = jnp.floor(r)
    a = r - l
    d = jnp.abs(jnp.arange(-max_radius, max_radius + 1, dtype=jnp.float32))
    w0 = 1.0 / (2.0 * r + 1.0)
    k = jnp.where(d <= l, w0, jnp.where(d <= l + 1, a * w0, 0.0))
    return k


def gaussian_blur(img, sigma, passes: int = 3, max_radius: int = 12,
                  h=None, w=None):
    """Gaussian blur with exact PIL ImageFilter.GaussianBlur semantics.

    Pillow implements GaussianBlur(radius=sigma) as ``passes`` (3) successive
    fractional-radius box blurs per axis (Gwosdek et al. extended box
    filter): per-pass box radius = l + a with
      L = sqrt(12 sigma^2/passes + 1),  l = floor((L-1)/2),
      a = (2l+1)(l(l+1) - 3 sigma^2/n) / (6(sigma^2/n - (l+1)^2)),
    horizontal passes first then vertical, each pass materializing a rounded
    uint8 line (we round per pass to match).  Edges are clamp-extended.

    ``h``/``w`` give the valid-region extent on a padded canvas (padded-canvas
    invariant: content lives in [0:h, 0:w]).  Clamp-extension then happens at
    the VALID boundary — the last valid row/column is replicated into the
    padding before each 1-D pass — so padding pixels never bleed into the
    blurred valid region (they are what PIL would read past the edge).
    Without h/w the canvas edge is the clamp boundary (exact-size images).
    """
    sig = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-6)
    sigma2 = sig * sig / passes
    L = jnp.sqrt(12.0 * sigma2 + 1.0)
    l = jnp.floor((L - 1.0) / 2.0)
    a = (2 * l + 1) * (l * (l + 1) - 3 * sigma2)
    a = a / (6 * (sigma2 - (l + 1) * (l + 1)))
    radius = l + a
    k = _box_kernel(radius, max_radius)

    is_int = jnp.issubdtype(img.dtype, jnp.integer)

    def extend(arr, axis, n):
        """Replicate the last valid line (index n-1 along axis) into the
        padding, so canvas-edge clamping equals valid-edge clamping."""
        if n is None:
            return arr
        idx = jnp.minimum(jnp.arange(arr.shape[axis]), n - 1)
        return jnp.take(arr, idx, axis=axis)

    def conv1d(arr, axis):
        pad = [(0, 0)] * arr.ndim
        pad[axis] = (max_radius, max_radius)
        ap = jnp.pad(arr, pad, mode="edge")
        out = jnp.zeros_like(arr)
        for t in range(2 * max_radius + 1):
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(t, t + arr.shape[axis])
            out = out + k[t] * ap[tuple(sl)]
        return out

    out = img.astype(jnp.float32)
    # Pillow: horizontal passes, then vertical.  Re-extend before every pass:
    # after a pass the padding holds a blur of (edge ∪ constant), not the
    # clamped value PIL would read, so a single up-front extension is wrong.
    for axis, n in ((-2, w), (-3, h)):
        for _ in range(passes):
            out = extend(out, axis, n)
            out = conv1d(out, axis)
            if is_int:
                out = jnp.clip(jnp.rint(out), 0, 255)
    return out.astype(img.dtype)


def channel_gains(img, gains):
    """Per-channel multiplicative gain, clamped to [0, 255].

    Intent of reference tranfo.py:46-51 (one gain per RGB channel).
    """
    f = img.astype(jnp.float32) * jnp.asarray(gains, jnp.float32)
    return jnp.clip(jnp.rint(f), 0, 255).astype(img.dtype)


def enhance(img, h, w, b_factor, c_factor, col_factor,
            blur_sigma, apply_blur, rgb_gains, apply_rgb):
    """Full enhance chain of reference tranfo.py:9-55 on one image.

    ``apply_blur`` / ``apply_rgb`` are traced booleans (the 30% Bernoulli
    draws of the 'sample' pairing mode, reference pipeline.py:209-225).
    """
    out = brightness(img, b_factor)
    out = contrast(out, c_factor, h, w)
    out = color_balance(out, col_factor)
    blurred = gaussian_blur(out, blur_sigma, h=h, w=w)
    out = jnp.where(apply_blur, blurred, out)
    gained = channel_gains(out, rgb_gains)
    out = jnp.where(apply_rgb, gained, out)
    from image_processor_pipeline_tpu.ops.geometry import apply_mask
    return apply_mask(out, h, w)


enhance_batch = jax.vmap(enhance)
