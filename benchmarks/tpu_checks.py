"""On-device validation + perf suite (run on real TPU hardware).

Consolidates the checks used during development so any round can re-verify
with one command:

    python benchmarks/tpu_checks.py            # correctness + perf
    python benchmarks/tpu_checks.py --fast     # correctness only

Checks:
  1. packed shear-rotation kernel == XLA bit-shear formulation (bit-exact)
  2. fused mega-kernel == pure-JAX reference (bit-exact, incl. dihedral)
  3. chain TPU output == chain CPU-backend output (same seeds)
  4. per-mode chain throughput ladder (fori-loop protocol, tunnel-proof)
"""

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="skip perf ladder")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_processor_pipeline_tpu.models.chains import augment_chain
    from image_processor_pipeline_tpu.ops import geometry
    from image_processor_pipeline_tpu.ops.pallas.rotate import (
        rotate_square_shear_batch,
    )

    B = args.batch
    rng = np.random.default_rng(0)
    ok = True

    # --- 1. rotation kernel vs XLA formulation --------------------------
    imgs = jax.device_put(rng.integers(0, 256, (B, 512, 512, 3), np.uint8))
    angles = jax.device_put(np.linspace(3, 357, B).astype(np.float32))
    a = np.asarray(jax.jit(rotate_square_shear_batch)(imgs, angles))
    b = np.asarray(jax.jit(jax.vmap(geometry.rotate_square_shear))(imgs, angles))
    exact = (a == b).all()
    print(f"[1] pallas rotation vs XLA shear: {'BIT-EXACT' if exact else 'MISMATCH'}")
    ok &= bool(exact)

    # --- 2+3. full chain: pallas_fused vs reference vs CPU --------------
    big = jax.device_put(rng.integers(0, 256, (B, 640, 640, 3), np.uint8))
    xy = jax.device_put(
        np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (B, 1)))
    seeds = jax.device_put(np.arange(B, dtype=np.uint32))
    fn = jax.jit(augment_chain, static_argnums=(3, 4))
    pf = np.asarray(fn(big, xy, seeds, 512, "pallas_fused"))
    fr = np.asarray(fn(big, xy, seeds, 512, "fused_reference"))
    exact2 = (pf == fr).all()
    print(f"[2] mega-kernel vs pure-JAX reference: "
          f"{'BIT-EXACT' if exact2 else 'MISMATCH'}")
    ok &= bool(exact2)

    # --- 2b. round-2 full kernel (in-kernel crop+transpose) --------------
    pff = np.asarray(fn(big, xy, seeds, 512, "pallas_full"))
    ffr = np.asarray(fn(big, xy, seeds, 512, "full_reference"))
    nbad = int((pff != ffr).sum())
    maxd = int(np.abs(pff.astype(int) - ffr.astype(int)).max())
    exact2b = nbad == 0
    print(f"[2b] full mega-kernel vs pure-JAX reference: "
          f"{'BIT-EXACT' if exact2b else f'MISMATCH n={nbad} max={maxd}'}")
    ok &= bool(exact2b)
    # the two pure-JAX paths must also agree (crop+flip algebra)
    exact2c = (np.asarray(fn(big, xy, seeds, 512, "fused_reference"))
               == ffr).all()
    print(f"[2c] full_reference vs fused_reference: "
          f"{'BIT-EXACT' if exact2c else 'MISMATCH'}")
    ok &= bool(exact2c)

    # --- 2d. the SHIPPED bench config: B=16, 2 images/grid-step ----------
    fn_g = jax.jit(functools.partial(augment_chain, images_per_step=2),
                   static_argnums=(3, 4))
    b16 = big[:16]
    pg = np.asarray(fn_g(b16, xy[:16], seeds[:16], 512, "pallas_full"))
    rg = np.asarray(fn(b16, xy[:16], seeds[:16], 512, "full_reference"))
    exact2d = (pg == rg).all()
    print(f"[2d] pallas_full at G=2/B=16 (bench config) vs reference: "
          f"{'BIT-EXACT' if exact2d else 'MISMATCH'}")
    ok &= bool(exact2d)

    # --- 2e. hybrid JPEG decode finish on the chip ------------------------
    try:
        import cv2

        from image_processor_pipeline_tpu.io import native as _native
        from image_processor_pipeline_tpu.ops import jpeg as _djpeg

        img = rng.integers(0, 256, (45, 61, 3), np.uint8)
        cv2.imwrite("/tmp/tpu_checks_jpeg.jpg", img[..., ::-1],
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
        r = _native.read_jpeg_coefs("/tmp/tpu_checks_jpeg.jpg", (8, 8),
                                    (8, 8))
        if r is None:
            print("[2e] hybrid decode: SKIPPED (native engine unavailable)")
        else:
            cy, cc, qt, info = r
            out = _djpeg.decode_finish(
                jax.device_put(jnp.asarray(cy[None])),
                jax.device_put(jnp.asarray(cc[None])),
                jax.device_put(jnp.asarray(qt[None])),
                jnp.asarray([45]), jnp.asarray([61]),
                samp=(int(info[3]), int(info[4])), cap_h=64, cap_w=64)
            ref = cv2.imread("/tmp/tpu_checks_jpeg.jpg")[..., ::-1]
            exact2e = (np.asarray(out)[0, :45, :61] == ref).all()
            print(f"[2e] hybrid JPEG decode finish on device vs cv2: "
                  f"{'BYTE-EXACT' if exact2e else 'MISMATCH'}")
            ok &= bool(exact2e)

        # --- 2f. sparse (COO) coefficient transport on the chip ----------
        # explicit full-size capacity: this probe image is NOISE (~50%
        # DCT density), which overflows the default dense/4 cap by design
        rs = _native.read_jpeg_coefs_sparse_batch(
            [Path("/tmp/tpu_checks_jpeg.jpg")], (8, 8), cap_blocks_c=(8, 8),
            cap_nnz=3 * 8 * 8 * 64)
        if rs is None or r is None:
            print("[2f] sparse transport: SKIPPED (native engine "
                  "unavailable)")
        else:
            sidx, sval, snnz, sqt, sinf = rs
            out_s = _djpeg.decode_finish_sparse(
                jax.device_put(jnp.asarray(sidx)),
                jax.device_put(jnp.asarray(sval)),
                jax.device_put(jnp.asarray(sqt)),
                jnp.asarray([45]), jnp.asarray([61]),
                samp=(int(sinf[0][3]), int(sinf[0][4])), cap_h=64,
                cap_w=64, cap_by_c=8, cap_bx_c=8)
            exact2f = (np.asarray(out_s)[0, :45, :61] == ref).all()
            print(f"[2f] sparse coefficient transport on device vs cv2: "
                  f"{'BYTE-EXACT' if exact2f else 'MISMATCH'} "
                  f"(nnz {int(snnz[0])}/{8 * 8 * 64 * 3})")
            ok &= bool(exact2f)
        # --- 2g. hybrid JPEG ENCODE on the chip ---------------------------
        # device FDCT+quant (sparse transport) + host entropy write must be
        # byte-identical to the native pixel encoder at the same quality
        if _native.available():
            eimg = rng.integers(0, 256, (45, 61, 3), np.uint8)
            canvas = np.zeros((64, 64, 3), np.uint8)
            canvas[:45, :61] = eimg
            qt = _djpeg.quality_qtabs(95)
            eidx, eval_, ennz = _djpeg.encode_start_sparse(
                jax.device_put(jnp.asarray(canvas[None])),
                jnp.asarray([45]), jnp.asarray([61]), jnp.asarray(qt),
                cap_h=64, cap_w=64, cap_nnz=3 * 64 * 64 // 2)
            rc = _native.write_jpeg_coefs_sparse(
                Path("/tmp/tpu_checks_enc.jpg"), np.asarray(eidx[0]),
                np.asarray(eval_[0]), int(ennz[0]), (8, 8), (4, 4),
                45, 61, 95)
            _native.encode_jpeg(Path("/tmp/tpu_checks_enc_ref.jpg"),
                                eimg, 95)
            exact2g = (rc == 0
                       and Path("/tmp/tpu_checks_enc.jpg").read_bytes()
                       == Path("/tmp/tpu_checks_enc_ref.jpg").read_bytes())
            print(f"[2g] hybrid JPEG encode on device vs pixel encoder: "
                  f"{'BYTE-EXACT' if exact2g else f'MISMATCH rc={rc}'} "
                  f"(nnz {int(ennz[0])}/{3 * 64 * 64 // 2})")
            ok &= bool(exact2g)
        else:
            print("[2g] hybrid encode: SKIPPED (native engine unavailable)")
    except ImportError:
        print("[2e] hybrid decode: SKIPPED (cv2 unavailable)")

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        cr = np.asarray(jax.jit(augment_chain, static_argnums=(3, 4))(
            np.asarray(big), np.asarray(xy), np.asarray(seeds),
            512, "fused_reference"))
    frac = (fr == cr).mean()
    print(f"[3] TPU vs CPU backend (same seeds): {frac:.6f} exact "
          f"({'OK' if frac > 0.9999 else 'SUSPECT'})")
    ok &= frac > 0.9999

    # --- 4. perf ladder ---------------------------------------------------
    if not args.fast:
        @functools.partial(jax.jit, static_argnums=(4,))
        def loop(images, xywhn, seeds, n, rotation):
            def body(i, carry):
                dep, _ = carry
                out = augment_chain(images, xywhn, seeds + i * B + dep,
                                    512, rotation)
                return out[0, 0, 0, 0].astype(jnp.uint32), out
            dep, out = jax.lax.fori_loop(
                0, n, body,
                (jnp.uint32(0), jnp.zeros((B, 512, 512, 4), jnp.uint8)))
            return jnp.sum(out.astype(jnp.uint32)) + dep

        for mode in ("pallas_full", "pallas_full_ikc", "pallas_fused",
                     "pallas", "shear"):
            try:
                for n in (2, 42):
                    int(loop(big, xy, seeds, n, mode))
                best = 0.0
                for _ in range(3):
                    t0 = time.perf_counter()
                    int(loop(big, xy, seeds, 42, mode))
                    t1 = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    int(loop(big, xy, seeds, 2, mode))
                    t0d = time.perf_counter() - t0
                    best = max(best, B * 40 / (t1 - t0d))
                print(f"[4] chain[{mode}]: {best:.0f} img/s")
            except Exception as e:  # noqa: BLE001
                print(f"[4] chain[{mode}] failed: {type(e).__name__}")

    print("ALL CHECKS PASSED" if ok else "CHECKS FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
