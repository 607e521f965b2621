"""Host-side image decode/encode and directory inventory.

The framework is RGB(A)-native end to end; decode converts whatever the
codec yields to RGB or RGBA uint8 HWC numpy arrays, and encode writes from
the same.  (The reference mixes cv2-BGR and PIL-RGB per transform; the
pixel bytes on disk are what must match, not the in-memory channel order.)

Directory inventory parity: reference pipeline.py:122-146
(_get_files_from_inputs) lists and **sorts** files, erroring on missing or
empty directories.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def decode_image(path: Path, mode: Optional[str] = None) -> np.ndarray:
    """Decode an image file to uint8 HWC numpy (RGB, RGBA, or as requested).

    ``mode``: None keeps native bands (L/RGB/RGBA → 1/3/4 channels);
    'RGB'/'RGBA' forces a conversion (PIL convert semantics, matching the
    reference's .convert('RGBA') at rotations.py:55 / overlays.py:83-88).

    JPEG/PNG with an explicit mode go through the native C++ engine
    (native/ipp_io.cpp) when built; everything else through PIL.
    """
    if mode in ("RGB", "RGBA") and Path(path).suffix.lower() in (
        ".jpg", ".jpeg", ".png",
    ):
        from image_processor_pipeline_tpu.io import native

        ch = 3 if mode == "RGB" else 4
        # decode at the exact size by probing the header via a first attempt
        res = _native_decode_exact(path, ch)
        if res is not None:
            return res
    with Image.open(path) as im:
        if mode is not None and im.mode != mode:
            im = im.convert(mode)
        elif mode is None and im.mode not in ("L", "RGB", "RGBA"):
            im = im.convert("RGBA" if "A" in im.mode or "P" == im.mode else "RGB")
        arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def _native_decode_exact(path: Path, channels: int) -> Optional[np.ndarray]:
    """Native decode at exact image size (native header probe, no PIL)."""
    from image_processor_pipeline_tpu.io import native

    meta = native.probe(Path(path))
    if meta is None:
        return None
    h, w, _ = meta
    res = native.decode_to_canvas(Path(path), (h, w), channels)
    if res is None:
        return None
    buf, hh, ww, _ = res
    if (hh, ww) != (h, w):
        return None
    return buf


def decode_padded(path: Path, mode: Optional[str] = None,
                  diag: bool = False):
    """Decode straight into a zero-padded bucket canvas.

    Returns (buf [H, W, C] uint8, h, w, canvas) with the framework's
    padded-canvas invariant already satisfied.  The native engine writes
    into the canvas in place (no intermediate exact-size array + pad copy);
    PIL fallback decodes then pads.

    ``diag=True`` yields a square canvas bucketed to the image diagonal
    (room for expanded rotations).
    """
    import math

    from image_processor_pipeline_tpu.io.batching import (
        bucket_dim,
        canvas_for,
        pad_to_canvas,
    )
    from image_processor_pipeline_tpu.io import native

    def pick_canvas(h, w):
        if diag:
            d = bucket_dim(int(math.ceil(math.hypot(h, w))))
            return (d, d)
        return canvas_for(h, w)

    path = Path(path)
    channels = {"RGB": 3, "RGBA": 4}.get(mode)
    if channels is not None and path.suffix.lower() in (
        ".jpg", ".jpeg", ".png",
    ):
        meta = native.probe(path)  # header only, native (no PIL open)
        if meta is not None:
            h, w, _ = meta
            canvas = pick_canvas(h, w)
            res = native.decode_to_canvas(path, canvas, channels)
            if res is not None and (res[1], res[2]) == (h, w):
                return res[0], h, w, canvas
    arr = decode_image(path, mode=mode)
    h, w = arr.shape[:2]
    canvas = pick_canvas(h, w)
    ch = channels or arr.shape[2]
    return pad_to_canvas(arr, canvas, channels=ch), h, w, canvas


def probe_padded(path: Path, mode: str, diag: bool = False):
    """Metadata-only twin of decode_padded: (h, w, canvas) with NO pixel
    decode (native header probe).  Returns None when the native engine
    can't handle the file — callers fall back to decode_padded.
    """
    import math

    from image_processor_pipeline_tpu.io.batching import bucket_dim, canvas_for
    from image_processor_pipeline_tpu.io import native

    path = Path(path)
    if mode not in ("RGB", "RGBA") or path.suffix.lower() not in (
        ".jpg", ".jpeg", ".png",
    ):
        return None
    meta = native.probe(path)
    if meta is None:
        return None
    h, w, _ = meta
    if diag:
        d = bucket_dim(int(math.ceil(math.hypot(h, w))))
        canvas = (d, d)
    else:
        canvas = canvas_for(h, w)
    return h, w, canvas


_reader_crash_warned = False


def _warn_reader_crash(exc: Exception) -> None:
    """Log (once per process) that a coefficient reader crashed: outputs
    stay correct via the host decode fallback, but a persistent crash
    means device_decode is silently dead — make that observable."""
    global _reader_crash_warned
    if not _reader_crash_warned:
        _reader_crash_warned = True
        print(f"[device_decode] coefficient reader crashed "
              f"({type(exc).__name__}: {exc}); falling back to host decode "
              f"(warned once)")


def _decode_group_device(items, canvas, mode, n_threads: int = 0,
                         stats=None):
    """Hybrid JPEG decode of one homogeneous bucket: host entropy decode
    (ONE native batch call) + device dequant/IDCT/upsample/color
    (ops/jpeg.py, byte-identical to the host decoder).

    Returns the stacked [n, H, W, C] batch as a DEVICE array (the engine
    ships coefficients, not pixels, across PCIe and the host never touches
    a pixel), or None to fall back to the host decode path.  Items that
    the device path can't handle (non-YCbCr colorspace, exotic sampling,
    probe/decode dim mismatch) are decoded host-side and patched in.
    """
    import jax
    import jax.numpy as jnp

    from image_processor_pipeline_tpu.io import native
    from image_processor_pipeline_tpu.ops import jpeg as djpeg

    cap_h, cap_w = canvas
    if cap_h % 16 or cap_w % 16:
        return None
    paths = [Path(it["_decode"][0]) for it in items]
    if any(p.suffix.lower() not in (".jpg", ".jpeg") for p in paths):
        return None
    cap_b = (cap_h // 8, cap_w // 8)
    cap_c_half = ((cap_b[0] + 1) // 2, (cap_b[1] + 1) // 2)
    n = len(items)
    channels = {"RGB": 3, "RGBA": 4}[mode]

    # Sparse-first transport (TODO r2 #27): ship (idx, val) nonzero pairs
    # and scatter-add into the dense layout ON DEVICE — ~3x fewer bytes at
    # q <= 92.  Failure ladder per item:
    #   -3 (chroma grid exceeds the 4:2:0-sized default cap: 4:4:4/h2v1/
    #       h1v2 streams) → sparse retry with full-size chroma caps
    #       (ADVICE r2: those device legs must stay live);
    #   -6 (nonzero count exceeds the sparse capacity) → dense reader;
    #   anything else → host decode fallback below.
    try:
        res = native.read_jpeg_coefs_sparse_batch(
            paths, cap_b, n_threads=n_threads)
    except Exception as e:  # noqa: BLE001 — a reader crash must not kill
        _warn_reader_crash(e)  # the step; host decode handles the bucket
        res = None
    if res is None:
        return None
    idx0, val0, nnz0, qt0, infos = res
    # pools[tag] = transport arrays; rows[i] = (tag, row index in pool)
    pools = {"sp": (idx0, val0, nnz0, qt0, cap_c_half)}
    rows = {}
    for i in range(n):
        if int(infos[i][0]) >= 0:
            rows[i] = ("sp", i)
    r3 = [i for i in range(n) if int(infos[i][0]) == -3]
    if r3:
        try:
            res3 = native.read_jpeg_coefs_sparse_batch(
                [paths[i] for i in r3], cap_b, cap_blocks_c=cap_b,
                n_threads=n_threads)
        except Exception as e:  # noqa: BLE001 — per-item fallback below
            _warn_reader_crash(e)
            res3 = None
        if res3 is not None:
            idx3, val3, nnz3, qt3, inf3 = res3
            pools["spf"] = (idx3, val3, nnz3, qt3, cap_b)
            for j, i in enumerate(r3):
                infos[i] = inf3[j]
                if int(inf3[j][0]) >= 0:
                    rows[i] = ("spf", j)
    r6 = [i for i in range(n)
          if i not in rows and int(infos[i][0]) == -6]
    if stats is not None:
        # dense-content telemetry for the engine's auto-gate hysteresis
        # (ops/jpeg.py:note_decode_dense): items whose nonzero count
        # overflowed the sparse transport and paid a dense re-read
        stats["n"] = stats.get("n", 0) + n
        stats["dense"] = stats.get("dense", 0) + len(r6)
    if r6:
        try:
            resd = native.read_jpeg_coefs_batch(
                [paths[i] for i in r6], cap_b, cap_blocks_c=cap_b,
                n_threads=n_threads)
        except Exception as e:  # noqa: BLE001 — per-item fallback below
            _warn_reader_crash(e)
            resd = None
        if resd is not None:
            cyd, ccd, qtd, infd = resd
            pools["dn"] = (cyd, ccd, qtd)
            for j, i in enumerate(r6):
                infos[i] = infd[j]
                if int(infd[j][0]) >= 0:
                    rows[i] = ("dn", j)

    groups = {}
    failed = []
    for i, it in enumerate(items):
        h, w = (int(x) for x in it["size"])
        info = infos[i]
        ncomp = int(info[2])
        samp = (int(info[3]), int(info[4]))
        ok = (
            i in rows
            and int(info[0]) == h and int(info[1]) == w
            and ncomp in (1, 3)
            # JCS_GRAYSCALE = 1, JCS_YCbCr = 3 (jpeglib.h J_COLOR_SPACE)
            and int(info[15]) in (1, 3)
            and (ncomp == 1 or (
                samp in ((1, 1), (2, 1), (1, 2), (2, 2))
                and (int(info[7]), int(info[8])) == (1, 1)
                and (int(info[11]), int(info[12])) == (1, 1)))
        )
        if ok:
            # items from different transport pools carry differently-shaped
            # arrays, so they group separately even at equal sampling
            key = (((1, 1), True) if ncomp == 1 else (samp, False)) \
                + (rows[i][0],)
            groups.setdefault(key, []).append(i)
        else:
            failed.append(i)

    def finish(idx, samp, grayscale, tag):
        sel = np.asarray([rows[i][1] for i in idx])
        hw = np.asarray([[int(x) for x in items[i]["size"]] for i in idx],
                        np.int32)
        hj = jnp.asarray(hw[:, 0])
        wj = jnp.asarray(hw[:, 1])
        if tag == "dn":
            cyd, ccd, qtd = pools["dn"]
            return djpeg.decode_finish(
                jnp.asarray(cyd[sel]), jnp.asarray(ccd[sel]),
                jnp.asarray(qtd[sel]), hj, wj,
                samp=samp, cap_h=cap_h, cap_w=cap_w,
                grayscale=grayscale, channels=channels)
        spi, spv, spn, spq, capc = pools[tag]
        # truncate the padded capacity to the group's max nonzero count,
        # rounded up a power-of-2 ladder so recompiles stay bounded
        m = max(1, int(spn[sel].max()))
        capm = 1024
        while capm < m:
            capm *= 2
        capm = min(capm, spi.shape[1])
        return djpeg.decode_finish_sparse(
            jnp.asarray(spi[sel, :capm]), jnp.asarray(spv[sel, :capm]),
            jnp.asarray(spq[sel]), hj, wj,
            samp=samp, cap_h=cap_h, cap_w=cap_w,
            cap_by_c=capc[0], cap_bx_c=capc[1],
            grayscale=grayscale, channels=channels)

    if len(groups) == 1 and not failed:
        ((samp, gray, tag), idx), = groups.items()
        # bucket order is already the batch order
        return finish(list(range(n)), samp, gray, tag)

    batch = jnp.zeros((n, cap_h, cap_w, channels), jnp.uint8)
    for (samp, gray, tag), idx in groups.items():
        batch = batch.at[jnp.asarray(idx)].set(
            finish(idx, samp, gray, tag))
    for i in failed:
        it = items[i]
        h, w = (int(x) for x in it["size"])
        try:
            buf, hh, ww, cv = decode_padded(
                Path(it["_decode"][0]), mode=mode, diag=it["_decode"][2])
            if (hh, ww) != (h, w) or tuple(cv) != canvas:
                raise ValueError(
                    f"decode dims changed between probe and decode: "
                    f"probed ({h}, {w}) canvas {canvas}, "
                    f"decoded ({hh}, {ww}) canvas {tuple(cv)}")
            batch = batch.at[i].set(jnp.asarray(buf))
        except Exception as e:  # noqa: BLE001 — engine logs per item
            it["_load_error"] = f"{type(e).__name__}: {e}"
    return batch


def _fallback_decode(it, field, path, mode, diag, canvas, h, w, channels):
    """Per-item decode_padded fallback shared by the single- and multi-
    field batch-decode paths: verifies probe-vs-decode dims, records
    ``_load_error`` + a zero canvas on failure (batch stacking must stay
    shape-consistent).  Returns the decoded buffer or None on failure."""
    try:
        buf, hh, ww, cv = decode_padded(Path(path), mode=mode, diag=diag)
        if (hh, ww) != (h, w) or tuple(cv) != tuple(canvas):
            raise ValueError(
                f"decode dims changed between probe and decode: "
                f"probed ({h}, {w}) canvas {tuple(canvas)}, "
                f"decoded ({hh}, {ww}) canvas {tuple(cv)}"
            )
        it[field] = buf
        return buf
    except Exception as e:  # noqa: BLE001 — engine logs per item
        it["_load_error"] = f"{type(e).__name__}: {e}"
        it[field] = np.zeros((canvas[0], canvas[1], channels), np.uint8)
        return None


def _fill_pending_multi(chunk, n_threads: int = 0) -> None:

    """Decode multi-image probed items (``_pending``) with one native batch
    call per (canvas, mode) group.

    Items carry ``_pending = {field: (path, mode, diag, canvas, h, w)}``
    and none of the named pixel fields (see BatchTransform.probe_item);
    e.g. the overlay transform pends ``overlay`` (RGBA, overlay canvas) and
    ``background`` (RGB, background canvas) — a bucket of n items then
    decodes with exactly two native calls instead of 2n Python-thread
    decodes.  Failure semantics match the single-image path: native miss →
    per-item decode_padded fallback → ``_load_error`` + zero canvas.
    """
    from collections import defaultdict

    from image_processor_pipeline_tpu.io import native

    seen = {}
    for it in chunk:  # padded chunks repeat the last dict; dedup by identity
        if "_pending" in it and id(it) not in seen:
            seen[id(it)] = it
    if not seen:
        return
    groups = defaultdict(list)
    for it in seen.values():
        for field, (path, mode, diag, canvas, h, w) in it["_pending"].items():
            if field in it:
                continue
            groups[(tuple(canvas), mode)].append(
                (it, field, Path(path), diag, int(h), int(w))
            )
    for (canvas, mode), entries in groups.items():
        channels = {"RGB": 3, "RGBA": 4}[mode]
        paths = [e[2] for e in entries]
        res = native.decode_batch(paths, canvas, channels, n_threads)
        batch, dims = res if res is not None else (None, None)
        for i, (it, field, path, diag, h, w) in enumerate(entries):
            if dims is not None and dims[i, 0] == h and dims[i, 1] == w:
                it[field] = batch[i]
                continue
            # per-item fallback (native failure or dims mismatch)
            _fallback_decode(it, field, path, mode, diag, canvas, h, w,
                             channels)


def fill_pending_images(chunk, n_threads: int = 0,
                        device_decode: bool = False, stats=None) -> None:
    """Decode every probed-but-not-yet-decoded item of a batch chunk with ONE
    native threaded batch-decode call per (canvas, mode) group.

    Probed items carry ``_decode = (path, mode, diag)`` and no ``image``
    field (see BatchTransform.probe_item); multi-image items carry
    ``_pending`` instead (see _fill_pending_multi).  On native failure the
    item falls back to the per-item decode_padded path; if that fails too
    the item gets ``_load_error`` set (the engine logs it as Error and skips
    the save) and a zero canvas so batch stacking stays shape-consistent.

    Fast path: when the WHOLE chunk is one pending homogeneous group, the
    batch decodes straight into the final stacked layout (row i = chunk[i],
    padding duplicates decoded redundantly) and the array is attached as
    ``chunk[0]['_prestacked_image']`` — BatchTransform.stack_batch then
    skips its np.stack copy entirely.
    """
    from collections import defaultdict

    from image_processor_pipeline_tpu.io import native

    _fill_pending_multi(chunk, n_threads)

    def decode_group(items, canvas, mode, n_rows=None):
        """One native batch-decode for ``items`` (row i = items[i]).
        Returns the [n, H, W, C] array or None if native is unavailable.
        ``n_rows`` appends all-zero tail rows (ladder-padded chunks)."""
        channels = {"RGB": 3, "RGBA": 4}[mode]
        paths = [Path(it["_decode"][0]) for it in items]
        res = native.decode_batch(paths, canvas, channels, n_threads, n_rows)
        batch, dims = res if res is not None else (None, None)
        for i, it in enumerate(items):
            h, w = (int(x) for x in it["size"])
            if dims is not None and dims[i, 0] == h and dims[i, 1] == w:
                it["image"] = batch[i]
                continue
            # per-item fallback (native failure or dims mismatch)
            buf = _fallback_decode(
                it, "image", it["_decode"][0], mode, it["_decode"][2],
                canvas, h, w, channels)
            if batch is not None:
                # keep the prestacked rows authoritative
                batch[i] = buf if buf is not None else 0
        return batch

    all_pending = all(
        "image" not in it and "_decode" in it for it in chunk
    )
    keys = {
        (tuple(it["canvas"]), it["_decode"][1])
        for it in chunk if "_decode" in it
    }
    if all_pending and len(keys) == 1:
        canvas, mode = next(iter(keys))
        # padded chunks repeat the last dict: decode row-per-slot (the rare
        # duplicate rows decode twice) so the array IS the stacked batch
        seen = set()
        uniq = []
        for it in chunk:
            if id(it) not in seen:
                seen.add(id(it))
                uniq.append(it)
        # ladder-padded chunks repeat the LAST dict at the tail, so
        # uniq == chunk[:len(uniq)]: decode the unique rows into the
        # head of a full-length array and leave the pad rows zero (their
        # outputs are discarded by the engine's n_valid) — the array IS
        # the stacked batch either way, skipping stack_batch's copy
        if all(c is u for c, u in zip(chunk, uniq)):
            if device_decode:
                batch = _decode_group_device(uniq, canvas, mode, n_threads,
                                             stats=stats)
                if batch is not None:
                    if len(uniq) < len(chunk):
                        import jax.numpy as jnp

                        # zero tail rows mirror decode_group's n_rows pad
                        batch = jnp.concatenate([batch, jnp.zeros(
                            (len(chunk) - len(uniq),) + batch.shape[1:],
                            batch.dtype)])
                    chunk[0]["_prestacked_image"] = batch
                    return
            batch = decode_group(uniq, canvas, mode, n_rows=len(chunk))
            if batch is not None:
                chunk[0]["_prestacked_image"] = batch
        else:  # interior duplicates (not engine-shaped): no prestack
            decode_group(uniq, canvas, mode)
        return

    pending = {}
    for it in chunk:  # padded chunks repeat the last dict; dedup by identity
        if "image" not in it and "_decode" in it:
            pending[id(it)] = it
    if not pending:
        return
    groups = defaultdict(list)
    for it in pending.values():
        groups[(tuple(it["canvas"]), it["_decode"][1])].append(it)
    for (canvas, mode), items in groups.items():
        decode_group(items, canvas, mode)


def encode_image(arr: np.ndarray, path: Path, **save_kwargs) -> Path:
    """Encode uint8 HWC numpy (1/3/4 channels) to ``path`` (format by suffix).

    PNG and JPEG go through the native C++ engine when built (PNG is
    lossless either way; JPEG quality defaults to 95 on both paths, matching
    cv2.imwrite in the reference); other formats and exotic kwargs use PIL.
    """
    arr = np.asarray(arr)
    path = Path(path)
    suffix_l = path.suffix.lower()
    if arr.dtype == np.uint8 and arr.ndim == 3:
        from image_processor_pipeline_tpu.io import native

        path.parent.mkdir(parents=True, exist_ok=True)
        if suffix_l == ".png" and not save_kwargs:
            if native.encode_png(path, arr):
                return path
        if suffix_l in (".jpg", ".jpeg") and set(save_kwargs) <= {"quality"}:
            rgb = arr[:, :, :3] if arr.shape[2] >= 3 else None
            if rgb is not None and native.encode_jpeg(
                path, rgb, int(save_kwargs.get("quality", 95))
            ):
                return path
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    im = Image.fromarray(arr)
    suffix = Path(path).suffix.lower()
    if suffix in (".jpg", ".jpeg"):
        if im.mode == "RGBA":
            im = im.convert("RGB")
        # cv2.imwrite (the reference's encoder, utils/utils.py:95) defaults
        # to JPEG quality 95; PIL defaults to 75 — match the reference.
        save_kwargs.setdefault("quality", 95)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    im.save(path, **save_kwargs)
    return path


def encode_image_pil(arr: np.ndarray, path: Path, **save_kwargs) -> Path:
    """encode_image with PIL Image.save defaults: JPEG quality 75.

    The reference uses TWO encoders with different JPEG defaults: cv2.imwrite
    (quality 95 — crop_square, symmetry, border crop, video frames) and PIL
    Image.save (quality 75 — tranfo.py:53 enhance, overlays.py:169 composite,
    rotations.py:81,119, recadrages.py:80 fit crop).  Transforms whose
    reference encoder is PIL must save through this wrapper so their JPEG
    bytes match the reference's (the native q75 encode is byte-identical to
    Image.save's — test_native_io pins it); everything else keeps
    encode_image's cv2-parity q95 default.
    """
    if Path(path).suffix.lower() in (".jpg", ".jpeg"):
        save_kwargs.setdefault("quality", 75)
    return encode_image(arr, path, **save_kwargs)


def list_files(directory: Path, suffixes: Optional[Sequence[str]] = None) -> List[Path]:
    """Sorted list of files in a directory.

    Parity: reference pipeline.py:122-146 — raises on missing dir; the
    empty-dir check is done by the caller (pipeline.py:168-170) so partial
    inventories can still be reported.
    """
    directory = Path(directory)
    if not directory.is_dir():
        raise FileNotFoundError(f"input directory does not exist: {directory}")
    files = sorted(p for p in directory.iterdir() if p.is_file())
    if suffixes:
        sfx = {s.lower().lstrip(".") for s in suffixes}
        files = [p for p in files if p.suffix.lower().lstrip(".") in sfx]
    return files
