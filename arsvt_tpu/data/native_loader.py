"""ctypes binding for the C++ data-loader core (native/arsvt_loader.cpp).

Builds `native/libarsvt_loader.so` on first use if a compiler is present
(the toolchain is baked into the image); otherwise `available()` is False
and `pipeline.py` falls back to the PIL path. The C++ core decodes
JPEG/PNG with libjpeg/libpng on a thread pool and letterboxes straight
into one contiguous (B, canvas, canvas, 3) fp32 buffer (see the .cpp
header for the design rationale vs the reference's fork-based loaders).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libarsvt_loader.so"))

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # `make` is mtime-aware: it rebuilds only when arsvt_loader.cpp is
        # newer than the .so, so a prebuilt binary can never silently
        # shadow newer source. On a box without the toolchain the failed
        # make falls back to an existing .so (PIL fallback otherwise).
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            if not os.path.exists(_SO_PATH):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.arsvt_load_batch.restype = ctypes.c_int
        lib.arsvt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.arsvt_load_batch_u8.restype = ctypes.c_int
        lib.arsvt_load_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ]
        lib.arsvt_load_batch_ex.restype = ctypes.c_int
        lib.arsvt_load_batch_ex.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.arsvt_load_batch_u8_ex.restype = ctypes.c_int
        lib.arsvt_load_batch_u8_ex.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ]
        lib.arsvt_probe_image.restype = ctypes.c_int
        lib.arsvt_probe_image.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.arsvt_decode_raw.restype = ctypes.c_int
        lib.arsvt_decode_raw.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_longlong,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_letterboxed_batch(paths: list[str], canvas: int,
                           *, threads: int | None = None,
                           dtype=np.float32, strict: bool = True,
                           scaled_decode: bool | None = None):
    """Decode+letterbox a batch natively.

    Returns (images (B, canvas, canvas, 3), meta fp32). Meta rows are
    [scale, pad_x, pad_y, ok] — plus [dec_w, dec_h] (the post-EXIF dims
    the letterbox consumed) when `scaled_decode` is on. `dtype=np.uint8`
    emits raw 0..255 bytes — 4x less host RAM and H2D traffic than fp32
    [0,1] (the device rescales at the top of the jitted step);
    `np.float32` emits [0,1]. Raises RuntimeError if the native library
    is unavailable.

    `scaled_decode` (None = honor ARSVT_SCALED_DECODE env): JPEGs decode
    directly at the smallest libjpeg M/8 DCT scale whose longest side is
    still >= canvas — skips most IDCT work on downscales (e.g. 640x480 ->
    224 decodes at 3/8 = ~14% of the full-decode pixel count), at the
    cost of the decoded pixels differing slightly from full-decode +
    box-reduce + bilinear (both are downscale prefilters; geometry stays
    exact because box transforms consume the decoded dims from meta).

    `strict=True` (default) raises ValueError when any image fails to
    decode — matching the PIL fallback, which raises on corrupt files.
    The C++ core zero-fills failed slots and flags meta ok=0; silently
    training on black images with identity box transforms is the failure
    mode this guards. `strict=False` returns them flagged instead.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (build failed)")
    if scaled_decode is None:
        scaled_decode = bool(os.environ.get("ARSVT_SCALED_DECODE"))
    n = len(paths)
    if threads is None:
        threads = min(max(os.cpu_count() or 1, 1), 16)
    meta = np.empty((n, 6 if scaled_decode else 4), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mp = meta.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if np.dtype(dtype) == np.uint8:
        images = np.empty((n, canvas, canvas, 3), np.uint8)
        ip = images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if scaled_decode:
            lib.arsvt_load_batch_u8_ex(arr, n, canvas, threads, 1, ip, mp)
        else:
            lib.arsvt_load_batch_u8(arr, n, canvas, threads, ip, mp)
    else:
        images = np.empty((n, canvas, canvas, 3), np.float32)
        ip = images.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if scaled_decode:
            lib.arsvt_load_batch_ex(arr, n, canvas, threads, 1, ip, mp)
        else:
            lib.arsvt_load_batch(arr, n, canvas, threads, ip, mp)
    if strict:
        failed = np.where(meta[:, 3] == 0.0)[0]
        if failed.size:
            sample = [paths[i] for i in failed[:5]]
            raise ValueError(
                f"{failed.size} image(s) failed to decode, e.g. {sample}"
            )
    return images, meta


def decode_image(path: str) -> np.ndarray:
    """One image -> upright uint8 HWC RGB via the native core (EXIF
    orientation applied in C++, arsvt_loader.cpp). Debug/test surface;
    the batch path is `load_letterboxed_batch`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (build failed)")
    w = ctypes.c_int()
    h = ctypes.c_int()
    encoded = path.encode()
    if lib.arsvt_probe_image(encoded, ctypes.byref(w),
                             ctypes.byref(h)) != 0:
        raise ValueError(f"undecodable image: {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.arsvt_decode_raw(
        encoded, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.size,
    )
    if rc != 0:
        raise ValueError(f"decode failed ({rc}): {path}")
    return out


def _native_resized_dims(orig_w: int, orig_h: int, canvas: int):
    """The EXACT resized dims the C++ core produced (arsvt_loader.cpp
    letterbox_into): integer box-reduce by k first for >=2x downscales,
    then float32 scale + lround. Recomputing with Python round() on the
    original dims diverges by 1px on odd-width >=2x downscales (banker's
    rounding on fp64 vs lround on fp32 post-reduce) — enough to misalign a
    GT box edge from the letterboxed pixels."""
    if max(orig_w, orig_h) <= 0:
        return 1, 1  # degenerate record: match the old graceful floor
    s0 = np.float32(canvas) / np.float32(max(orig_w, orig_h))
    # the reciprocal must be FP32 like the C++ (1.0f / s0): at exact >=3x
    # integer ratios fp32 rounds 1/s0 up to the integer while fp64 stays
    # just below it, so an fp64 reciprocal truncates to k-1 (e.g. 1920@640:
    # C++ k=3 -> nh=22, fp64 k=2 -> nh=23 — the 1px family again)
    k = max(1, int(np.float32(1.0) / np.maximum(s0, np.float32(1e-6))))
    w, h = orig_w, orig_h
    if k >= 2:
        w, h = max(1, orig_w // k), max(1, orig_h // k)
    scale = np.float32(canvas) / np.float32(max(w, h))
    # lround = round half away from zero (positive: floor(x + 0.5))
    nw = max(1, int(np.floor(np.float32(w) * scale + np.float32(0.5))))
    nh = max(1, int(np.floor(np.float32(h) * scale + np.float32(0.5))))
    return nw, nh


def box_transform_from_meta(meta_row, canvas: int):
    """Box transform matching the NATIVE letterbox's exact geometry.

    Not interchangeable with pipeline.letterbox's transform: the PIL
    fallback resizes without the C++ core's integer box-reduce prefilter
    and rounds dims with Python round(), so the two paths can differ by
    1px in resized dims — each path's boxes align with ITS OWN pixels.

    6-wide meta rows (the `_ex`/scaled-decode path) carry the post-EXIF
    decoded dims the letterbox actually consumed; the transform replays
    the resize math on THOSE instead of the caller's original dims, so
    boxes stay aligned with the scaled-decoded pixels (normalized box
    coords are scale-invariant, so the original dims drop out)."""
    pad_x, pad_y = float(meta_row[1]), float(meta_row[2])
    dec_w = dec_h = 0
    if len(meta_row) >= 6:
        dec_w, dec_h = int(meta_row[4]), int(meta_row[5])

    def transform(boxes: np.ndarray, orig_w: int, orig_h: int) -> np.ndarray:
        if boxes.size == 0:
            return boxes
        if dec_w > 0 and dec_h > 0:
            nw, nh = _native_resized_dims(dec_w, dec_h, canvas)
        else:
            nw, nh = _native_resized_dims(orig_w, orig_h, canvas)
        px = boxes * np.array([nw, nh, nw, nh], np.float32)
        px += np.array([pad_x, pad_y, pad_x, pad_y], np.float32)
        return px / canvas

    return transform
