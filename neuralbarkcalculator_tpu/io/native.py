"""ctypes binding to the native IO runtime (native/barkio.cc).

Replaces PIL in the IO hot paths (the reference's native codec layer,
dataset.py:82-90, models.py:203) with first-party C++: single-pass BMP
decode, zlib PNG decode/encode, and a pthread batch decoder that runs
outside the GIL. Falls back to PIL transparently when the shared library
hasn't been built (``make -C native``) — every caller goes through
``load_image_u8_fast`` / ``save_image_u8_fast``.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_LIB_PATHS = [
    os.path.join(_REPO_ROOT, "native", "libbarkio.so"),
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "libbarkio.so"),
]


def _build_if_needed() -> str | None:
    """Compile native/barkio.cc on first use if g++ is available."""
    src_dir = os.path.join(_REPO_ROOT, "native")
    so = os.path.join(src_dir, "libbarkio.so")
    src = os.path.join(src_dir, "barkio.cc")
    if os.path.isfile(so) and (not os.path.isfile(src) or
                               os.path.getmtime(so) >=
                               os.path.getmtime(src)):
        return so
    if not os.path.isfile(src):
        return None
    import subprocess
    try:
        subprocess.run(["make", "-C", src_dir, "-s"], check=True,
                       capture_output=True)
        return so if os.path.isfile(so) else None
    except Exception:
        return None


def get_lib():
    """The loaded library, or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    # rebuild-first: _build_if_needed compares the .so's mtime against
    # barkio.cc and recompiles when stale, so a pre-existing library from
    # an older checkout can't shadow newly added entry points; the path
    # scan is the fallback for source-less installs (prebuilt .so only).
    path = _build_if_needed()
    if path is None:
        path = next((p for p in _LIB_PATHS if os.path.isfile(p)), None)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.bmp_info.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.bmp_decode_rgb.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                   ctypes.c_int64]
    lib.png_info.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.png_decode.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                               ctypes.c_int64]
    lib.png_encode.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                               ctypes.c_int32, ctypes.c_int32,
                               ctypes.c_int32, ctypes.c_int32]
    lib.batch_decode.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32]
    lib.remove_small_zones_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p]
    lib.remove_small_zones_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32]
    try:  # v2 (packed input + fused remap/count); absent in older builds
        lib.remove_small_zones_batch2.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int32]
    except AttributeError:  # pragma: no cover
        pass
    try:  # threaded resize+trim preprocess; absent in older builds
        lib.preprocess_image_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
    except AttributeError:  # pragma: no cover
        pass
    _LIB = lib
    return _LIB


def image_info(path: str) -> tuple[int, int, int] | None:
    """(height, width, channels) without decoding, or None."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int32()
    h = ctypes.c_int32()
    c = ctypes.c_int32()
    lower = path.lower()
    if lower.endswith(".bmp"):
        if lib.bmp_info(path.encode(), ctypes.byref(w),
                        ctypes.byref(h)) == 0:
            return int(h.value), int(w.value), 3
    elif lower.endswith(".png"):
        if lib.png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                        ctypes.byref(c)) == 0:
            return int(h.value), int(w.value), int(c.value)
    return None


def load_image_u8_fast(path: str, grayscale: bool = False
                       ) -> np.ndarray | None:
    """Native decode to uint8 ([H,W,3] RGB or [H,W] L), PIL fallback."""
    from ..data.dataset import load_image_u8  # fallback

    if not path or not os.path.isfile(path):
        return None
    lib = get_lib()
    info = image_info(path) if lib is not None else None
    if info is None:
        return load_image_u8(path, grayscale=grayscale)
    h, w, c = info
    out = np.empty((h, w, c) if c > 1 else (h, w), np.uint8)
    fn = lib.bmp_decode_rgb if path.lower().endswith(".bmp") \
        else lib.png_decode
    if fn(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
          out.nbytes) != 0:
        return load_image_u8(path, grayscale=grayscale)
    return _convert_mode(out, grayscale)


def _convert_mode(img: np.ndarray, grayscale: bool) -> np.ndarray:
    """Match PIL convert('RGB'/'L') semantics for the decoded channels."""
    if grayscale:
        if img.ndim == 2:
            return img
        rgb = img[..., :3].astype(np.float32)
        # PIL L: ITU-R 601-2 luma, truncated like PIL (round-half-down via
        # + 0.5 floor is what PIL does internally)
        lum = rgb[..., 0] * 299 / 1000 + rgb[..., 1] * 587 / 1000 \
            + rgb[..., 2] * 114 / 1000
        return np.floor(lum + 0.5).astype(np.uint8)
    if img.ndim == 2:
        return np.repeat(img[..., None], 3, axis=-1)
    return np.ascontiguousarray(img[..., :3])


def save_image_u8_fast(path: str, img: np.ndarray,
                       zlevel: int = 6) -> None:
    """Native PNG encode for uint8 HW / HWC arrays; PIL fallback (and PIL
    for non-PNG extensions)."""
    from ..data.dataset import save_image_u8  # fallback

    if img.dtype != np.uint8:
        img = np.rint(np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    lib = get_lib()
    if lib is None or not path.lower().endswith(".png"):
        return save_image_u8(path, img)
    c = 1 if img.ndim == 2 else img.shape[2]
    img = np.ascontiguousarray(img)
    rc = lib.png_encode(path.encode(),
                        img.ctypes.data_as(ctypes.c_void_p),
                        img.shape[1], img.shape[0], c, zlevel)
    if rc != 0:
        save_image_u8(path, img)


def batch_decode(paths: list[str], shape: tuple[int, ...],
                 threads: int = 8) -> np.ndarray | None:
    """Decode same-shaped files into one contiguous uint8 batch with the
    pthread pool (GIL-free). Returns None when the lib is unavailable or
    any file fails (callers fall back to per-file loads)."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    is_png = 1 if paths[0].lower().endswith(".png") else 0
    out = np.empty((len(paths), *shape), np.uint8)
    status = np.zeros(len(paths), np.int32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    item = int(np.prod(shape))
    rc = lib.batch_decode(arr, len(paths), is_png,
                          out.ctypes.data_as(ctypes.c_void_p), item,
                          status.ctypes.data_as(ctypes.c_void_p), threads)
    return out if rc == 0 else None


def preprocess_image_native(img: np.ndarray, target: int,
                            trim_thr: float, trim_frac: float,
                            threads: int = 1
                            ) -> tuple[np.ndarray, int, int] | None:
    """Native resize+trim+quantize preprocess of one decoded uint8
    [H, W, 3] image (reference models.py:191-203 semantics; the scipy
    twin is pipeline/preprocess._preprocess_host_one).

    Returns (out_u8, first, last): out_u8 is [target, target, 3] when the
    image was resized (max(H, W) > target) else [H, W, 3]; (first, last)
    is the kept row range when the trim decision applied, else (-1, -1)
    — the caller crops ``out_u8[first:last]``. None when the native
    library (or this entry point) is unavailable.

    The C pass reproduces the host path's math exactly: per-line
    double-precision mirror-boundary cubic B-spline IIR prefilter
    (bit-exact vs scipy.ndimage.spline_filter1d, incl. its truncated
    causal init), f32 4-tap evaluation in numpy accumulation order, clip
    to the input range, f64 row-fraction trim compare, rint
    quantization.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "preprocess_image_u8"):
        return None
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        return None
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]
    do_resize = max(h, w) > target
    out = np.empty((target, target, 3) if do_resize else (h, w, 3),
                   np.uint8)
    first = ctypes.c_int32()
    last = ctypes.c_int32()
    rc = lib.preprocess_image_u8(
        img.ctypes.data_as(ctypes.c_void_p), h, w, target,
        float(trim_thr), float(trim_frac),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.byref(first),
        ctypes.byref(last), threads)
    if rc != 0:
        return None
    return out, int(first.value), int(last.value)


def remove_small_zones_host(class_maps: np.ndarray,
                            valid_h: np.ndarray | None = None,
                            min_size: int = 150,
                            threads: int = 8) -> np.ndarray | None:
    """Native union-find remove_small_zones (reference utils.py:135-148
    semantics, 8-connectivity, strict < thresholds, islands->bark
    write-back) on a uint8 class-map batch [B, H, W] (or one [H, W]).

    ``valid_h`` restricts each image to its true trimmed height; padded
    rows come back 0. Returns None when the native library is unavailable
    (callers fall back to the device CCL op).
    """
    lib = get_lib()
    if lib is None:
        return None
    single = class_maps.ndim == 2
    if single:
        class_maps = class_maps[None]
    class_maps = np.ascontiguousarray(class_maps, dtype=np.uint8)
    b, h, w = class_maps.shape
    out = np.empty_like(class_maps)
    vh_ptr = None
    if valid_h is not None:
        valid_h = np.ascontiguousarray(valid_h, dtype=np.int32)
        vh_ptr = valid_h.ctypes.data_as(ctypes.c_void_p)
    rc = lib.remove_small_zones_batch(
        class_maps.ctypes.data_as(ctypes.c_void_p), b, h, w, vh_ptr,
        min_size, out.ctypes.data_as(ctypes.c_void_p), threads)
    if rc != 0:  # per-image malloc failure / gigapixel guard: the output
        # buffer may hold uninitialized bytes for the failed image —
        # surfacing beats silently reporting garbage CSV stats
        raise RuntimeError(
            f"native remove_small_zones failed (barkio rc={rc}; "
            f"out-of-memory or image beyond the int32 run-capacity guard)")
    return out[0] if single else out


def remove_small_zones_host2(class_maps: np.ndarray, w: int,
                             valid_h: np.ndarray | None = None,
                             packed: bool = False,
                             exclude_nodes: bool = False,
                             min_size: int = 150, threads: int = 8
                             ) -> tuple[np.ndarray, np.ndarray] | None:
    """remove_small_zones with the predict engine's whole postprocess
    fused into the one native pass: optional 2-bit-packed input ([B, H,
    W/4], the device pull layout, w % 4 == 0), the exclude_nodes 2->1
    remap (reference models.py:273-276), and per-image class counts over
    the valid rows (the CSV/legend bincount, models.py:323-332).

    Returns (cleaned [B, H, W] uint8, counts [B, 3] int64) or None when
    the native library (or the v2 entry) is unavailable.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "remove_small_zones_batch2"):
        return None
    class_maps = np.ascontiguousarray(class_maps, dtype=np.uint8)
    b, h = class_maps.shape[:2]
    if class_maps.shape[2] != (w // 4 if packed else w) or \
            (packed and w % 4):
        return None  # layout mismatch: graceful fallback, not OOB reads
    out = np.empty((b, h, w), np.uint8)
    counts = np.zeros((b, 3), np.int64)
    vh_ptr = None
    if valid_h is not None:
        valid_h = np.ascontiguousarray(valid_h, dtype=np.int32)
        vh_ptr = valid_h.ctypes.data_as(ctypes.c_void_p)
    rc = lib.remove_small_zones_batch2(
        class_maps.ctypes.data_as(ctypes.c_void_p), int(packed), b, h, w,
        vh_ptr, min_size, int(exclude_nodes),
        out.ctypes.data_as(ctypes.c_void_p),
        counts.ctypes.data_as(ctypes.c_void_p), threads)
    if rc != 0:  # pragma: no cover - hard to provoke without OOM
        # Argument errors (E_ARG) are pre-checked above, so a nonzero rc
        # is a per-image runtime failure (malloc / gigapixel guard) and
        # `out` may hold uninitialized bytes — raise rather than return
        # None: the None path retries through remove_small_zones_host,
        # which would fail the same way.
        raise RuntimeError(
            f"native remove_small_zones_batch2 failed (barkio rc={rc}; "
            f"out-of-memory or image beyond the int32 run-capacity guard)")
    return out, counts
