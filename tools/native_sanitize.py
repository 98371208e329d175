"""Sanitizer fuzz pass over the native IO runtime (native/barkio.cc).

The reference has no native code and therefore no sanitizer story
(SURVEY.md §5.2); this framework ships a first-party C++ runtime, so it
gets one: build ``libbarkio_asan.so`` with AddressSanitizer + UBSan,
load it via ctypes under a preloaded ASAN runtime, and drive every
exported entry point with randomized + adversarial inputs:

- ``remove_small_zones_u8`` / ``_batch`` / ``_batch2`` on random and
  structured class maps across degenerate sizes (1x1 up), packed and
  unpacked, with/without valid_h and exclude_nodes — cross-checked
  against each other and against numpy counts (the *semantics* goldens
  vs scipy live in tests/test_ccl.py and test_native_io.py; this pass
  is for memory safety on hostile shapes).
- ``png_encode`` -> ``png_decode`` roundtrips (odd sizes, 1-4 channels)
  byte-compared, plus PIL cross-decode.
- ``bmp_decode_rgb`` on PIL-written BMPs, compared to PIL's decode.
- Corrupt-input robustness: truncations, bit flips, and garbage bytes
  fed to ``png_info/png_decode/bmp_info/bmp_decode_rgb`` must return
  nonzero (or a clean 0) without touching invalid memory.
- ``batch_decode`` across a pthread pool (threads > images, threads=1).

Usage: ``python tools/native_sanitize.py [--iters N]`` — re-execs
itself with LD_PRELOAD set to the ASAN/UBSan runtimes. Exit 0 = no
sanitizer report and all cross-checks passed.
"""
from __future__ import annotations

import argparse
import ctypes
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "native", "barkio.cc")
SO = os.path.join(REPO, "native", "libbarkio_asan.so")


def build() -> None:
    cmd = ["g++", "-O1", "-g", "-fPIC", "-Wall", "-shared",
           "-fsanitize=address,undefined",
           "-fno-sanitize-recover=undefined",
           "-o", SO, SRC, "-lz", "-lpthread"]
    subprocess.run(cmd, check=True)


def reexec_with_asan() -> None:
    """Re-exec python with the sanitizer runtimes preloaded (required to
    load an ASAN-instrumented DSO into an uninstrumented interpreter)."""
    if os.environ.get("_BARKIO_ASAN_CHILD") == "1":
        return
    asan = subprocess.run(["g++", "-print-file-name=libasan.so"],
                          capture_output=True, text=True).stdout.strip()
    ubsan = subprocess.run(["g++", "-print-file-name=libubsan.so"],
                           capture_output=True, text=True).stdout.strip()
    env = dict(os.environ,
               _BARKIO_ASAN_CHILD="1",
               LD_PRELOAD=f"{asan} {ubsan}",
               # CPython itself is not leak-clean; we care about barkio
               ASAN_OPTIONS="detect_leaks=0:abort_on_error=1",
               UBSAN_OPTIONS="print_stacktrace=1")
    os.execvpe(sys.executable, [sys.executable] + sys.argv, env)


def load_lib():
    lib = ctypes.CDLL(SO)
    i32, i64, vp, cp = (ctypes.c_int32, ctypes.c_int64, ctypes.c_void_p,
                        ctypes.c_char_p)
    P = ctypes.POINTER
    lib.bmp_info.argtypes = [cp, P(i32), P(i32)]
    lib.bmp_decode_rgb.argtypes = [cp, vp, i64]
    lib.png_info.argtypes = [cp, P(i32), P(i32), P(i32)]
    lib.png_decode.argtypes = [cp, vp, i64]
    lib.png_encode.argtypes = [cp, vp, i32, i32, i32, i32]
    lib.batch_decode.argtypes = [P(cp), i32, i32, vp, i64, vp, i32]
    lib.remove_small_zones_u8.argtypes = [vp, i32, i32, i32, vp]
    lib.remove_small_zones_batch.argtypes = [vp, i32, i32, i32, vp, i32,
                                             vp, i32]
    lib.remove_small_zones_batch2.argtypes = [vp, i32, i32, i32, i32, vp,
                                              i32, i32, vp, vp, i32]
    lib.preprocess_image_u8.argtypes = [vp, i32, i32, i32,
                                        ctypes.c_double, ctypes.c_double,
                                        vp, P(i32), P(i32), i32]
    return lib


def fuzz_ccl(lib, rng, iters: int) -> int:
    import numpy as np
    checks = 0
    for it in range(iters):
        kind = it % 4
        if kind == 0:      # degenerate sizes
            h = int(rng.integers(1, 6))
            w = int(rng.integers(1, 6)) * (4 if it % 8 == 0 else 1)
        elif kind == 1:    # skinny
            h, w = int(rng.integers(1, 3)), int(rng.integers(1, 300))
        elif kind == 2:    # blocky random
            h, w = int(rng.integers(8, 120)), int(rng.integers(8, 120))
        else:              # structured stripes / checkers
            h, w = 64, 64
        b = int(rng.integers(1, 4))
        if kind == 3:
            base = np.indices((h, w)).sum(0) % 3
            maps = np.broadcast_to(base, (b, h, w)).astype(np.uint8).copy()
        else:
            p = rng.uniform(0.05, 0.95)
            maps = (rng.random((b, h, w)) < p).astype(np.uint8)
            maps[rng.random((b, h, w)) < 0.1] = 2
        min_size = int(rng.choice([0, 1, 2, 150, h * w + 7]))
        vh = None
        vh_ptr = None
        if rng.random() < 0.5:
            vh = rng.integers(0, h + 1, b).astype(np.int32)
            vh_ptr = vh.ctypes.data_as(ctypes.c_void_p)
        threads = int(rng.choice([1, 2, 8]))

        out_b = np.empty_like(maps)
        rc = lib.remove_small_zones_batch(
            maps.ctypes.data_as(ctypes.c_void_p), b, h, w, vh_ptr,
            min_size, out_b.ctypes.data_as(ctypes.c_void_p), threads)
        assert rc == 0, f"batch rc={rc} at h={h} w={w}"

        # single-image entry must agree where valid_h doesn't apply
        if vh is None:
            for i in range(b):
                one = maps[i].copy()
                lib.remove_small_zones_u8(
                    one.ctypes.data_as(ctypes.c_void_p), h, w, min_size,
                    one.ctypes.data_as(ctypes.c_void_p))
                assert (one == out_b[i]).all(), \
                    f"u8 vs batch mismatch h={h} w={w} min={min_size}"

        # v2 unpacked + counts must agree with batch + numpy bincount
        excl = bool(rng.random() < 0.5)
        out2 = np.empty((b, h, w), np.uint8)
        counts = np.zeros((b, 3), np.int64)
        rc = lib.remove_small_zones_batch2(
            maps.ctypes.data_as(ctypes.c_void_p), 0, b, h, w, vh_ptr,
            min_size, int(excl), out2.ctypes.data_as(ctypes.c_void_p),
            counts.ctypes.data_as(ctypes.c_void_p), threads)
        assert rc == 0, f"batch2 rc={rc} at h={h} w={w}"
        want = out_b.copy()
        if excl:
            want[want == 2] = 1
        assert (out2 == want).all(), f"batch2 map mismatch h={h} w={w}"
        for i in range(b):
            hh = h if vh is None else int(vh[i])
            ref = np.bincount(out2[i, :hh].ravel(), minlength=3)[:3]
            assert (counts[i] == ref).all(), \
                f"batch2 counts mismatch h={h} w={w} vh={hh}"

        # packed input path (w % 4 == 0): pack then compare
        if w % 4 == 0 and w > 0:
            flat = maps.reshape(b, h, w // 4, 4)
            packed = (flat[..., 0] | (flat[..., 1] << 2) |
                      (flat[..., 2] << 4) | (flat[..., 3] << 6)
                      ).astype(np.uint8)
            out3 = np.empty((b, h, w), np.uint8)
            c3 = np.zeros((b, 3), np.int64)
            rc = lib.remove_small_zones_batch2(
                packed.ctypes.data_as(ctypes.c_void_p), 1, b, h, w,
                vh_ptr, min_size, int(excl),
                out3.ctypes.data_as(ctypes.c_void_p),
                c3.ctypes.data_as(ctypes.c_void_p), threads)
            assert rc == 0 and (out3 == out2).all() and \
                (c3 == counts).all(), f"packed mismatch h={h} w={w}"
        checks += 1
    return checks


def fuzz_preprocess(lib, rng, iters: int) -> int:
    """preprocess_image_u8 across hostile shapes/thread counts: memory
    safety + invariants (bounds in range, trim flag semantics, thread
    invariance); scipy-parity goldens live in
    tests/test_preprocess_native.py."""
    import numpy as np
    checks = 0
    for it in range(iters):
        kind = it % 4
        if kind == 0:      # tiny (shorter than the IIR init horizon)
            h = int(rng.integers(1, 32))
            w = int(rng.integers(1, 32))
            target = int(rng.integers(2, 24))
        elif kind == 1:    # skinny
            h = int(rng.integers(1, 4))
            w = int(rng.integers(1, 600))
            target = int(rng.integers(2, 64))
        elif kind == 2:    # resize path
            h = int(rng.integers(64, 300))
            w = int(rng.integers(64, 300))
            target = int(rng.integers(16, 128))
        else:              # no-resize (square and not)
            target = int(rng.integers(64, 256))
            h = int(rng.integers(1, target + 1))
            w = h if rng.random() < 0.5 else int(
                rng.integers(1, target + 1))
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        if rng.random() < 0.3:
            img[: max(1, h // 4)] = 0  # dark band
        do_resize = max(h, w) > target
        oh, ow = (target, target) if do_resize else (h, w)
        out = np.full((oh, ow, 3), 0xAB, np.uint8)
        first = ctypes.c_int32(-2)
        last = ctypes.c_int32(-2)
        threads = int(rng.choice([1, 2, 8]))
        rc = lib.preprocess_image_u8(
            img.ctypes.data_as(ctypes.c_void_p), h, w, target,
            1e-3, 0.85, out.ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(first), ctypes.byref(last), threads)
        assert rc == 0, f"rc={rc} h={h} w={w} target={target}"
        if do_resize or h == w:
            assert 0 <= first.value <= last.value <= oh, \
                f"bounds {first.value}:{last.value} oh={oh}"
        else:
            assert first.value == -1 and last.value == -1
        if threads != 1:  # thread invariance
            out1 = np.empty_like(out)
            f1 = ctypes.c_int32()
            l1 = ctypes.c_int32()
            rc = lib.preprocess_image_u8(
                img.ctypes.data_as(ctypes.c_void_p), h, w, target,
                1e-3, 0.85, out1.ctypes.data_as(ctypes.c_void_p),
                ctypes.byref(f1), ctypes.byref(l1), 1)
            assert rc == 0 and (out1 == out).all() and \
                (f1.value, l1.value) == (first.value, last.value)
        checks += 1
    # arg validation: NULLs and bad sizes must fail cleanly
    out = np.empty((4, 4, 3), np.uint8)
    f = ctypes.c_int32()
    l_ = ctypes.c_int32()
    assert lib.preprocess_image_u8(
        None, 4, 4, 16, 1e-3, 0.85,
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(f), ctypes.byref(l_), 1) != 0
    assert lib.preprocess_image_u8(
        out.ctypes.data_as(ctypes.c_void_p), 0, 4, 16, 1e-3, 0.85,
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(f), ctypes.byref(l_), 1) != 0
    assert lib.preprocess_image_u8(
        out.ctypes.data_as(ctypes.c_void_p), 4, 4, 1, 1e-3, 0.85,
        out.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(f), ctypes.byref(l_), 1) != 0
    checks += 3
    return checks


def fuzz_codecs(lib, rng, iters: int, tmp: str) -> int:
    import numpy as np
    from PIL import Image
    checks = 0
    png = os.path.join(tmp, "f.png")
    bmp = os.path.join(tmp, "f.bmp")
    for it in range(iters):
        h = int(rng.integers(1, 90))
        w = int(rng.integers(1, 90))
        c = int(rng.choice([1, 3]))
        img = rng.integers(0, 256, (h, w, c) if c > 1 else (h, w)
                           ).astype(np.uint8)
        z = int(rng.integers(0, 7))
        rc = lib.png_encode(png.encode(),
                            img.ctypes.data_as(ctypes.c_void_p),
                            w, h, c, z)
        assert rc == 0, f"png_encode rc={rc} h={h} w={w} c={c}"
        W = ctypes.c_int32()
        H = ctypes.c_int32()
        C = ctypes.c_int32()
        assert lib.png_info(png.encode(), ctypes.byref(W), ctypes.byref(H),
                            ctypes.byref(C)) == 0
        assert (W.value, H.value, C.value) == (w, h, c)
        out = np.empty_like(img)
        assert lib.png_decode(png.encode(),
                              out.ctypes.data_as(ctypes.c_void_p),
                              out.nbytes) == 0
        assert (out == img).all(), "png roundtrip mismatch"
        pil = np.asarray(Image.open(png))
        assert (pil.reshape(img.shape) == img).all(), "PIL cross-decode"

        # BMP: PIL writes, native decodes
        Image.fromarray(img if c == 3 else
                        np.repeat(img[..., None], 3, -1)).save(bmp)
        outb = np.empty((h, w, 3), np.uint8)
        assert lib.bmp_decode_rgb(bmp.encode(),
                                  outb.ctypes.data_as(ctypes.c_void_p),
                                  outb.nbytes) == 0
        ref = np.asarray(Image.open(bmp).convert("RGB"))
        assert (outb == ref).all(), "bmp decode vs PIL"

        # undersized output buffers must fail cleanly, never overflow
        if it % 4 == 0 and out.nbytes > 1:
            small = np.empty(out.nbytes - 1, np.uint8)
            assert lib.png_decode(png.encode(),
                                  small.ctypes.data_as(ctypes.c_void_p),
                                  small.nbytes) != 0
            smallb = np.empty(outb.nbytes - 1, np.uint8)
            assert lib.bmp_decode_rgb(bmp.encode(),
                                      smallb.ctypes.data_as(
                                          ctypes.c_void_p),
                                      smallb.nbytes) != 0
        checks += 1

    # corrupt-input robustness: truncations, flips, garbage
    with open(png, "rb") as f:
        good_png = f.read()
    with open(bmp, "rb") as f:
        good_bmp = f.read()
    evil = os.path.join(tmp, "evil.bin")
    cases = []
    for data in (good_png, good_bmp):
        n = len(data)
        cases += [data[:k] for k in
                  sorted(set(int(x) for x in rng.integers(0, n, 24)))]
        for _ in range(24):
            buf = bytearray(data)
            for _ in range(int(rng.integers(1, 8))):
                buf[int(rng.integers(0, n))] ^= int(rng.integers(1, 256))
            cases.append(bytes(buf))
    for _ in range(24):
        cases.append(rng.integers(0, 256, int(rng.integers(0, 200))
                                  ).astype("u1").tobytes())
    big = np.empty(1 << 22, np.uint8)
    for data in cases:
        with open(evil, "wb") as f:
            f.write(data)
        W = ctypes.c_int32()
        H = ctypes.c_int32()
        C = ctypes.c_int32()
        lib.png_info(evil.encode(), ctypes.byref(W), ctypes.byref(H),
                     ctypes.byref(C))
        lib.bmp_info(evil.encode(), ctypes.byref(W), ctypes.byref(H))
        lib.png_decode(evil.encode(),
                       big.ctypes.data_as(ctypes.c_void_p), big.nbytes)
        lib.bmp_decode_rgb(evil.encode(),
                           big.ctypes.data_as(ctypes.c_void_p), big.nbytes)
        checks += 1

    # batch_decode: threads >= files, threads = 1, plus one bad file
    import numpy as np
    imgs = []
    paths = []
    for i in range(5):
        p = os.path.join(tmp, f"b{i}.png")
        im = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)
        assert lib.png_encode(p.encode(),
                              im.ctypes.data_as(ctypes.c_void_p),
                              23, 17, 3, 1) == 0
        imgs.append(im)
        paths.append(p)
    for threads in (1, 8, 16):
        out = np.empty((5, 17, 23, 3), np.uint8)
        status = np.zeros(5, np.int32)
        arr = (ctypes.c_char_p * 5)(*[p.encode() for p in paths])
        rc = lib.batch_decode(arr, 5, 1,
                              out.ctypes.data_as(ctypes.c_void_p),
                              17 * 23 * 3,
                              status.ctypes.data_as(ctypes.c_void_p),
                              threads)
        assert rc == 0 and (out == np.stack(imgs)).all()
        checks += 1
    bad = list(paths)
    bad[2] = evil
    arr = (ctypes.c_char_p * 5)(*[p.encode() for p in bad])
    out = np.empty((5, 17, 23, 3), np.uint8)
    status = np.zeros(5, np.int32)
    lib.batch_decode(arr, 5, 1, out.ctypes.data_as(ctypes.c_void_p),
                     17 * 23 * 3,
                     status.ctypes.data_as(ctypes.c_void_p), 8)
    assert status[2] != 0, "bad file must be flagged in status"
    checks += 1
    return checks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200,
                    help="fuzz iterations per family")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    build()
    reexec_with_asan()

    import tempfile

    import numpy as np
    rng = np.random.default_rng(args.seed)
    lib = load_lib()
    with tempfile.TemporaryDirectory() as tmp:
        n1 = fuzz_ccl(lib, rng, args.iters)
        n2 = fuzz_codecs(lib, rng, args.iters, tmp)
        n3 = fuzz_preprocess(lib, rng, args.iters)
    print(f"SANITIZE_OK ccl_checks={n1} codec_checks={n2} "
          f"preprocess_checks={n3} (ASan+UBSan, no reports)")


if __name__ == "__main__":
    main()
