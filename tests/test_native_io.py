"""Native C++ IO runtime (native/barkio.cc via ctypes) golden tests vs
PIL: BMP decode, PNG decode/encode round trips, threaded batch decode.

Skipped when the shared library can't be built (no g++) — the Python
pipelines fall back to PIL automatically.
"""
import numpy as np
import pytest
from PIL import Image

native = pytest.importorskip("neuralbarkcalculator_tpu.io.native")

if native.get_lib() is None:  # pragma: no cover
    pytest.skip("libbarkio.so unavailable", allow_module_level=True)


@pytest.fixture()
def rgb(rng):
    return (rng.random((37, 53, 3)) * 255).astype(np.uint8)


def test_bmp_decode_matches_pil(tmp_path, rgb):
    path = str(tmp_path / "x.bmp")
    Image.fromarray(rgb).save(path)
    want = np.asarray(Image.open(path).convert("RGB"))
    assert native.image_info(path) == (37, 53, 3)
    got = native.load_image_u8_fast(path)
    np.testing.assert_array_equal(got, want)


def test_png_decode_rgb_matches_pil(tmp_path, rgb):
    path = str(tmp_path / "x.png")
    Image.fromarray(rgb).save(path)
    got = native.load_image_u8_fast(path)
    np.testing.assert_array_equal(got, rgb)


def test_png_decode_grayscale(tmp_path, rng):
    gray = (rng.random((40, 25)) * 255).astype(np.uint8)
    path = str(tmp_path / "g.png")
    Image.fromarray(gray, mode="L").save(path)
    got = native.load_image_u8_fast(path, grayscale=True)
    np.testing.assert_array_equal(got, gray)


def test_png_encode_roundtrip(tmp_path, rgb, rng):
    path = str(tmp_path / "enc.png")
    native.save_image_u8_fast(path, rgb)
    np.testing.assert_array_equal(np.asarray(Image.open(path)), rgb)

    dual = rng.choice([0, 127, 255], size=(64, 48)).astype(np.uint8)
    path2 = str(tmp_path / "dual.png")
    native.save_image_u8_fast(path2, dual)
    decoded = Image.open(path2)
    assert decoded.mode == "L"
    np.testing.assert_array_equal(np.asarray(decoded), dual)


def test_rgb_to_grayscale_matches_pil(tmp_path, rgb):
    path = str(tmp_path / "x.png")
    Image.fromarray(rgb).save(path)
    want = np.asarray(Image.open(path).convert("L"))
    got = native.load_image_u8_fast(path, grayscale=True)
    # PIL uses fixed-point luma; allow off-by-one from float rounding
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_batch_decode(tmp_path, rng):
    paths = []
    want = []
    for i in range(6):
        img = (rng.random((32, 24, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f"b{i}.png")
        Image.fromarray(img).save(p)
        paths.append(p)
        want.append(img)
    got = native.batch_decode(paths, (32, 24, 3), threads=3)
    assert got is not None
    np.testing.assert_array_equal(got, np.stack(want))


def test_float_input_quantizes(tmp_path):
    img = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
    path = str(tmp_path / "f.png")
    native.save_image_u8_fast(path, img)
    want = np.rint(img * 255).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(Image.open(path)), want)


def test_native_ccl_matches_device_op(rng):
    """The C++ union-find postprocess must agree exactly with the golden
    device op (itself validated against scipy in test_ccl.py)."""
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.ccl import (remove_small_zones,
                                                  remove_small_zones_ragged)

    # speckle + blobs to exercise both thresholds
    img = (rng.random((3, 96, 128)) * 3).astype(np.uint8)
    img[0, 20:60, 20:80] = 1
    img[1, :, :] = 0
    img[1, 10:15, 10:15] = 2
    want = np.asarray(remove_small_zones(
        jnp.asarray(img.astype(np.int32)))).astype(np.uint8)
    got = native.remove_small_zones_host(img)
    np.testing.assert_array_equal(got, want)

    # ragged variant
    vh = np.array([96, 70, 33], np.int32)
    want_r = np.asarray(remove_small_zones_ragged(
        jnp.asarray(img.astype(np.int32)), jnp.asarray(vh))
    ).astype(np.uint8)
    got_r = native.remove_small_zones_host(img, vh)
    np.testing.assert_array_equal(got_r, want_r)


def test_native_ccl_v2_fused_pass(rng):
    """remove_small_zones_host2 (packed input + exclude_nodes remap +
    per-class counts in one native pass) must match the v1 clean followed
    by the separate numpy remap/bincount sweeps it replaces."""
    B, H, W = 3, 96, 128
    maps = (rng.random((B, H, W)) * 3).astype(np.uint8)
    maps[0, 20:60, 20:80] = 1
    maps[2, :, :] = 0
    maps[2, 10:15, 10:15] = 2
    vh = np.array([96, 70, 33], np.int32)
    for i, h in enumerate(vh):
        maps[i, h:] = 0
    flat = maps.reshape(B, H, W // 4, 4).astype(np.uint16)
    packed = (flat[..., 0] | (flat[..., 1] << 2) | (flat[..., 2] << 4)
              | (flat[..., 3] << 6)).astype(np.uint8)

    ref = native.remove_small_zones_host(maps, vh)
    if ref is None:
        pytest.skip("native lib unavailable")
    for exclude in (False, True):
        want = np.where(ref == 2, 1, ref).astype(np.uint8) if exclude \
            else ref
        for pk, inp in ((False, maps), (True, packed)):
            out, counts = native.remove_small_zones_host2(
                inp, W, vh, packed=pk, exclude_nodes=exclude)
            np.testing.assert_array_equal(out, want)
            for i in range(B):
                np.testing.assert_array_equal(
                    counts[i], np.bincount(want[i, :vh[i]].ravel(),
                                           minlength=3))


def test_native_ccl_v2_arbitrary_values_and_layout_guard(rng):
    """Public-entry hardening: class values outside {0,1,2} must count
    safely (the np.bincount this replaced tolerated any uint8), and a
    mismatched plain layout must return None instead of reading out of
    bounds in C."""
    maps = np.full((1, 32, 32), 3, np.uint8)  # all value 3 (>= NUM_CLASSES)
    res = native.remove_small_zones_host2(maps, 32)
    if res is None:
        pytest.skip("native lib unavailable")
    out, counts = res
    np.testing.assert_array_equal(counts[0], [0, 0, 0])  # 3s aren't 0/1/2
    assert out.shape == (1, 32, 32)

    # plain layout mismatch (w != shape[2]): graceful None, not OOB
    assert native.remove_small_zones_host2(maps, 64) is None
    # packed layout mismatch
    assert native.remove_small_zones_host2(maps, 64, packed=True) is None


def _write_bmp(path, rgb, bpp=24, top_down=False):
    """Hand-craft a BMP (24/32bpp, either row order) to exercise decoder
    paths PIL never writes."""
    import struct
    h, w = rgb.shape[:2]
    pix = bpp // 8
    stride = (w * pix + 3) & ~3
    data_off = 54
    size = data_off + stride * h
    hdr = b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
    hdr += struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                       1, bpp, 0, stride * h, 2835, 2835, 0, 0)
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        row = bytearray()
        for c in range(w):
            px = rgb[r, c]
            row += bytes([px[2], px[1], px[0]] +
                         ([255] if pix == 4 else []))
        row += b"\0" * (stride - len(row))
        rows.append(bytes(row))
    with open(path, "wb") as f:
        f.write(hdr + b"".join(rows))


@pytest.mark.parametrize("bpp,top_down", [(24, False), (24, True),
                                          (32, False), (32, True)])
def test_bmp_decode_variants(tmp_path, rng, bpp, top_down):
    rgb = (rng.random((11, 7, 3)) * 255).astype(np.uint8)
    path = str(tmp_path / f"v{bpp}{top_down}.bmp")
    _write_bmp(path, rgb, bpp=bpp, top_down=top_down)
    want = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(want, rgb)  # sanity: PIL agrees
    got = native.load_image_u8_fast(path)
    np.testing.assert_array_equal(got, rgb)
