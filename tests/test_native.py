"""Native (C++) data-kernel tests: built library vs numpy fallback parity."""

import numpy as np
import pytest

from deep_sfm_revisited_tpu.data import native


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_velodyne_project_parity():
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.uniform(1, 40, (2000, 1)),      # x forward
         rng.uniform(-10, 10, (2000, 2)),
         np.ones((2000, 1))], axis=1
    ).astype(np.float32)
    P = np.array([[70.0, 0, 48, 0], [0, 70.0, 32, 0], [0, 0, 1, 0]])
    T = np.array([[0.0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0],
                  [0, 0, 0, 1.0]])
    M = P @ T
    got = native.velodyne_project_depth(pts, M, (64, 96))
    expect = native._project_np(pts.astype(np.float64), M, (64, 96))
    nz = expect > 0
    np.testing.assert_allclose(got[nz], expect[nz], rtol=1e-5)
    assert (got > 0).sum() == nz.sum()


def test_normalize_pad_parity():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    out = native.normalize_pad_u8(img, (64, 96))
    assert out.shape == (64, 96, 3)
    np.testing.assert_allclose(out[:60, :90],
                               img.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)
    # replicate padding
    np.testing.assert_allclose(out[63, 95], out[59, 89], atol=1e-6)


def test_depth_u16_parity():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 2**16 - 1, (60, 90), dtype=np.uint16)
    out = native.depth_u16_to_f32(img, (64, 96))
    np.testing.assert_allclose(out[:60, :90],
                               img.astype(np.float32) / 256.0, atol=1e-4)


# ---------------------------------------------------------------------
# libpng decode path (native/dsfm_native.cpp png_*). Fixtures are
# PIL-encoded in-memory PNGs; every decode must match imageio/PIL
# bit-for-bit so the fast path can transparently replace it in the
# KITTI loaders (kitti.py::_imread / load_depth_png).

def _png_bytes(arr):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_png_probe_and_rgb8_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    data = _png_bytes(img)
    assert native.png_probe(data) == (37, 53, 3, 8)
    dec = native.decode_png_rgb8(data)
    assert dec is not None and np.array_equal(dec, img)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_png_gray8_widens_to_rgb():
    rng = np.random.default_rng(4)
    g = rng.integers(0, 256, (21, 33), dtype=np.uint8)
    dec = native.decode_png_rgb8(_png_bytes(g))
    assert dec is not None and np.array_equal(dec, np.stack([g] * 3, -1))


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_png_gray16_exact():
    rng = np.random.default_rng(5)
    d16 = rng.integers(0, 2**16, (29, 41), dtype=np.uint16)
    data = _png_bytes(d16)
    assert native.png_probe(data) == (29, 41, 1, 16)
    dec = native.decode_png_gray16(data)
    assert dec is not None and np.array_equal(dec, d16)
    # the rgb8 entry narrows 16 -> 8 rather than failing
    rgb = native.decode_png_rgb8(data)
    assert rgb is not None and rgb.shape == (29, 41, 3)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_png_norm_pad_bit_exact_vs_python_path():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    got, raw_hw = native.decode_png_norm_pad(_png_bytes(img), pad_multiple=16)
    assert raw_hw == (37, 53)
    ref = img.astype(np.float32) / 127.5 - 1.0
    ref = np.pad(ref, ((0, 48 - 37), (0, 64 - 53), (0, 0)), mode="edge")
    assert got.shape == (48, 64, 3)
    assert np.array_equal(got, ref)  # bit-exact: same batches either path


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_png_garbage_returns_none():
    assert native.png_probe(b"not a png at all") is None
    assert native.decode_png_rgb8(b"\x89PNG\r\n\x1a\n truncated") is None
    # truncated-after-header stream must error out, not crash
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = _png_bytes(img)
    assert native.decode_png_rgb8(data[: len(data) // 2]) is None


def test_kitti_imread_uses_native_or_falls_back(tmp_path):
    """_imread / load_depth_png produce identical results either path."""
    from PIL import Image

    from deep_sfm_revisited_tpu.data.kitti import _imread, load_depth_png

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(img).save(p)
    assert np.array_equal(_imread(str(p)), img)

    d16 = rng.integers(0, 2**16, (19, 23), dtype=np.uint16)
    pd = tmp_path / "depth.png"
    Image.fromarray(d16).save(pd)
    out = load_depth_png(str(pd))
    np.testing.assert_array_equal(out, d16.astype(np.float32) / 256.0)
