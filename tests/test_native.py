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
