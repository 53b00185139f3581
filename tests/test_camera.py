"""Unit tests for ops/camera.py (ref `models/inverse_warp.py` semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.ops import camera as cam
from deep_sfm_revisited_tpu.ops import rotations as rot

F32 = jnp.float32


def make_K(b, f=100.0, cx=32.0, cy=24.0):
    K = jnp.asarray(
        [[f, 0.0, cx], [0.0, f, cy], [0.0, 0.0, 1.0]], F32
    )
    return jnp.broadcast_to(K, (b, 3, 3)), jnp.broadcast_to(jnp.linalg.inv(K), (b, 3, 3))


def test_pixel_grid():
    g = cam.pixel_grid(3, 4)
    assert g.shape == (3, 3, 4)
    np.testing.assert_allclose(g[0, 0], [0, 1, 2, 3])  # u = x/col
    np.testing.assert_allclose(g[1, :, 0], [0, 1, 2])  # v = y/row
    np.testing.assert_allclose(g[2], 1.0)


def test_pixel2cam_cam2pixel_roundtrip():
    b, h, w = 2, 48, 64
    K, K_inv = make_K(b)
    depth = jnp.full((b, h, w), 5.0, F32)
    pts = cam.pixel2cam(depth, K_inv)
    assert pts.shape == (b, 3, h, w)
    # identity pose: project back to the original pixels (proj = K @ [I|0],
    # as SFMnet passes intrinsics.bmm(pose), models/inverse_warp.py:116)
    coords = cam.cam2pixel(pts, K, jnp.zeros((b, 3, 1), F32))
    grid = jnp.moveaxis(cam.pixel_grid(h, w), 0, -1)[..., :2]
    np.testing.assert_allclose(coords, jnp.broadcast_to(grid, coords.shape), atol=1e-3)


def test_bilinear_sample_identity_and_interp():
    img = jnp.arange(2 * 4 * 5 * 3, dtype=F32).reshape(2, 4, 5, 3)
    h, w = 4, 5
    grid = jnp.moveaxis(cam.pixel_grid(h, w), 0, -1)[..., :2]
    coords = jnp.broadcast_to(grid[None], (2, h, w, 2))
    out = cam.bilinear_sample(img, coords)
    np.testing.assert_allclose(out, img, atol=1e-5)
    # halfway between (0,0) and (1,0) in x
    c = jnp.array([[[0.5, 0.0]]], F32)
    c = jnp.broadcast_to(c, (2, 1, 2))
    v = cam.bilinear_sample(img, c)
    expect = (img[:, 0, 0] + img[:, 0, 1]) / 2
    np.testing.assert_allclose(v[:, 0], expect, atol=1e-5)
    # out of range -> zeros
    c = jnp.broadcast_to(jnp.array([[[-1.5, 0.0]]], F32), (2, 1, 2))
    np.testing.assert_allclose(cam.bilinear_sample(img, c)[:, 0], 0.0)


def test_inverse_warp_identity():
    b, h, w = 1, 32, 40
    K, K_inv = make_K(b)
    img = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), F32)
    depth = jnp.full((b, h, w), 4.0, F32)
    pose = jnp.concatenate([jnp.eye(3, dtype=F32), jnp.zeros((3, 1), F32)], 1)[None]
    out = cam.inverse_warp(img, depth, pose, K, K_inv)
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_pose2flow_translation():
    """Pure x-translation: flow = -f*tx/z when pose maps ref->target."""
    b, h, w = 1, 32, 40
    f = 100.0
    K, K_inv = make_K(b, f=f)
    z = 5.0
    depth = jnp.full((b, h, w), z, F32)
    tx = 0.5
    pose = jnp.concatenate(
        [jnp.eye(3, dtype=F32), jnp.array([[tx], [0.0], [0.0]], F32)], 1
    )[None]
    flow = cam.pose2flow(depth, pose, K, K_inv)
    np.testing.assert_allclose(flow[..., 0], f * tx / z, atol=1e-3)
    np.testing.assert_allclose(flow[..., 1], 0.0, atol=1e-3)


def test_plane_sweep_matches_per_plane_inverse_warp():
    b, h, w, c = 2, 24, 32, 8
    K, K_inv = make_K(b, f=60.0, cx=16.0, cy=12.0)
    key = jax.random.PRNGKey(1)
    feat = jax.random.uniform(key, (b, h, w, c), F32)
    angles = jnp.array([0.02, -0.01, 0.03], F32)
    R = rot.angle_to_matrix(angles).astype(F32)
    t = jnp.array([0.3, 0.1, -0.05], F32)
    pose = jnp.broadcast_to(jnp.concatenate([R, t[:, None]], 1), (b, 3, 4))
    depths = jnp.array([2.0, 4.0, 8.0], F32)
    vol = cam.plane_sweep_warp(feat, depths, pose, K, K_inv)
    assert vol.shape == (b, 3, h, w, c)
    for i, d in enumerate(depths):
        per = cam.inverse_warp(feat, jnp.full((b, h, w), d, F32), pose, K, K_inv)
        np.testing.assert_allclose(vol[:, i], per, atol=1e-4)


def test_bilinear_sample_pallas_matches_xla_interpret():
    """Mosaic warp kernel ≡ the XLA quad-gather, incl. borders/out-of-range.

    Interpret mode (CPU); the on-device equivalence at the flagship shape
    is checked in scratch/warp_kernel_ablate.py.
    """
    from deep_sfm_revisited_tpu.ops.pallas.sweep_warp import (
        bilinear_sample_pallas,
    )

    b, h, w, c = 2, 12, 20, 32
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    img = jax.random.normal(k1, (b, h, w, c), F32)
    coords = jax.random.uniform(k2, (b, 5, 7, 9, 2), F32, -3.0, 1.0)
    coords = coords * jnp.array([w + 4, h + 4], F32)  # spans out-of-range
    ref = cam.bilinear_sample(img, coords)
    got = bilinear_sample_pallas(img, coords, tile=128, interpret=True)
    # ulp-level only: the kernel contracts the same fma chain differently
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-7)

    imgb = img.astype(jnp.bfloat16)
    refb = cam.bilinear_sample(imgb, coords)
    gotb = bilinear_sample_pallas(imgb, coords, tile=128, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(gotb, np.float32), np.asarray(refb, np.float32)
    )
