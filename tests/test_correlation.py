"""Tests for correlation layers and PWC-Net."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.config import FlowConfig
from deep_sfm_revisited_tpu.ops.correlation import (
    epipolar_correlation,
    local_correlation,
)

F32 = jnp.float32


def test_local_correlation_displacement_semantics():
    """Delta responses land on the channel of their true displacement
    (channel = (dy+md)*(2md+1) + (dx+md), the reference's loop order)."""
    for dy, dx in ((0, 0), (0, 1), (1, 0), (-1, 1)):
        f0 = jnp.zeros((1, 7, 9, 2)).at[0, 3, 4].set(1.0)
        f1 = jnp.zeros((1, 7, 9, 2)).at[0, 3 + dy, 4 + dx].set(1.0)
        corr = local_correlation(f0, f1, md=2)
        assert corr.shape == (1, 7, 9, 25)
        chan = int(jnp.argmax(corr[0, 3, 4]))
        assert chan == (dy + 2) * 5 + (dx + 2), (dy, dx, chan)
        np.testing.assert_allclose(float(corr[0, 3, 4, chan]), 2 / 2)


def test_local_correlation_normalization_and_border():
    f = jnp.ones((1, 6, 6, 8), F32)
    corr = local_correlation(f, f, md=1)
    # interior full-overlap channels equal 1 (sum over C / C)
    np.testing.assert_allclose(corr[0, 2, 2], 1.0, atol=1e-6)
    # out-of-image displacements contribute zero at the border
    assert float(corr[0, 0, 0, 0]) == 0.0  # (dy=-1, dx=-1) off image


def test_epipolar_correlation_shapes():
    from deep_sfm_revisited_tpu.ops.rotations import angle_to_matrix

    b, h, w, c = 1, 24, 32, 8
    f = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, c), F32)
    K = jnp.asarray([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]], F32)[None]
    K_inv = jnp.linalg.inv(K)
    R = angle_to_matrix(jnp.asarray([0.01, 0.02, 0.0])).astype(F32)
    t = jnp.asarray([0.5, 0.0, 0.1], F32)
    pose = jnp.concatenate([R, t[:, None]], 1)[None]
    flow = jnp.zeros((b, h, w, 2), F32)
    out = epipolar_correlation(f, f, pose, K, K_inv, flow,
                               para_offsets=(-2, -1, 0, 1, 2),
                               perp_offsets=(-1, 0, 1))
    assert out.shape == (b, h, w, 2 + 2 + 15)
    assert bool(jnp.all(jnp.isfinite(out)))
    # para_dir is unit length
    norms = jnp.linalg.norm(out[..., 2:4], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_pwcnet_forward():
    from deep_sfm_revisited_tpu.models.pwcnet import PWCDCNet

    m = PWCDCNet(FlowConfig(estimator="PWC"))
    b, h, w = 1, 64, 128
    pair = jax.random.uniform(jax.random.PRNGKey(3), (b, h, w, 6), F32, -1, 1)
    params = m.init(jax.random.PRNGKey(4), pair)
    flow, conf = m.apply(params, pair)
    assert flow.shape == (b, h, w, 2)
    assert conf is None
    assert bool(jnp.all(jnp.isfinite(flow)))
    stack, _ = m.apply(params, pair, all_iters=True)
    assert stack.shape == (5, b, h, w, 2)


def test_pallas_local_correlation_matches_xla():
    """Pallas windowed-correlation kernel (interpret mode) vs reference."""
    from deep_sfm_revisited_tpu.ops.pallas.local_corr import (
        local_correlation_pallas,
    )

    f0 = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 32, 8), F32)
    f1 = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 32, 8), F32)
    ref = local_correlation(f0, f1, md=2)
    got = local_correlation_pallas(f0, f1, 2, 4, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
