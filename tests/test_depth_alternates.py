"""Forward tests for PANet/REGNet/REG2D/DISPNET/CVPMVS depth estimators."""

import jax
import jax.numpy as jnp
import pytest

from deep_sfm_revisited_tpu.config import DepthConfig

F32 = jnp.float32


def _inputs(b=1, h=64, w=96):
    ref = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3), F32, -1, 1)
    tgt = jnp.roll(ref, 2, axis=2)[:, None]
    pose = jnp.concatenate(
        [jnp.eye(3, dtype=F32), jnp.asarray([[0.4], [0.0], [0.1]], F32)], 1
    )[None, None]
    pose = jnp.broadcast_to(pose, (b, 1, 3, 4))
    K = jnp.broadcast_to(
        jnp.asarray([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], F32),
        (b, 3, 3),
    )
    return ref, tgt, pose, K, jnp.linalg.inv(K)


@pytest.mark.parametrize(
    "name",
    ["REG2D", "CVP",
     pytest.param("PANET", marks=pytest.mark.heavy),
     pytest.param("REGNET", marks=pytest.mark.heavy),
     pytest.param("DISPNET", marks=pytest.mark.heavy)],
)
def test_alternate_depth_forward(name):
    cfg = DepthConfig(estimator=name, nlabel=8, min_depth=1.0,
                      scale_min=0.8, scale_max=1.2, scale_step=0.2)
    if name == "PANET":
        from deep_sfm_revisited_tpu.models.depth_alternates import PANet as M
    elif name == "REGNET":
        from deep_sfm_revisited_tpu.models.depth_alternates import REGNet as M
    elif name == "REG2D":
        from deep_sfm_revisited_tpu.models.depth_alternates import REG2D as M
    elif name == "DISPNET":
        from deep_sfm_revisited_tpu.models.depth_alternates import DISPNET as M
    else:
        from deep_sfm_revisited_tpu.models.cvpmvs import CVPMVS as M

    m = M(cfg)
    ref, tgt, pose, K, Ki = _inputs()
    params = m.init(jax.random.PRNGKey(1), ref, tgt, pose, K, Ki)
    d_init, d = m.apply(params, ref, tgt, pose, K, Ki)
    assert d.shape == ref.shape[:3]
    assert bool(jnp.all(jnp.isfinite(d)))
    if d_init is not None:
        assert d_init.shape == ref.shape[:3]
        assert bool(jnp.all(jnp.isfinite(d_init)))
