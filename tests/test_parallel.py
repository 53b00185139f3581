"""Mesh/sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_sfm_revisited_tpu.config import MeshConfig
from deep_sfm_revisited_tpu.parallel.mesh import (
    batch_sharding,
    hyp_sharding,
    make_mesh,
    shard_batch,
)


def test_make_mesh_shapes():
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    mesh_all = make_mesh(MeshConfig())  # all devices on data
    assert mesh_all.devices.shape == (8, 1)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(MeshConfig(data_parallel=8))
    batch = {"x": np.ones((8, 4, 4), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.is_equivalent_to(
        batch_sharding(mesh), ndim=3
    )


def test_sharded_ransac_matches_unsharded():
    """Hypothesis-axis sharding must not change the RANSAC result: the
    winner argmax is a deterministic reduction over the same candidates."""
    from deep_sfm_revisited_tpu.ops import essential as ess
    from tests.test_essential import make_scene

    x1, x2, R, t, E_true = make_scene(jax.random.PRNGKey(0), n_points=128,
                                      noise=5e-4)
    x1b, x2b = x1[None], x2[None]
    key = jax.random.PRNGKey(1)

    base = ess.ransac_pose(x1b, x2b, key, num_hypotheses=32, ransac_iter=1,
                           polish=False)

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=8))
    sh = NamedSharding(mesh, P("data", "model"))
    sharded = jax.jit(
        lambda a, b, k: ess.ransac_pose(
            a, b, k, num_hypotheses=32, ransac_iter=1, polish=False,
            hyp_sharding=sh,
        )
    )(x1b, x2b, key)

    np.testing.assert_allclose(np.asarray(sharded["E"]),
                               np.asarray(base["E"]), atol=1e-12)
    assert int(sharded["inliers"][0]) == int(base["inliers"][0])


@pytest.mark.heavy
def test_dryrun_multichip():
    """The driver's sharded-train-step entry point (also run by the
    harness with N virtual devices)."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)
