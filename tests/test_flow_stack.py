"""Flow I/O round-trips, augmentors, datasets, flow-eval, pose variants."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_sfm_revisited_tpu.data import flow_io
from deep_sfm_revisited_tpu.data.flow_augment import (
    FlowAugmentor,
    SparseFlowAugmentor,
)


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).normal(size=(32, 48, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    flow_io.write_flo(p, flow)
    np.testing.assert_allclose(flow_io.read_flo(p), flow)


def test_pfm_roundtrip(tmp_path):
    data = np.random.default_rng(1).normal(size=(24, 36)).astype(np.float32)
    p = str(tmp_path / "a.pfm")
    flow_io.write_pfm(p, data)
    out, scale = flow_io.read_pfm(p)
    np.testing.assert_allclose(out, data)


def test_kitti_flow_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    flow = rng.uniform(-30, 30, (32, 48, 2)).astype(np.float32)
    valid = rng.random((32, 48)) > 0.3
    flow[~valid] = 0
    p = str(tmp_path / "f.png")
    flow_io.write_flow_kitti(p, flow, valid)
    f2, v2 = flow_io.read_flow_kitti(p)
    np.testing.assert_array_equal(v2, valid)
    np.testing.assert_allclose(f2[valid], flow[valid], atol=1 / 64)


def test_dense_augmentor_shapes():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (100, 140, 3)).astype(np.float32)
    flow = rng.normal(size=(100, 140, 2)).astype(np.float32)
    aug = FlowAugmentor((64, 96))
    i1, i2, f = aug(img, img.copy(), flow, rng)
    assert i1.shape == (64, 96, 3) and f.shape == (64, 96, 2)


def test_sparse_augmentor_preserves_validity():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (100, 140, 3)).astype(np.float32)
    flow = rng.normal(size=(100, 140, 2)).astype(np.float32)
    valid = rng.random((100, 140)) > 0.5
    aug = SparseFlowAugmentor((64, 96))
    i1, i2, f, v = aug(img, img.copy(), flow, valid, rng)
    assert v.dtype == bool and v.shape == (64, 96)
    # invalid positions carry zero flow
    np.testing.assert_allclose(f[~v], 0.0)


def test_flow_eval_perfect_flow(tmp_path):
    """evaluate_flow_dataset: a forward that returns GT scores EPE 0."""
    from deep_sfm_revisited_tpu.train.flow_eval import evaluate_flow_dataset

    rng = np.random.default_rng(5)

    class Fake:
        def __init__(self):
            self.items = [
                {
                    "ref": rng.uniform(-1, 1, (64, 96, 3)).astype(np.float32),
                    "target": rng.uniform(-1, 1, (64, 96, 3)).astype(np.float32),
                    "flow_gt": rng.normal(size=(64, 96, 2)).astype(np.float32),
                    "flow_valid": np.ones((64, 96), bool),
                }
                for _ in range(2)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]

    ds = Fake()
    gt = {i: ds.items[i]["flow_gt"] for i in range(2)}
    calls = {"i": 0}

    def forward(pair):
        out = gt[calls["i"]][None]
        calls["i"] += 1
        h, w = pair.shape[1:3]
        pad = np.zeros((1, h, w, 2), np.float32)
        pad[:, :64, :96] = out
        return jnp.asarray(pad)

    res = evaluate_flow_dataset(forward, ds, pad_multiple=32)
    assert res["epe"] < 1e-6
    assert res["f1_all"] == 0.0


def test_resnet_pose_variant():
    from deep_sfm_revisited_tpu.models.posenet import ResNetPose

    m = ResNetPose()
    flow = jnp.zeros((1, 64, 96, 2))
    ref = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 96, 3))
    p = m.init(jax.random.PRNGKey(1), flow, ref, ref)
    out = m.apply(p, flow, ref, ref)
    assert out.shape == (1, 6)
    np.testing.assert_allclose(float(jnp.linalg.norm(out[0, 3:])), 1.0,
                               atol=1e-5)


def test_active_stereo():
    from deep_sfm_revisited_tpu.models.activestereo import ActiveStereoNet

    m = ActiveStereoNet(maxdisp=32)
    l = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 96, 3))
    r = jnp.roll(l, 3, axis=2)
    p = m.init(jax.random.PRNGKey(1), l, r)
    disp, inv = m.apply(p, l, r)
    assert disp.shape == (1, 64, 96)
    assert bool(jnp.all(jnp.isfinite(disp)))


@pytest.mark.heavy
def test_flow_trainer_step_descends():
    """Supervised flow pretraining step (train/flow_trainer.py): loss and
    EPE finite, parameters update."""
    from deep_sfm_revisited_tpu.config import FlowConfig
    from deep_sfm_revisited_tpu.train.flow_trainer import (
        create_flow_state,
        make_flow_train_step,
    )

    cfg = FlowConfig(estimator="RAFT", raft_iters_train=2, raft_iters_eval=2)
    model, state = create_flow_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(1, 64, 96),
        total_steps=10, dtype=jnp.float32,
    )
    step = make_flow_train_step(model, cfg)
    rng = np.random.default_rng(0)
    batch = {
        "ref": jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)), jnp.float32),
        "target": jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)),
                              jnp.float32),
        "flow_gt": jnp.asarray(rng.normal(size=(1, 64, 96, 2)), jnp.float32),
        "flow_valid": jnp.ones((1, 64, 96), bool),
    }
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["epe"]))
    assert not np.array_equal(jax.tree_util.tree_leaves(state2.params)[0], p0)
