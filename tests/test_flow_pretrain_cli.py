"""Flow-pretraining driver e2e: the runnable version of the reference's
MISSING flow_training.train_flow module (main.py:251 lazily imports it;
the file does not exist upstream — SURVEY.md §2.8).

CLI --train-flow over a synthetic KITTI-flow tree -> Orbax checkpoint ->
subtree restore into the SfM composite (--pretrained-flow semantics,
incl. the standalone-net checkpoint layout)."""

import os

import jax
import numpy as np
import pytest

from deep_sfm_revisited_tpu.config import SfMConfig


@pytest.fixture(scope="module")
def flow_root(tmp_path_factory):
    from PIL import Image

    from deep_sfm_revisited_tpu.data.flow_io import write_flow_kitti

    root = tmp_path_factory.mktemp("kitti_flow")
    tr = root / "training"
    (tr / "image_2").mkdir(parents=True)
    (tr / "flow_occ").mkdir()
    h, w = 40, 56
    rng = np.random.default_rng(0)
    for i in range(4):
        for suff in ("10", "11"):
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3), dtype=np.uint8),
            ).save(str(tr / "image_2" / f"{i:06d}_{suff}.png"))
        flow = rng.uniform(-3, 3, (h, w, 2)).astype(np.float32)
        write_flow_kitti(str(tr / "flow_occ" / f"{i:06d}_10.png"), flow,
                         np.ones((h, w), bool))
    return str(root)


def test_flow_pretrain_cli_and_subtree_restore(flow_root, tmp_path):
    from deep_sfm_revisited_tpu.cli import main
    from deep_sfm_revisited_tpu.train.checkpoint import restore_subtree
    from deep_sfm_revisited_tpu.train.trainer import create_train_state

    out = str(tmp_path / "flow_out")
    model, flow_state = main([
        "--data", flow_root, "--train-flow", "--flow-dataset", "kitti",
        "--flow-crop", "32", "48", "-b", "2", "--epochs", "1",
        "--workers", "1", "--out", out,
        "--override", "flow.raft_iters_train=2", "flow.raft_iters_eval=2",
    ])
    ckpt = os.path.join(out, "default_flow", "ckpt")
    assert os.path.isdir(ckpt)
    assert any(d for d in os.listdir(ckpt) if d != "model_best")

    # standalone flow checkpoint -> SfM composite flow_net subtree
    cfg = SfMConfig().override(**{
        "flow.raft_iters_train": 2, "flow.raft_iters_eval": 2,
        "depth.nlabel": 8, "pose.num_hypotheses": 8,
        "pose.ransac_iter": 1, "pose.num_correspondences": 64,
        "pose.polish_iters": 2,
    })
    _, sfm_state = create_train_state(cfg, jax.random.PRNGKey(7),
                                      sample_shape=(1, 32, 48))
    merged = restore_subtree(ckpt, sfm_state, "flow_net")

    got = jax.tree_util.tree_leaves(merged.params["flow_net"])
    want = jax.tree_util.tree_leaves(flow_state.params)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # other subtrees untouched
    for a, b in zip(jax.tree_util.tree_leaves(merged.params["depth_net"]),
                    jax.tree_util.tree_leaves(sfm_state.params["depth_net"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
