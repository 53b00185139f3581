"""Smoke regression for the shipped examples/ demos (compile-heavy).

The demos are user-facing entry points that aren't imported anywhere
else, so they can silently bit-rot against API changes (round 2 caught
`odometry_demo` crashing on the TPU's missing f64 LU kernel). Each runs
end to end on CPU with its own tiny settings.
"""

import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
sys.path.insert(0, os.path.abspath(EXAMPLES))


@pytest.mark.heavy
def test_odometry_demo_runs():
    import odometry_demo

    # asserts ATE < 0.05 m internally (synthetic trajectory recovery)
    odometry_demo.main(["--cpu"])


@pytest.mark.heavy
def test_training_demo_runs(tmp_path):
    import training_demo

    out = str(tmp_path / "demo")
    results = training_demo.main(["--out", out, "--steps", "4",
                                  "--chain", "2"])
    assert np.isfinite(results["abs_rel"])
    train_dir = os.path.join(out, "train")
    assert os.path.exists(os.path.join(train_dir, "scalars.jsonl"))
    tb = [f for f in os.listdir(train_dir) if "tfevents" in f]
    assert tb, "no TensorBoard event file written"
    from deep_sfm_revisited_tpu.utils.tb_events import read_events

    evs = read_events(os.path.join(train_dir, tb[0]))
    assert any(e.get("tag") == "loss" for e in evs)


@pytest.mark.heavy
def test_two_view_demo_runs(tmp_path):
    import two_view_demo

    out = str(tmp_path / "demo")
    two_view_demo.main(["--cpu", "--nlabel", "8", "--out", out])
    assert os.path.exists(os.path.join(out, "flow.png"))
    assert os.path.exists(os.path.join(out, "depth.png"))
    # the flow visualization must be a real image, not all-zero
    from imageio.v2 import imread

    assert np.asarray(imread(os.path.join(out, "flow.png"))).std() > 0
