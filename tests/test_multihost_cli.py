"""Two-process end-to-end DRIVER run: cli.main train + validate under
jax.distributed on CPU (the single-machine stand-in for a 2-host pod).

Round 1 tested the multihost library pieces; this drives the actual CLI:
each process joins the job, strides its loader shard, trains one epoch
over a 2-device global mesh with global-batch assembly, process 0 writes
the checkpoint, and the standalone validate path cross-host-reduces to
identical metrics on both hosts.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np

coord, nproc, pid, root, out = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])

import jax
jax.config.update("jax_platforms", "cpu")

# join BEFORE the backend is touched; cli.main would also do this, but
# the coordinator address must come from argv here
from deep_sfm_revisited_tpu.parallel import multihost
multihost.initialize(coordinator=coord, num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc

from deep_sfm_revisited_tpu.cli import main

TINY = ["--override",
        "flow.raft_iters_train=2", "flow.raft_iters_eval=2",
        "depth.nlabel=8", "pose.num_hypotheses=8", "pose.ransac_iter=1",
        "pose.num_correspondences=64", "pose.polish_iters=2",
        "data.val_size=(64,96)", "data.pad_multiple=16"]

# global batch 2 -> local batch 1 per process
main(["--data", root, "--dataset", "kitti_vo", "-b", "2", "--epochs", "1",
      "--out", out, "--workers", "1", *TINY, "data.train_size=(48,80)",
      "train.print_freq=1"])

ckpt = os.path.join(out, "default", "ckpt")
if pid == 0:
    assert "model_best" in os.listdir(ckpt), os.listdir(ckpt)

res = main(["--data", root, "--dataset", "kitti_vo", "-v",
            "--pretrained", ckpt, "--out", out, "--workers", "1", *TINY])
assert np.isfinite(res["abs_rel"]), res
print(f"proc {pid}: OK abs_rel={res['abs_rel']:.6f}")
"""


def _mini_vo_tree(root):
    from imageio.v2 import imwrite

    rng = np.random.default_rng(0)
    for seq in (0, 9):
        img_dir = os.path.join(root, "sequences", f"{seq:02d}", "image_2")
        os.makedirs(img_dir)
        depth_dir = os.path.join(root, "RealDepth", f"{seq:02d}", "velodyne")
        os.makedirs(depth_dir)
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)
        poses = []
        for i in range(6):
            imwrite(os.path.join(img_dir, f"{i:06d}.png"),
                    rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
            imwrite(os.path.join(depth_dir, f"{i:06d}.png"),
                    (rng.uniform(2, 7, (64, 96)) * 256).astype(np.uint16))
            pose = np.concatenate(
                [np.eye(3), [[0.05 * i], [0.0], [0.6 * i]]], axis=1)
            poses.append(pose.reshape(-1))
        np.savetxt(os.path.join(root, "poses", f"{seq:02d}.txt"),
                   np.stack(poses))
        with open(os.path.join(root, "sequences", f"{seq:02d}",
                               "calib.txt"), "w") as f:
            f.write("P2: 70 0 48 0 0 70 32 0 0 0 1 0\n")


@pytest.mark.heavy
def test_two_process_cli_train_validate(tmp_path):
    root = str(tmp_path / "kitti")
    os.makedirs(root)
    _mini_vo_tree(root)
    out = str(tmp_path / "out")

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(i), root, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=1500)
        outs.append(stdout)
    for i, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{stdout[-4000:]}"
        assert f"proc {i}: OK" in stdout, stdout[-2000:]
    # cross-host reduction: both processes must report the SAME
    # full-eval-set abs_rel even though each only ran its shard
    vals = [s.split("abs_rel=")[1].split()[0] for s in outs]
    assert vals[0] == vals[1], vals
