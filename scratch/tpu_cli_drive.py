"""Full product drive on the REAL TPU chip: miniature KITTI-VO tree ->
cli.main train epoch -> validate with restore -> record-pose.
Same drive as tests/test_cli_e2e.py but WITHOUT the CPU conftest override,
so every jitted step (train, eval, pose) compiles and runs on the chip,
and the loader exercises the native libpng decode path."""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
from imageio.v2 import imwrite

root = tempfile.mkdtemp(prefix="kitti_vo_tpu_")
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
        pose = np.concatenate([np.eye(3), [[0.05*i], [0.0], [0.6*i]]], axis=1)
        poses.append(pose.reshape(-1))
    np.savetxt(os.path.join(root, "poses", f"{seq:02d}.txt"), np.stack(poses))
    with open(os.path.join(root, "sequences", f"{seq:02d}", "calib.txt"), "w") as f:
        f.write("P2: 70 0 48 0 0 70 32 0 0 0 1 0\n")

from deep_sfm_revisited_tpu.data import native
print("native decode available:", native.available(), flush=True)

from deep_sfm_revisited_tpu.cli import main
TINY = ["--override",
        "flow.raft_iters_train=2", "flow.raft_iters_eval=2",
        "depth.nlabel=8", "pose.num_hypotheses=8", "pose.ransac_iter=1",
        "pose.num_correspondences=64", "pose.polish_iters=2",
        "data.val_size=(64,96)", "data.pad_multiple=16"]
out = os.path.join(root, "out")
import jax
print("backend:", jax.default_backend(), jax.devices(), flush=True)

main(["--data", root, "--dataset", "kitti_vo", "-b", "2", "--epochs", "1",
      "--out", out, "--workers", "2", *TINY, "data.train_size=(48,80)",
      "train.print_freq=1"])
ckpt = os.path.join(out, "default", "ckpt")
assert "model_best" in os.listdir(ckpt), "no checkpoint written"
print("TRAIN EPOCH ON TPU OK", flush=True)

res = main(["--data", root, "--dataset", "kitti_vo", "-v",
            "--pretrained", ckpt, "--out", out, "--workers", "2", *TINY])
assert np.isfinite(res["abs_rel"])
print("VALIDATE ON TPU OK abs_rel=%.4f" % res["abs_rel"], flush=True)

res = main(["--data", root, "--dataset", "kitti_vo", "--record-pose",
            "--workers", "2", *TINY])
assert np.isfinite(res["rot_err"])
print("RECORD-POSE ON TPU OK rot_err=%.4f" % res["rot_err"], flush=True)
print("TPU CLI DRIVE: ALL OK", flush=True)
