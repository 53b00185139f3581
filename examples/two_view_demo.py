"""Two-view SfM demo: a frame pair in, (flow, pose, depth) out.

    python examples/two_view_demo.py --out /tmp/demo           # synthetic
    python examples/two_view_demo.py --ref a.png --target b.png \
        --fx 718.856 --cx 607.19 --cy 185.2 --out /tmp/demo

Writes flow.png (Middlebury colors), depth.png (colormap), and prints the
estimated relative pose. With --synthetic the pair is generated from a
known camera motion so the printed pose can be compared to ground truth.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# runnable from any cwd: the repo root is one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_pair(h=256, w=512, f=200.0, seed=0):
    """Textured fronto-parallel scene viewed from two known poses."""
    import jax
    import jax.numpy as jnp

    from deep_sfm_revisited_tpu.ops import (
        angle_to_matrix,
        inverse_warp,
        pose2flow,
    )

    rng = np.random.default_rng(seed)
    # smooth random texture
    small = rng.uniform(-1, 1, (h // 8, w // 8, 3)).astype(np.float32)
    from deep_sfm_revisited_tpu.models.submodules import resize_bilinear

    ref = np.asarray(resize_bilinear(jnp.asarray(small)[None], (h, w))[0])

    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32)
    R = np.asarray(angle_to_matrix(jnp.asarray([0.02, -0.03, 0.01])))
    t = np.array([0.5, 0.1, 0.2])
    t = t / np.linalg.norm(t)
    pose = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)

    depth = 6.0 + 2.0 * rng.standard_normal((h, w)).astype(np.float32).clip(-1, 1)
    # target = ref warped by the inverse motion (view synthesis)
    import jax.numpy as jnp

    Kb = jnp.asarray(K)[None]
    Ki = jnp.linalg.inv(Kb)
    target = np.asarray(
        inverse_warp(jnp.asarray(ref)[None], jnp.asarray(depth)[None],
                     jnp.asarray(pose)[None], Kb, Ki)[0]
    )
    return ref, target, K, pose


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ref")
    p.add_argument("--target")
    p.add_argument("--fx", type=float, default=718.856)
    p.add_argument("--cx", type=float, default=None)
    p.add_argument("--cy", type=float, default=None)
    p.add_argument("--nlabel", type=int, default=32)
    p.add_argument("--out", default="demo_out")
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU (remote TPU compile can be slow)")
    p.add_argument("--pretrained", default=None,
                   help="checkpoint dir (train/checkpoint.py layout)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deep_sfm_revisited_tpu.config import SfMConfig
    from deep_sfm_revisited_tpu.models import SFMNet
    from deep_sfm_revisited_tpu.ops.rotations import pose_to_rt
    from deep_sfm_revisited_tpu.utils.viz import depth_to_colormap, flow_to_rgb

    gt_pose = None
    if args.ref and args.target:
        from imageio.v2 import imread

        ref = np.asarray(imread(args.ref), np.float32)[..., :3] / 127.5 - 1
        target = np.asarray(imread(args.target), np.float32)[..., :3] / 127.5 - 1
        h, w = ref.shape[:2]
        K = np.array(
            [[args.fx, 0, args.cx or w / 2],
             [0, args.fx, args.cy or h / 2],
             [0, 0, 1]], np.float32,
        )
    else:
        ref, target, K, gt_pose = synthetic_pair()

    # pad to /64 for the flow pyramid
    from deep_sfm_revisited_tpu.data.loader import pad_to_multiple

    h0, w0 = ref.shape[:2]
    ref_p = pad_to_multiple(ref, 64)[None]
    tgt_p = pad_to_multiple(target, 64)[None]

    cfg = SfMConfig().override(**{
        "depth.nlabel": args.nlabel,
        "flow.raft_iters_eval": 8,
        "pose.num_hypotheses": 256,
        "pose.ransac_iter": 1,
        "pose.num_correspondences": 512,
    })
    model = SFMNet(cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    Kb = jnp.asarray(K)[None]
    variables = jax.jit(
        lambda r, t, k: model.init(jax.random.PRNGKey(1), r, t, k, key=key)
    )(jnp.asarray(ref_p), jnp.asarray(tgt_p), Kb)
    if args.pretrained:
        from deep_sfm_revisited_tpu.train.checkpoint import restore_params

        variables = restore_params(args.pretrained)
    else:
        print("note: random-initialized weights — flow/pose/depth are "
              "structurally valid but not accurate; pass --pretrained for "
              "meaningful estimates")
    out = jax.jit(
        lambda v, r, t, k: model.apply(v, r, t, k, key=key)
    )(variables, jnp.asarray(ref_p), jnp.asarray(tgt_p), Kb)

    os.makedirs(args.out, exist_ok=True)
    from imageio.v2 import imwrite

    flow = np.asarray(out["flow"])[0, :h0, :w0]
    depth = np.asarray(out["depth"])[0, :h0, :w0]
    imwrite(os.path.join(args.out, "flow.png"), flow_to_rgb(flow))
    imwrite(os.path.join(args.out, "depth.png"),
            depth_to_colormap(depth, max_value=float(depth.max())))

    rt = np.asarray(pose_to_rt(out["pose"]))[0]
    print("estimated pose (rx, ry, rz, tx, ty, tz):", np.round(rt, 4))
    if gt_pose is not None:
        gt_rt = np.asarray(pose_to_rt(jnp.asarray(gt_pose)[None]))[0]
        print("ground-truth pose:                    ", np.round(gt_rt, 4))
    print(f"wrote {args.out}/flow.png and {args.out}/depth.png")


if __name__ == "__main__":
    main()
