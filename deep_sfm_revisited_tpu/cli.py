"""Command-line driver.

Rebuild of the reference CLI (`main.py:66-115` argparse surface): the
same run-shape flags (--data, --cfg, -b/--batch-size, --lr, --nlabel,
-v/--validate, --fix-flownet, --fix-depthnet, --pretrained,
--epochs, ...) on top of the typed config system (config.py), plus
`--override k=v` dotted-key overrides replacing `cfg_from_list`.

Usage:
  python -m deep_sfm_revisited_tpu.cli --data /path/KITTI --cfg kitti -b 32
  python -m deep_sfm_revisited_tpu.cli --data /path/KITTI -v --pretrained out/ckpt
"""

from __future__ import annotations

import argparse
import ast


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native Deep-SfM: two-view flow + pose + depth"
    )
    p.add_argument("--data", required=True, help="dataset root")
    p.add_argument("--cfg", default=None,
                   help="'kitti' for the builtin recipe, or a YAML path")
    p.add_argument("--dataset", default=None,
                   choices=[None, "kitti_raw", "kitti_vo"])
    p.add_argument("-b", "--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--nlabel", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("-v", "--validate", action="store_true")
    p.add_argument("--fix-flownet", action="store_true")
    p.add_argument("--fix-depthnet", action="store_true")
    p.add_argument("--pretrained", default=None,
                   help="checkpoint dir to restore")
    p.add_argument("--pretrained-flow", default=None)
    p.add_argument("--pretrained-depth", default=None)
    p.add_argument("--pretrained-torch", default=None,
                   help="reference .pth.tar checkpoint to port "
                        "(utils/torch_port; ≙ main.py:200-242 loading)")
    p.add_argument("--gt-depth-dir", default=None)
    p.add_argument("--train-flow", action="store_true",
                   help="flow-pretraining mode over a flow benchmark "
                        "(the reference's cfg.TRAIN_FLOW path whose "
                        "flow_training module is missing upstream, "
                        "SURVEY.md §2.8)")
    p.add_argument("--flow-dataset", default="kitti",
                   choices=["chairs", "things", "sintel", "kitti", "hd1k"])
    p.add_argument("--flow-crop", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="override the flow augmentor crop size")
    p.add_argument("--record-pose", action="store_true",
                   help="evaluate pose errors only (≙ cfg.RECORD_POSE "
                        "branch of validate, main.py:504-530)")
    p.add_argument("--save-pose", action="store_true",
                   help="save per-pair predicted poses into the dataset "
                        "tree for later pred_pose_online=False training "
                        "(≙ save_pose, main.py:636-703)")
    p.add_argument("--out", default="output")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--override", nargs="*", default=[],
                   metavar="KEY=VALUE",
                   help="dotted config overrides, e.g. pose.ransac_iter=3")
    return p


def config_from_args(args):
    from deep_sfm_revisited_tpu.config import SfMConfig, config_from_yaml

    if args.cfg == "kitti":
        cfg = SfMConfig.kitti(nlabel=args.nlabel or 128)
    elif args.cfg:
        cfg = config_from_yaml(args.cfg)
    else:
        cfg = SfMConfig()

    over = {}
    if args.batch_size is not None:
        over["train.batch_size"] = args.batch_size
    if args.lr is not None:
        over["train.lr"] = args.lr
    if args.nlabel is not None:
        over["depth.nlabel"] = args.nlabel
    if args.epochs is not None:
        over["train.epochs"] = args.epochs
    if args.dataset is not None:
        over["data.dataset"] = args.dataset
    if args.fix_flownet:
        over["train.fix_flownet"] = True
    if args.fix_depthnet:
        over["train.fix_depthnet"] = True
    if args.workers:
        over["data.workers"] = args.workers
    for kv in args.override:
        k, v = kv.split("=", 1)
        try:
            over[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            over[k] = v
    return cfg.override(**over)


def build_loaders(cfg, args, shard_id: int = 0, num_shards: int = 1):
    from deep_sfm_revisited_tpu.data import (
        BatchLoader,
        Compose,
        KittiRawDataset,
        KittiVODataset,
        Normalize,
        RandomCrop,
    )
    from deep_sfm_revisited_tpu.data.transforms import (
        CenterCrop,
        ColorJitter,
        RandomHorizontalFlip,
        RandomZoom,
    )

    train_tf = Compose(
        ([RandomZoom()] if cfg.data.zoom_input else [])
        + [RandomCrop(cfg.data.train_size)]
        + ([RandomHorizontalFlip()] if cfg.data.flip_aug else [])
        + [ColorJitter(), Normalize()]
    )
    val_tf = Compose([Normalize()])

    if cfg.data.dataset == "kitti_vo":
        train_ds = KittiVODataset(args.data, train=True, skip=cfg.data.skip,
                                  transform=train_tf)
        val_ds = KittiVODataset(args.data, train=False, transform=val_tf)
    else:
        train_ds = KittiRawDataset(
            args.data, train=True, gt_depth_dir=args.gt_depth_dir,
            transform=train_tf,
            random_offset=cfg.data.random_offset,
            random_fw_bw=cfg.data.random_fw_bw,
        )
        val_ds = KittiRawDataset(
            args.data, train=False, kitti_697=cfg.data.kitti_697,
            gt_depth_dir=args.gt_depth_dir, transform=val_tf,
            eigen_sfm=cfg.data.eigen_sfm,
            filtered_pair=cfg.data.filtered_pair,
        )
    # multi-host: batch_size is the GLOBAL batch; each process loads its
    # 1/num_shards stride and multihost.global_batch assembles the rest
    local_b = cfg.train.batch_size
    if num_shards > 1:
        assert local_b % num_shards == 0, (
            f"global batch {local_b} not divisible by {num_shards} hosts")
        local_b //= num_shards
    train_loader = BatchLoader(
        train_ds, local_b, workers=cfg.data.workers,
        pad_multiple=cfg.data.pad_multiple, seed=cfg.train.seed,
        shard_id=shard_id, num_shards=num_shards,
    )
    val_loader = BatchLoader(
        val_ds, 1, shuffle=False, workers=cfg.data.workers,
        pad_multiple=cfg.data.pad_multiple, drop_last=False,
        shard_id=shard_id, num_shards=num_shards,
    )
    return train_loader, val_loader


def apply_pretrained(args, cfg, state):
    """Restore pretrained weights onto a fresh state — the reference's
    checkpoint-loading block (≙ main.py:200-245): full checkpoint
    (--pretrained), flow-only / depth-only subtree merges
    (--pretrained-flow / --pretrained-depth, strict=False semantics), and
    torch-checkpoint porting (--pretrained-torch)."""
    if args.pretrained:
        from deep_sfm_revisited_tpu.train.checkpoint import (
            restore_checkpoint,
        )

        state = restore_checkpoint(args.pretrained, state)
    if args.pretrained_flow:
        from deep_sfm_revisited_tpu.train.checkpoint import restore_subtree

        state = restore_subtree(args.pretrained_flow, state, "flow_net")
    if args.pretrained_depth:
        from deep_sfm_revisited_tpu.train.checkpoint import restore_subtree

        state = restore_subtree(args.pretrained_depth, state, "depth_net")
    if args.pretrained_torch:
        from deep_sfm_revisited_tpu.utils import torch_port as tp

        sd = tp.load_torch_checkpoint(args.pretrained_torch)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        flow_port = (cfg.flow.estimator
                     if cfg.flow.estimator in ("DICL", "RAFT") else None)
        depth_port = (cfg.depth.estimator
                      if cfg.depth.estimator == "PSNET" else None)
        if flow_port is None:
            print(f"torch port: no table for flow estimator "
                  f"{cfg.flow.estimator} — leaving flow_net untouched")
        if depth_port is None:
            print(f"torch port: no table for depth estimator "
                  f"{cfg.depth.estimator} — leaving depth_net untouched")
        if flow_port is None and depth_port is None:
            raise SystemExit(
                "--pretrained-torch: no port table for either "
                "configured estimator")
        new_vars, report = tp.convert_reference_checkpoint(
            sd, variables,
            flow=flow_port,
            depth=depth_port,
            context_bn=cfg.depth.context_bn,
            dep_context=cfg.depth.psnet_dep_context,
        )
        if report["missing"] or report["unused"]:
            print(f"torch port: {len(report['missing'])} missing, "
                  f"{len(report['unused'])} unused torch keys "
                  f"(strict=False semantics, main.py:203)")
        state = state.replace(params=new_vars["params"],
                              batch_stats=new_vars["batch_stats"])
    return state


def make_pose_forward(cfg, state, diag: bool = False):
    """Jitted early-return pose forward (≙ models/SFMnet.py:157-158).

    With `diag=True` returns (pose, num_matches) — num_matches is the
    per-image confident-candidate count (None on the RAFT / GT paths),
    surfacing the uniform-grid fallback the reference prints degenerate-
    pair diagnostics for (models/SFMnet.py:205-241)."""
    import jax
    import jax.numpy as jnp

    from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

    pose_cfg = cfg.override(record_pose=True)
    dtype = jnp.bfloat16 if cfg.train.mixed_prec else jnp.float32
    model = SFMNet(pose_cfg, dtype=dtype)

    @jax.jit
    def fwd(ref, target, K, key):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ref, target, K, key=key, train=False,
        )
        if diag:
            return out["pose"], out.get("num_matches")
        return out["pose"]

    return fwd


def build_flow_dataset(name: str, root: str, augment: bool, crop=None):
    from deep_sfm_revisited_tpu.data import flow_datasets as fd

    kw = {"augment": augment}
    if crop is not None:
        kw["crop_size"] = tuple(crop)
    builders = {
        "chairs": lambda: fd.FlyingChairs(root, **kw),
        "things": lambda: fd.FlyingThings3D(root, **kw),
        "sintel": lambda: fd.MpiSintel(root, **kw),
        "kitti": lambda: fd.KITTIFlow(root, **kw),
        "hd1k": lambda: fd.HD1K(root, **kw),
    }
    return builders[name]()


def train_flow_main(args, cfg):
    """Flow-pretraining driver branch (≙ the missing train_flow module)."""
    import jax.numpy as jnp

    from deep_sfm_revisited_tpu.data.loader import BatchLoader
    from deep_sfm_revisited_tpu.train.flow_trainer import flow_fit

    train_ds = build_flow_dataset(args.flow_dataset, args.data,
                                  augment=True, crop=args.flow_crop)
    val_ds = build_flow_dataset(args.flow_dataset, args.data,
                                augment=False)
    pad = 128 if cfg.flow.estimator == "DICL" else 8
    loader = BatchLoader(
        train_ds, cfg.train.batch_size, workers=cfg.data.workers,
        pad_multiple=pad, seed=cfg.train.seed,
    )
    sample = train_ds.__getitem__(0)
    h, w = sample["ref"].shape[:2]
    h = -(-h // pad) * pad
    w = -(-w // pad) * pad
    dtype = jnp.bfloat16 if cfg.train.mixed_prec else jnp.float32
    out = f"{args.out}/{cfg.tag}_flow"
    return flow_fit(
        cfg.flow, loader, out,
        sample_shape=(cfg.train.batch_size, h, w),
        val_dataset=val_ds,
        lr=cfg.train.lr, epochs=cfg.train.epochs, seed=cfg.train.seed,
        dtype=dtype, eval_pad_multiple=pad,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    if args.train_flow:
        return train_flow_main(args, cfg)

    # multi-host: join the job BEFORE anything touches the backend, then
    # stride the loaders per process (single-host: no-op, shard 0/1)
    from deep_sfm_revisited_tpu.parallel import multihost

    multihost.initialize()

    import jax

    shard = multihost.host_shard_info()
    train_loader, val_loader = build_loaders(cfg, args, **shard)

    from deep_sfm_revisited_tpu.train.loop import fit
    from deep_sfm_revisited_tpu.utils.retry import run_with_backend_retry

    if args.validate or args.record_pose or args.save_pose:
        # eval/pose branches dump the effective config too (the train
        # branch dumps inside fit); ≙ the reference's unconditional
        # startup config dump, main.py:140-142
        if jax.process_index() == 0:
            import os

            from deep_sfm_revisited_tpu.config import save_config

            out = os.path.join(args.out, cfg.tag)
            os.makedirs(out, exist_ok=True)
            save_config(cfg, os.path.join(out, "config.yaml"))
        if args.record_pose or args.save_pose:
            # pose tools are single-host jobs: they print one report /
            # write one file tree. Run them on process 0 over the FULL
            # (unsharded) eval set; everyone meets at an explicit barrier
            # afterwards so the non-zero processes park in a deliberate
            # collective (not the coordination-service shutdown path,
            # whose heartbeat timeouts a long eval could outlive).
            if jax.process_index() != 0:
                multihost.barrier("pose-tools-done")
                return None
            # everything process 0 runs — INCLUDING loader construction,
            # which can raise on a bad --data path — sits inside the try
            # whose finally hits the barrier, so a process-0 failure can
            # never leave the other processes parked forever
            try:
                _, val_loader = build_loaders(cfg, args)

                def run_pose_tools():
                    return _eval_tools(args, cfg, val_loader)

                return run_with_backend_retry(run_pose_tools,
                                              label="cli-eval")
            finally:
                multihost.barrier("pose-tools-done")

        # self-contained so a transient-backend retry re-creates every
        # piece of device state (utils/retry.py; ≙ bench.py hardening —
        # the reference counterpart is a human re-running the script)
        def run_eval_tools():
            return _eval_tools(args, cfg, val_loader)

        return run_with_backend_retry(run_eval_tools, label="cli-eval")

    restore_fn = (
        (lambda state: apply_pretrained(args, cfg, state))
        if (args.pretrained or args.pretrained_flow
            or args.pretrained_depth or args.pretrained_torch)
        else None
    )
    # attempts=2: a retried fit restarts the epoch loop (per-epoch Orbax
    # checkpoints under out/tag/ckpt survive for a manual --start-epoch
    # resume if the second attempt also dies)
    return run_with_backend_retry(
        lambda: fit(cfg, train_loader, val_loader, out_dir=args.out,
                    restore_fn=restore_fn, start_epoch=args.start_epoch),
        attempts=2, label="cli-train",
    )


def _eval_tools(args, cfg, val_loader):
    """Device-touching body of the -v / --record-pose / --save-pose
    branches (wrapped by run_with_backend_retry in main)."""
    import jax

    from deep_sfm_revisited_tpu.train.loop import validate
    from deep_sfm_revisited_tpu.train.trainer import (
        ChainedEval,
        create_train_state,
    )

    rng = jax.random.PRNGKey(cfg.train.seed)
    model, state = create_train_state(
        cfg, rng, sample_shape=(1, *cfg.data.val_size)
    )
    state = apply_pretrained(args, cfg, state)

    if args.record_pose:
        from deep_sfm_revisited_tpu.train.pose_eval import (
            record_pose_errors,
        )

        fwd_diag = make_pose_forward(cfg, state, diag=True)

        def fwd(ref, target, K, key):  # plain form, same compile
            return fwd_diag(ref, target, K, key)[0]

        results = record_pose_errors(
            val_loader, fwd_diag, jax.random.PRNGKey(0),
            min_matches=cfg.pose.min_matches,
        )
        print({k: round(v, 6) for k, v in results.items()})

        if cfg.data.dataset == "kitti_vo":
            # full odometry report: chain the predicted poses of the
            # test sequences and score ATE / RPE / KITTI segment
            # errors (≙ save_pose + external kitti-odom-eval,
            # README.md:69-71 — here in-framework)
            from deep_sfm_revisited_tpu.data import (
                Compose,
                KittiVODataset,
                Normalize,
            )
            from deep_sfm_revisited_tpu.train.pose_eval import (
                evaluate_vo_odometry,
            )

            ds = KittiVODataset(args.data, train=False,
                                skip=cfg.data.skip,
                                transform=Compose([Normalize()]))
            odo = evaluate_vo_odometry(
                ds, fwd, jax.random.PRNGKey(0),
                pad_multiple=cfg.data.pad_multiple,
            )
            for seq, rep in odo.items():
                print(f"seq {seq:02d}: "
                      f"ATE {rep['ate_rmse']:.3f} m  "
                      f"t_err {rep['t_err_pct']:.2f} %  "
                      f"r_err {rep['r_err_deg_per_100m']:.4f} deg/100m")
            results["odometry"] = odo
        return results

    if args.save_pose:
        # deterministic no-augmentation datasets over BOTH splits: the
        # saved poses feed pred_pose_online=False TRAINING
        # (≙ save_pose main.py:636-703 run per sequence)
        from deep_sfm_revisited_tpu.data import (
            Compose,
            KittiRawDataset,
            KittiVODataset,
            Normalize,
        )
        from deep_sfm_revisited_tpu.train.pose_eval import (
            save_raw_pred_poses,
            save_vo_pred_poses,
        )

        fwd = make_pose_forward(cfg, state)
        tf = Compose([Normalize()])
        written = []
        for train_split in (True, False):
            if cfg.data.dataset == "kitti_vo":
                ds = KittiVODataset(args.data, train=train_split,
                                    skip=cfg.data.skip, transform=tf)
                w = save_vo_pred_poses(
                    ds, fwd, args.data, jax.random.PRNGKey(0),
                    pad_multiple=cfg.data.pad_multiple)
            else:
                ds = KittiRawDataset(
                    args.data, train=train_split,
                    gt_depth_dir=args.gt_depth_dir, transform=tf,
                    random_offset=False, random_fw_bw=False,
                )
                w = save_raw_pred_poses(
                    ds, fwd, args.data, jax.random.PRNGKey(0),
                    pad_multiple=cfg.data.pad_multiple)
            written.extend(w if isinstance(w, list) else list(w))
        print(f"saved predicted poses for {len(written)} entries")
        return written

    # production eval: ChainedEval fuses eval_chain_steps batches per
    # dispatch and accumulates metrics on device (train/loop.py)
    import os

    from deep_sfm_revisited_tpu.utils.logging import MetricLogger

    eval_fn = ChainedEval(model, cfg)
    mlog = (MetricLogger(os.path.join(args.out, cfg.tag), "test")
            if jax.process_index() == 0 else None)
    results = validate(val_loader, state, eval_fn,
                       jax.random.PRNGKey(0),
                       cross_host=jax.process_count() > 1,
                       chain=cfg.train.eval_chain_steps,
                       metric_logger=mlog)
    if mlog is not None:
        mlog.scalars(results, 0)
        mlog.close()
    print({k: round(v, 4) for k, v in results.items()})
    return results



if __name__ == "__main__":
    main()
