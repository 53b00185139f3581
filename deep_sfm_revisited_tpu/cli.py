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
import os


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


def build_loaders(cfg, args):
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
        )
    train_loader = BatchLoader(
        train_ds, cfg.train.batch_size, workers=cfg.data.workers,
        pad_multiple=cfg.data.pad_multiple, seed=cfg.train.seed,
    )
    val_loader = BatchLoader(
        val_ds, 1, shuffle=False, workers=cfg.data.workers,
        pad_multiple=cfg.data.pad_multiple, drop_last=False,
    )
    return train_loader, val_loader


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    train_loader, val_loader = build_loaders(cfg, args)

    import jax

    from deep_sfm_revisited_tpu.train.loop import fit, validate
    from deep_sfm_revisited_tpu.train.trainer import (
        create_train_state,
        make_eval_step,
    )

    if args.validate:
        rng = jax.random.PRNGKey(cfg.train.seed)
        model, state = create_train_state(
            cfg, rng, sample_shape=(1, *cfg.data.val_size)
        )
        if args.pretrained:
            from deep_sfm_revisited_tpu.train.checkpoint import (
                restore_checkpoint,
            )

            state = restore_checkpoint(args.pretrained, state)
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
        eval_fn = make_eval_step(model, cfg)
        results = validate(val_loader, state, eval_fn,
                           jax.random.PRNGKey(0))
        print({k: round(v, 4) for k, v in results.items()})
        return results

    return fit(cfg, train_loader, val_loader, out_dir=args.out)


if __name__ == "__main__":
    main()
