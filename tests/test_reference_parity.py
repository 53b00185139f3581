"""End-to-end numeric parity against the UPSTREAM torch reference.

Builds the reference's own networks (fresh torch init, CPU, eval mode),
ports their state dicts through `utils.torch_port`, runs both sides on
identical inputs, and requires float32-level agreement. This is the
strongest checkpoint-porting guarantee available without KITTI data: if
these pass, a released `.pth.tar` loads into this framework and computes
the same function the reference computes (flow: DICL_shallow.py:350-668;
depth: PSNet.py:41-227).

Skipped when /root/reference is not present.
"""

import numpy as np
import pytest

from reference_harness import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.utils import torch_port as tp


def test_dicl_end_to_end_matches_reference():
    """Full DICL eval forward: ported weights reproduce the reference's
    full-res flow and entropy to f32 precision.

    Input must be /128 (the reference pads, main.py:315-338) and large
    enough that the level-6 map exceeds the +-3 search range -> 256x384.
    """
    refcfg = load_reference()
    import torch

    from models.DICL_shallow import DICL_shallow

    torch.manual_seed(0)
    tm = DICL_shallow().eval()
    B, H, W = 1, 256, 384
    x = torch.rand(B, 6, H, W) * 2 - 1
    with torch.no_grad():
        tflow, tent = (o.numpy() for o in tm(x))

    sd = {f"flow_estimator.{k}": v.numpy()
          for k, v in tm.state_dict().items()}

    from deep_sfm_revisited_tpu.models.dicl import DICLFlow

    net = DICLFlow(SfMConfig.kitti().flow)
    pair = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = net.init(jax.random.PRNGKey(0), pair, False)
    ported, report = tp.apply_entries(
        sd, variables, tp.dicl_entries("flow_estimator", ""))
    assert not report["missing"], report["missing"][:8]
    leftover = [k for k in set(sd) - set(report["consumed"])
                if "num_batches_tracked" not in k]
    assert not leftover, leftover[:8]

    jflow, jent = net.apply(ported, pair, False)
    jflow = np.asarray(jflow).transpose(0, 3, 1, 2)
    jent = np.asarray(jent).transpose(0, 3, 1, 2)
    # observed ~1.2e-4 max on ~30 px flows (f32 accumulation noise)
    assert np.abs(jflow - tflow).max() < 5e-3, np.abs(jflow - tflow).max()
    assert np.abs(jent - tent).max() < 1e-4, np.abs(jent - tent).max()


def test_raft_end_to_end_matches_reference():
    """Full RAFT eval forward (24 hardcoded iters, raft.py:84-87): ported
    weights reproduce the reference flow.

    Exercises the BGR fold (conv2d_bgr), the fused GRU/head kernels
    (conv2d_cat), the dx-major correlation-window channel order
    (corr.py:37-39), and the (9, 8, 8) convex-upsample mask layout
    (raft.py:69). Residual error is the bf16 correlation-pyramid storage
    compounding over 24 iterations (~1e-2 px max, observed).
    """
    load_reference()
    import sys

    import torch

    torch.manual_seed(0)
    sys.path.insert(0, "/root/reference/models/RAFT/core")
    from models.RAFT.core.raft import RAFT as RefRAFT

    tm = RefRAFT().eval()
    B, H, W = 1, 128, 192
    x = torch.rand(B, 6, H, W) * 2 - 1
    with torch.no_grad():
        tflow, _ = tm(x)
    tflow = tflow.numpy()

    sd = {f"flow_estimator.{k}": v.numpy()
          for k, v in tm.state_dict().items()}

    from deep_sfm_revisited_tpu.models.raft import RAFT

    cfg = SfMConfig.kitti().flow
    cfg = cfg.__class__(**{**cfg.__dict__, "raft_iters_eval": 24})
    net = RAFT(cfg)
    pair = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    variables = net.init(jax.random.PRNGKey(0), pair, False)
    entries = [
        (kind, tkey, fpath.replace("flow_net/", ""))
        for kind, tkey, fpath in tp.raft_entries("flow_estimator",
                                                 "flow_net")
    ]
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]
    # cnet downsample norms appear twice in the torch state dict (norm3 is
    # an attribute alias of downsample.1, extractor.py:44-45); only the
    # alias keys may remain unconsumed
    leftover = [k for k in set(sd) - set(report["consumed"])
                if "num_batches_tracked" not in k and ".norm3." not in k]
    assert not leftover, leftover[:8]

    jflow, _ = net.apply(ported, pair, False)
    jflow = np.asarray(jflow).transpose(0, 3, 1, 2)
    d = np.abs(jflow - tflow)
    assert d.max() < 5e-2, d.max()  # observed ~1.1e-2 on ~14 px flows


def test_motion_and_depth_metrics_match_reference():
    """`compute_motion_errors` (demon_metrics.py:391-456, via a numpy
    minieigen shim) and the DeMoN depth distances (l1_inverse,
    scale_invariant, abs_relative) vs our train.metrics."""
    load_reference()
    from reference_harness import install_minieigen_shim

    install_minieigen_shim()
    import demon_metrics as ref_m

    from deep_sfm_revisited_tpu.train.metrics import (
        depth_metrics,
        motion_errors,
    )

    rng = np.random.default_rng(0)
    for _ in range(4):
        aa1 = rng.normal(size=3) * 0.3
        aa2 = aa1 + rng.normal(size=3) * 0.05
        t1 = rng.normal(size=3)
        t2 = t1 + rng.normal(size=3) * 0.2
        rot_deg, tdist, tang_deg = ref_m.compute_motion_errors(
            np.concatenate([aa2, t2]), np.concatenate([aa1, t1]))

        def rodrigues(aa):
            th = np.linalg.norm(aa)
            k = aa / max(th, 1e-12)
            K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                          [-k[1], k[0], 0]])
            return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K

        P1 = np.concatenate([rodrigues(aa1), t1[:, None]], 1)[None]
        P2 = np.concatenate([rodrigues(aa2), t2[:, None]], 1)[None]
        r_err, t_dist, t_ang = motion_errors(jnp.asarray(P2),
                                             jnp.asarray(P1))
        assert abs(np.degrees(float(r_err[0])) - rot_deg) < 1e-3, (
            np.degrees(float(r_err[0])), rot_deg)
        assert abs(float(t_dist[0]) - tdist) < 1e-5
        assert abs(np.degrees(float(t_ang[0])) - tang_deg) < 1e-3

    d_gt = rng.uniform(1.0, 50.0, size=(32, 48))
    d_pred = d_gt * rng.uniform(0.8, 1.2, size=d_gt.shape)
    ours = depth_metrics(jnp.asarray(d_gt), jnp.asarray(d_pred),
                         jnp.ones(d_gt.shape, bool))
    assert abs(float(ours["l1_inv"])
               - ref_m.l1_inverse(d_pred, d_gt)) < 1e-6
    assert abs(float(ours["sc_inv"])
               - ref_m.scale_invariant(d_pred, d_gt)) < 1e-6
    assert abs(float(ours["abs_rel"])
               - ref_m.abs_relative(d_pred, d_gt)) < 1e-6


def test_flow_viz_matches_reference():
    """Middlebury flow colorization vs the reference's `flow_viz.py`."""
    load_reference()
    import flow_viz as ref_viz

    from deep_sfm_revisited_tpu.utils.viz import flow_to_rgb, make_colorwheel

    assert np.array_equal(make_colorwheel(), ref_viz.make_colorwheel())

    rng = np.random.default_rng(3)
    flow = rng.normal(size=(40, 56, 2)).astype(np.float32) * 8
    ours = flow_to_rgb(flow)
    theirs = ref_viz.flow_to_image(flow.copy(), valid=None)
    assert ours.shape == theirs.shape
    d = np.abs(ours.astype(int) - theirs.astype(int))
    # identical up to uint8 rounding except isolated wheel-segment
    # boundary pixels (floor-vs-round differences); observed: 99.97%
    # within +-1, mean |d| = 0.01
    assert (d > 1).mean() < 5e-3 and d.mean() < 0.1, (
        d.max(), d.mean(), (d > 1).mean())


def test_kitti_vo_loader_matches_reference(tmp_path):
    """Drive the reference's KITTIVOLoaderGT and our KittiVODataset on the
    same synthetic odometry tree (test split, no transforms) and require
    identical images, intrinsics, relative poses, and masked depth for
    every index — including the sequence-boundary -skip fallback.

    Orientation note: the reference trains "backward" — the model's
    reference frame is frame 2 (main.py:340-345) — so our item's ref
    image is the reference loader's inputs[1] and our pose_gt its
    poses[1] (bw).
    """
    refcfg = load_reference()
    import os

    from imageio.v2 import imwrite

    root = tmp_path / "kitti_vo"
    rng = np.random.default_rng(0)
    os.makedirs(root / "poses")
    for seq in range(11):  # the reference loads pose files for ALL seqs
        n = 4 if seq in (9, 10) else 1
        poses = []
        for i in range(n):
            t = np.array([0.1 * i, 0.05 * i, 1.2 * i])
            ang = 0.05 * i
            R = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
            poses.append(np.concatenate([R, t[:, None]], 1).reshape(-1))
        np.savetxt(root / "poses" / f"{seq:02d}.txt", np.stack(poses))
    for seq in (9, 10):
        img_dir = root / "sequences" / f"{seq:02d}" / "image_2"
        depth_dir = root / "RealDepth" / f"{seq:02d}" / "velodyne"
        os.makedirs(img_dir)
        os.makedirs(depth_dir)
        for i in range(4):
            imwrite(img_dir / f"{i:06d}.png",
                    rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
            d = (rng.uniform(0, 40, (64, 96)) * 256).astype(np.uint16)
            d[rng.random((64, 96)) < 0.5] = 0  # sparse
            imwrite(depth_dir / f"{i:06d}.png", d)
        with open(root / "sequences" / f"{seq:02d}" / "calib.txt",
                  "w") as f:
            f.write("P0: " + " ".join(["0"] * 12) + "\n")
            f.write("P2: 70 0 48 0 0 70 32 0 0 0 1 0\n")

    from KITTI_loader import KITTIVOLoaderGT

    from deep_sfm_revisited_tpu.data.kitti import KittiVODataset

    ref_ds = KITTIVOLoaderGT(str(root), train=False)
    our_ds = KittiVODataset(str(root), train=False,
                            skip=int(refcfg.SKIP))
    assert len(ref_ds) == len(our_ds) == 8
    for idx in range(len(ref_ds)):
        r_inputs, r_K, r_poses, _, r_depths, p1, p2 = ref_ds[idx]
        ours = our_ds[idx]
        assert np.array_equal(ours["target"],
                              r_inputs[0].astype(np.float32))
        assert np.array_equal(ours["ref"], r_inputs[1].astype(np.float32))
        assert np.allclose(ours["intrinsics"], r_K, atol=1e-6)
        assert np.allclose(ours["pose_gt"], r_poses[1], atol=1e-6), idx
        assert np.allclose(ours["depth_gt"], r_depths[1][..., 0],
                           atol=1e-6)


def test_flow_file_io_matches_reference(tmp_path):
    """Cross-read .flo and KITTI-16bit flow files between our flow_io and
    the reference's frame_utils / load_flow_from_png."""
    load_reference()
    import sys as _sys

    _sys.path.insert(0, "/root/reference/models/RAFT/core/utils")
    import frame_utils as ref_io

    from deep_sfm_revisited_tpu.data import flow_io

    rng = np.random.default_rng(5)
    flow = rng.normal(size=(32, 44, 2)).astype(np.float32) * 20

    # ours writes .flo -> reference reads (and vice versa)
    p1 = str(tmp_path / "a.flo")
    flow_io.write_flo(p1, flow)
    assert np.allclose(ref_io.readFlow(p1), flow, atol=1e-6)
    p2 = str(tmp_path / "b.flo")
    ref_io.writeFlow(p2, flow)
    assert np.allclose(flow_io.read_flo(p2), flow, atol=1e-6)

    # KITTI 16-bit png cross-read (value-quantized to 1/64 px)
    p3 = str(tmp_path / "c.png")
    valid = rng.random((32, 44)) > 0.3
    flow_io.write_flow_kitti(p3, flow, valid)
    rf, rv = ref_io.readFlowKITTI(p3)
    jf, jv = flow_io.read_flow_kitti(p3)
    assert np.array_equal(np.asarray(rv, bool), np.asarray(jv, bool))
    # ours zeroes invalid pixels; the reference returns them raw — compare
    # where valid
    assert np.allclose(rf[rv > 0], jf[jv > 0], atol=1e-6)
    assert np.all(jf[jv == 0] == 0)
    assert np.allclose(jf[jv > 0], flow[valid], atol=1 / 64 + 1e-6)

    # KITTI_loader.load_flow_from_png: zeroes invalid px, 1e-10 floor
    from KITTI_loader import load_flow_from_png

    lf = load_flow_from_png(p3)
    assert np.allclose(lf[valid], rf[rv > 0], atol=1e-6)
    assert np.all(lf[~valid] == 0)


def test_flow_losses_match_reference():
    """Flow-training losses vs the reference's `loss_functions.py`:
    MultiScale_UP (L1, KITTI weights + valid ranges, full-res stack —
    the form the DICL trainer feeds) and realEPE, with and without an
    extra mask."""
    refcfg = load_reference()
    import torch

    import loss_functions as ref_losses

    from deep_sfm_revisited_tpu.train.losses import (
        flow_epe,
        multiscale_flow_loss,
    )

    torch.manual_seed(0)
    B, H, W, L = 2, 64, 96, 6
    preds_t = tuple(torch.randn(B, 2, H, W) * 30 for _ in range(L))
    gt_t = torch.randn(B, 2, H, W) * 30
    weights = list(refcfg.MultiScale_W[:L])
    vrange = [list(v) for v in refcfg.VALID_RANGE[:L]]

    t_loss, _, t_epe = ref_losses.MultiScale_UP(
        preds_t, gt_t, loss_type="L1", weight=weights, valid_range=vrange)

    preds_j = [jnp.asarray(p.numpy().transpose(0, 2, 3, 1)) for p in preds_t]
    gt_j = jnp.asarray(gt_t.numpy().transpose(0, 2, 3, 1))
    j_loss = multiscale_flow_loss(preds_j, gt_j, weights,
                                  valid_range=vrange)
    assert abs(float(t_loss) - float(j_loss)) < 1e-3 * abs(float(t_loss))

    # realEPE without valid range; and EPE under an extra mask
    t_epe2 = ref_losses.realEPE(preds_t[0], gt_t)
    j_epe2 = flow_epe(preds_j[0], gt_j)
    assert abs(float(t_epe2) - float(j_epe2)) < 1e-4 * abs(float(t_epe2))
    mask_t = (torch.rand(B, H, W) > 0.5).float()
    t_epe3 = ref_losses.realEPE(preds_t[0], gt_t, extra_mask=mask_t)
    j_epe3 = flow_epe(preds_j[0], gt_j,
                      valid=jnp.asarray(mask_t.numpy()) > 0.5)
    assert abs(float(t_epe3) - float(j_epe3)) < 1e-4 * abs(float(t_epe3))


def test_census_and_photometric_losses_match_reference():
    """`ternary_loss` (loss_functions.py:129-155) and the Charbonnier
    photometric term (:84-85) vs our census/photometric losses, with zero
    flow so both sides see identical warped images."""
    load_reference()
    import torch

    import loss_functions as ref_losses

    from deep_sfm_revisited_tpu.train.losses import (
        census_loss,
        photometric_loss,
    )

    torch.manual_seed(1)
    B, H, W = 2, 48, 64
    i1 = torch.rand(B, 3, H, W) * 2 - 1
    i2 = torch.rand(B, 3, H, W) * 2 - 1
    mask = (torch.rand(B, 1, H, W) > 0.3).float()

    t_cen = ref_losses.ternary_loss(i1, i2, mask)
    t_pho = ((ref_losses.charbonnier_penalty(i2 - i1) * mask).mean()
             / (mask.mean() + 1e-3))

    j1 = jnp.asarray(i1.numpy().transpose(0, 2, 3, 1))
    j2 = jnp.asarray(i2.numpy().transpose(0, 2, 3, 1))
    jm = jnp.asarray(mask.numpy()[:, 0])
    zf = jnp.zeros((B, H, W, 2))
    j_cen = census_loss(j1, j2, zf, occlusion=jm)
    j_pho = photometric_loss(j1, j2, zf, occlusion=jm)
    assert abs(float(t_cen) - float(j_cen)) < 1e-4 * abs(float(t_cen)), (
        float(t_cen), float(j_cen))
    assert abs(float(t_pho) - float(j_pho)) < 1e-4 * abs(float(t_pho)), (
        float(t_pho), float(j_pho))

    # weighted smoothness (loss_functions.py:98-126)
    from deep_sfm_revisited_tpu.train.losses import (
        weighted_smooth_depth_loss,
    )

    disp = torch.rand(B, H, W) * 5
    t_sm = ref_losses.weighted_smooth_depth_loss(disp, i1)
    j_sm = weighted_smooth_depth_loss(jnp.asarray(disp.numpy()), j1)
    assert abs(float(t_sm) - float(j_sm)) < 1e-4 * abs(float(t_sm)), (
        float(t_sm), float(j_sm))


def test_depth_training_loss_matches_reference():
    """RESCALE_DEPTH depth loss vs a line-by-line torch replica of
    main.py:350-394 (the logic is inline in train_epoch, not importable):
    validity window, scale-window frame drop, |t|/NORM_TARGET rescale of
    the refined output only, optional REMASK, 0.7-weighted init term."""
    load_reference()
    import torch
    import torch.nn.functional as F

    from deep_sfm_revisited_tpu.train.losses import depth_training_loss

    torch.manual_seed(0)
    B, H, W = 4, 24, 32
    nlabel, min_depth, norm_target = 16, 0.5, 0.6
    gt = torch.rand(B, H, W) * 12  # some pixels out of the [0.5, 8] window
    d_init = torch.rand(B, H, W) * 8
    d_out = torch.rand(B, H, W) * 8
    t = torch.randn(B, 3) * 0.8  # some frames outside [0.2, 2.0]
    pose = torch.cat([torch.eye(3).expand(B, 3, 3), t[:, :, None]], -1)

    for remask in (False, True):
        scale = torch.norm(t, dim=-1)
        scale_mask = (scale > 0.2) & (scale < 2.0)
        ratio = (scale / norm_target).view(B, 1, 1)
        mask = (gt <= nlabel * min_depth) & (gt >= min_depth) & (gt == gt)
        d_scaled = d_out * ratio
        if remask:
            gt_r = gt / ratio
            mask = ((gt_r <= nlabel * min_depth) & (gt_r >= min_depth)
                    & (gt_r == gt_r))
        t_init = 0.7 * F.smooth_l1_loss(d_init[scale_mask][mask[scale_mask]],
                                        gt[scale_mask][mask[scale_mask]])
        t_out = F.smooth_l1_loss(d_scaled[scale_mask][mask[scale_mask]],
                                 gt[scale_mask][mask[scale_mask]])
        t_loss = float(t_init + t_out)

        j_loss, _ = depth_training_loss(
            jnp.asarray(d_init.numpy()), jnp.asarray(d_out.numpy()),
            jnp.asarray(gt.numpy()), jnp.asarray(pose.numpy()),
            nlabel=nlabel, min_depth=min_depth, rescale_depth=True,
            norm_target=norm_target, remask=remask,
        )
        assert abs(float(j_loss) - t_loss) < 1e-5 * max(abs(t_loss), 1.0), (
            remask, float(j_loss), t_loss)


def test_sfmnet_composite_matches_reference():
    """Composite orchestration parity: DICL flow -> PlainPose (RT2Pose)
    -> PSNet, plus the GT-pose route through the reference's REAL
    forward (SFMnet.py:95-174). The POSENET branch of the shipped
    forward crashes (E_mat unbound, SFMnet.py:133-166), so that chain is
    driven through the same components manually.

    PSNet conv weights are scaled (eval-BN explosion, see the PSNet
    test); pose_reg is scaled UP so the regressed translation is not
    near zero (F.normalize of a ~1e-3 vector amplifies float noise into
    direction chaos).
    """
    refcfg = load_reference()
    refcfg.POSE_EST = "POSENET"
    refcfg.MIXED_PREC = False  # autocast is CUDA-only; numerics unchanged
    import torch

    try:
        torch.manual_seed(0)
        from models.SFMnet import RT2Pose, SFMnet as RefSFMnet

        NLABEL = 8
        tm = RefSFMnet(NLABEL, refcfg.MIN_DEPTH).eval()
        with torch.no_grad():
            for m in tm.depth_estimator.modules():
                if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
                    m.weight.mul_(0.5)
            tm.posenet.pose_reg.weight.mul_(50.0)
        B, H, W = 1, 256, 384
        ref_t = torch.rand(B, 3, H, W) * 2 - 1
        tgt_t = torch.rand(B, 3, H, W) * 2 - 1
        K = torch.tensor([[[200.0, 0, W / 2], [0, 200.0, H / 2],
                           [0, 0, 1]]])
        pose_gt = torch.cat(
            [torch.eye(3), torch.tensor([[0.6], [0.1], [0.79]])], dim=1
        )[None].float()

        with torch.no_grad():
            tflow, tconf = tm.flow_estimator(
                torch.cat((ref_t, tgt_t), dim=1))
            tP = RT2Pose(tm.posenet(tflow, tconf, ref_t, tgt_t))
            _, tdepth = tm.depth_estimator(
                ref_t, [tgt_t], tP.unsqueeze(1).clone(), K,
                torch.inverse(K))
            touts_gt = tm(ref_t, tgt_t, K, pose_gt=pose_gt.clone(),
                          use_gt_pose=True)
        tdepth_gt = touts_gt[2].numpy()

        sd = {k: v.numpy() for k, v in tm.state_dict().items()}

        from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

        cfg = SfMConfig.kitti(nlabel=NLABEL).override(**{
            "flow.estimator": "DICL",
            "pose.estimator": "POSENET",
        })
        net = SFMNet(cfg, dtype=jnp.float32)
        jref = jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1))
        jtgt = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))
        jK = jnp.asarray(K.numpy())
        jpose = jnp.asarray(pose_gt.numpy())
        variables = net.init(jax.random.PRNGKey(0), jref, jtgt, jK,
                             pose_gt=jpose, key=jax.random.PRNGKey(1))
        ported, report = tp.convert_reference_checkpoint(
            sd, variables, flow="DICL", depth="PSNET", pose="POSENET")
        assert not report["missing"], report["missing"][:8]
        leftover = [k for k in report["unused"]
                    if "num_batches_tracked" not in k]
        assert not leftover, leftover[:8]

        out = net.apply(ported, jref, jtgt, jK, pose_gt=jpose,
                        key=jax.random.PRNGKey(2))
        assert np.abs(tflow.numpy().transpose(0, 2, 3, 1)
                      - np.asarray(out["flow"])).max() < 5e-3
        assert np.abs(tP.numpy() - np.asarray(out["pose"])).max() < 1e-3
        a = tdepth.numpy().reshape(B, H, W)
        rel = (np.abs(a - np.asarray(out["depth"]))
               / np.maximum(np.abs(a), 1.0))
        assert rel.max() < 1e-3, rel.max()

        out_gt = net.apply(ported, jref, jtgt, jK, pose_gt=jpose,
                           use_gt_pose=True, key=jax.random.PRNGKey(2))
        a = tdepth_gt.reshape(B, H, W)
        rel = (np.abs(a - np.asarray(out_gt["depth"]))
               / np.maximum(np.abs(a), 1.0))
        assert rel.max() < 1e-3, rel.max()
    finally:
        refcfg.POSE_EST = "RANSAC"
        refcfg.MIXED_PREC = True


def _depth_alt_fixture(RefNet, nlabel=8, B=1, H=128, W=192, e_mat=False):
    """Shared scaffolding for the alternate-depth parity tests: a scaled
    fresh-init reference net, a synthetic pair+pose, and the torch run."""
    import torch

    torch.manual_seed(0)
    tm = RefNet(nlabel, 0.5).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
                m.weight.mul_(0.5)
    ref_t = torch.rand(B, 3, H, W) * 2 - 1
    tgt_t = torch.rand(B, 3, H, W) * 2 - 1
    K = torch.tensor([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]])
    ang = 0.03
    R = torch.tensor([
        [np.cos(ang), -np.sin(ang), 0.0],
        [np.sin(ang), np.cos(ang), 0.0],
        [0.0, 0.0, 1.0],
    ]).float()
    t = torch.tensor([0.7, 0.1, 0.7])
    pose = torch.cat([R, t[:, None]], dim=1)[None, None].float()
    kwargs = {}
    if e_mat:  # DISPNET derives its epipolar direction from E
        tx = torch.tensor([[0.0, -t[2], t[1]],
                           [t[2], 0.0, -t[0]],
                           [-t[1], t[0], 0.0]])
        kwargs["E_mat"] = (tx.float() @ R)[None]
    with torch.no_grad():
        touts = tm(ref_t, [tgt_t], pose.clone(), K, torch.inverse(K),
                   **kwargs)
    sd = {f"depth_estimator.{k}": v.numpy()
          for k, v in tm.state_dict().items()}
    jin = dict(
        ref=jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1)),
        tgt=jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))[:, None],
        pose=jnp.asarray(pose.numpy()),
        K=jnp.asarray(K.numpy()),
        Ki=jnp.asarray(torch.inverse(K).numpy()),
    )
    return touts, sd, jin


def _run_ported_alt(net, entries, sd, jin):
    variables = net.init(jax.random.PRNGKey(0), jin["ref"], jin["tgt"],
                         jin["pose"], jin["K"], jin["Ki"], False)
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]
    leftover = [k for k in set(sd) - set(report["consumed"])
                if "num_batches_tracked" not in k]
    assert not leftover, leftover[:8]
    return net.apply(ported, jin["ref"], jin["tgt"], jin["pose"], jin["K"],
                     jin["Ki"], False)


def test_panet_end_to_end_matches_reference():
    """PANet (PANet.py:42-165): shared small hourglass over pose-scale
    hypotheses. ONE scale hypothesis: the max over near-tied hypotheses
    of a random-weight net amplifies f32 noise into plane flips, so the
    multi-scale case is not a meaningful numeric comparison."""
    refcfg = load_reference()
    old = (refcfg.SCALE_MIN, refcfg.SCALE_MAX, refcfg.SCALE_STEP)
    refcfg.SCALE_MIN, refcfg.SCALE_MAX, refcfg.SCALE_STEP = 1.0, 1.01, 0.1
    try:
        from models.PANet import PANet as RefNet

        touts, sd, jin = _depth_alt_fixture(RefNet)
        from deep_sfm_revisited_tpu.models.depth_alternates import PANet

        cfg = SfMConfig.kitti(nlabel=8).depth
        cfg = cfg.__class__(**{**cfg.__dict__, "scale_min": 1.0,
                               "scale_max": 1.01, "scale_step": 0.1})
        _, j_depth = _run_ported_alt(
            PANet(cfg, dtype=jnp.float32),
            tp.panet_entries("depth_estimator", ""), sd, jin)
        a = touts[1].numpy().reshape(j_depth.shape)
        assert np.abs(a - np.asarray(j_depth)).max() < 1e-4  # obs ~6e-7
    finally:
        refcfg.SCALE_MIN, refcfg.SCALE_MAX, refcfg.SCALE_STEP = old


def test_regnet_end_to_end_matches_reference():
    """REGNet (REGNet.py:73-227): full 5^3 coupled pose-perturbation grid
    as cost channels — also validates the angle<->matrix conventions on
    the grid (observed ~5e-7)."""
    load_reference()
    from models.REGNet import REGNet as RefNet

    touts, sd, jin = _depth_alt_fixture(RefNet)
    from deep_sfm_revisited_tpu.models.depth_alternates import REGNet

    cfg = SfMConfig.kitti(nlabel=8).depth
    j_init, j_depth = _run_ported_alt(
        REGNet(cfg, dtype=jnp.float32),
        tp.regnet_entries("depth_estimator", ""), sd, jin)
    for a, b in ((touts[0], j_init), (touts[1], j_depth)):
        a = a.numpy().reshape(np.asarray(b).shape)
        assert np.abs(a - np.asarray(b)).max() < 1e-4


def test_reg2d_end_to_end_matches_reference():
    """REG2D (REG2D.py:34-156): dense 2D stack + fixed 11-scale
    translation refinement + leaky convbn context (observed ~2e-6)."""
    load_reference()
    from models.REG2D import REG2D as RefNet

    touts, sd, jin = _depth_alt_fixture(RefNet)
    from deep_sfm_revisited_tpu.models.depth_alternates import REG2D

    cfg = SfMConfig.kitti(nlabel=8).depth
    j_init, j_depth = _run_ported_alt(
        REG2D(cfg, dtype=jnp.float32),
        tp.reg2d_entries("depth_estimator", ""), sd, jin)
    for a, b in ((touts[0], j_init), (touts[1], j_depth)):
        a = a.numpy().reshape(np.asarray(b).shape)
        assert np.abs(a - np.asarray(b)).max() < 1e-4


def test_dispnet_end_to_end_matches_reference():
    """DISPNET (DISPNET.py:44-291): epipolar disparity sweep + u-base
    triangulation. Our epipolar direction comes from projecting at two
    depths instead of the F-matrix line slope — identical line, different
    arithmetic — so ~1e-4-relative agreement (observed 3e-3 on 23 m)."""
    load_reference()
    from models.DISPNET import DISPNET as RefNet

    touts, sd, jin = _depth_alt_fixture(RefNet, e_mat=True)
    from deep_sfm_revisited_tpu.models.depth_alternates import DISPNET

    cfg = SfMConfig.kitti(nlabel=8).depth
    j_init, j_depth = _run_ported_alt(
        DISPNET(cfg, dtype=jnp.float32),
        tp.dispnet_entries("depth_estimator", ""), sd, jin)
    for a, b in ((touts[0], j_init), (touts[1], j_depth)):
        a = a.numpy().reshape(np.asarray(b).shape)
        d = np.abs(a - np.asarray(b))
        assert d.max() < 2e-2 and d.mean() < 1e-3, (d.max(), d.mean())


def test_resnetpose_end_to_end_matches_reference():
    """ResNet pose regressor (PoseNet.py:170-312 + MotionNet): ported
    weights match exactly (observed ~6e-8). Covers the skipped-maxpool
    stem resolution, the MotionNet shrink + normalized flow-coordinate
    channels, and the unscaled (rot3, unit trans3) head."""
    load_reference()
    import torch

    torch.manual_seed(0)
    from models.PoseNet import Bottleneck, ResNet

    tm = ResNet(Bottleneck, [3, 4, 6, 3]).eval()
    B, H, W = 2, 64, 96
    flow_t = torch.randn(B, 2, H, W) * 3
    conf_t = torch.rand(B, 1, H, W)
    ref_t = torch.rand(B, 3, H, W) * 2 - 1
    tgt_t = torch.rand(B, 3, H, W) * 2 - 1
    with torch.no_grad():
        tpose = tm(flow_t, conf_t, ref_t, tgt_t).numpy()

    sd = {f"posenet.{k}": v.numpy() for k, v in tm.state_dict().items()}

    from deep_sfm_revisited_tpu.models.posenet import ResNetPose

    net = ResNetPose()

    def j(t):
        return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))

    variables = net.init(jax.random.PRNGKey(0), j(flow_t), j(ref_t),
                         j(tgt_t), j(conf_t), False)
    entries = [
        (kind, tkey, fpath.replace("pose_net/", ""))
        for kind, tkey, fpath in tp.resnetpose_entries("posenet",
                                                       "pose_net")
    ]
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]
    leftover = [k for k in set(sd) - set(report["consumed"])
                if "num_batches_tracked" not in k]
    assert not leftover, leftover[:8]

    jpose = np.asarray(net.apply(ported, j(flow_t), j(ref_t), j(tgt_t),
                                 j(conf_t), False))
    assert np.abs(jpose - tpose).max() < 1e-5, np.abs(jpose - tpose).max()


def test_cvpmvs_end_to_end_matches_reference():
    """CVPMVS (CVPMVS.py:19-224): ported weights reproduce the finest
    depth to f32 precision (observed ~5e-5 on 47 m). Covers the BGR fold,
    the intrinsics-free pixel-space warp quirk (CVPMVS.py:163,
    modules.py:74-84), the mixed grid_sample normalization, the bicubic
    seed upsample, and both ConvTranspose3d ports.
    """
    load_reference()
    import torch

    torch.manual_seed(0)
    from models.CVPMVS import CVPMVS as RefNet

    tm = RefNet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d,
                              torch.nn.ConvTranspose3d)):
                m.weight.mul_(0.6)
    B, H, W = 1, 64, 96
    ref_t = torch.rand(B, 3, H, W) * 2 - 1
    tgt_t = torch.rand(B, 3, H, W) * 2 - 1
    K = torch.tensor([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]])
    ang = 0.03
    R = torch.tensor([
        [np.cos(ang), -np.sin(ang), 0.0],
        [np.sin(ang), np.cos(ang), 0.0],
        [0.0, 0.0, 1.0],
    ]).float()
    t = torch.tensor([0.7, 0.1, 0.7])
    pose = torch.cat([R, t[:, None]], dim=1)[None, None].float()
    with torch.no_grad():
        _, tdepth = tm(ref_t, [tgt_t], pose.clone(), K, torch.inverse(K))

    sd = {f"depth_estimator.{k}": v.numpy()
          for k, v in tm.state_dict().items()}

    from deep_sfm_revisited_tpu.models.cvpmvs import CVPMVS

    net = CVPMVS(SfMConfig.kitti(nlabel=8).depth, dtype=jnp.float32)
    jref = jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1))
    jtgt = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))[:, None]
    variables = net.init(jax.random.PRNGKey(0), jref, jtgt,
                         jnp.asarray(pose.numpy()), jnp.asarray(K.numpy()),
                         jnp.asarray(torch.inverse(K).numpy()), False)
    ported, report = tp.apply_entries(
        sd, variables, tp.cvpmvs_entries("depth_estimator", ""))
    assert not report["missing"], report["missing"][:8]
    leftover = [k for k in set(sd) - set(report["consumed"])
                if "num_batches_tracked" not in k]
    assert not leftover, leftover[:8]

    _, j_depth = net.apply(ported, jref, jtgt, jnp.asarray(pose.numpy()),
                           jnp.asarray(K.numpy()),
                           jnp.asarray(torch.inverse(K).numpy()), False)
    a = tdepth.numpy().reshape(np.asarray(j_depth).shape)
    assert np.abs(a - np.asarray(j_depth)).max() < 1e-2, (
        np.abs(a - np.asarray(j_depth)).max())


def test_plainpose_end_to_end_matches_reference():
    """PlainPose ablation head (PoseNet.py:13-68): ported weights match
    exactly (observed ~4e-8)."""
    load_reference()
    import torch

    torch.manual_seed(0)
    from models.PoseNet import PlainPose as RefPlainPose

    tm = RefPlainPose().eval()
    B, H, W = 2, 64, 96
    flow_t = torch.randn(B, 2, H, W) * 3
    conf_t = torch.rand(B, 1, H, W)
    ref_t = torch.rand(B, 3, H, W) * 2 - 1
    tgt_t = torch.rand(B, 3, H, W) * 2 - 1
    with torch.no_grad():
        tpose = tm(flow_t, conf_t, ref_t, tgt_t).numpy()

    sd = {f"posenet.{k}": v.numpy() for k, v in tm.state_dict().items()}

    from deep_sfm_revisited_tpu.models.posenet import PlainPose

    net = PlainPose()

    def j(t):
        return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))

    variables = net.init(jax.random.PRNGKey(0), j(flow_t), j(ref_t),
                         j(tgt_t), j(conf_t), False)
    entries = [
        (kind, tkey, fpath.replace("pose_net/", ""))
        for kind, tkey, fpath in tp.plainpose_entries("posenet", "pose_net")
    ]
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]

    jpose = np.asarray(net.apply(ported, j(flow_t), j(ref_t), j(tgt_t),
                                 j(conf_t), False))
    assert np.abs(jpose - tpose).max() < 1e-5, np.abs(jpose - tpose).max()


def test_psnet_end_to_end_matches_reference():
    """Full PSNet eval forward (plane sweep + hourglass + context +
    regression + RESCALE_DEPTH pose scaling) matches the reference.

    Conv weights are scaled down post-init: at eval, fresh BatchNorms
    normalize with unit running stats, so default-init activations
    explode (~1e8 by the hourglass) and drown the comparison in
    amplified float noise.
    """
    refcfg = load_reference()
    import torch

    from models.PSNet import PSNet as RefPSNet

    torch.manual_seed(0)
    NLABEL = 8
    tm = RefPSNet(NLABEL, refcfg.MIN_DEPTH).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
                m.weight.mul_(0.5)

    B, H, W = 1, 128, 192
    ref_t = torch.rand(B, 3, H, W) * 2 - 1
    tgt_t = torch.rand(B, 3, H, W) * 2 - 1
    K = torch.tensor([[[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]]])
    ang = 0.03
    R = torch.tensor([
        [np.cos(ang), -np.sin(ang), 0.0],
        [np.sin(ang), np.cos(ang), 0.0],
        [0.0, 0.0, 1.0],
    ])
    t = torch.tensor([0.7, 0.1, 0.7])
    pose = torch.cat([R, t[:, None]], dim=1)[None, None].float()
    with torch.no_grad():
        t_init, t_depth = (o.numpy() for o in
                           tm(ref_t, [tgt_t], pose.clone(), K,
                              torch.inverse(K)))

    sd = {f"depth_estimator.{k}": v.numpy()
          for k, v in tm.state_dict().items()}

    from deep_sfm_revisited_tpu.models.psnet import PSNet

    cfg = SfMConfig.kitti(nlabel=NLABEL)
    # the reference rescales pose translation inside PSNet under
    # RESCALE_DEPTH (PSNet.py:135-136); SFMNet wires norm_target the same
    net = PSNet(cfg.depth, norm_target=float(refcfg.NORM_TARGET),
                dtype=jnp.float32)
    jref = jnp.asarray(ref_t.numpy().transpose(0, 2, 3, 1))
    jtgt = jnp.asarray(tgt_t.numpy().transpose(0, 2, 3, 1))[:, None]
    jpose = jnp.asarray(pose.numpy())
    jK = jnp.asarray(K.numpy())
    jKi = jnp.asarray(torch.inverse(K).numpy())
    variables = net.init(jax.random.PRNGKey(0), jref, jtgt, jpose, jK,
                         jKi, False)
    ported, report = tp.apply_entries(
        sd, variables, tp.psnet_entries("depth_estimator", ""))
    assert not report["missing"], report["missing"][:8]

    j_init, j_depth = net.apply(ported, jref, jtgt, jpose, jK, jKi, False)
    for a, b in ((t_init, j_init), (t_depth, j_depth)):
        a = a.reshape(B, H, W)
        b = np.asarray(b).reshape(B, H, W)
        # observed ~6e-7; inverse depth is the regression's linear output
        assert np.abs(a - b).max() < 1e-4, np.abs(a - b).max()
        ia, ib = 1.0 / np.maximum(a, 1e-9), 1.0 / np.maximum(b, 1e-9)
        assert np.abs(ia - ib).max() < 1e-5, np.abs(ia - ib).max()


def test_truncated_flow_regression_matches_reference():
    """Round-5 config-tail audit: the TRUNCATED/TRUNCATED_SIZE windowed
    soft-argmax (lib/config.py:298-299, DICL_shallow.py:277-316) vs the
    reference's own torch FlowRegression with cfg.TRUNCATED=True.

    The reference flattens its (U, V) displacement plane u-outer while
    we stack dv-outer/du-inner, so the cost volume is transposed between
    the two layouts before comparison.
    """
    if not reference_available():
        pytest.skip("reference checkout absent")
    refcfg = load_reference()
    import torch

    md, t, B, H, W = 3, 2, 2, 8, 9
    S = 2 * md + 1
    old_trunc, old_size = refcfg.TRUNCATED, refcfg.TRUNCATED_SIZE
    # the reference module holds the SAME global cfg object, so setting
    # the attrs here is visible to FlowRegression's __init__/forward
    refcfg.TRUNCATED, refcfg.TRUNCATED_SIZE = True, t
    try:
        from models.DICL_shallow import FlowRegression

        reg = FlowRegression(md, md).eval()
        rng = np.random.RandomState(0)
        # well-separated costs so the argmax (hence the window) is stable
        cost = rng.randn(B, S, S, H, W).astype(np.float32) * 3.0
        # reference layout: (B, 1, U, V, H, W), u = horizontal
        t_in = torch.from_numpy(cost[:, None]).contiguous()
        with torch.no_grad():
            t_flow = reg(t_in).numpy()  # (B, 2, H, W) = (flowU, flowV)
    finally:
        refcfg.TRUNCATED, refcfg.TRUNCATED_SIZE = old_trunc, old_size

    from deep_sfm_revisited_tpu.models.dicl import flow_regression

    # ours: dv-outer/du-inner -> transpose the (u, v) plane of the
    # reference layout to (dv, du) before flattening
    j_cost = jnp.asarray(
        cost.transpose(0, 2, 1, 3, 4).reshape(B, S * S, H, W)
    )
    j_flow = np.asarray(flow_regression(j_cost, md, truncated_size=t))
    # (B, H, W, 2) [fu, fv] vs (B, 2, H, W) [U, V]
    assert np.abs(j_flow[..., 0] - t_flow[:, 0]).max() < 1e-5
    assert np.abs(j_flow[..., 1] - t_flow[:, 1]).max() < 1e-5
    # sanity: the window actually bites (differs from the untruncated form)
    j_plain = np.asarray(flow_regression(j_cost, md))
    assert np.abs(j_plain - j_flow).max() > 1e-3
