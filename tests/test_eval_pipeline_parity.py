"""END-TO-END eval-pipeline parity vs the reference (VERDICT round-1 #3).

Round 1 proved network parity (same weights -> same tensors). This file
proves parity of the EVAL PIPELINE: the same reference torch PSNet
weights, pushed through

  torch side: replicate-pad -> PSNet(GT pose) -> RESCALE_DEPTH rescale ->
      crop to raw -> Eigen mask (raw dims) -> per-image median scale ->
      clamp -> the 9 metric formulas          (≙ main.py:494-590,727-747)
  jax side:   the production path — collate(pad + raw_hw) -> SFMNet ->
      make_eval_step -> evaluate_depth

must produce the same abs_rel/rmse/... numbers. The torch side is an
independent numpy transcription of the reference protocol formulas (not
of our code), so a wiring bug on either leg fails the comparison.

GOLDEN PINS (VERDICT round-2 weak #2): both fixtures' metric values are
pinned exactly (tol 1e-3) so a regression that shifts BOTH legs equally
(collate, shared protocol constants, crop fractions, clamp, median) still
fails loudly. Two fixtures: A exercises the plain path; B uses different
raw dims, a stronger pose scale, and full-frame GT points so the Eigen
crop edges and the median rescale are load-bearing. If a fixture changes,
re-derive BOTH sides together and say why in the commit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_harness import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout absent"
)

NLABEL = 8
PAD = 64  # stand-in for the /128 rule at test scale; both sides use it

FIXTURES = {
    # name: (seed, raw_h, raw_w, rot_angle, translation, depth_lo, depth_hi,
    #        full_frame_points)
    "A": (0, 120, 200, 0.03, (0.7, 0.1, 0.7), 2.0, 7.5, False),
    # B: other raw dims (crop window moves), |t| = 1.4 (strong RESCALE),
    # GT over the FULL frame (Eigen crop must cut rows/cols), wider depth
    # range (clamp at nlabel*min_depth strongly active on both tails)
    "B": (1, 104, 168, -0.05, (-0.9, 0.2, 1.05), 1.0, 12.0, True),
}

# pinned metric values for (fixture, seeded torch weights); re-derive
# with `python -m tests.test_eval_pipeline_parity` — update together
# with any fixture change and say why in the commit
GOLDEN = {
    "A": {
        "a1": 0.411660,
        "a2": 0.819760,
        "a3": 0.923453,
        "abs_rel": 0.342087,
        "l1_inv": 0.071227,
        "rmse": 1.553094,
        "rmse_log": 0.361665,
        "sc_inv": 0.355524,
        "sq_rel": 0.645812,
    },
    "B": {
        "a1": 0.259986,
        "a2": 0.518619,
        "a3": 0.783345,
        "abs_rel": 0.753014,
        "l1_inv": 0.117403,
        "rmse": 3.232748,
        "rmse_log": 0.651136,
        "sc_inv": 0.631827,
        "sq_rel": 3.074930,
    },
}


def _fixture_pair(name):
    seed, raw_h, raw_w, ang, t, dlo, dhi, full = FIXTURES[name]
    rng = np.random.default_rng(seed)
    ref = rng.uniform(-1, 1, (1, raw_h, raw_w, 3)).astype(np.float32)
    tgt = rng.uniform(-1, 1, (1, raw_h, raw_w, 3)).astype(np.float32)
    K = np.asarray(
        [[[100.0, 0, raw_w / 2], [0, 100.0, raw_h / 2], [0, 0, 1]]],
        np.float32)
    R = np.asarray([
        [np.cos(ang), -np.sin(ang), 0.0],
        [np.sin(ang), np.cos(ang), 0.0],
        [0.0, 0.0, 1.0],
    ])
    t = np.asarray(t)
    pose = np.concatenate([R, t[:, None]], axis=1)[None].astype(np.float32)
    # sparse LiDAR-like GT depth
    gt = np.zeros((1, raw_h, raw_w), np.float32)
    y_lo = 0 if full else raw_h // 3
    ys = rng.integers(y_lo, raw_h, 3000)
    xs = rng.integers(0, raw_w, 3000)
    gt[0, ys, xs] = rng.uniform(dlo, dhi, 3000).astype(np.float32)
    return ref, tgt, K, pose, gt


def _torch_psnet():
    refcfg = load_reference()
    import torch

    from models.PSNet import PSNet as RefPSNet

    torch.manual_seed(0)
    tm = RefPSNet(NLABEL, refcfg.MIN_DEPTH).eval()
    with torch.no_grad():
        # fresh eval-mode BatchNorms have unit running stats; default-init
        # activations explode — scale down (see test_reference_parity.py)
        for m in tm.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.Conv3d)):
                m.weight.mul_(0.5)
    return tm, refcfg


def _reference_protocol_metrics(tm, refcfg, ref, tgt, K, pose, gt):
    """The reference validate() protocol, transcribed formula-by-formula
    from main.py:494-590 + 727-747 (NOT from our code)."""
    import torch
    import torch.nn.functional as F

    raw_h, raw_w = gt.shape[1:]
    ref_t = torch.from_numpy(ref.transpose(0, 3, 1, 2))
    tgt_t = torch.from_numpy(tgt.transpose(0, 3, 1, 2))
    h_new = int(np.ceil(raw_h / PAD) * PAD)
    w_new = int(np.ceil(raw_w / PAD) * PAD)
    padding = (0, w_new - raw_w, 0, h_new - raw_h)
    ref_t = F.pad(ref_t, padding, "replicate")
    tgt_t = F.pad(tgt_t, padding, "replicate")

    K_t = torch.from_numpy(K)
    pose_t = torch.from_numpy(pose)[:, None]
    with torch.no_grad():
        _, depth = tm(ref_t, [tgt_t], pose_t.clone(), K_t,
                      torch.inverse(K_t))
    depth = depth.numpy().reshape(1, h_new, w_new)

    # RESCALE_DEPTH: undo the NORM_TARGET normalization (main.py:536-541)
    scale = np.linalg.norm(pose[0, :3, 3])
    depth = depth * (scale / refcfg.NORM_TARGET)
    # crop to raw (main.py:543)
    depth = depth[:, :raw_h, :raw_w]

    # Eigen mask on raw dims (main.py:568-574)
    mask = (gt > 0) & (gt < 80)
    crop = np.array([0.40810811 * raw_h, 0.99189189 * raw_h,
                     0.03594771 * raw_w, 0.96405229 * raw_w]).astype(
                         np.int32)
    crop_mask = np.zeros_like(mask)
    crop_mask[:, crop[0]:crop[1], crop[2]:crop[3]] = True
    mask = mask & crop_mask

    # median scale (main.py:576-585)
    med = np.median(gt[0][mask[0]]) / np.median(depth[0][mask[0]])
    depth = depth * med
    # clamp (main.py:587-590)
    max_range = refcfg.MIN_DEPTH * NLABEL
    depth = np.clip(depth, refcfg.MIN_DEPTH, max_range)

    g, p = gt[mask].astype(np.float64), depth[mask].astype(np.float64)
    thresh = np.maximum(g / p, p / g)
    logd = np.log(g) - np.log(p)
    return {
        "abs_rel": np.mean(np.abs(g - p) / g),
        "sq_rel": np.mean((g - p) ** 2 / g),
        "rmse": np.sqrt(np.mean((g - p) ** 2)),
        "rmse_log": np.sqrt(np.mean(logd ** 2)),
        "a1": np.mean(thresh < 1.25),
        "a2": np.mean(thresh < 1.25 ** 2),
        "a3": np.mean(thresh < 1.25 ** 3),
        "l1_inv": np.mean(np.abs(1.0 / g - 1.0 / p)),
        "sc_inv": np.sqrt(np.mean(logd ** 2) - np.mean(logd) ** 2),
    }


def _our_pipeline_metrics(tm, ref, tgt, K, pose, gt):
    """The production path: collate-pad -> SFMNet -> make_eval_step."""
    from deep_sfm_revisited_tpu.config import SfMConfig
    from deep_sfm_revisited_tpu.data.loader import collate
    from deep_sfm_revisited_tpu.train.trainer import (
        create_train_state,
        make_eval_step,
    )
    from deep_sfm_revisited_tpu.utils import torch_port as tp

    cfg = SfMConfig.kitti(nlabel=NLABEL).override(**{
        "train.mixed_prec": False,       # f32 for numeric comparison
        "use_gt_pose": True,
        "data.pad_multiple": PAD,
        "flow.estimator": "RAFT",        # skipped under GT pose; RAFT
        "flow.raft_iters_train": 1,      # keeps init cheap on CPU
        "flow.raft_iters_eval": 1,
    })
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), sample_shape=(1, 64, 64))

    sd = {f"depth_estimator.{k}": v.numpy()
          for k, v in tm.state_dict().items()}
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    new_vars, report = tp.convert_reference_checkpoint(
        sd, variables, flow=None, depth="PSNET",
        context_bn=cfg.depth.context_bn,
        dep_context=cfg.depth.psnet_dep_context,
    )
    assert not report["missing"], report["missing"][:8]
    state = state.replace(params=new_vars["params"],
                          batch_stats=new_vars["batch_stats"])

    sample = {
        "ref": ref[0], "target": tgt[0], "intrinsics": K[0],
        "pose_gt": pose[0], "depth_gt": gt[0],
    }
    batch = collate([sample], pad_multiple=PAD)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    eval_fn = make_eval_step(model, cfg)
    metrics, _ = eval_fn(state, batch, jax.random.PRNGKey(0))
    return {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_eval_pipeline_parity_and_golden(name):
    ref, tgt, K, pose, gt = _fixture_pair(name)
    tm, refcfg = _torch_psnet()
    want = _reference_protocol_metrics(tm, refcfg, ref, tgt, K, pose, gt)
    got = _our_pipeline_metrics(tm, ref, tgt, K, pose, gt)

    for k, v in want.items():
        assert abs(got[k] - float(v)) < 2e-4 + 1e-3 * abs(float(v)), (
            k, got[k], float(v))

    # golden pin: any protocol-constant edit (crop fractions, clamp range,
    # median scaling, NORM_TARGET, collate padding) shifts these values
    # and must fail — even if it shifts both legs equally
    golden = GOLDEN[name]
    assert golden, f"golden values missing for fixture {name}"
    for k, v in golden.items():
        assert abs(float(want[k]) - v) < 1e-3 + 1e-3 * abs(v), (
            "torch-side drift", k, float(want[k]), v)
        assert abs(got[k] - v) < 1e-3 + 1e-3 * abs(v), (
            "jax-side drift", k, got[k], v)


if __name__ == "__main__":
    # golden derivation: python tests/test_eval_pipeline_parity.py
    for name in sorted(FIXTURES):
        ref, tgt, K, pose, gt = _fixture_pair(name)
        tm, refcfg = _torch_psnet()
        want = _reference_protocol_metrics(tm, refcfg, ref, tgt, K, pose,
                                           gt)
        print(f'    "{name}": {{')
        for k in sorted(want):
            print(f'        "{k}": {float(want[k]):.6f},')
        print("    },")
