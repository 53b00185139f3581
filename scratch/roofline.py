"""Consolidated per-stage roofline for the flagship eval pipeline.

Generates the PERF.md "Roofline" table: for each pipeline stage at the
KITTI eval configuration (b=1, 384x1280, nlabel=128, DICL flow,
512x5-hypothesis RANSAC), reports
  FLOPs, HBM bytes, the v5e roofline bound max(FLOPs/peak, bytes/BW),
  the measured on-chip time (PERF.md stage ablations, provenance in
  comments), and measured-vs-bound — plus the implied speed-of-light
  pairs/s for the whole pipeline.

FLOPs/bytes come from XLA's own cost analysis of each stage program
(lowered on CPU at the real shapes — jit-for-analysis only, nothing is
executed), so the numbers track the code, not a hand model.

Run: python scratch/roofline.py            (analysis only, no TPU)
"""

import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

# v5e public specs: 197 TFLOP/s bf16 peak, 819 GB/s HBM
PEAK_FLOPS = 197e12
HBM_BW = 819e9

B, H, W = 1, 384, 1280
NLABEL = 128
HYPS, RITER, NPTS = 512, 5, 1024

# Measured on-chip stage times, ms (scan-protocol clean; PERF.md
# "Stage breakdown" 2026-08-19 + round-3 validate delta). Re-measure
# with scratch/e2e_scan_ablate.py / ransac_ablate.py / dicl_ablate.py /
# psnet_stage_ablate.py.
MEASURED_MS = {
    "DICL flow": 20.3,
    "RANSAC (5pt+score+polish)": 10.5,
    "PSNet sweep warp": 13.5,
    "PSNet cost-volume+regress": 10.0,
    "PSNet hourglass": 57.0,
    "PSNet ContextNet (full-D)": 27.0,
    "PSNet DepthContextNet": 10.0,
    "PSNet SPP features": 6.0,
    # bisection median (round 4): validate == sum-only bench within
    # noise — metric math is now < ~2 ms/pair (was 8.2 with the sort)
    "Eigen eval metrics": 2.0,
}


def cost(fn, *args):
    """XLA cost analysis of jit(fn) at the given avals: (flops, bytes)."""
    lowered = jax.jit(fn).lower(*args)
    try:
        an = lowered.compile().cost_analysis()
    except Exception as e:  # pragma: no cover
        print("cost_analysis failed:", e)
        return float("nan"), float("nan")
    if isinstance(an, list):
        an = an[0]
    return float(an.get("flops", np.nan)), float(
        an.get("bytes accessed", np.nan))


def sweep_args():
    ref = jnp.zeros((B, H, W, 3), jnp.bfloat16)
    K = jnp.eye(3, dtype=jnp.float32)[None]
    pose = jnp.concatenate(
        [jnp.eye(3), jnp.asarray([[0.0], [0.0], [0.6]])], 1)[None]
    return ref, K, pose


def main():
    from deep_sfm_revisited_tpu.config import SfMConfig
    from deep_sfm_revisited_tpu.models import dicl as mdicl
    from deep_sfm_revisited_tpu.models import psnet as mpsnet
    from deep_sfm_revisited_tpu.ops import essential as ess

    cfg = SfMConfig.kitti(nlabel=NLABEL)
    rows = {}

    # --- DICL flow ------------------------------------------------------
    m = mdicl.DICLFlow(cfg.flow, dtype=jnp.bfloat16)
    pair = jnp.zeros((B, H, W, 6), jnp.float32)
    params = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), pair))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), params)
    rows["DICL flow"] = cost(
        lambda p, x: m.apply(p, x), params, pair)

    # --- RANSAC ---------------------------------------------------------
    x1 = jnp.zeros((B, NPTS, 2), jnp.float64)
    rows["RANSAC (5pt+score+polish)"] = cost(
        lambda a, b: ess.ransac_pose(
            a, b, jax.random.PRNGKey(0),
            num_hypotheses=HYPS, ransac_iter=RITER,
            polish_iters=cfg.pose.polish_iters,
            solve_dtype=jnp.float32),
        x1, x1)

    # --- PSNet (whole) + stage attribution by measured split ------------
    dm = mpsnet.PSNet(cfg.depth, dtype=jnp.bfloat16)
    ref, K, pose = sweep_args()
    Kinv = jnp.linalg.inv(K)
    dvars = jax.eval_shape(
        lambda: dm.init(jax.random.PRNGKey(0), ref, ref[:, None],
                        pose[:, None], K, Kinv))
    dvars = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), dvars)
    rows["PSNet total"] = cost(
        lambda v, r, t, p, k, ki: dm.apply(v, r, t[:, None], p[:, None],
                                           k, ki),
        dvars, ref, ref, pose, K, Kinv)

    # --- Eigen eval metrics --------------------------------------------
    from deep_sfm_revisited_tpu.train.metrics import evaluate_depth

    depth = jnp.zeros((B, H, W), jnp.float32)
    raw_hw = jnp.asarray([[370, 1226]], jnp.int32)
    rows["Eigen eval metrics"] = cost(
        lambda d, g: evaluate_depth(d, g, nlabel=NLABEL, min_depth=0.5,
                                    raw_hw=raw_hw),
        depth, depth)

    # --- table ----------------------------------------------------------
    # NOTE on bounds: "GB touched" is XLA cost-analysis `bytes accessed`
    # = sum of operand+result bytes over ALL ops, i.e. HBM traffic of a
    # completely UNFUSED execution — a loose upper bound (TPU fusion
    # keeps most intermediates in VMEM). The auditable roofline floor is
    # therefore the FLOP bound; MFU = flop-bound / measured. A stage
    # whose MFU sits at the measured XLA conv ceiling (25-45%, PERF.md
    # efficiency map) is compute-limited at the achievable (not
    # theoretical-peak) rate.
    psnet_ms = sum(MEASURED_MS[k] for k in MEASURED_MS
                   if k.startswith("PSNet"))
    print("\n| stage | GFLOP | GB touched (unfused UB) | flop-bound ms "
          "| measured ms | MFU |")
    print("|---|---|---|---|---|---|")
    total_bound = 0.0
    total_meas = 0.0
    for name, (fl, by) in rows.items():
        if name == "PSNet total":
            meas = psnet_ms
        else:
            meas = MEASURED_MS.get(name, float("nan"))
        bound = fl / PEAK_FLOPS * 1e3
        total_bound += bound
        total_meas += meas
        print(f"| {name} | {fl / 1e9:.1f} | {by / 1e9:.2f} | "
              f"{bound:.2f} | {meas:.1f} | "
              f"{100 * bound / max(meas, 1e-9):.0f}% |")
    print(f"| TOTAL | | | {total_bound:.1f} | {total_meas:.1f} | "
          f"{100 * total_bound / max(total_meas, 1e-9):.0f}% |")
    print(f"\nspeed-of-light pairs/s (100% MXU): {1e3 / total_bound:.1f}; "
          f"at the measured 42% conv ceiling: "
          f"{1e3 / (total_bound / 0.42):.1f}; measured: "
          f"{1e3 / total_meas:.2f}")


if __name__ == "__main__":
    main()
