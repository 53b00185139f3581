"""End-to-end throughput benchmark on the real TPU chip.

Measures flagship frame-pairs/sec of the full SFMNet eval pipeline at
the reference's DEFAULT configuration (DICL flow -> on-device f64
five-point RANSAC pose over 512x5 hypotheses -> PSNet plane-sweep depth
with nlabel=128) at the KITTI eval shape (padded 384x1280, b=1, bf16
compute; ≙ `README.md:57-61` + `main.py:494-533`; FLOW_EST='DICL' is the
reference default, lib/config.py:178, and what the released
kitti.pth.tar weights use).

Prints ONE JSON line:
  {"metric": "frame_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N / BASELINE_FPS}

BASELINE_FPS is the reference pipeline's measured order of magnitude on a
datacenter GPU: the serial per-image SIFT+FLANN+RANSAC pose path plus
DICL flow and a 128-plane PSNet sweep runs at ~1 s/frame-pair
(BASELINE.md targets >= 3x A100 throughput per v5e chip; the reference
publishes no fps, so 1.0 pairs/s is the documented working estimate).

Fault tolerance: the axon platform can fail a single device->host read
with a transient `FAILED_PRECONDITION: TPU backend error` (this killed
the round-1 driver capture). Warmup reads are individually tolerated and
the whole build+measure attempt retries with bounded backoff
(utils/retry.py) — the JSON line is emitted as long as ONE timed
measurement survives.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 1.0

# eval-protocol shapes: KITTI 370x1224 padded to /128 (main.py:315-338)
B, H, W = 1, 384, 1280
WARMUP = 2
ITERS = 16  # distinct pairs per program; the one ~25 ms read amortizes


def _read_scalar(x) -> float:
    """Device->host sync read (patchable seam for the chaos test)."""
    return float(x)


def _build_and_measure(shape=(B, H, W), iters=ITERS, warmup=WARMUP,
                       cfg_overrides=None):
    """Create model + inputs, jit, warm up, and time one scan program.

    Self-contained so a backend-reset retry rebuilds all device state.
    """
    from deep_sfm_revisited_tpu.config import SfMConfig
    from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

    b, h, w = shape
    over = {
        "pose.num_hypotheses": 512,
        "pose.ransac_iter": 5,
        "pose.num_correspondences": 1024,
        "pose.polish_iters": 5,
    }
    over.update(cfg_overrides or {})
    cfg = SfMConfig.kitti(nlabel=128).override(**over)
    model = SFMNet(cfg, dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    ref = jax.random.uniform(key, (b, h, w, 3), jnp.float32, -1, 1)
    target = jnp.roll(ref, 3, axis=2)
    K = jnp.broadcast_to(
        jnp.asarray(
            [[718.856, 0, 607.19], [0, 718.856, 185.2], [0, 0, 1]],
            jnp.float32,
        ),
        (b, 3, 3),
    )

    # initialize at a small spatial size (conv/BN parameter shapes are
    # resolution-independent) and under jit — an unjitted init dispatches
    # thousands of single ops through the remote TPU helper (minutes).
    hs, ws = min(h, 128), min(w, 384)
    ref_s, tgt_s = ref[:, :hs, :ws], target[:, :hs, :ws]
    variables = jax.jit(
        lambda r, t, k: model.init(jax.random.PRNGKey(1), r, t, k,
                                   key=jax.random.PRNGKey(2))
    )(ref_s, tgt_s, K)

    # throughput protocol: run ITERS DISTINCT frame pairs inside ONE
    # program (lax.scan over stacked inputs), then one scalar read.
    # Rationale (measured, scratch/pose_only_bench.py):
    #   * on the remote axon platform every program DISPATCH costs ~27 ms
    #     of HTTP round-trip — per-call timing measures the tunnel, not
    #     the chip (a local runtime dispatches in microseconds);
    #   * block_until_ready can return before execution finishes here, so
    #     the sync is a device->host scalar read (a true data dependency);
    #   * the pairs MUST be distinct: with loop-invariant images XLA
    #     hoists the whole flow network out of the scan and the number is
    #     fake (verified: 15 ms/pair hoisted vs 31 ms/pair distinct on
    #     the pose-only path).
    keys = jax.random.split(jax.random.PRNGKey(3), iters)
    refs = jax.random.uniform(
        jax.random.PRNGKey(4), (iters, b, h, w, 3), jnp.float32, -1, 1
    )
    tgts = jnp.roll(refs, 3, axis=3)

    @jax.jit
    def forward_all(variables, refs, tgts, K, keys):
        def body(carry, inp):
            r, t, kk = inp
            out = model.apply(variables, r, t, K, key=kk)
            return carry + jnp.sum(out["depth"]), None

        tot, _ = jax.lax.scan(body, 0.0, (refs, tgts, keys))
        return tot

    # warmup: each read individually tolerated — a transient failure on a
    # warmup read must not kill the bench (the compile is already cached)
    warmed = 0
    last_err = None
    from deep_sfm_revisited_tpu.utils.retry import is_transient

    for _ in range(max(warmup, 1) + 2):  # up to 2 extra tries
        try:
            _read_scalar(forward_all(variables, refs, tgts, K, keys))
            warmed += 1
            if warmed >= max(warmup, 1):
                break
        except Exception as e:
            if not is_transient(e):
                raise
            last_err = e
            print(f"bench: warmup read failed (transient): {e}",
                  file=sys.stderr)
    if warmed == 0 and last_err is not None:
        raise last_err

    t0 = time.perf_counter()
    _read_scalar(forward_all(variables, refs, tgts, K, keys))
    dt = time.perf_counter() - t0
    return b * iters / dt


def main(shape=(B, H, W), iters=ITERS, warmup=WARMUP, cfg_overrides=None,
         attempts=3):
    jax.config.update("jax_enable_x64", True)
    from deep_sfm_revisited_tpu.utils.retry import run_with_backend_retry

    fps = run_with_backend_retry(
        lambda: _build_and_measure(shape, iters, warmup, cfg_overrides),
        attempts=attempts,
        label="bench",
    )
    line = json.dumps({
        "metric": "frame_pairs_per_sec",
        "value": round(fps, 3),
        "unit": "pairs/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    })
    print(line)
    return line


if __name__ == "__main__":
    main()
