"""Eigen eval protocol: padded inputs must evaluate EXACTLY like raw ones.

The reference crops the padded prediction back to raw size and computes
the crop window on the raw dims (`main.py:543,568-574`). We keep static
padded shapes under jit and instead mask with per-image `raw_hw` —
these tests pin that the two formulations agree."""

import numpy as np
import jax.numpy as jnp
import pytest

from deep_sfm_revisited_tpu.data.loader import collate, pad_to_multiple
from deep_sfm_revisited_tpu.train.metrics import (
    eigen_crop_mask,
    evaluate_depth,
)


def _scene(rng, h, w):
    gt = np.zeros((h, w), np.float64)
    # sparse LiDAR-like GT in the lower image half
    ys = rng.integers(h // 3, h, size=4000)
    xs = rng.integers(0, w, size=4000)
    gt[ys, xs] = rng.uniform(1.0, 79.0, size=4000)
    pred = rng.uniform(0.5, 90.0, size=(h, w))
    return gt, pred


def test_crop_window_matches_reference_formula_370x1224():
    """Reference: crop = int32([0.40810811*h, 0.99189189*h, 0.03594771*w,
    0.96405229*w]) rows/cols half-open (`main.py:571-574`)."""
    h, w = 370, 1224
    gt = jnp.ones((1, h, w))  # everywhere valid
    mask = np.asarray(eigen_crop_mask(gt))
    crop = np.array(
        [0.40810811 * h, 0.99189189 * h, 0.03594771 * w, 0.96405229 * w]
    ).astype(np.int32)
    assert tuple(crop) == (151, 366, 43, 1180)
    expect = np.zeros((h, w), bool)
    expect[crop[0]:crop[1], crop[2]:crop[3]] = True
    np.testing.assert_array_equal(mask[0], expect)


def test_padded_metrics_equal_unpadded():
    rng = np.random.default_rng(0)
    h, w = 370, 1224
    gt, pred = _scene(rng, h, w)

    ref = evaluate_depth(
        jnp.asarray(pred)[None], jnp.asarray(gt)[None],
        nlabel=128, min_depth=0.5,
    )

    # pad exactly as the loader does: gt zeros; the prediction carries
    # whatever the network produced in the padded band (junk here)
    gt_p = pad_to_multiple(gt, 128, mode="zeros")
    pred_p = pad_to_multiple(pred, 128, mode="edge")
    pred_p[h:, :] = 123.0
    pred_p[:, w:] = 456.0
    assert gt_p.shape == (384, 1280)
    raw_hw = jnp.asarray([[h, w]], jnp.int32)
    got = evaluate_depth(
        jnp.asarray(pred_p)[None], jnp.asarray(gt_p)[None],
        nlabel=128, min_depth=0.5, raw_hw=raw_hw,
    )

    for k in ref:
        np.testing.assert_allclose(
            float(got[k]), float(ref[k]), rtol=0, atol=1e-12,
            err_msg=k,
        )


def test_padded_crop_window_not_shifted():
    """Round-1 bug: the window computed on PADDED dims (384x1280) shifts
    vs the raw-dims window — assert the raw_hw path does not."""
    h, w = 370, 1224
    gt = np.zeros((384, 1280))
    gt[:h, :w] = 1.0  # valid everywhere inside raw region
    mask = np.asarray(
        eigen_crop_mask(jnp.asarray(gt)[None],
                        raw_hw=jnp.asarray([[h, w]], jnp.int32))
    )[0]
    ys, xs = np.nonzero(mask)
    assert (ys.min(), ys.max()) == (151, 365)
    assert (xs.min(), xs.max()) == (43, 1179)


def test_demon_protocol_mask():
    """DeMoN branch: 0.5 <= d <= 10 m, finite, NO Eigen crop
    (≙ main.py:565-566)."""
    from deep_sfm_revisited_tpu.train.metrics import demon_mask

    gt = np.zeros((1, 8, 10), np.float32)
    gt[0, 0, 0] = 0.4    # below range
    gt[0, 0, 1] = 0.5    # inclusive lower bound
    gt[0, 0, 2] = 10.0   # inclusive upper bound
    gt[0, 0, 3] = 10.5   # above range
    gt[0, 0, 4] = np.nan
    gt[0, 7, 9] = 5.0    # corner INSIDE (no crop window in this protocol)
    m = np.asarray(demon_mask(jnp.asarray(gt)))
    assert not m[0, 0, 0] and m[0, 0, 1] and m[0, 0, 2]
    assert not m[0, 0, 3] and not m[0, 0, 4]
    assert m[0, 7, 9]

    # raw_hw masks the padded band
    m2 = np.asarray(demon_mask(jnp.asarray(gt),
                               raw_hw=jnp.asarray([[7, 9]], jnp.int32)))
    assert not m2[0, 7, 9]

    res = evaluate_depth(jnp.asarray(gt) + 1.0, jnp.asarray(gt),
                         nlabel=128, min_depth=0.5, protocol="demon")
    assert np.isfinite(float(res["abs_rel"]))


def test_record_pose_eval_early_return():
    """RECORD_POSE_EVAL returns the pose early at eval but runs the full
    pipeline in training (≙ models/SFMnet.py:157)."""
    import jax

    from deep_sfm_revisited_tpu.config import SfMConfig
    from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

    cfg = SfMConfig().override(**{
        "flow.raft_iters_train": 2, "flow.raft_iters_eval": 2,
        "depth.nlabel": 8, "pose.num_hypotheses": 8,
        "pose.ransac_iter": 1, "pose.num_correspondences": 64,
        "pose.polish_iters": 2, "record_pose_eval": True,
    })
    model = SFMNet(cfg, dtype=jnp.float32)
    b, h, w = 1, 32, 48
    ref = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, 3))
    tgt = jnp.roll(ref, 2, axis=2)
    K = jnp.broadcast_to(
        jnp.asarray([[40.0, 0, 24], [0, 40.0, 16], [0, 0, 1]]), (b, 3, 3))
    v = jax.jit(lambda: model.init(
        jax.random.PRNGKey(1), ref, tgt, K, train=True,
        key=jax.random.PRNGKey(2)))()
    out_eval = model.apply(v, ref, tgt, K, train=False,
                           key=jax.random.PRNGKey(2))
    assert set(out_eval.keys()) == {"pose", "flow", "num_matches"}
    out_train = model.apply(v, ref, tgt, K, train=True,
                            key=jax.random.PRNGKey(2),
                            mutable=["batch_stats"])[0]
    assert "depth" in out_train


def test_collate_zero_pads_gt_and_records_raw_hw():
    h, w = 370, 1224
    rng = np.random.default_rng(1)
    s = {
        "ref": rng.random((h, w, 3), np.float32),
        "target": rng.random((h, w, 3), np.float32),
        "depth_gt": rng.random((h, w)).astype(np.float32) + 1.0,
        "intrinsics": np.eye(3, dtype=np.float32),
    }
    batch = collate([s], pad_multiple=128)
    assert batch["ref"].shape == (1, 384, 1280, 3)
    assert batch["depth_gt"].shape == (1, 384, 1280)
    np.testing.assert_array_equal(batch["raw_hw"], [[h, w]])
    # depth padding is zeros (outside every (gt>0) mask) ...
    assert np.all(batch["depth_gt"][0, h:, :] == 0)
    assert np.all(batch["depth_gt"][0, :, w:] == 0)
    # ... images replicate (≙ F.pad 'replicate', main.py:497-500)
    np.testing.assert_array_equal(
        batch["ref"][0, h:, :w], np.broadcast_to(
            s["ref"][h - 1], (384 - h, w, 3))
    )


def test_bisection_median_equals_sort_median():
    """The 32-step bit-bisection masked median (the round-4 replacement
    for the chained-validate full-image sort) must be BIT-EXACT against
    the sort-based reference on every edge case: empty mask, single
    element, duplicates, even/odd counts, negatives, denormal-free
    random depths."""
    import jax

    from deep_sfm_revisited_tpu.train.metrics import (
        _masked_median,
        _masked_median_sort,
    )

    rng = np.random.default_rng(0)
    cases = []
    x = rng.uniform(0.01, 80.0, 4096).astype(np.float32)
    m = rng.random(4096) < 0.4
    cases.append((x, m))
    cases.append((x, np.zeros(4096, bool)))          # empty -> 1.0
    m1 = np.zeros(4096, bool)
    m1[7] = True
    cases.append((x, m1))                            # single element
    xd = np.repeat(rng.uniform(1, 10, 16).astype(np.float32), 256)
    cases.append((xd, rng.random(4096) < 0.5))       # heavy duplicates
    xn = rng.normal(0, 5, 4096).astype(np.float32)
    cases.append((xn, rng.random(4096) < 0.5))       # negatives too
    m_even = np.zeros(4096, bool)
    m_even[:10] = True
    m_odd = np.zeros(4096, bool)
    m_odd[:11] = True
    cases.append((x, m_even))
    cases.append((x, m_odd))

    for x_, m_ in cases:
        a = float(jax.jit(_masked_median)(jnp.asarray(x_),
                                          jnp.asarray(m_)))
        b = float(jax.jit(_masked_median_sort)(jnp.asarray(x_),
                                               jnp.asarray(m_)))
        assert a == b, (a, b, m_.sum())
