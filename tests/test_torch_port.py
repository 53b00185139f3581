"""Torch-checkpoint porting (utils/torch_port.py).

Numeric micro-parity: a torch Conv+BN pair and a Conv3d stack must produce
the same outputs as our flax modules after porting. Full-tree coverage:
the PSNet entry table must fill every parameter/statistic leaf of our
PSNet from a synthetic state dict with the reference's key names.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from deep_sfm_revisited_tpu.config import SfMConfig
from deep_sfm_revisited_tpu.models.psnet import PSNet
from deep_sfm_revisited_tpu.models.submodules import ConvBN, ConvBN3D
from deep_sfm_revisited_tpu.utils import torch_port as tp


def _to_np(t):
    return t.detach().cpu().numpy()


def test_convbn2d_numeric_parity():
    torch.manual_seed(0)
    seq = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False),
        torch.nn.BatchNorm2d(8),
    )
    # non-trivial BN statistics
    with torch.no_grad():
        seq[1].running_mean.uniform_(-1, 1)
        seq[1].running_var.uniform_(0.5, 2.0)
        seq[1].weight.uniform_(0.5, 1.5)
        seq[1].bias.uniform_(-0.3, 0.3)
    seq.eval()

    x_t = torch.randn(2, 3, 16, 20)
    y_t = _to_np(seq(x_t)).transpose(0, 2, 3, 1)  # NCHW -> NHWC

    sd = {k: _to_np(v) for k, v in seq.state_dict().items()}
    mod = ConvBN(8, 3, 2, 1)
    x_j = jnp.asarray(_to_np(x_t).transpose(0, 2, 3, 1))
    variables = mod.init(jax.random.PRNGKey(0), x_j, False)
    entries = [("conv2d", "0", "Conv_0"), ("bn", "1", "BatchNorm_0")]
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"]
    y_j = np.asarray(mod.apply(ported, x_j, False))
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


def test_convbn3d_numeric_parity():
    torch.manual_seed(1)
    seq = torch.nn.Sequential(
        torch.nn.Conv3d(4, 6, 3, padding=1, bias=False),
        torch.nn.BatchNorm3d(6),
    )
    with torch.no_grad():
        seq[1].running_mean.uniform_(-1, 1)
        seq[1].running_var.uniform_(0.5, 2.0)
    seq.eval()

    x_t = torch.randn(1, 4, 5, 8, 12)  # NCDHW
    y_t = _to_np(seq(x_t)).transpose(0, 2, 3, 4, 1)  # -> NDHWC

    sd = {k: _to_np(v) for k, v in seq.state_dict().items()}
    mod = ConvBN3D(6, (3, 3, 3))
    x_j = jnp.asarray(_to_np(x_t).transpose(0, 2, 3, 4, 1))
    variables = mod.init(jax.random.PRNGKey(0), x_j, False)
    entries = [("conv3d", "0", "Conv3DMXU_0"), ("bn", "1", "BatchNorm_0")]
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"]
    y_j = np.asarray(mod.apply(ported, x_j, False))
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


def test_per_plane_2d_conv_equals_conv3dmxu():
    """The reference applies 2D context convs per depth plane
    (models/PSNet.py:179-190); our (1,k,k) Conv3DMXU with the ported
    kernel must match that loop exactly."""
    torch.manual_seed(2)
    conv = torch.nn.Conv2d(5, 7, 3, padding=1, bias=False)
    conv.eval()
    x_t = torch.randn(1, 5, 4, 8, 10)  # NCDHW: 4 planes
    planes = [conv(x_t[:, :, d]) for d in range(4)]
    y_t = _to_np(torch.stack(planes, dim=2)).transpose(0, 2, 3, 4, 1)

    from deep_sfm_revisited_tpu.models.submodules import Conv3DMXU

    sd = {"c.weight": _to_np(conv.weight)}
    mod = Conv3DMXU(7, (1, 3, 3), use_bias=False)
    x_j = jnp.asarray(_to_np(x_t).transpose(0, 2, 3, 4, 1))
    variables = mod.init(jax.random.PRNGKey(0), x_j)
    ported, report = tp.apply_entries(sd, variables,
                                      [("conv2d_to_3d", "c", "")])
    assert not report["missing"]
    y_j = np.asarray(mod.apply(ported, x_j))
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


def test_psnet_entry_table_covers_every_leaf():
    """Synthesize a torch state dict with the reference PSNet key names,
    port it, and require (a) every flax leaf overwritten, (b) every
    synthesized torch key consumed, (c) nothing missing."""
    cfg = SfMConfig().override(**{"depth.nlabel": 4})
    net = PSNet(cfg.depth, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 96, 3))
    pose = jnp.concatenate([jnp.eye(3)[None], jnp.ones((1, 3, 1))], -1)
    K = jnp.asarray([[[80.0, 0, 48], [0, 80.0, 32], [0, 0, 1]]])
    variables = net.init(jax.random.PRNGKey(0), img, img[:, None],
                         pose[:, None], K, jnp.linalg.inv(K), False)

    entries = tp.psnet_entries("depth_estimator", "")

    # synthesize the torch side from the flax shapes via the inverse maps
    inv = {"conv2d": (3, 2, 0, 1), "conv3d": (4, 3, 0, 1, 2), "linear": (1, 0)}
    rng = np.random.RandomState(0)
    sd = {}
    for kind, tkey, fpath in entries:
        parts = tuple(p for p in fpath.split("/") if p)
        if kind == "bn":
            n = variables["params"][parts[0]]
            for p in parts[1:]:
                n = n[p]
            c = n["scale"].shape[0]
            sd[f"{tkey}.weight"] = rng.randn(c).astype(np.float32)
            sd[f"{tkey}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{tkey}.running_mean"] = rng.randn(c).astype(np.float32)
            sd[f"{tkey}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5
        else:
            n = variables["params"]
            for p in parts:
                n = n[p]
            shp = n["kernel"].shape
            if kind == "conv2d_to_3d":
                tshape = (shp[4], shp[3], shp[1], shp[2])  # (O,I,kh,kw)
            else:
                tshape = tuple(shp[i] for i in inv[kind])
            # small scale: N(0,1) kernels explode through the deep stack
            sd[f"{tkey}.weight"] = (0.05 * rng.randn(*tshape)).astype(np.float32)

    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]
    assert set(report["consumed"]) == set(sd.keys()), (
        set(sd.keys()) - set(report["consumed"])
    )

    # every leaf must have been overwritten
    flat_new = jax.tree_util.tree_flatten_with_path(ported)[0]
    flat_old = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    n_filled = 0
    for path, leaf in flat_new:
        k = jax.tree_util.keystr(path)
        if not np.array_equal(flat_old[k], np.asarray(leaf)):
            n_filled += 1
        else:
            # allow only leaves the table legitimately skips: none for PSNet
            raise AssertionError(f"leaf not ported: {k}")
    assert n_filled == len(flat_new)

    # and the ported model must still run
    d1, d2 = net.apply(ported, img, img[:, None], pose[:, None], K,
                       jnp.linalg.inv(K), False)
    assert np.isfinite(np.asarray(d1)).all() and np.isfinite(np.asarray(d2)).all()


def test_deconv_numeric_parity():
    """torch ConvTranspose2d(k4,s2,p1) == flax ConvTranspose('SAME') with
    the transposed+flipped kernel (the DICL Conv2x/matching upsamplers)."""
    torch.manual_seed(3)
    tc = torch.nn.ConvTranspose2d(5, 7, 4, stride=2, padding=1, bias=False)
    tc.eval()
    x_t = torch.randn(1, 5, 6, 9)
    y_t = _to_np(tc(x_t)).transpose(0, 2, 3, 1)

    from deep_sfm_revisited_tpu.models.dicl import BasicConv

    mod = BasicConv(7, 4, 2, deconv=True, bn=False, relu=False)
    x_j = jnp.asarray(_to_np(x_t).transpose(0, 2, 3, 1))
    variables = mod.init(jax.random.PRNGKey(0), x_j, False)
    sd = {"d.conv.weight": _to_np(tc.weight)}
    ported, report = tp.apply_entries(
        sd, variables, tp._basicconv("d", "", bn=False, deconv=True))
    assert not report["missing"]
    y_j = np.asarray(mod.apply(ported, x_j, False))
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


def _synth_sd_from_entries(entries, variables, rng, scale=0.05):
    inv = {"conv2d": (3, 2, 0, 1), "conv2d_bgr": (3, 2, 0, 1),
           "conv2d_disp_transpose": (3, 2, 0, 1),
           "conv3d": (4, 3, 0, 1, 2), "linear": (1, 0)}
    sd = {}
    for kind, tkey, fpath in entries:
        parts = tuple(p for p in fpath.split("/") if p)
        if kind == "conv2d_cat":
            n = variables["params"]
            for p_ in parts:
                n = n[p_]
            kh, kw, ci, co = n["kernel"].shape
            half = co // len(tkey)
            for k in tkey:
                sd[f"{k}.weight"] = (scale * rng.randn(half, ci, kh, kw)).astype(np.float32)
                if "bias" in n:
                    sd[f"{k}.bias"] = (scale * rng.randn(half)).astype(np.float32)
            continue
        if kind == "bn":
            n = variables["params"]
            for p in parts:
                n = n[p]
            c = n["scale"].shape[0]
            sd[f"{tkey}.weight"] = rng.randn(c).astype(np.float32)
            sd[f"{tkey}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{tkey}.running_mean"] = rng.randn(c).astype(np.float32)
            sd[f"{tkey}.running_var"] = np.abs(rng.randn(c)).astype(np.float32) + 0.5
            continue
        n = variables["params"]
        for p in parts:
            n = n[p]
        shp = n["kernel"].shape
        if kind == "conv2d_to_3d":
            tshape = (shp[4], shp[3], shp[1], shp[2])
        elif kind == "deconv2d":
            tshape = (shp[2], shp[3], shp[0], shp[1])
        else:
            tshape = tuple(shp[i] for i in inv[kind])
        sd[f"{tkey}.weight"] = (scale * rng.randn(*tshape)).astype(np.float32)
        if "bias" in n:
            sd[f"{tkey}.bias"] = (scale * rng.randn(shp[-1])).astype(np.float32)
    return sd


def test_dicl_entry_table_covers_every_leaf():
    """The DICL table must fill EVERY leaf of our DICLFlow at the KITTI
    recipe, consume every synthesized torch key, and leave the model
    runnable."""
    cfg = SfMConfig.kitti().flow
    from deep_sfm_revisited_tpu.models.dicl import DICLFlow

    net = DICLFlow(cfg)
    pair = jnp.zeros((1, 128, 128, 6))
    variables = net.init(jax.random.PRNGKey(0), pair, False)

    entries = tp.dicl_entries("flow_estimator", "")
    sd = _synth_sd_from_entries(entries, variables, np.random.RandomState(1))
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]
    assert set(report["consumed"]) == set(sd.keys()), (
        sorted(set(sd.keys()) - set(report["consumed"]))[:8]
    )

    flat_new = jax.tree_util.tree_flatten_with_path(ported)[0]
    flat_old = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    for path, leaf in flat_new:
        k = jax.tree_util.keystr(path)
        if np.array_equal(flat_old[k], np.asarray(leaf)):
            # the smoothing convs are identity-initialized; a ported
            # random kernel always differs, so nothing may be skipped
            raise AssertionError(f"leaf not ported: {k}")

    flow, entro = net.apply(ported, pair + 0.1, False)
    assert np.isfinite(np.asarray(flow)).all()


def test_full_sfmnet_checkpoint_roundtrip():
    """Full-model port: synthesize a reference-shaped SFMnet state dict
    (flow_estimator.* + depth_estimator.*), convert, and require every
    flow_net/depth_net leaf filled + a clean unused-key report."""
    from deep_sfm_revisited_tpu.models.sfmnet import SFMNet

    cfg = SfMConfig.kitti(nlabel=4).override(**{
        "flow.estimator": "DICL",
        "pose.num_hypotheses": 8,
        "pose.ransac_iter": 1,
        "pose.num_correspondences": 64,
        "pose.polish_iters": 1,
    })
    model = SFMNet(cfg, dtype=jnp.float32)
    ref = jnp.zeros((1, 128, 128, 3))
    K = jnp.asarray([[[80.0, 0, 64], [0, 80.0, 64], [0, 0, 1]]])
    variables = model.init(jax.random.PRNGKey(0), ref, ref, K,
                           key=jax.random.PRNGKey(1))

    entries = (tp.dicl_entries("flow_estimator", "flow_net")
               + tp.psnet_entries("depth_estimator", "depth_net"))
    sd = _synth_sd_from_entries(entries, {
        "params": variables["params"],
    } | {k: v for k, v in variables.items() if k != "params"},
        np.random.RandomState(2))
    # keys must resolve inside the full tree: prepend nothing, the entry
    # tables already carry flow_net/depth_net roots
    ported, report = tp.convert_reference_checkpoint(sd, variables)
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]

    flat_new = jax.tree_util.tree_flatten_with_path(ported)[0]
    flat_old = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    for path, leaf in flat_new:
        k = jax.tree_util.keystr(path)
        if ("flow_net" in k or "depth_net" in k) and np.array_equal(
                flat_old[k], np.asarray(leaf)):
            raise AssertionError(f"leaf not ported: {k}")


def test_fused_gru_port_matches_torch_gru():
    """One SepConvGRU direction: torch z/r/q convs vs our fused-zr module."""
    torch.manual_seed(4)
    hid, inp = 16, 24
    convz = torch.nn.Conv2d(hid + inp, hid, (1, 5), padding=(0, 2))
    convr = torch.nn.Conv2d(hid + inp, hid, (1, 5), padding=(0, 2))
    convq = torch.nn.Conv2d(hid + inp, hid, (1, 5), padding=(0, 2))
    convz2 = torch.nn.Conv2d(hid + inp, hid, (5, 1), padding=(2, 0))
    convr2 = torch.nn.Conv2d(hid + inp, hid, (5, 1), padding=(2, 0))
    convq2 = torch.nn.Conv2d(hid + inp, hid, (5, 1), padding=(2, 0))

    h_t = torch.randn(1, hid, 6, 8)
    x_t = torch.randn(1, inp, 6, 8)

    def direction(h, x, cz, cr, cq):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(cz(hx))
        r = torch.sigmoid(cr(hx))
        q = torch.tanh(cq(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q

    h1 = direction(h_t, x_t, convz, convr, convq)
    y_t = _to_np(direction(h1, x_t, convz2, convr2, convq2)).transpose(0, 2, 3, 1)

    from deep_sfm_revisited_tpu.models.raft import SepConvGRU

    mod = SepConvGRU(hid)
    h_j = jnp.asarray(_to_np(h_t).transpose(0, 2, 3, 1))
    x_j = jnp.asarray(_to_np(x_t).transpose(0, 2, 3, 1))
    variables = mod.init(jax.random.PRNGKey(0), h_j, x_j)

    sd = {}
    for name, c in (("gru.convz1", convz), ("gru.convr1", convr),
                    ("gru.convq1", convq), ("gru.convz2", convz2),
                    ("gru.convr2", convr2), ("gru.convq2", convq2)):
        sd[f"{name}.weight"] = _to_np(c.weight)
        sd[f"{name}.bias"] = _to_np(c.bias)
    entries = [("conv2d_cat", ("gru.convz1", "gru.convr1"), "Conv_0"),
               ("conv2d", "gru.convq1", "Conv_1"),
               ("conv2d_cat", ("gru.convz2", "gru.convr2"), "Conv_2"),
               ("conv2d", "gru.convq2", "Conv_3")]
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"]
    y_j = np.asarray(mod.apply(ported, h_j, x_j))
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


def test_raft_entry_table_covers_every_param_leaf():
    """The RAFT table must fill every PARAM leaf except the instance-norm
    GroupNorm scale/bias (torch InstanceNorm2d is affine=False — those
    stay at their identity init by design)."""
    from deep_sfm_revisited_tpu.models.raft import RAFT

    cfg = SfMConfig.kitti().override(**{"flow.raft_iters_eval": 2}).flow
    net = RAFT(cfg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)),
                         False)
    entries = tp.raft_entries("flow_estimator", "")
    sd = _synth_sd_from_entries(entries, variables, np.random.RandomState(3))
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]
    assert set(report["consumed"]) == set(sd.keys())

    flat_new = jax.tree_util.tree_flatten_with_path(ported)[0]
    flat_old = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    skipped = []
    for path, leaf in flat_new:
        k = jax.tree_util.keystr(path)
        if np.array_equal(flat_old[k], np.asarray(leaf)):
            skipped.append(k)
    assert all("GroupNorm" in k for k in skipped), [
        k for k in skipped if "GroupNorm" not in k][:8]

    flow, conf = net.apply(ported, 0.1 + jnp.zeros((1, 64, 64, 6)), False)
    assert np.isfinite(np.asarray(flow)).all()


def test_plainpose_entry_table_covers_every_leaf():
    from deep_sfm_revisited_tpu.models.posenet import PlainPose

    net = PlainPose()
    flow = jnp.zeros((1, 64, 64, 2))
    img = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), flow, img, img)
    entries = tp.plainpose_entries("posenet", "")
    sd = _synth_sd_from_entries(entries, variables, np.random.RandomState(4))
    ported, report = tp.apply_entries(sd, variables, entries)
    assert not report["missing"], report["missing"][:8]
    assert set(report["consumed"]) == set(sd.keys())
    flat_new = jax.tree_util.tree_flatten_with_path(ported)[0]
    flat_old = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    for path, leaf in flat_new:
        k = jax.tree_util.keystr(path)
        assert not np.array_equal(flat_old[k], np.asarray(leaf)), k
    out = net.apply(ported, flow, img, img)
    assert out.shape == (1, 6) and np.isfinite(np.asarray(out)).all()


def test_resize_bilinear_matches_torch_both_modes():
    from deep_sfm_revisited_tpu.models.submodules import resize_bilinear

    torch.manual_seed(5)
    x_t = torch.randn(2, 3, 24, 40)
    x_j = jnp.asarray(_to_np(x_t).transpose(0, 2, 3, 1))
    for ac in (True, False):
        for hw in ((96, 160), (13, 27)):
            y_t = torch.nn.functional.interpolate(
                x_t, hw, mode="bilinear", align_corners=ac)
            y_t = _to_np(y_t).transpose(0, 2, 3, 1)
            y_j = np.asarray(resize_bilinear(x_j, hw, align_corners=ac))
            np.testing.assert_allclose(y_j, y_t, atol=1e-5,
                                       err_msg=f"ac={ac} hw={hw}")


def test_trilinear_cost_upsample_matches_torch():
    """The PSNet regress() upsample == torch F.interpolate trilinear with
    D unchanged and default align_corners=False (PSNet.py:194,207)."""
    from deep_sfm_revisited_tpu.models.submodules import resize_bilinear

    torch.manual_seed(6)
    v_t = torch.randn(1, 1, 8, 12, 20)  # (B, 1, D, h, w)
    y_t = torch.nn.functional.interpolate(v_t, [8, 48, 80], mode="trilinear")
    y_t = _to_np(y_t)[:, 0]  # (B, D, H, W)

    v_j = jnp.asarray(_to_np(v_t))[:, 0]  # (B, D, h, w)
    B, D, h, w = v_j.shape
    vj = v_j.reshape(B * D, h, w, 1)
    y_j = np.asarray(resize_bilinear(vj, (48, 80), align_corners=False)
                     .reshape(B, D, 48, 80))
    np.testing.assert_allclose(y_j, y_t, atol=1e-5)


def test_cost_smoothing_displacement_permutation():
    """The ported 49x49 smoothing kernel must act on our (v-outer)
    displacement flattening exactly as the torch kernel acts on the
    reference's (u-outer) flattening."""
    S = 7
    conv = torch.nn.Conv2d(S * S, S * S, 1, bias=False)
    torch.manual_seed(7)
    with torch.no_grad():
        conv.weight.normal_()
    conv.eval()
    cost = torch.randn(1, S, S, 5, 6)  # (B, u, v, H, W)

    # reference: flatten u-outer, smooth, unflatten
    y_t = conv(cost.reshape(1, S * S, 5, 6)).reshape(1, S, S, 5, 6)
    y_t = _to_np(y_t)

    # ours: flatten v-outer (transpose), ported kernel, unflatten v-outer
    sd = {"sm.weight": _to_np(conv.weight)}
    from flax import linen as nn

    mod = nn.Conv(S * S, (1, 1), use_bias=False)
    x_o = _to_np(cost.permute(0, 2, 1, 3, 4).reshape(1, S * S, 5, 6))
    x_o = jnp.asarray(x_o.transpose(0, 2, 3, 1))  # NHWC
    variables = mod.init(jax.random.PRNGKey(0), x_o)
    ported, _ = tp.apply_entries(sd, variables,
                                 [("conv2d_disp_transpose", "sm", "")])
    y_o = np.asarray(mod.apply(ported, x_o))  # (1, 5, 6, S2) v-outer
    y_o = y_o.transpose(0, 3, 1, 2).reshape(1, S, S, 5, 6)  # (B, v, u, H, W)
    np.testing.assert_allclose(y_o.transpose(0, 2, 1, 3, 4), y_t, atol=1e-5)


def test_convert_reference_checkpoint_raft_flow():
    """The RAFT branch of the top-level converter (incl. the empty-prefix
    normalization over tuple-keyed conv2d_cat entries) must work."""
    from deep_sfm_revisited_tpu.models.raft import RAFT

    cfg = SfMConfig.kitti().override(**{"flow.raft_iters_eval": 2}).flow
    net = RAFT(cfg)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)),
                         False)
    # wrap under a flow_net root, as SFMNet variables are shaped
    wrapped = {k: {"flow_net": v} for k, v in variables.items()}
    entries = tp.raft_entries("flow_estimator", "flow_net")
    sd = _synth_sd_from_entries(entries, wrapped, np.random.RandomState(5))
    new_vars, report = tp.convert_reference_checkpoint(
        sd, wrapped, flow="RAFT", depth=None)
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]

    # flow-only checkpoint without the flow_estimator. prefix (main.py:222-235)
    sd_np = {k[len("flow_estimator."):]: v for k, v in sd.items()}
    new_vars, report = tp.convert_reference_checkpoint(
        sd_np, wrapped, flow="RAFT", depth=None)
    assert not report["missing"] and not report["unused"]


def test_bilinear_sample_matches_torch_grid_sample():
    """ops.camera.bilinear_sample == torch F.grid_sample(align_corners=True,
    padding_mode='zeros') for in-range and out-of-range coordinates —
    the core warp primitive of plane-sweep/inverse-warp/DICL warping."""
    from deep_sfm_revisited_tpu.ops.camera import bilinear_sample

    torch.manual_seed(8)
    B, H, W, C = 2, 13, 17, 5
    img_t = torch.randn(B, C, H, W)
    # coords spanning in-range, boundary, and far out-of-range
    xs = torch.empty(B, 9, 7).uniform_(-3, W + 2)
    ys = torch.empty(B, 9, 7).uniform_(-3, H + 2)
    gx = 2.0 * xs / max(W - 1, 1) - 1.0
    gy = 2.0 * ys / max(H - 1, 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    y_t = torch.nn.functional.grid_sample(
        img_t, grid, mode="bilinear", padding_mode="zeros",
        align_corners=True)
    y_t = _to_np(y_t).transpose(0, 2, 3, 1)  # (B, 9, 7, C)

    img_j = jnp.asarray(_to_np(img_t).transpose(0, 2, 3, 1))
    coords = jnp.asarray(np.stack([_to_np(xs), _to_np(ys)], axis=-1))
    y_j = np.asarray(bilinear_sample(img_j, coords))
    # torch's zeros padding interpolates against zeros at the border
    # (partial contributions); ours zeroes strictly-outside samples and
    # matches the reference's coordinate-2 trick for out-of-frustum
    # points. Interior samples must agree exactly.
    interior = ((_to_np(xs) >= 0) & (_to_np(xs) <= W - 1)
                & (_to_np(ys) >= 0) & (_to_np(ys) <= H - 1))
    np.testing.assert_allclose(y_j[interior], y_t[interior], atol=1e-5)
    # strictly-outside samples are exactly zero in both
    outside = ((_to_np(xs) < -1) | (_to_np(xs) > W) | (_to_np(ys) < -1)
               | (_to_np(ys) > H))
    assert np.abs(y_j[outside]).max() == 0.0
