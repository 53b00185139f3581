"""Port the reference's PyTorch checkpoints into this framework.

The reference releases trained weights as torch `.pth.tar` state dicts
(`main.py:200-242` loads them with `strict=False`, stripping DataParallel
`module.` prefixes). A user switching to this framework needs those exact
weights on TPU, so this module maps torch parameter tensors onto our flax
variable trees:

  * torch Conv2d  (O, I, kh, kw)      -> flax kernel (kh, kw, I, O)
  * torch Conv3d  (O, I, kd, kh, kw)  -> Conv3DMXU kernel (kd, kh, kw, I, O)
  * torch Conv2d applied per-plane    -> Conv3DMXU (1, kh, kw, I, O)
    (the reference loops 2D context convs over depth planes,
    `models/PSNet.py:179-190`; here they are one (1,k,k) 3D conv)
  * torch BatchNorm{2,3}d weight/bias/running_mean/running_var
        -> flax params scale/bias + batch_stats mean/var
  * torch Linear (O, I) -> flax Dense kernel (I, O)

Mapping tables are explicit per architecture (built by the `*_entries`
functions below from the reference's construction order — e.g. the SPP
extractor `models/submodule.py:108-184`), so every tensor movement is
auditable and shape-checked. `apply_entries` fails loudly on any shape
mismatch and reports unconsumed torch keys.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

Entry = Tuple[str, str, str]  # (kind, torch_module_prefix, flax_path)

_TRANSPOSE = {
    "conv2d": (2, 3, 1, 0),
    "conv3d": (2, 3, 4, 1, 0),
    "linear": (1, 0),
}


# ---------------------------------------------------------------------------
# core
# ---------------------------------------------------------------------------


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference `.pth.tar` into {key: np.ndarray}.

    Handles the reference's {'epoch', 'state_dict'} wrapper
    (`main.py:772-775`) and strips DataParallel `module.` prefixes
    (≙ `main.py:204-211`).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _get(tree, path: Sequence[str]):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path: Sequence[str], value):
    for p in path[:-1]:
        tree = tree[p]
    leaf = tree[path[-1]]
    if tuple(leaf.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: "
            f"flax {tuple(leaf.shape)} vs torch {tuple(value.shape)}"
        )
    import jax.numpy as jnp

    tree[path[-1]] = jnp.asarray(value, dtype=leaf.dtype)


def apply_entries(
    sd: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    entries: Sequence[Entry],
    flax_root: Sequence[str] = (),
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Write torch tensors into a copy of `variables` per the entry table.

    Returns (new_variables, report). report: dict(filled=[flax paths],
    consumed=[torch keys], missing=[torch keys the table wanted but the
    state dict lacks]). Raises on any shape mismatch.
    """
    import jax

    variables = jax.tree.map(lambda x: x, variables)  # deep-ish copy
    # rebuild as plain nested dicts so _set can mutate
    def to_mut(d):
        return {k: to_mut(v) for k, v in d.items()} if isinstance(d, dict) else d

    variables = to_mut(variables)
    root = tuple(flax_root)
    filled, consumed, missing = [], [], []

    def take(tk: str):
        if tk in sd:
            consumed.append(tk)
            return sd[tk]
        missing.append(tk)
        return None

    for kind, tkey, fpath in entries:
        fparts = tuple(p for p in fpath.split("/") if p)
        if kind == "conv2d_cat":
            # fused conv: torch kernels/biases concatenated along Cout
            ws = [take(f"{k}.weight") for k in tkey]
            if all(w is not None for w in ws):
                w = np.concatenate([np.transpose(w, (2, 3, 1, 0)) for w in ws],
                                   axis=-1)
                dst = ("params",) + root + fparts + ("kernel",)
                _set(variables, dst, w)
                filled.append("/".join(dst))
            bs = [sd.get(f"{k}.bias") for k in tkey]
            if all(b is not None for b in bs):
                dst = ("params",) + root + fparts + ("bias",)
                _set(variables, dst, np.concatenate(bs))
                consumed.extend(f"{k}.bias" for k in tkey)
                filled.append("/".join(dst))
            continue
        if kind == "bn":
            pairs = [
                ("weight", ("params",) + root + fparts + ("scale",)),
                ("bias", ("params",) + root + fparts + ("bias",)),
                ("running_mean", ("batch_stats",) + root + fparts + ("mean",)),
                ("running_var", ("batch_stats",) + root + fparts + ("var",)),
            ]
            for suffix, dst in pairs:
                w = take(f"{tkey}.{suffix}")
                if w is not None:
                    _set(variables, dst, w)
                    filled.append("/".join(dst))
            continue

        w = take(f"{tkey}.weight")
        if w is not None:
            if kind == "conv2d_to_3d":
                w = np.transpose(w, (2, 3, 1, 0))[None]  # (1, kh, kw, I, O)
            elif kind == "conv2d_bgr":
                # absorb the reference's RGB->BGR permute (raft.py:93-95)
                # into the first conv's input-channel axis
                w = np.transpose(w, (2, 3, 1, 0))[:, :, ::-1].copy()
            elif kind == "conv2d_disp_transpose":
                w = np.transpose(w, (2, 3, 1, 0))  # (1, 1, S2, S2)
                s2 = w.shape[-1]
                S = int(round(s2 ** 0.5))
                # transpose permutation (an involution): ours[v*S+u]
                # corresponds to torch's [u*S+v]
                perm = np.arange(s2).reshape(S, S).T.ravel()
                w = w[:, :, perm][:, :, :, perm]
            elif kind in ("deconv3d_s1", "deconv3d_s2"):
                # torch ConvTranspose3d weight (I, O, kd, kh, kw): channel
                # swap + spatial flip. s1 lands on a plain conv; s2 on the
                # dilated-conv lowering (_Deconv3DS2) — both consume the
                # flipped kernel (scratch/deconv3d_port_check.py)
                w = np.transpose(w, (2, 3, 4, 0, 1))[::-1, ::-1, ::-1].copy()
            elif kind == "deconv2d":
                # torch ConvTranspose2d weight (I, O, kh, kw) is applied
                # spatially FLIPPED relative to flax ConvTranspose
                # (lax.conv_transpose does zero-insertion + unflipped conv);
                # verified exact vs torch k4/s2/p1 in tests/test_torch_port
                w = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
            else:
                w = np.transpose(w, _TRANSPOSE[kind])
            dst = ("params",) + root + fparts + ("kernel",)
            _set(variables, dst, w)
            filled.append("/".join(dst))
        b = f"{tkey}.bias"
        if b in sd:
            dst = ("params",) + root + fparts + ("bias",)
            _set(variables, dst, sd[b])
            consumed.append(b)
            filled.append("/".join(dst))

    return variables, {"filled": filled, "consumed": consumed, "missing": missing}


# ---------------------------------------------------------------------------
# entry tables (construction order of the reference modules)
# ---------------------------------------------------------------------------


def _convbn2d(t: str, f: str) -> List[Entry]:
    # ref `convbn` = Sequential(Conv2d, BatchNorm2d) (submodule.py:12-14)
    return [("conv2d", f"{t}.0", f"{f}/Conv_0"), ("bn", f"{t}.1", f"{f}/BatchNorm_0")]


def _convbn3d(t: str, f: str) -> List[Entry]:
    # ref `convbn_3d` = Sequential(Conv3d, BatchNorm3d) (submodule.py:18-20)
    return [("conv3d", f"{t}.0", f"{f}/Conv3DMXU_0"), ("bn", f"{t}.1", f"{f}/BatchNorm_0")]


def spp_entries(t: str, f: str) -> List[Entry]:
    """`feature_extraction` SPP encoder (submodule.py:108-184)."""
    e: List[Entry] = []
    for i, j in enumerate((0, 2, 4)):  # firstconv: convbn at 0, 2, 4
        e += _convbn2d(f"{t}.firstconv.{j}", f"{f}/ConvBN_{i}")
    blk = 0
    # (layer, blocks, downsample on first block) — downsample iff stride!=1
    # or inplanes != planes (submodule.py:146-152)
    for layer, blocks, down in (("layer1", 3, False), ("layer2", 16, True),
                                ("layer3", 3, True), ("layer4", 3, False)):
        for b in range(blocks):
            tb = f"{t}.{layer}.{b}"
            fb = f"{f}/BasicBlock_{blk}"
            e += _convbn2d(f"{tb}.conv1.0", f"{fb}/ConvBN_0")
            e += _convbn2d(f"{tb}.conv2", f"{fb}/ConvBN_1")
            if b == 0 and down:
                e += [("conv2d", f"{tb}.downsample.0", f"{fb}/Conv_0"),
                      ("bn", f"{tb}.downsample.1", f"{fb}/BatchNorm_0")]
            blk += 1
    for i in range(4):  # branch1..4: Sequential(AvgPool, convbn, ReLU)
        e += _convbn2d(f"{t}.branch{i + 1}.1", f"{f}/ConvBN_{3 + i}")
    e += _convbn2d(f"{t}.lastconv.0", f"{f}/ConvBN_7")
    e += [("conv2d", f"{t}.lastconv.2", f"{f}/Conv_0")]
    return e


def psnet_entries(
    t: str = "depth_estimator",
    f: str = "depth_net",
    context_bn: bool = False,
    dep_context: bool = True,
) -> List[Entry]:
    """PSNet (models/PSNet.py:41-102): SPP + dres hourglass + context nets."""
    e = spp_entries(f"{t}.feature_extraction", f"{f}/SPPFeatureExtractor_0")
    hg = f"{f}/Hourglass3D_0"
    e += _convbn3d(f"{t}.dres0.0", f"{hg}/ConvBN3D_0")
    e += _convbn3d(f"{t}.dres0.2", f"{hg}/ConvBN3D_1")
    idx = 2
    for dres in ("dres1", "dres2", "dres3", "dres4"):
        e += _convbn3d(f"{t}.{dres}.0", f"{hg}/ConvBN3D_{idx}")
        e += _convbn3d(f"{t}.{dres}.2", f"{hg}/ConvBN3D_{idx + 1}")
        idx += 2
    e += _convbn3d(f"{t}.classify.0", f"{hg}/ConvBN3D_10")
    e += [("conv3d", f"{t}.classify.2", f"{hg}/Conv3DMXU_0")]

    # per-plane 2D context stack `convs` (PSNet.py:64-72) — here one
    # (1,k,k) 3D conv over all planes (ContextNet); 7 bias-free convtext
    for i in range(7):
        e += [("conv2d_to_3d", f"{t}.convs.{i}.0",
               f"{f}/ContextNet_0/Conv3DMXU_{i}")]
        if context_bn:
            e += [("bn", f"{t}.convs.{i}.1", f"{f}/ContextNet_0/BatchNorm_{i}")]
    if dep_context:  # dep_convs (PSNet.py:54-61), plain 2D here too
        for i in range(7):
            e += [("conv2d", f"{t}.dep_convs.{i}.0",
                   f"{f}/DepthContextNet_0/Conv_{i}")]
            if context_bn:
                e += [("bn", f"{t}.dep_convs.{i}.1",
                       f"{f}/DepthContextNet_0/BatchNorm_{i}")]
    return e


def port_psnet(sd, variables, torch_prefix="depth_estimator",
               flax_root=("depth_net",), **kw):
    """Port a reference PSNet state dict subtree into our variables."""
    return apply_entries(sd, variables,
                         psnet_entries(torch_prefix, ""), flax_root=flax_root)


def _context_2d_to_3d(t: str, f: str, n: int = 7,
                      context_bn: bool = False) -> List[Entry]:
    # per-plane convtext stack ported onto a (1, k, k) 3D ContextNet
    e: List[Entry] = []
    for i in range(n):
        e += [("conv2d_to_3d", f"{t}.{i}.0", f"{f}/Conv3DMXU_{i}")]
        if context_bn:
            e += [("bn", f"{t}.{i}.1", f"{f}/BatchNorm_{i}")]
    return e


def panet_entries(t: str = "depth_estimator", f: str = "depth_net",
                  context_bn: bool = False) -> List[Entry]:
    """PANet (models/PANet.py:42-105): SPP + dres00-03/classify0 + convs."""
    e = spp_entries(f"{t}.feature_extraction", f"{f}/SPPFeatureExtractor_0")
    hg = f"{f}/SmallHourglass3D_0"
    e += _convbn3d(f"{t}.dres00.0", f"{hg}/ConvBN3D_0")
    e += _convbn3d(f"{t}.dres00.2", f"{hg}/ConvBN3D_1")
    idx = 2
    for dres in ("dres01", "dres02", "dres03"):
        e += _convbn3d(f"{t}.{dres}.0", f"{hg}/ConvBN3D_{idx}")
        e += _convbn3d(f"{t}.{dres}.2", f"{hg}/ConvBN3D_{idx + 1}")
        idx += 2
    e += _convbn3d(f"{t}.classify0.0", f"{hg}/ConvBN3D_8")
    e += [("conv3d", f"{t}.classify0.2", f"{hg}/Conv3DMXU_0")]
    e += _context_2d_to_3d(f"{t}.convs", f"{f}/ContextNet_0", 7, context_bn)
    return e


def regnet_entries(t: str = "depth_estimator", f: str = "depth_net",
                   context_bn: bool = False) -> List[Entry]:
    """REGNet (models/REGNet.py:73-126): SPP + posecnn0-4/predict + convs."""
    e = spp_entries(f"{t}.feature_extraction", f"{f}/SPPFeatureExtractor_0")
    e += _convbn3d(f"{t}.posecnn0.0", f"{f}/ConvBN3D_0")
    e += _convbn3d(f"{t}.posecnn0.2", f"{f}/ConvBN3D_1")
    idx = 2
    for p in ("posecnn1", "posecnn2", "posecnn3", "posecnn4"):
        e += _convbn3d(f"{t}.{p}.0", f"{f}/ConvBN3D_{idx}")
        e += _convbn3d(f"{t}.{p}.2", f"{f}/ConvBN3D_{idx + 1}")
        idx += 2
    e += _convbn3d(f"{t}.predict.0", f"{f}/ConvBN3D_10")
    e += [("conv3d", f"{t}.predict.2", f"{f}/Conv3DMXU_0")]
    e += _context_2d_to_3d(f"{t}.convs", f"{f}/ContextNet_0", 7, context_bn)
    return e


def reg2d_entries(t: str = "depth_estimator",
                  f: str = "depth_net") -> List[Entry]:
    """REG2D (models/REG2D.py:34-63): SPP + dense stack + leaky context.

    The dense/context convbn here is the file-local biased-conv + BN +
    LeakyReLU variant (REG2D.py:27-32), so both conv bias and BN port.
    """
    e = spp_entries(f"{t}.feature_extraction", f"{f}/SPPFeatureExtractor_0")
    for i in range(5):  # conv0..conv4 dense stack
        e += [("conv2d", f"{t}.conv{i}.0", f"{f}/Conv_{i}"),
              ("bn", f"{t}.conv{i}.1", f"{f}/BatchNorm_{i}")]
    e += [("conv2d", f"{t}.predict", f"{f}/Conv_5")]
    for i in range(8):  # context.0..7 convbn layers
        e += [("conv2d", f"{t}.context.{i}.0", f"{f}/Conv_{6 + i}"),
              ("bn", f"{t}.context.{i}.1", f"{f}/BatchNorm_{5 + i}")]
    e += [("conv2d", f"{t}.context.8", f"{f}/Conv_14")]
    return e


def dispnet_entries(t: str = "depth_estimator", f: str = "depth_net",
                    context_bn: bool = False,
                    dep_context: bool = True) -> List[Entry]:
    """DISPNET (models/DISPNET.py:44-98): SPP + PSNet-shaped hourglass +
    convs (+ dep_convs under PSNET_DEP_CONTEXT)."""
    e = spp_entries(f"{t}.feature_extraction", f"{f}/SPPFeatureExtractor_0")
    hg = f"{f}/Hourglass3D_0"
    e += _convbn3d(f"{t}.dres0.0", f"{hg}/ConvBN3D_0")
    e += _convbn3d(f"{t}.dres0.2", f"{hg}/ConvBN3D_1")
    idx = 2
    for dres in ("dres1", "dres2", "dres3", "dres4"):
        e += _convbn3d(f"{t}.{dres}.0", f"{hg}/ConvBN3D_{idx}")
        e += _convbn3d(f"{t}.{dres}.2", f"{hg}/ConvBN3D_{idx + 1}")
        idx += 2
    e += _convbn3d(f"{t}.classify.0", f"{hg}/ConvBN3D_10")
    e += [("conv3d", f"{t}.classify.2", f"{hg}/Conv3DMXU_0")]
    e += _context_2d_to_3d(f"{t}.convs", f"{f}/ContextNet_0", 7, context_bn)
    if dep_context:
        for i in range(7):
            e += [("conv2d", f"{t}.dep_convs.{i}.0",
                   f"{f}/DepthContextNet_0/Conv_{i}")]
            if context_bn:
                e += [("bn", f"{t}.dep_convs.{i}.1",
                       f"{f}/DepthContextNet_0/BatchNorm_{i}")]
    return e


def resnetpose_entries(t: str = "posenet",
                       f: str = "pose_net") -> List[Entry]:
    """ResNet pose regressor (PoseNet.py:170-312 + MotionNet :348-432):
    conv1/bn1 stem (maxpool constructed but SKIPPED by the forward),
    layer1 (3x bottleneck) + layer2 (4x, first strided), down_layer,
    dense fusion conv3_0..4, and the MotionNet head."""
    e: List[Entry] = [("conv2d", f"{t}.conv1", f"{f}/stem/Conv_0"),
                      ("bn", f"{t}.bn1", f"{f}/stem/BatchNorm_0")]
    blk = 0
    for layer, blocks in (("layer1", 3), ("layer2", 4)):
        for b in range(blocks):
            tb = f"{t}.{layer}.{b}"
            fb = f"{f}/stem/_Bottleneck_{blk}"
            for i in (1, 2, 3):
                e += [("conv2d", f"{tb}.conv{i}", f"{fb}/Conv_{i - 1}"),
                      ("bn", f"{tb}.bn{i}", f"{fb}/BatchNorm_{i - 1}")]
            if b == 0:  # both layers' first block carries a downsample
                e += [("conv2d", f"{tb}.downsample.0", f"{fb}/Conv_3"),
                      ("bn", f"{tb}.downsample.1", f"{fb}/BatchNorm_3")]
            blk += 1
    e += [("conv2d", f"{t}.down_layer.0", f"{f}/Conv_0"),
          ("bn", f"{t}.down_layer.1", f"{f}/BatchNorm_0")]
    for i in range(5):  # conv3_0..conv3_4 dense fusion
        e += [("conv2d", f"{t}.conv3_{i}.0", f"{f}/Conv_{i + 1}"),
              ("bn", f"{t}.conv3_{i}.1", f"{f}/BatchNorm_{i + 1}")]
    m = f"{f}/MotionNet_0"
    e += [("conv2d", f"{t}.motion_1.shrink.0", f"{m}/Conv_0")]
    for i in range(10):  # conv_layers: Sequential interleaved with leaky
        e += [("conv2d", f"{t}.motion_1.conv_layers.{2 * i}",
               f"{m}/Conv_{i + 1}")]
    e += [("linear", f"{t}.motion_1.dropout_layers.0", f"{m}/Dense_0"),
          ("linear", f"{t}.motion_1.dropout_layers.2", f"{m}/Dense_1"),
          ("linear", f"{t}.motion_1.last_layer", f"{m}/Dense_2")]
    return e


def cvpmvs_entries(t: str = "depth_estimator",
                   f: str = "depth_net") -> List[Entry]:
    """CVPMVS (models/CVPMVS.py:19-96): feature pyramid + 3D U-Net.

    conv0aa gets conv2d_bgr — the reference permutes inputs to BGR
    (CVPMVS.py:102-107); folding the permute into the first conv's
    input channels reproduces the torch activations for our RGB inputs.
    conv5/conv6 are ConvTranspose3d (stride 1 / stride 2) — ported with
    channel swap + spatial flip onto the plain-conv / dilated-conv
    lowerings (deconv3d_s1 / deconv3d_s2).
    """
    fp = f"{f}/FeaturePyramid_0"
    names = ("conv0aa", "conv0ba", "conv0bb", "conv0bc", "conv0bd",
             "conv0be", "conv0bf", "conv0bg", "conv0bh")
    e: List[Entry] = []
    for i, n in enumerate(names):
        kind = "conv2d_bgr" if i == 0 else "conv2d"
        e += [(kind, f"{t}.featurePyramid.{n}.0",
               f"{fp}/_ConvLeaky_{i}/Conv_0")]
    cr_t = f"{t}.cost_reg_refine"
    cr = f"{f}/CostRegNet_0"
    for i, n in enumerate(("conv0", "conv0a", "conv1", "conv2", "conv2a",
                           "conv3", "conv4", "conv4a")):
        e += [("conv3d", f"{cr_t}.{n}.conv", f"{cr}/_ConvBnReLU3D_{i}/Conv_0"),
              ("bn", f"{cr_t}.{n}.bn", f"{cr}/_ConvBnReLU3D_{i}/BatchNorm_0")]
    e += [("deconv3d_s1", f"{cr_t}.conv5.0", f"{cr}/Conv_0"),
          ("bn", f"{cr_t}.conv5.1", f"{cr}/BatchNorm_0"),
          ("deconv3d_s2", f"{cr_t}.conv6.0", f"{cr}/_Deconv3DS2_0"),
          ("bn", f"{cr_t}.conv6.1", f"{cr}/BatchNorm_1"),
          ("conv3d", f"{cr_t}.prob0", f"{cr}/Conv_1")]
    return e


def _basicconv(t: str, f: str, bn: bool = True, deconv: bool = False) -> List[Entry]:
    # ref `BasicConv` (DICL_shallow.py:75-92): attrs .conv / .bn; conv is
    # always bias-free (bias=False passed unconditionally, :82-84)
    conv_name = "ConvTranspose_0" if deconv else "Conv_0"
    kind = "deconv2d" if deconv else "conv2d"
    e: List[Entry] = [(kind, f"{t}.conv", f"{f}/{conv_name}")]
    if bn:
        e.append(("bn", f"{t}.bn", f"{f}/BatchNorm_0"))
    return e


def _conv2x(t: str, f: str, deconv: bool = False) -> List[Entry]:
    # ref `Conv2x` (DICL_shallow.py:94-128): conv1 (bn=False, stride 2,
    # deconv per flag), conv2 (bn=True, fuse after skip concat)
    return (_basicconv(f"{t}.conv1", f"{f}/BasicConv_0", bn=False, deconv=deconv)
            + _basicconv(f"{t}.conv2", f"{f}/BasicConv_1", bn=True))


def featurega_entries(t: str, f: str) -> List[Entry]:
    """`FeatureGA` U-net (DICL_shallow.py:134-249), SEP_LEVEL=5 (kitti.yml).

    Flax name assignment follows call order: BasicConv_0..2 = conv_start,
    BasicConv_3..8 = conv1a..6a, Conv2x_0..5 = deconv6a..1a,
    Conv2x_6..10 = conv1b..5b, Conv2x_11 = conv6b,
    Conv2x_12..16 = deconv6b..2b interleaved with BasicConv_9..13 =
    outconv_6..2.
    """
    e: List[Entry] = []
    for i in range(3):
        e += _basicconv(f"{t}.conv_start.{i}", f"{f}/BasicConv_{i}")
    for i, name in enumerate(("conv1a", "conv2a", "conv3a", "conv4a",
                              "conv5a", "conv6a")):
        e += _basicconv(f"{t}.{name}", f"{f}/BasicConv_{3 + i}")
    for i, name in enumerate(("deconv6a", "deconv5a", "deconv4a",
                              "deconv3a", "deconv2a", "deconv1a")):
        e += _conv2x(f"{t}.{name}", f"{f}/Conv2x_{i}", deconv=True)
    for i, name in enumerate(("conv1b", "conv2b", "conv3b", "conv4b",
                              "conv5b")):
        e += _conv2x(f"{t}.{name}", f"{f}/Conv2x_{6 + i}")
    e += _conv2x(f"{t}.conv6b", f"{f}/Conv2x_11")
    for i, (dec, out) in enumerate((("deconv6b", "outconv_6"),
                                    ("deconv5b", "outconv_5"),
                                    ("deconv4b", "outconv_4"),
                                    ("deconv3b", "outconv_3"),
                                    ("deconv2b", "outconv_2"))):
        e += _conv2x(f"{t}.{dec}", f"{f}/Conv2x_{12 + i}", deconv=True)
        e += _basicconv(f"{t}.{out}", f"{f}/BasicConv_{9 + i}")
    return e


def dicl_entries(t: str = "flow_estimator", f: str = "flow_net") -> List[Entry]:
    """`DICL_shallow` (DICL_shallow.py:350-) at the KITTI recipe
    (SHALLOW_Down=True, SHALLOW_SHARE=False, SMOOTH_SHARE=False,
    SMOOTH_COST=True, CTF_CONTEXT=True, USE_CONTEXT6=True, SEP_LEVEL=5).

    Flax call order per level (6, 5, 4, 3, 2): the named matching net,
    the smoothing 1x1 (Conv_{0,2,4,6,8}), six context BasicConvs
    (BasicConv_{6k..6k+5}) and the context head conv (Conv_{1,3,5,7,9}).
    """
    e = featurega_entries(f"{t}.feature", f"{f}/FeatureGA_0")
    for li, lvl in enumerate((6, 5, 4, 3, 2)):
        m_t, m_f = f"{t}.matching{lvl}.match", f"{f}/matching{lvl}"
        # MatchingShallow_down (DICL_shallow.py:753-773): 4 BasicConv,
        # 1 deconv BasicConv, final biased Conv2d
        for i in range(4):
            e += _basicconv(f"{m_t}.{i}", f"{m_f}/BasicConv_{i}")
        e += _basicconv(f"{m_t}.4", f"{m_f}/BasicConv_4", deconv=True)
        e += [("conv2d", f"{m_t}.5", f"{m_f}/Conv_0")]
        # cost smoothing (smooth_cost, :324-347): bias-free 1x1 over the
        # (2md+1)^2 displacement axis. The reference flattens (U outer,
        # V inner) (compute_cost DICL_shallow.py:672-728 + FlowRegression
        # :271-321); our stack is (v outer, u inner) — same function,
        # transposed index — so the ported kernel's in/out displacement
        # axes are permuted by the (u,v)->(v,u) transposition.
        e += [("conv2d_disp_transpose", f"{t}.cost_smooth{lvl}.smooth_layer.conv",
               f"{f}/Conv_{2 * li}")]
        # context stack (context{lvl}, :409-446): 6 BasicConv + biased conv
        for i in range(6):
            e += _basicconv(f"{t}.context{lvl}.{i}",
                            f"{f}/BasicConv_{6 * li + i}")
        e += [("conv2d", f"{t}.context{lvl}.6", f"{f}/Conv_{2 * li + 1}")]
    return e


def convert_reference_checkpoint(
    sd: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    flow: str = "DICL",
    depth: str = "PSNET",
    context_bn: bool = False,
    dep_context: bool = True,
    pose: str | None = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Port a full reference SFMnet checkpoint into SFMNet variables.

    Mirrors the reference's loading shims: strips DataParallel `module.`
    (done by `load_torch_checkpoint`) and accepts flow-only checkpoints
    whose keys lack the `flow_estimator.` prefix (`main.py:222-235`).
    `variables` is the output of SFMNet.init. Unknown torch keys are
    returned in the report, matching the reference's `strict=False`.
    """
    entries: List[Entry] = []
    has_flow_prefix = any(k.startswith("flow_estimator.") for k in sd)
    has_depth_prefix = any(k.startswith("depth_estimator.") for k in sd)
    if flow == "DICL":
        entries += dicl_entries(
            "flow_estimator" if has_flow_prefix else "", "flow_net")
    elif flow == "RAFT":
        entries += raft_entries(
            "flow_estimator" if has_flow_prefix else "", "flow_net")
    elif flow is not None:
        raise NotImplementedError(f"flow estimator port: {flow}")
    if depth == "PSNET":
        entries += psnet_entries(
            "depth_estimator" if has_depth_prefix else "", "depth_net",
            context_bn=context_bn, dep_context=dep_context)
    elif depth is not None:
        raise NotImplementedError(f"depth estimator port: {depth}")
    if pose == "POSENET":
        entries += plainpose_entries("posenet", "pose_net")
    elif pose is not None:
        raise NotImplementedError(f"pose estimator port: {pose}")
    # normalize the empty-prefix case ("".x -> x); conv2d_cat entries
    # carry a TUPLE of torch prefixes in the key slot
    def _strip(t):
        if isinstance(t, tuple):
            return tuple(_strip(x) for x in t)
        return t[1:] if t.startswith(".") else t

    entries = [(k, _strip(t), f) for k, t, f in entries]
    new_vars, report = apply_entries(sd, variables, entries)
    report["unused"] = sorted(set(sd) - set(report["consumed"]))
    return new_vars, report


def _resblock(t: str, f: str, norm: str, down: bool) -> List[Entry]:
    # ref `ResidualBlock` (extractor.py:6-56); instance norms are
    # affine=False in torch (no tensors) — our GroupNorm scale/bias stay
    # at their identity init, which is the same function
    e: List[Entry] = [("conv2d", f"{t}.conv1", f"{f}/Conv_0"),
                      ("conv2d", f"{t}.conv2", f"{f}/Conv_1")]
    if norm == "batch":
        e += [("bn", f"{t}.norm1", f"{f}/BatchNorm_0"),
              ("bn", f"{t}.norm2", f"{f}/BatchNorm_1")]
    if down:
        e += [("conv2d", f"{t}.downsample.0", f"{f}/Conv_2")]
        if norm == "batch":
            e += [("bn", f"{t}.downsample.1", f"{f}/BatchNorm_2")]
    return e


def basic_encoder_entries(t: str, f: str, norm: str) -> List[Entry]:
    """RAFT `BasicEncoder` (extractor.py:118-185).

    conv1 gets kind conv2d_bgr: the reference permutes inputs to BGR
    before the encoders (raft.py:93-95); permuting conv1's input-channel
    axis absorbs that exactly, so our RGB inputs reproduce the torch
    activations bit-for-bit (modulo float assoc).
    """
    e: List[Entry] = [("conv2d_bgr", f"{t}.conv1", f"{f}/Conv_0")]
    if norm == "batch":
        e += [("bn", f"{t}.norm1", f"{f}/BatchNorm_0")]
    blk = 0
    for layer in ("layer1", "layer2", "layer3"):
        for b in range(2):
            down = layer != "layer1" and b == 0
            e += _resblock(f"{t}.{layer}.{b}", f"{f}/ResBlock_{blk}", norm, down)
            blk += 1
    e += [("conv2d", f"{t}.conv2", f"{f}/Conv_1")]
    return e


def raft_entries(t: str = "flow_estimator", f: str = "flow_net") -> List[Entry]:
    """RAFT (models/RAFT/core/): fnet/cnet encoders + BasicUpdateBlock.

    Our SepConvGRU fuses the z and r convs per direction and the
    flow/mask heads' first convs (one MXU pass each inside the scanned
    GRU body) — conv2d_cat rebuilds the fused kernels by concatenating
    the torch tensors along Cout.
    """
    e = basic_encoder_entries(f"{t}.fnet", f"{f}/fnet", "instance")
    e += basic_encoder_entries(f"{t}.cnet", f"{f}/cnet", "batch")
    u_t, u_f = f"{t}.update_block", f"{f}/UpdateBlock_0"
    me = f"{u_f}/MotionEncoder_0"
    for i, name in enumerate(("convc1", "convc2", "convf1", "convf2", "conv")):
        e += [("conv2d", f"{u_t}.encoder.{name}", f"{me}/Conv_{i}")]
    gru = f"{u_f}/SepConvGRU_0"
    e += [("conv2d_cat", (f"{u_t}.gru.convz1", f"{u_t}.gru.convr1"), f"{gru}/Conv_0"),
          ("conv2d", f"{u_t}.gru.convq1", f"{gru}/Conv_1"),
          ("conv2d_cat", (f"{u_t}.gru.convz2", f"{u_t}.gru.convr2"), f"{gru}/Conv_2"),
          ("conv2d", f"{u_t}.gru.convq2", f"{gru}/Conv_3"),
          ("conv2d_cat", (f"{u_t}.flow_head.conv1", f"{u_t}.mask.0"), f"{u_f}/Conv_0"),
          ("conv2d", f"{u_t}.flow_head.conv2", f"{u_f}/Conv_1"),
          ("conv2d", f"{u_t}.mask.2", f"{u_f}/Conv_2")]
    return e


def plainpose_entries(t: str = "posenet", f: str = "pose_net") -> List[Entry]:
    """`PlainPose` (PoseNet.py:13-68): biased conv+BN+ReLU stacks.

    torch `posenet.conv.{i}.{0,1}` (shared frame encoder),
    `posenet.pose_agg.{i}.{0,1}`, `posenet.pose_reg` (1x1, bias).
    """
    e: List[Entry] = []
    for i in range(7):
        e += [("conv2d", f"{t}.conv.{i}.0",
               f"{f}/frame_enc/_ConvBNRelu_{i}/Conv_0"),
              ("bn", f"{t}.conv.{i}.1",
               f"{f}/frame_enc/_ConvBNRelu_{i}/BatchNorm_0")]
    for i in range(5):
        e += [("conv2d", f"{t}.pose_agg.{i}.0",
               f"{f}/_ConvBNRelu_{i}/Conv_0"),
              ("bn", f"{t}.pose_agg.{i}.1",
               f"{f}/_ConvBNRelu_{i}/BatchNorm_0")]
    e += [("conv2d", f"{t}.pose_reg", f"{f}/Conv_0")]
    return e
