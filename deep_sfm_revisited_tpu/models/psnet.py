"""PSNet: plane-sweep stereo depth estimation.

TPU-native rebuild of `models/PSNet.py` (DPSNet-derived; `PSNet` `:41`,
forward `:131-227`):

  * SPP feature extraction at 1/4 resolution (submodules.SPPFeatureExtractor
    ≙ `models/submodule.py:108-184`);
  * `nlabel` fronto-parallel inverse-depth planes
    depth_i = min_depth * nlabel / (i+1) (`models/PSNet.py:149-153`);
  * cost volume: the reference python-loops over planes calling
    `inverse_warp` per plane and writing into a zero tensor
    (`models/PSNet.py:146-157`); here the whole (B, D, H/4, W/4, 64)
    volume is one broadcasted projection + one batched gather
    (`ops.camera.plane_sweep_warp`) — no serial plane loop;
  * 3D-conv hourglass `dres0-4` + `classify` (`models/PSNet.py:79-102,
    160-165`), NDHWC 3D convolutions;
  * per-plane 2D context refinement expressed as (1, 3, 3) 3D convs with
    dilation so all D planes share the 2D weights in one conv call
    (`models/PSNet.py:175-190`);
  * trilinear upsample + softmax + soft-argmax regression
    (`models/PSNet.py:194-216`);
  * depth-domain context head `PSNET_DEP_CONTEXT` (`models/PSNet.py:53-61,
    218-222`).

Returns (depth_init, depth): with dep_context on, (pre-context, refined)
as the reference returns `(depth, depth_out)` (`models/PSNet.py:221-222`);
otherwise `(depth_init, depth)` (`:227`).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import DepthConfig
from deep_sfm_revisited_tpu.models.submodules import (
    Conv3DMXU,
    ConvBN3D,
    SPPFeatureExtractor,
    dunpack,
    resize_bilinear,
    soft_argmax_depth,
    soft_argmax_disparity,
)
from deep_sfm_revisited_tpu.ops.camera import (
    bilinear_sample,
    plane_sweep_coords,
    plane_sweep_warp,
)

Dtype = Any


class Hourglass3D(nn.Module):
    """dres0..dres4 residual 3D stack + classify head (PSNet.py:79-102).

    With `dpack=G>1` the input is the D-packed cost volume
    (B, D/G, H, W, G*Cin) and the whole stack stays packed — every conv
    fills the MXU's 128 output lanes (see `submodules.dpack_weight`);
    the parameter tree is identical to the unpacked form. Output is
    always unpacked (B, D, H, W, 1).
    """

    dtype: Dtype = jnp.float32
    dpack: int = 1
    dpack_mode: str = "tridiag"

    @nn.compact
    def __call__(self, cost, train: bool = False):
        d = self.dtype
        G = self.dpack
        m = self.dpack_mode
        c0 = nn.relu(ConvBN3D(32, dtype=d, dpack=G, dpack_mode=m)(cost, train))
        c0 = nn.relu(ConvBN3D(32, dtype=d, dpack=G, dpack_mode=m)(c0, train))
        for _ in range(4):  # dres1..dres4, each a 2-conv residual block
            r = nn.relu(ConvBN3D(32, dtype=d, dpack=G, dpack_mode=m)(c0, train))
            r = ConvBN3D(32, dtype=d, dpack=G, dpack_mode=m)(r, train)
            c0 = c0 + r
        out = nn.relu(ConvBN3D(32, dtype=d, dpack=G, dpack_mode=m)(c0, train))
        out = Conv3DMXU(1, (3, 3, 3), dtype=d, dpack=G, dpack_mode=m)(out)
        if G > 1:
            out = dunpack(out, G)
        return out  # (B, D, H, W, 1)


class ContextNet(nn.Module):
    """Dilated 2D context stack applied across all planes (PSNet.py:64-72).

    Kernels are (1, k, k) so each depth plane is refined independently with
    shared weights — one conv call instead of the reference's python loop
    over D (`models/PSNet.py:179-190`).
    """

    out_features: int = 1
    use_bn: bool = False  # ref CONTEXT_BN, default False (lib/config.py:158)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        # every `convtext` layer is bias-free and ReLU-terminated — the
        # LAST one included, so the residual context addition is
        # non-negative (ref convtext PSNet.py:17-27, convs PSNet.py:64-72)
        plan = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1),
                (self.out_features, 1)]
        for feats, dil in plan:
            x = Conv3DMXU(
                feats, (1, 3, 3),
                dilation=(dil, dil),
                use_bias=False,
                dtype=d,
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=d)(x)
            x = nn.relu(x)
        return x


class DepthContextNet(nn.Module):
    """Depth-domain refinement head (ref `dep_convs`, PSNet.py:55-61). 2D."""

    use_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        # bias-free, ReLU-terminated `convtext` layers throughout — the
        # last included (ref dep_convs PSNet.py:54-61)
        plan = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1),
                (1, 1)]
        for feats, dil in plan:
            x = nn.Conv(feats, (3, 3), kernel_dilation=(dil, dil),
                        padding=dil, use_bias=False, dtype=d)(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 dtype=d)(x)
            x = nn.relu(x)
        return x


class PSNet(nn.Module):
    """Plane-sweep depth network. Inputs NHWC, [-1, 1]-normalized images."""

    cfg: DepthConfig
    norm_target: float = 0.0  # >0: rescale pose translation (RESCALE_DEPTH)
    dtype: Dtype = jnp.float32
    # optional NamedSharding for the (B, D, H/4, W/4, C) cost volume:
    # P(data, model) shards the plane-sweep D axis over the model mesh
    # axis (SURVEY.md §2.7 — the TPU-native "sequence parallel" of this
    # workload); XLA partitions the 3D convs with halo exchange.
    cost_sharding: Any = None

    @nn.compact
    def __call__(
        self,
        ref: jnp.ndarray,        # (B, H, W, 3)
        targets: jnp.ndarray,    # (B, T, H, W, 3) — T target views
        pose: jnp.ndarray,       # (B, T, 3, 4) ref->target transforms
        K: jnp.ndarray,          # (B, 3, 3)
        K_inv: jnp.ndarray,      # (B, 3, 3)
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        d = self.dtype
        B, H, W, _ = ref.shape
        nlabel = cfg.nlabel
        min_depth = cfg.min_depth

        # 1/4-resolution intrinsics (ref PSNet.py:133-136)
        scale = jnp.asarray([0.25, 0.25, 1.0], jnp.float32)
        K4 = K * scale[None, :, None]
        K4_inv = jnp.linalg.inv(K4)

        pose = pose.astype(jnp.float32)
        if self.norm_target > 0:
            # normalized-translation poses rescaled to NORM_TARGET metres
            # (ref PSNet.py:139-140 with cfg.RESCALE_DEPTH)
            pose = pose.at[..., :3, 3].multiply(self.norm_target)

        feat_net = SPPFeatureExtractor(dtype=d)
        T = targets.shape[1]
        if not train:
            # one batched extractor call for ref + all targets: identical
            # math at eval (BatchNorm uses running stats); kept separate in
            # train mode, where the reference computes BN batch statistics
            # per call (PSNet.py:138,145)
            stacked = jnp.concatenate(
                [ref] + [targets[:, j] for j in range(T)], axis=0
            )
            feats = feat_net(stacked, train)
            ref_feat = feats[:B]
            tgt_feats = [feats[B * (1 + j):B * (2 + j)] for j in range(T)]
        else:
            ref_feat = feat_net(ref, train)  # (B, H/4, W/4, 32)
            tgt_feats = None
        h4, w4 = ref_feat.shape[1], ref_feat.shape[2]

        # plane depths: min_depth * nlabel / (i+1) (ref PSNet.py:149-153)
        labels = jnp.arange(1, nlabel + 1, dtype=jnp.float32)
        plane_depths = min_depth * nlabel / labels  # (D,), far -> near

        # rematerialize the big 3D stacks under grad: the (B, D, H/4,
        # W/4, 32) activations of 12 hourglass convs dominate training
        # HBM at the reference's b=32 recipe; recomputing them in the
        # backward pass is the standard TPU memory/FLOP trade
        HG = (nn.remat(Hourglass3D, static_argnums=(2,)) if cfg.remat
              else Hourglass3D)
        # explicit name: nn.remat wraps the class as "CheckpointX", which
        # would silently change the param tree (and break checkpoint /
        # torch-port compatibility) whenever remat is toggled
        G = cfg.dpack if cfg.dpack > 1 and nlabel % cfg.dpack == 0 else 1
        hourglass = HG(dtype=d, dpack=G, dpack_mode=cfg.dpack_mode,
                       name="Hourglass3D_0")
        costs = None
        for j in range(T):
            tgt_feat = (tgt_feats[j] if tgt_feats is not None
                        else feat_net(targets[:, j], train))
            # warp in the compute dtype (bf16 under mixed precision): the
            # cost volume is cast to it right after anyway, and halving
            # the gather source bytes is measurably faster
            if G > 1:
                # build the cost volume DIRECTLY in the D-packed layout
                # the hourglass consumes: transpose the (small) sampling
                # coordinates instead of relaying out the (huge) volume
                coords = plane_sweep_coords(
                    plane_depths, pose[:, j], K4, K4_inv, h4, w4
                )  # (B, D, H/4, W/4, 2)
                coords = jnp.moveaxis(
                    coords.reshape(B, nlabel // G, G, h4, w4, 2), 2, 4
                )  # (B, D/G, H/4, W/4, G, 2)
                warped = bilinear_sample(tgt_feat.astype(d), coords)
                refb = jnp.broadcast_to(
                    ref_feat[:, None, :, :, None, :].astype(d), warped.shape
                )
                # slot-major packed channels: per plane [ref 32 | warped 32]
                cost = jnp.concatenate([refb, warped], axis=-1)
                cost = cost.reshape(B, nlabel // G, h4, w4, -1)
            else:
                if cfg.warp_kernel and jax.default_backend() == "tpu":
                    from deep_sfm_revisited_tpu.ops.pallas.sweep_warp import (
                        plane_sweep_warp_pallas,
                    )
                    warped = plane_sweep_warp_pallas(
                        tgt_feat.astype(d), plane_depths, pose[:, j],
                        K4, K4_inv,
                    )  # (B, D, H/4, W/4, 32)
                else:
                    warped = plane_sweep_warp(
                        tgt_feat.astype(d), plane_depths, pose[:, j],
                        K4, K4_inv,
                    )  # (B, D, H/4, W/4, 32)
                refb = jnp.broadcast_to(
                    ref_feat[:, None].astype(d), warped.shape
                )
                cost = jnp.concatenate([refb, warped], axis=-1)
            if self.cost_sharding is not None:
                # packed or not, the sweep axis (D or D/G) is dim 1, so the
                # same (data, model, ...) spec shards it either way
                cost = jax.lax.with_sharding_constraint(cost, self.cost_sharding)
            c = hourglass(cost, train)  # (B, D, H/4, W/4, 1)
            costs = c if costs is None else costs + c
        costs = costs / T

        # per-plane 2D context refinement (ref PSNET_CONTEXT, PSNet.py:175-190)
        if cfg.psnet_context:
            ctx_in = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        ref_feat[:, None], (B, nlabel, h4, w4, ref_feat.shape[-1])
                    ),
                    costs,
                ],
                axis=-1,
            )
            Ctx = (nn.remat(ContextNet, static_argnums=(2,)) if cfg.remat
                   else ContextNet)
            costss = Ctx(1, cfg.context_bn, dtype=d,
                         name="ContextNet_0")(ctx_in, train) + costs
        else:
            costss = costs

        def regress(vol):
            # trilinear upsample to (nlabel, H, W) + softmax + soft-argmax
            # (ref PSNet.py:194-216). D is unchanged so this is bilinear
            # over H, W with shared plane weights.
            v = vol[..., 0].astype(jnp.float32)  # (B, D, h4, w4)
            v = v.reshape(B * nlabel, h4, w4, 1)
            # torch trilinear WITHOUT align_corners (PSNet.py:194,207 omit it,
            # so torch defaults to half-pixel centers)
            v = resize_bilinear(v, (H, W), align_corners=False)
            v = v.reshape(B, nlabel, H, W)
            prob = jax.nn.softmax(v, axis=1)
            if cfg.predict_by_depth:
                return soft_argmax_depth(prob, nlabel, min_depth)
            disp = soft_argmax_disparity(prob, nlabel,
                                         trunc_soft=cfg.trunc_soft)
            return min_depth * nlabel / (disp + 1e-16)

        depth_init = regress(costs)   # (B, H, W)
        depth = regress(costss)

        if cfg.psnet_dep_context:
            up_feat = resize_bilinear(ref_feat, (H, W))
            dep_in = jnp.concatenate(
                [
                    jax.lax.stop_gradient(depth)[..., None].astype(d),
                    up_feat,
                    ref.astype(d),
                ],
                axis=-1,
            )  # 1 + 32 + 3 = 36 ch (ref PSNet.py:218-220)
            depth_out = DepthContextNet(cfg.context_bn, dtype=d)(dep_in, train)
            depth_out = depth_out[..., 0].astype(jnp.float32) + depth
            return depth, depth_out
        return depth_init, depth
