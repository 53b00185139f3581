"""Alternate depth estimators: PANet, REGNet, REG2D, DISPNET.

TPU-native rebuilds of the reference's pose-robust plane-sweep variants
(selected by cfg.depth.estimator, ≙ `models/SFMnet.py:57-75`):

  * `PANet` ≙ `models/PANet.py:42,107`: concat cost volumes built under
    `num_scales` pose-scale hypotheses (angles and z-translation scaled,
    `sample_pose_by_scale` `models/PSNet.py:30-40`), each regularized by
    a shared small 3D hourglass, max-pooled over scales;
  * `REGNet` ≙ `models/REGNet.py:73,148`: correlation (mean dot-product)
    cost over nlabel planes x sampled pose scales, treated as a
    (scale-channel, D, H, W) volume regularized by 3D convs `posecnn0-4`;
  * `REG2D` ≙ `models/REG2D.py:34,88`: 2D-only — correlation cost over
    planes -> DenseNet 2D stack -> init depth; refinement cost over
    9 depth offsets x 11 pose scales -> dilated context -> residual;
  * `DISPNET` ≙ `models/DISPNET.py:44,203`: epipolar-line disparity
    sweep — anchors projected at a fixed far depth, 2*nlabel+1 steps
    along the epipolar direction, 3D hourglass + context, soft-argmax to
    a matched point, closed-form triangulation to depth.

All python per-plane / per-scale loops of the reference are folded into
batched gathers (`ops.camera.plane_sweep_warp` with scales folded into
the batch axis) — the same restructuring as PSNet.

Each returns (depth_init | None, depth) in the SFMnet contract.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deep_sfm_revisited_tpu.config import DepthConfig
from deep_sfm_revisited_tpu.models.psnet import ContextNet, DepthContextNet
from deep_sfm_revisited_tpu.models.submodules import (
    Conv3DMXU,
    ConvBN,
    ConvBN3D,
    SPPFeatureExtractor,
    resize_bilinear,
    soft_argmax_disparity,
)
from deep_sfm_revisited_tpu.ops.camera import (
    bilinear_sample,
    pixel_grid,
    plane_sweep_warp,
)
Dtype = Any


def pose_scales(cfg: DepthConfig) -> np.ndarray:
    return np.arange(cfg.scale_min, cfg.scale_max, cfg.scale_step)


def sample_pose_by_scale(pose: jnp.ndarray, scales: jnp.ndarray,
                         full_translation: bool = False) -> jnp.ndarray:
    """Scale hypotheses of a (B, 3, 4) pose -> (B, S, 3, 4).

    Default mode matches `sample_pose_by_scale` (`models/PSNet.py:30-40`):
    Euler angles and the z-translation scaled; `full_translation=True`
    scales the whole translation (REG2D's variant, `models/REG2D.py:126`).
    """
    from deep_sfm_revisited_tpu.ops.rotations import (
        angle_to_matrix,
        matrix_to_angle,
    )

    B = pose.shape[0]
    S = scales.shape[0]
    ang = matrix_to_angle(pose[:, :3, :3])  # (B, 3)
    ang_s = ang[:, None] * scales[None, :, None]  # (B, S, 3)
    R = angle_to_matrix(ang_s)
    t = jnp.broadcast_to(pose[:, None, :3, 3], (B, S, 3))
    if full_translation:
        t = t * scales[None, :, None]
    else:
        t = t.at[..., 2].multiply(scales[None, :])
    return jnp.concatenate([R, t[..., None]], axis=-1)


def _quarter_K(K):
    scale = jnp.asarray([0.25, 0.25, 1.0], jnp.float32)
    K4 = K * scale[None, :, None]
    return K4, jnp.linalg.inv(K4)


def _scaled_sweep(tgt_feat, plane_depths, poses_s, K4, K4_inv):
    """Warp target features over (S scale-poses x D planes) in one call.

    tgt_feat (B, h, w, C); poses_s (B, S, 3, 4) -> (B, S, D, h, w, C):
    scales folded into the batch axis of plane_sweep_warp.
    """
    B, h, w, C = tgt_feat.shape
    S = poses_s.shape[1]
    D = plane_depths.shape[0]
    tf = jnp.broadcast_to(tgt_feat[:, None], (B, S, h, w, C)).reshape(
        B * S, h, w, C
    )
    pf = poses_s.reshape(B * S, 3, 4)
    Kf = jnp.repeat(K4, S, axis=0)
    Kif = jnp.repeat(K4_inv, S, axis=0)
    vol = plane_sweep_warp(tf, plane_depths, pf, Kf, Kif)
    return vol.reshape(B, S, D, h, w, C)


def _upsample_regress(cost, nlabel, min_depth, H, W):
    """Trilinear upsample + softmax + inverse-depth soft-argmax."""
    B, D, h, w = cost.shape
    v = cost.reshape(B * D, h, w, 1).astype(jnp.float32)
    # trilinear default (align_corners=False), ref PANet.py:158/REGNet.py:211
    v = resize_bilinear(v, (H, W), align_corners=False).reshape(B, D, H, W)
    prob = jax.nn.softmax(v, axis=1)
    disp = soft_argmax_disparity(prob, nlabel)
    return min_depth * nlabel / (disp + 1e-16)


def sample_pose_grid(pose: jnp.ndarray, sample_num: int, std_rot: float,
                     std_tr: float) -> jnp.ndarray:
    """REGNet's coupled pose-perturbation grid (ref REGNet.py:40-72).

    (B, 3, 4) -> (B, n^3, 3, 4): grid point (i, j, k) perturbs BOTH the
    Euler angles by (g[i], g[j], g[k]) * std_rot (delta rotation composed
    on the left) and the translation by (g[i], g[j], g[k]) * std_tr,
    where g = -linspace(-n//2, n//2)/(-n//2) spans [-1, 1].
    """
    from deep_sfm_revisited_tpu.ops.rotations import angle_to_matrix

    B = pose.shape[0]
    n = sample_num
    base = jnp.arange(-(n // 2), n // 2 + 1, dtype=jnp.float32)
    g = -base / base[0]  # [-1, ..., 1] scaled so g[0] = -(-n/2)/(-n/2)
    gi = jnp.broadcast_to(g[:, None, None], (n, n, n))
    gj = jnp.broadcast_to(g[None, :, None], (n, n, n))
    gk = jnp.broadcast_to(g[None, None, :], (n, n, n))
    grid = jnp.stack([gi, gj, gk], axis=-1).reshape(n ** 3, 3)  # (S, 3)

    dR = angle_to_matrix(grid * std_rot)  # (S, 3, 3)
    R = jnp.einsum("sij,bjk->bsik", dR, pose[:, :3, :3])
    t = pose[:, None, :3, 3] + (grid * std_tr)[None]  # (B, S, 3)
    return jnp.concatenate([R, t[..., None]], axis=-1)


class SmallHourglass3D(nn.Module):
    """dres00-03 + classify0, PANet's shared per-scale stack
    (ref PANet.py:60-79): 64->8->16 entry, 16-ch residual blocks whose
    second conv is 1x1x1, and an 16->8 convbn+relu classify stage."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cost, train: bool = False):
        d = self.dtype
        c0 = nn.relu(ConvBN3D(8, dtype=d)(cost, train))
        c0 = nn.relu(ConvBN3D(16, dtype=d)(c0, train))
        for _ in range(3):  # dres01..03
            r = nn.relu(ConvBN3D(16, dtype=d)(c0, train))
            r = ConvBN3D(16, kernel=(1, 1, 1), dtype=d)(r, train)
            c0 = c0 + r
        out = nn.relu(ConvBN3D(8, dtype=d)(c0, train))
        return Conv3DMXU(1, (3, 3, 3), dtype=d)(out)


class PANet(nn.Module):
    """Pose-aware plane sweep: max over pose-scale hypotheses."""

    cfg: DepthConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ref, targets, pose, K, K_inv, train: bool = False):
        cfg = self.cfg
        d = self.dtype
        B, H, W, _ = ref.shape
        K4, K4_inv = _quarter_K(K.astype(jnp.float32))
        scales = jnp.asarray(pose_scales(cfg), jnp.float32)
        labels = jnp.arange(1, cfg.nlabel + 1, dtype=jnp.float32)
        plane_depths = cfg.min_depth * cfg.nlabel / labels

        feat = SPPFeatureExtractor(dtype=d)
        ref_feat = feat(ref, train)
        hourglass = SmallHourglass3D(dtype=d)
        costs = None
        T = targets.shape[1]
        for j in range(T):
            tgt_feat = feat(targets[:, j], train)
            poses_s = sample_pose_by_scale(pose[:, j].astype(jnp.float32),
                                           scales)
            vol = _scaled_sweep(tgt_feat.astype(jnp.float32), plane_depths,
                                poses_s, K4, K4_inv)  # (B,S,D,h,w,C)
            S = vol.shape[1]
            refb = jnp.broadcast_to(
                ref_feat[:, None, None].astype(jnp.float32), vol.shape
            )
            cost = jnp.concatenate([refb, vol], axis=-1).astype(d)
            Bc, _, D, h, w, C2 = cost.shape
            c = hourglass(cost.reshape(Bc * S, D, h, w, C2), train)
            c = c.reshape(Bc, S, D, h, w)
            c = jnp.max(c, axis=1)  # max over pose scales (PANet.py:144)
            costs = c if costs is None else costs + c
        costs = costs / T

        ctx_in = jnp.concatenate(
            [
                jnp.broadcast_to(
                    ref_feat[:, None],
                    costs.shape[:2] + ref_feat.shape[1:],
                ),
                costs[..., None].astype(d),
            ],
            axis=-1,
        )
        costss = (ContextNet(1, cfg.context_bn, dtype=d)(ctx_in, train)[..., 0]
                  + costs)
        depth = _upsample_regress(costss, cfg.nlabel, cfg.min_depth, H, W)
        return None, depth


class REGNet(nn.Module):
    """Correlation cost over planes x pose scales, 3D-conv regularized."""

    cfg: DepthConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ref, targets, pose, K, K_inv, train: bool = False):
        cfg = self.cfg
        d = self.dtype
        B, H, W, _ = ref.shape
        K4, K4_inv = _quarter_K(K.astype(jnp.float32))
        labels = jnp.arange(1, cfg.nlabel + 1, dtype=jnp.float32)
        plane_depths = cfg.min_depth * cfg.nlabel / labels

        feat = SPPFeatureExtractor(dtype=d)
        ref_feat = feat(ref, train)
        costs = None
        T = targets.shape[1]
        for j in range(T):
            tgt_feat = feat(targets[:, j], train)
            # coupled n^3 pose-perturbation grid (ref REGNet.py:173-176)
            poses_s = sample_pose_grid(
                pose[:, j].astype(jnp.float32), cfg.regnet_sample_num,
                cfg.regnet_std_rot, cfg.regnet_std_tr,
            )
            vol = _scaled_sweep(tgt_feat.astype(jnp.float32), plane_depths,
                                poses_s, K4, K4_inv)  # (B,S,D,h,w,C)
            corr = jnp.mean(
                ref_feat[:, None, None].astype(jnp.float32) * vol, axis=-1
            )  # (B, S, D, h, w): pose samples as channels (REGNet.py:182)
            cost = nn.leaky_relu(
                jnp.moveaxis(corr, 1, -1), 0.1
            ).astype(d)  # (B, D, h, w, S)
            c0 = nn.relu(ConvBN3D(32, dtype=d)(cost, train))
            c0 = nn.relu(ConvBN3D(32, dtype=d)(c0, train))
            for _ in range(4):  # posecnn1..4
                r = nn.relu(ConvBN3D(32, dtype=d)(c0, train))
                r = ConvBN3D(32, dtype=d)(r, train)
                c0 = c0 + r
            # predict head: convbn+relu stage before the final conv
            # (ref REGNet.py:120-122)
            c0 = nn.relu(ConvBN3D(32, dtype=d)(c0, train))
            c = Conv3DMXU(1, (3, 3, 3), dtype=d)(c0)[..., 0]
            costs = c if costs is None else costs + c
        costs = costs / T

        ctx_in = jnp.concatenate(
            [
                jnp.broadcast_to(
                    ref_feat[:, None], costs.shape[:2] + ref_feat.shape[1:]
                ),
                costs[..., None].astype(d),
            ],
            axis=-1,
        )
        costss = (ContextNet(1, cfg.context_bn, dtype=d)(ctx_in, train)[..., 0]
                  + costs)
        depth_init = _upsample_regress(costs, cfg.nlabel, cfg.min_depth, H, W)
        depth = _upsample_regress(costss, cfg.nlabel, cfg.min_depth, H, W)
        return depth_init, depth


class REG2D(nn.Module):
    """2D-conv-only regression with offset x scale refinement."""

    cfg: DepthConfig
    offset_num: int = 9
    offset_std: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ref, targets, pose, K, K_inv, train: bool = False):
        cfg = self.cfg
        d = self.dtype
        B, H, W, _ = ref.shape
        K4, K4_inv = _quarter_K(K.astype(jnp.float32))
        labels = jnp.arange(1, cfg.nlabel + 1, dtype=jnp.float32)
        plane_depths = cfg.min_depth * cfg.nlabel / labels

        feat = SPPFeatureExtractor(dtype=d)
        ref_feat = feat(ref, train)
        h, w = ref_feat.shape[1:3]
        tgt_feat = feat(targets[:, 0], train)
        pose0 = pose[:, 0].astype(jnp.float32)

        vol = plane_sweep_warp(tgt_feat.astype(jnp.float32), plane_depths,
                               pose0, K4, K4_inv)  # (B, D, h, w, C)
        corr = jnp.mean(ref_feat[:, None].astype(jnp.float32) * vol, axis=-1)
        cost = nn.leaky_relu(jnp.moveaxis(corr, 1, -1), 0.1).astype(d)

        # REG2D's own convbn: biased conv + BN + LeakyReLU(0.1)
        # (ref REG2D.py:27-32 — distinct from the shared submodule convbn)
        def convbn_lk(x, feats, dil=1):
            x = nn.Conv(feats, (3, 3), padding=dil,
                        kernel_dilation=(dil, dil), dtype=d)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=d)(x)
            return nn.leaky_relu(x, 0.1)

        # DenseNet 2D stack (REG2D.py:116-121)
        x = cost
        for c in (128, 128, 96, 64, 32):
            x = jnp.concatenate([convbn_lk(x, c), x], axis=-1)
        depth_init = nn.Conv(1, (3, 3), padding=1, dtype=d)(x)[..., 0]
        depth_init = depth_init.astype(jnp.float32)  # (B, h, w), 1/4 res

        # refinement cost: 9 depth offsets x 11 FIXED translation scales
        # (hardcoded in the reference, REG2D.py:126-130, independent of the
        # SCALE_MIN/MAX/STEP knobs PANet reads); rotation is NOT scaled —
        # only the translation column is multiplied
        scales = jnp.arange(0.5, 1.6, 0.1, dtype=jnp.float32)
        S_ = scales.shape[0]
        poses_s = jnp.broadcast_to(pose0[:, None], (B, S_, 3, 4))
        poses_s = poses_s.at[..., 3].multiply(scales[None, :, None])
        S = poses_s.shape[1]
        offs = (jnp.arange(self.offset_num, dtype=jnp.float32)
                - (self.offset_num - 1) / 2) * self.offset_std
        d_hypo = jax.lax.stop_gradient(depth_init)[:, None] + offs[None, :, None, None]
        # fold (offset x scale) into the depth-plane machinery: for each
        # offset o and scale s, warp by depth map d_hypo[o] under pose_s
        from deep_sfm_revisited_tpu.ops.camera import inverse_warp

        ref_corr = []
        for o in range(self.offset_num):
            tf = jnp.broadcast_to(
                tgt_feat[:, None].astype(jnp.float32),
                (B, S) + tgt_feat.shape[1:],
            ).reshape(B * S, h, w, -1)
            dh = jnp.broadcast_to(d_hypo[:, o][:, None], (B, S, h, w)).reshape(
                B * S, h, w
            )
            warped = inverse_warp(
                tf, dh, poses_s.reshape(B * S, 3, 4),
                jnp.repeat(K4, S, axis=0), jnp.repeat(K4_inv, S, axis=0),
            ).reshape(B, S, h, w, -1)
            ref_corr.append(
                jnp.mean(ref_feat[:, None].astype(jnp.float32) * warped, -1)
            )
        refine = jnp.concatenate(ref_corr, axis=1)  # (B, 9*S, h, w)
        refine = jnp.moveaxis(refine, 1, -1)

        ref_down = resize_bilinear(ref.astype(d), (h, w))
        ctx_in = jnp.concatenate(
            [
                refine.astype(d),
                ref_feat,
                jax.lax.stop_gradient(depth_init)[..., None].astype(d),
                ref_down,
            ],
            axis=-1,
        )
        x = ctx_in
        for c, dil in ((128, 1), (128, 1), (128, 1), (128, 2), (128, 4),
                       (96, 8), (64, 16), (32, 1)):
            x = convbn_lk(x, c, dil)  # leaky convbn stack (REG2D.py:54-63)
        resid = nn.Conv(1, (3, 3), padding=1, dtype=d)(x)[..., 0]
        depth = resid.astype(jnp.float32) + jax.lax.stop_gradient(depth_init)

        up = lambda z: resize_bilinear(z[..., None], (H, W))[..., 0]
        return up(depth_init), up(depth)


class DISPNET(nn.Module):
    """Epipolar-disparity sweep with closed-form triangulation."""

    cfg: DepthConfig
    dtype: Dtype = jnp.float32
    anchor_depth: float = 20.0

    @nn.compact
    def __call__(self, ref, targets, pose, K, K_inv, train: bool = False):
        from deep_sfm_revisited_tpu.models.psnet import Hourglass3D

        cfg = self.cfg
        d = self.dtype
        B, H, W, _ = ref.shape
        K4, K4_inv = _quarter_K(K.astype(jnp.float32))
        nl = cfg.nlabel
        num_disp = 2 * nl + 1

        feat = SPPFeatureExtractor(dtype=d)
        ref_feat = feat(ref, train)
        h, w = ref_feat.shape[1:3]
        tgt_feat = feat(targets[:, 0], train)
        pose0 = pose[:, 0].astype(jnp.float32)

        # anchors: projection of every pixel at the fixed anchor depth,
        # moving along the epipolar direction (DISPNET.py:123-200)
        grid = pixel_grid(h, w, jnp.float32).reshape(3, -1)
        KRKi = jnp.einsum("bij,bjk,bkl->bil", K4, pose0[:, :, :3], K4_inv)
        ray = jnp.einsum("bij,jn->bin", KRKi, grid)
        tvec = jnp.einsum("bij,bj->bi", K4, pose0[:, :, 3])[..., None]
        p = ray * self.anchor_depth + tvec
        z = jnp.maximum(p[:, 2], 1e-3)
        anchors = jnp.stack([p[:, 0] / z, p[:, 1] / z], -1)  # (B, HW, 2)
        # epipolar direction: difference of projections at two depths —
        # the same line the reference derives from the fundamental matrix
        # (DISPNET.py:137-141,165-170). The reference normalizes
        # [1, slope], whose x-component is always positive, so flip to
        # that sign convention (the disparity axis orientation feeds the
        # 3D convs, which are not symmetric in D).
        p2 = ray * (self.anchor_depth * 2.0) + tvec
        z2 = jnp.maximum(p2[:, 2], 1e-3)
        far = jnp.stack([p2[:, 0] / z2, p2[:, 1] / z2], -1)
        move = far - anchors
        move = move * jnp.where(move[..., :1] < 0, -1.0, 1.0)
        move = move / jnp.maximum(
            jnp.linalg.norm(move, axis=-1, keepdims=True), 1e-12
        )

        steps = jnp.arange(-nl, nl + 1, dtype=jnp.float32)
        coords = anchors[:, None] + steps[None, :, None, None] * move[:, None]
        coords = coords.reshape(B, num_disp, h, w, 2)
        warped = bilinear_sample(tgt_feat.astype(jnp.float32), coords)
        refb = jnp.broadcast_to(
            ref_feat[:, None].astype(jnp.float32), warped.shape
        )
        cost = jnp.concatenate([refb, warped], axis=-1).astype(d)
        c = Hourglass3D(dtype=d)(cost, train)[..., 0]  # (B, num_disp, h, w)

        ctx_in = jnp.concatenate(
            [
                jnp.broadcast_to(
                    ref_feat[:, None], c.shape[:2] + ref_feat.shape[1:]
                ),
                c[..., None].astype(d),
            ],
            axis=-1,
        )
        cs = ContextNet(1, cfg.context_bn, dtype=d)(ctx_in, train)[..., 0] + c

        prob = jax.nn.softmax(cs.astype(jnp.float32), axis=1)
        disp = jnp.sum(prob * steps[None, :, None, None], axis=1)  # (B,h,w)

        # matched point -> u-coordinate closed-form triangulation
        # (ref `triangulation` u_base=True, DISPNET.py:177-203): the ref
        # pixel's depth lambda solves  lambda (K R K^-1 u)_0 + (K t)_0 =
        # u2 (lambda (K R K^-1 u)_2 + (K t)_2)
        matched = (anchors.reshape(B, h, w, 2)
                   + disp[..., None] * move.reshape(B, h, w, 2))
        KT = jnp.einsum("bij,bj->bi", K4, pose0[:, :, 3])  # (B, 3)
        RpK = KRKi @ grid  # (B, 3, HW) = K R K^-1 [u, v, 1]
        RpK = RpK.reshape(B, 3, h, w)
        u2 = matched[..., 0]
        depth = (u2 * KT[:, 2, None, None] - KT[:, 0, None, None]) / (
            RpK[:, 0] - u2 * RpK[:, 2] + 1e-5
        )
        depth = jnp.clip(depth, 0.0, 80.0)
        depth = jnp.nan_to_num(depth)

        if cfg.psnet_dep_context:
            ref_g = resize_bilinear(ref.astype(d), (h, w))
            dep_in = jnp.concatenate(
                [
                    jax.lax.stop_gradient(depth)[..., None].astype(d),
                    ref_feat,
                    ref_g,
                ],
                axis=-1,
            )
            depth_out = DepthContextNet(cfg.context_bn, dtype=d)(
                dep_in, train
            )[..., 0].astype(jnp.float32) + depth
            up = lambda z: resize_bilinear(z[..., None], (H, W))[..., 0]
            return up(depth), up(depth_out)
        up = lambda z: resize_bilinear(z[..., None], (H, W))[..., 0]
        return None, up(depth)
