"""CVP-MVSNet: cost-volume-pyramid multi-view stereo depth.

Rebuild of `models/CVPMVS.py` (`FeaturePyramid` `:19`, `CostRegNet` 3D
U-Net `:45`, `CVPMVS` `:84`): shared per-scale feature extraction,
coarse 48-hypothesis uniform sweep between depth 1 and 96
(`:117-118,148`), sum-of-squares cost aggregation (`:155-176`),
3D-U-Net regularization, then coarse-to-fine refinement with per-pixel
local hypotheses around the 2x-upsampled depth (`:192-212`).

Selected via cfg.depth.estimator == 'CVP'. Returns (depth_init = coarse
upsampled, depth = finest), matching the SFMnet two-output contract
(the reference returns its multi-scale list; SFMnet uses [0]).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import DepthConfig
from deep_sfm_revisited_tpu.models.submodules import (
    resize_bicubic,
    resize_bilinear,
)
from deep_sfm_revisited_tpu.ops.mvs import (
    depth_regression,
    depth_regression_refine,
    homo_warping,
    local_depth_hypos,
    proj_cost_volume,
    sweeping_depth_hypos,
)

Dtype = Any


class _ConvLeaky(nn.Module):
    """Biased conv + LeakyReLU(0.1), NO norm (ref `conv`, modules.py:21-25)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.1)


class FeaturePyramid(nn.Module):
    """Shared conv stack applied at each image scale (CVPMVS.py:19-43)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, nscale: int = 3, train: bool = False):
        d = self.dtype

        chans = (64, 64, 64, 32, 32, 32, 16, 16, 16)
        convs = [_ConvLeaky(c, dtype=d) for c in chans]

        def extract(x):
            for conv in convs:
                x = conv(x)
            return x

        fp = [extract(img.astype(d))]
        x = img
        for _ in range(nscale - 1):
            h, w = x.shape[1] // 2, x.shape[2] // 2
            # torch F.interpolate(scale_factor=0.5) without align_corners
            # (CVPMVS.py:38) => half-pixel centers
            x = resize_bilinear(x, (h, w), align_corners=False)
            fp.append(extract(x.astype(d)))
        return fp  # fine -> coarse, 16 channels each


class _ConvBnReLU3D(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3, 3), strides=(self.stride,) * 3,
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class _Deconv3DS2(nn.Module):
    """torch `ConvTranspose3d(k3, s2, p1, output_padding=1)` equivalent:
    2x input dilation + asymmetric (1, 2) padding + (ported-flipped)
    kernel — numerically exact vs torch (scratch/deconv3d_port_check.py).
    Kernel layout (3, 3, 3, Cin, Cout)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        Cin = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 3, Cin, self.features),
                       jnp.float32).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, window_strides=(1, 1, 1),
            padding=[(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )


class CostRegNet(nn.Module):
    """3D U-Net cost regularizer (CVPMVS.py:45-82). NDHWC."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        c0 = _ConvBnReLU3D(16, dtype=d)(x, train)
        c0 = _ConvBnReLU3D(16, dtype=d)(c0, train)
        c2 = _ConvBnReLU3D(32, 2, d)(c0, train)
        c2 = _ConvBnReLU3D(32, dtype=d)(c2, train)
        c2 = _ConvBnReLU3D(32, dtype=d)(c2, train)
        c4 = _ConvBnReLU3D(64, dtype=d)(c2, train)
        c4 = _ConvBnReLU3D(64, dtype=d)(c4, train)
        c4 = _ConvBnReLU3D(64, dtype=d)(c4, train)
        # conv5: stride-1 "transpose" = plain conv (ref output_padding=0)
        c5 = nn.Conv(32, (3, 3, 3), padding=1, use_bias=False, dtype=d)(c4)
        c5 = nn.relu(nn.BatchNorm(use_running_average=not train,
                                  momentum=0.9, dtype=d)(c5))
        c5 = c2 + c5
        c6 = _Deconv3DS2(16, dtype=d)(c5)
        c6 = nn.relu(nn.BatchNorm(use_running_average=not train,
                                  momentum=0.9, dtype=d)(c6))
        c6 = c0 + c6
        prob = nn.Conv(1, (3, 3, 3), padding=1, dtype=d)(c6)
        return prob[..., 0]  # (B, D, H, W)


class CVPMVS(nn.Module):
    """Cost-volume-pyramid depth. SFMnet depth-estimator contract."""

    cfg: DepthConfig
    nscale: int = 3
    n_coarse: int = 48
    n_refine: int = 8
    depth_min: float = 1.0
    depth_max: float = 96.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ref, targets, pose, K, K_inv, train: bool = False):
        d = self.dtype
        B, H, W, _ = ref.shape
        # the reference maps inputs back to [0,1] (CVPMVS.py:99-105)
        ref01 = 0.5 + ref * 0.5
        src01 = 0.5 + targets[:, 0] * 0.5

        pyr = FeaturePyramid(dtype=d)
        ref_fp = pyr(ref01, self.nscale, train)
        src_fp = pyr(src01, self.nscale, train)
        reg = CostRegNet(dtype=d)
        pose0 = pose[:, 0].astype(jnp.float32)

        # coarse sweep at the coarsest level. NOTE the reference never
        # applies its multi-scale intrinsics to the warp — the pose acts
        # on pixel coordinates directly (CVPMVS.py:163, modules.py:74-84);
        # reproduced bug-for-bug in ops.mvs
        hyp = sweeping_depth_hypos(self.depth_min, self.depth_max,
                                   self.n_coarse)
        rf, sf = ref_fp[-1], src_fp[-1]
        warped = homo_warping(sf.astype(jnp.float32), pose0, hyp)
        cost = (rf[:, None].astype(jnp.float32) ** 2 + warped**2).astype(d)
        prob = jax.nn.softmax(reg(cost, train).astype(jnp.float32), axis=1)
        depth = depth_regression(prob, hyp)
        depth_coarse = depth

        # coarse-to-fine refinement
        for lvl in range(self.nscale - 2, -1, -1):
            rf, sf = ref_fp[lvl], src_fp[lvl]
            hw = rf.shape[1:3]
            # ref upsamples the seed depth BICUBIC half-pixel
            # (CVPMVS.py:195)
            depth = resize_bicubic(depth[..., None], hw)[..., 0]
            hypos = local_depth_hypos(depth, self.n_refine)
            cost = proj_cost_volume(
                rf.astype(jnp.float32), sf.astype(jnp.float32), pose0,
                hypos,
            ).astype(d)
            prob = jax.nn.softmax(reg(cost, train).astype(jnp.float32), 1)
            depth = depth_regression_refine(prob, hypos)

        depth_full = resize_bilinear(depth[..., None], (H, W))[..., 0]
        init_full = resize_bilinear(depth_coarse[..., None], (H, W))[..., 0]
        return init_full, depth_full
