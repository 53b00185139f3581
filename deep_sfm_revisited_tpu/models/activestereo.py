"""ActiveStereoNet: siamese stereo matching with disparity refinement.

Rebuild of `models/activestereonet.py` (`siamese_network` `:98`,
`refine_disp_network` `:114`, `invalidation_network` `:143`,
`ActiveStereoNet` `:176`) — an *orphaned* alternate in the reference
(never imported by SFMnet/main; kept here for component parity and as a
rectified-stereo head):

  * 1/8-res siamese features (res blocks + 3 stride-2 convs);
  * shift-and-diff disparity cost volume over maxdisp/8 candidates,
    3D-conv regularized, soft-argmin regression;
  * edge-aware disparity refinement net on the upsampled disparity;
  * invalidation (confidence) network over left/right features.

Input: rectified (left, right) (B, H, W, C) pairs; output (disparity
(B, H, W), invalidation logits (B, H/8, W/8, 1)).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.models.submodules import resize_bilinear

Dtype = Any


class _Res(nn.Module):
    features: int
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        y = nn.Conv(self.features, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=d)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=d)(y)
        y = nn.leaky_relu(y, 0.1)
        y = nn.Conv(self.features, (3, 3), padding=self.dilation,
                    kernel_dilation=(self.dilation,) * 2, use_bias=False,
                    dtype=d)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=d)(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=d)(x)
        return nn.leaky_relu(x + y, 0.1)


class SiameseTower(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dtype
        x = nn.Conv(32, (3, 3), padding=1, dtype=d)(x.astype(d))
        for _ in range(3):
            x = _Res(32, dtype=d)(x, train)
        for _ in range(3):
            x = nn.leaky_relu(
                nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=d)(
                    nn.Conv(32, (3, 3), strides=(2, 2), padding=1,
                            use_bias=False, dtype=d)(x)
                ),
                0.1,
            )
        return nn.Conv(32, (3, 3), padding=1, dtype=d)(x)  # 1/8 res


class ActiveStereoNet(nn.Module):
    """Rectified-stereo disparity network."""

    maxdisp: int = 144
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, left, right, train: bool = False):
        d = self.dtype
        B, H, W, _ = left.shape
        tower = SiameseTower(dtype=d)
        fl = tower(left, train)
        fr = tower(right, train)
        D = self.maxdisp // 8

        # shift-and-diff cost volume (disparity = leftward shift of right)
        costs = []
        for disp in range(D):
            if disp == 0:
                diff = fl - fr
            else:
                shifted = jnp.pad(fr, ((0, 0), (0, 0), (disp, 0), (0, 0)))[
                    :, :, : fr.shape[2]
                ]
                diff = fl - shifted
            costs.append(diff)
        cost = jnp.stack(costs, axis=1)  # (B, D, h, w, C)

        for _ in range(4):
            cost = nn.leaky_relu(
                nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=d)(
                    nn.Conv(32, (3, 3, 3), padding=1, use_bias=False,
                            dtype=d)(cost)
                ),
                0.1,
            )
        cost = nn.Conv(1, (3, 3, 3), padding=1, dtype=d)(cost)[..., 0]

        prob = jax.nn.softmax(-cost.astype(jnp.float32), axis=1)  # soft-argmin
        disps = jnp.arange(D, dtype=jnp.float32)[None, :, None, None]
        disp_lr = jnp.sum(prob * disps, axis=1)  # (B, h, w)

        disp_up = 8.0 * resize_bilinear(disp_lr[..., None], (H, W))[..., 0]

        # edge-aware refinement (≙ refine_disp_network)
        x = nn.leaky_relu(nn.Conv(16, (3, 3), padding=1, dtype=d)(
            disp_up[..., None].astype(d) / self.maxdisp), 0.1)
        y = nn.leaky_relu(nn.Conv(16, (3, 3), padding=1, dtype=d)(
            left.astype(d)), 0.1)
        x = _Res(16, 1, d)(x, train)
        y = _Res(16, 1, d)(y, train)
        x = _Res(16, 2, d)(x, train)
        y = _Res(16, 2, d)(y, train)
        h = jnp.concatenate([x, y], axis=-1)
        for dil in (4, 8, 1):
            h = _Res(32, dil, d)(h, train)
        resid = nn.Conv(1, (3, 3), padding=1, dtype=d)(h)[..., 0]
        disparity = disp_up + resid.astype(jnp.float32)

        # invalidation head (≙ invalidation_network)
        inv = jnp.concatenate([fl, fr], axis=-1)
        inv = _Res(64, 1, d)(inv, train)
        inv_res = _Res(64, 1, d, name="inv_res")  # shared, applied 4x
        for _ in range(4):
            inv = inv + inv_res(inv, train)
        invalidation = nn.Conv(1, (3, 3), padding=1, dtype=d)(inv)

        return disparity, invalidation
