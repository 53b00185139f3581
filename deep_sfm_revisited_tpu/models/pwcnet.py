"""PWC-DC Net optical flow.

Rebuild of `models/PWCNet.py` (`PWCDCNet` `:41`; the reference ships it
orphaned — its custom CUDA correlation import is commented out and
SFMnet only routes RAFT/DICL, `models/SFMnet.py:49-54`; here it is fully
functional using `ops.correlation.local_correlation` and selectable via
cfg.flow.estimator == 'PWC'):

  * 6-level siamese pyramid encoder (stride 2 per level);
  * per-level: warp target features by 0.05/0.1/... scaled up-flow,
    windowed correlation (md=4), DenseNet-connected decoder, flow head,
    deconv up-flow + up-feature;
  * dilated context network refining the finest (1/4) flow;
  * output upsampled x4 to full res, flow scaled x20/px conventions of
    the original PWC-Net (div_flow=20).

Layout NHWC; input (B, H, W, 6) with H, W divisible by 64.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import FlowConfig
from deep_sfm_revisited_tpu.models.dicl import warp_flow
from deep_sfm_revisited_tpu.models.submodules import resize_bilinear
from deep_sfm_revisited_tpu.ops.correlation import local_correlation

Dtype = Any
_LRELU = 0.1


class _Conv(nn.Module):
    features: int
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.dilation
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=pad, kernel_dilation=(self.dilation,) * 2,
                    dtype=self.dtype)(x)
        return nn.leaky_relu(x, _LRELU)


class _Deconv(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                padding="SAME", dtype=self.dtype)(x)


class _Encoder(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        feats = []
        for c in (16, 32, 64, 96, 128, 196):
            x = _Conv(c, 2, dtype=d)(x)
            x = _Conv(c, 1, dtype=d)(x)
            x = _Conv(c, 1, dtype=d)(x)
            feats.append(x)
        return feats  # strides 2, 4, 8, 16, 32, 64


class _DenseDecoder(nn.Module):
    """DenseNet-connected flow decoder block (ref conv{l}_0..4)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        for c in (128, 128, 96, 64, 32):
            x = jnp.concatenate([_Conv(c, 1, dtype=d)(x), x], axis=-1)
        flow = nn.Conv(2, (3, 3), padding=1, dtype=d)(x)
        return x, flow


class PWCDCNet(nn.Module):
    """PWC-DC flow network. Returns (flow, None) like RAFT."""

    cfg: FlowConfig
    md: int = 4
    div_flow: float = 20.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pair: jnp.ndarray, train: bool = False,
                 all_iters: bool = False):
        d = self.dtype
        B, H, W, _ = pair.shape
        im1 = pair[..., :3].astype(d)
        im2 = pair[..., 3:].astype(d)
        enc = _Encoder(dtype=d)
        c1 = enc(im1)
        c2 = enc(im2)

        # per-level warp scales of the original PWC (0.625 at l=2 ... )
        warp_scales = {6: None, 5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}
        flows = []
        flow = None
        up_flow = None
        up_feat = None
        x = None
        for lvl in (6, 5, 4, 3, 2):
            f1, f2 = c1[lvl - 1], c2[lvl - 1]
            if up_flow is None:
                corr = local_correlation(
                    f1.astype(jnp.float32), f2.astype(jnp.float32), self.md
                ).astype(d)
                inp = corr
            else:
                warped = warp_flow(
                    f2, up_flow.astype(jnp.float32) * warp_scales[lvl]
                )
                corr = local_correlation(
                    f1.astype(jnp.float32), warped.astype(jnp.float32),
                    self.md,
                ).astype(d)
                inp = jnp.concatenate([corr, f1, up_flow, up_feat], axis=-1)
            inp = nn.leaky_relu(inp, _LRELU) if up_flow is None else inp
            x, flow = _DenseDecoder(dtype=d)(inp)
            flows.append(flow)
            if lvl > 2:
                up_flow = _Deconv(2, d)(flow)
                up_feat = _Deconv(2, d)(x)

        # dilated context refinement at 1/4 (ref dc_conv1..7)
        h = x
        for c, dil in ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16),
                       (32, 1)):
            h = _Conv(c, 1, dil, d)(h)
        flow = flow + nn.Conv(2, (3, 3), padding=1, dtype=d)(h)
        flows[-1] = flow

        full = self.div_flow * resize_bilinear(
            flow.astype(jnp.float32), (H, W)
        )
        if all_iters:
            stack = jnp.stack(
                [
                    resize_bilinear(
                        f.astype(jnp.float32) * self.div_flow, (H, W)
                    )
                    for f in flows
                ],
                axis=0,
            )
            return stack, None
        return full, None
