"""PoseNet: direct 6-DoF pose regression (ablation path).

Rebuild of `models/PoseNet.py` (`PlainPose` `:13-68`; the deeper
`ResNet`/`Bottleneck` variant selected by POSE_NET_TYPE='res',
`models/SFMnet.py:86-92`): regresses 0.01-scaled (rot3, normalized
trans3) from per-frame conv features + downsampled flow (+confidence).
Selected with cfg.pose.estimator == 'POSENET'; trained with the 20x-rot
MSE loss (`train/losses.py::pose_regression_loss` ≙ `main.py:396-408`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.models.submodules import resize_bilinear

Dtype = Any


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=(self.kernel - 1) // 2,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype)(x)
        return nn.relu(x)


class PlainPose(nn.Module):
    """(flow, conf, ref, target) -> (B, 6) = (rot3, unit trans3)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, ref, target, conf=None, train: bool = False):
        d = self.dtype
        x1 = _SharedEncoder(dtype=d, name="frame_enc")(ref, train)
        x2 = _SharedEncoder(dtype=d, name="frame_enc")(target, train)

        hw = x1.shape[1:3]
        flow_d = resize_bilinear(flow.astype(d), hw)
        if conf is None:
            conf = jnp.zeros(flow.shape[:3] + (1,), flow.dtype)
        conf_d = resize_bilinear(conf.astype(d), hw)

        x = jnp.concatenate([x1, x2, flow_d, conf_d], axis=-1)  # 131 ch
        for feats, k in ((128, 5), (64, 3), (32, 3), (16, 3), (16, 3)):
            x = _ConvBNRelu(feats, k, 2, d)(x, train)
        x = jnp.mean(x, axis=(1, 2), keepdims=True)  # global avg pool
        pose = nn.Conv(6, (1, 1), dtype=d)(x)[:, 0, 0, :]
        pose = 0.01 * pose.astype(jnp.float32)
        t = pose[:, 3:]
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
        return jnp.concatenate([pose[:, :3], t], axis=-1)


class _SharedEncoder(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        x = img.astype(self.dtype)
        for feats, k, s in ((16, 5, 2), (32, 3, 2), (64, 3, 1), (128, 3, 1),
                            (128, 3, 1), (128, 3, 1), (64, 3, 1)):
            x = _ConvBNRelu(feats, k, s, self.dtype)(x, train)
        return x
