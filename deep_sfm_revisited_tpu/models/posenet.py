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

import jax
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
        enc = _SharedEncoder(dtype=d, name="frame_enc")
        x1 = enc(ref, train)
        x2 = enc(target, train)

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


class _Bottleneck(nn.Module):
    """torchvision-style bottleneck (ref `Bottleneck`, PoseNet.py:123-170)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        out_ch = self.planes * 4

        def bn(v):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=d)(v)

        y = nn.relu(bn(nn.Conv(self.planes, (1, 1), use_bias=False,
                               dtype=d)(x)))
        y = nn.relu(bn(nn.Conv(self.planes, (3, 3),
                               strides=(self.stride,) * 2, padding=1,
                               use_bias=False, dtype=d)(y)))
        y = bn(nn.Conv(out_ch, (1, 1), use_bias=False, dtype=d)(y))
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = bn(nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                           use_bias=False, dtype=d)(x))
        return nn.relu(x + y)


class MotionNet(nn.Module):
    """Shrink + normalized flow-coordinate channels + stride-2 conv
    pyramid + linear head -> (rot3, unit trans3)
    (ref `MotionNet`, PoseNet.py:348-432): the fused feature map is
    1x1-shrunk to 32 channels and concatenated with 4 channels of
    [pixel, pixel+flow] coordinates normalized to [-1, 1]; each pyramid
    stage is TWO stride-2 biased convs with LeakyReLU(0.1); spatial mean,
    two (512->256->256) linear+leaky layers, and a 6-way head whose
    translation half is L2-normalized (NO 0.01 scaling — that is
    PlainPose-only)."""

    conv_sizes: tuple = (64, 128, 256, 512, 512)
    lin_sizes: tuple = (256, 256)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, flow):
        d = self.dtype
        B, H, W, _ = x.shape
        x = nn.leaky_relu(
            nn.Conv(32, (1, 1), dtype=d)(x), 0.1)  # shrink (PoseNet.py:384)
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing="ij")
        pix = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (B, H, W, 2))
        fp = pix + jax.lax.stop_gradient(flow.astype(jnp.float32))
        info = jnp.concatenate([pix, fp], axis=-1)
        norm = jnp.asarray([W / 2, H / 2, W / 2, H / 2], jnp.float32)
        info = (info - norm) / norm  # (PoseNet.py:411-420)
        x = jnp.concatenate([x, info.astype(d)], axis=-1)  # 36 ch
        for c in self.conv_sizes:
            x = nn.leaky_relu(
                nn.Conv(c, (3, 3), strides=(2, 2), padding=1, dtype=d)(x), 0.1
            )
            x = nn.leaky_relu(
                nn.Conv(c, (3, 3), strides=(2, 2), padding=1, dtype=d)(x), 0.1
            )
        x = jnp.mean(x, axis=(1, 2))  # spatial mean (PoseNet.py:426-427)
        for c in self.lin_sizes:
            x = nn.leaky_relu(nn.Dense(c, dtype=d)(x), 0.1)
        pose = nn.Dense(6, dtype=d)(x).astype(jnp.float32)
        t = pose[:, 3:]
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                            1e-12)
        return jnp.concatenate([pose[:, :3], t], axis=-1)


class ResNetPose(nn.Module):
    """Deeper pose regressor: shared bottleneck-ResNet stem over each
    frame, dense fusion block, MotionNet head (ref `ResNet` with
    Bottleneck [3, 4, 6, 3], `models/PoseNet.py:172-345`, selected by
    POSE_NET_TYPE='res'). Returns (B, 6) = (rot3, unit trans3)."""

    down_feat: int = 128  # ref POSE_DOWN_FEAT (lib/config.py:60)
    use_flow: bool = False   # ref POSENET_FLOW
    use_conf: bool = False   # ref POSENET_ENTRO
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, ref, target, conf=None, train: bool = False):
        d = self.dtype
        flow = jax.lax.stop_gradient(flow)

        stem = _ResNetStem(dtype=d, name="stem")
        x1 = stem(ref, train)
        y1 = stem(target, train)
        x = jnp.concatenate([x1, y1], axis=-1)  # 512 ch at 1/8

        x = nn.leaky_relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=d)(
                nn.Conv(self.down_feat, (3, 3), padding=1, use_bias=False,
                        dtype=d)(x)
            ),
            0.1,
        )
        if self.use_flow:
            x = jnp.concatenate(
                [x, resize_bilinear(flow.astype(d), x.shape[1:3])], axis=-1
            )
        if self.use_conf and conf is not None:
            x = jnp.concatenate(
                [x, resize_bilinear(conf.astype(d), x.shape[1:3])], axis=-1
            )
        # DenseNet fusion (ref conv3_0..conv3_4)
        for c in (128, 96, 64, 32, 32):
            y = nn.leaky_relu(
                nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=d)(
                    nn.Conv(c, (3, 3), padding=1, use_bias=False, dtype=d)(x)
                ),
                0.1,
            )
            x = jnp.concatenate([y, x], axis=-1)

        # MotionNet consumes the fused map AND the 1/4-res flow
        # (PoseNet.py:282,302); output is already (rot3, unit trans3)
        flow_q = resize_bilinear(flow.astype(d), x.shape[1:3])
        return MotionNet(dtype=d)(x, flow_q)


class _ResNetStem(nn.Module):
    """conv7/2 + layer1 (3x bottleneck-64) + layer2 (4x bottleneck-64,
    first stride 2) — the layers the reference forward actually uses
    (`models/PoseNet.py:269-280`). NOTE: the constructed maxpool is
    SKIPPED by the forward, so features come out at 1/4 resolution,
    matching the 1/4-downsampled flow the head consumes."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        d = self.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=d)(img.astype(d))
        x = nn.relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=d)(x)
        )
        for _ in range(3):  # layer1
            x = _Bottleneck(64, 1, d)(x, train)
        x = _Bottleneck(64, 2, d)(x, train)  # layer2, 4 blocks
        for _ in range(3):
            x = _Bottleneck(64, 1, d)(x, train)
        return x  # 256 ch at 1/4
