"""Shared network building blocks.

TPU-native rebuild of `models/submodule.py` (`convbn` `:12`, `convbn_3d`
`:18`, `BasicBlock` `:23`, `feature_extraction` SPP encoder `:108-184`,
`disparityregression` `:57-80`, `depthregression` `:82-93`).

Conventions: flax.linen, NHWC (2D) / NDHWC (3D) layouts, explicit compute
`dtype` (bfloat16 under the mixed-precision policy, ref `MIXED_PREC`
`main.py:38-64`) with float32 parameters. BatchNorm statistics follow the
flax `batch_stats` collection; `train=True` updates them.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv2D + BatchNorm, no activation (ref `convbn`, submodule.py:12)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation if self.dilation > 1 else self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
        )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)


def dpack_weight(k: jnp.ndarray, G: int) -> jnp.ndarray:
    """Expand a 3D conv kernel for the D-packed layout.

    k (kd=3, kh, kw, Cin, Cout) -> (kh, kw, (G+2)*Cin, G*Cout), block-banded:
    output slot g reads packed-input slots g..g+2 (slot j holds depth
    d = block*G + j - 1, so slots 0 and G+1 are the one-plane halo).
    Zero blocks make the GEMM dense — that is the point: Cout=32 uses only
    32 of the MXU's 128 output lanes (a measured 4x penalty), while G=4
    packed output channels fill all 128 lanes at (G+2)/3 = 2x the FLOPs,
    a ~2x net win on the plane-sweep hourglass.
    """
    kd, kh, kw, Ci, Co = k.shape
    Wp = jnp.zeros((kh, kw, (G + 2) * Ci, G * Co), k.dtype)
    for g in range(G):
        for t in range(kd):
            j = g + t
            Wp = Wp.at[:, :, j * Ci:(j + 1) * Ci, g * Co:(g + 1) * Co].set(k[t])
    return Wp


def dpack_weight_tridiag(k: jnp.ndarray, G: int) -> jnp.ndarray:
    """Tri-diagonal packed kernel (no halo): (kh, kw, G*Cin, G*Cout).

    Output slot g reads in-block slots g-1, g, g+1 (block-tridiagonal,
    G/3-x denser than minimal instead of the halo form's (G+2)/3); the
    cross-block terms (slot 0's k[0] tap, slot G-1's k[2] tap) are applied
    by two small separate convolutions in `Conv3DMXU._call_packed`.
    """
    kd, kh, kw, Ci, Co = k.shape
    Wp = jnp.zeros((kh, kw, G * Ci, G * Co), k.dtype)
    for g in range(G):
        for t in range(kd):
            j = g + t - 1
            if 0 <= j < G:
                Wp = Wp.at[:, :, j * Ci:(j + 1) * Ci,
                           g * Co:(g + 1) * Co].set(k[t])
    return Wp


def dpack(x: jnp.ndarray, G: int) -> jnp.ndarray:
    """(B, D, H, W, C) -> packed (B, D//G, H, W, G*C), slot-major channels."""
    B, D, H, W, C = x.shape
    x = x.reshape(B, D // G, G, H, W, C)
    return jnp.moveaxis(x, 2, 4).reshape(B, D // G, H, W, G * C)


def dunpack(x: jnp.ndarray, G: int) -> jnp.ndarray:
    """Packed (B, nb, H, W, G*C) -> (B, nb*G, H, W, C)."""
    B, nb, H, W, GC = x.shape
    x = x.reshape(B, nb, H, W, G, GC // G)
    return jnp.moveaxis(x, 4, 2).reshape(B, nb * G, H, W, GC // G)


def _dpack_halo(x: jnp.ndarray, G: int, Ci: int) -> jnp.ndarray:
    """Add the one-plane halo to a packed volume.

    x (B, nb, H, W, G*Ci) -> (B, nb, H, W, (G+2)*Ci): prepend the previous
    block's last slot and append the next block's first slot (zeros at the
    sweep ends = SAME D-padding).
    """
    left = jnp.pad(x[:, :-1, ..., (G - 1) * Ci:],
                   ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
    right = jnp.pad(x[:, 1:, ..., :Ci],
                    ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
    return jnp.concatenate([left, x, right], axis=-1)


class Conv3DMXU(nn.Module):
    """3D convolution computed as depth-folded 2D convolutions. NDHWC.

    XLA's native NDHWC 3D convolution runs at ~14 TFLOP/s effective on
    v5e for the 32-channel plane-sweep volumes used here; folding the D
    axis into batch and summing kd depth-shifted 2D convolutions is the
    same math (bit-identical modulo bf16 accumulation order) and 2.1x
    faster (measured: scratch/psnet_conv_ablate.py, 196 -> 92 ms for the
    hourglass stack). Parameters match a standard conv kernel
    (kd, kh, kw, Cin, Cout) (+ optional bias).

    Supports kd in {1, 3} with unit D-stride and SAME D-padding — the
    shapes used by the PSNet/DPSNet-family hourglasses and per-plane 2D
    context stacks (ref `models/submodule.py:18`, `models/PSNet.py:64-102`).
    H/W stride and dilation are supported.

    `dpack=G>1` switches the call to the D-packed layout: input and output
    are (B, D/G, H, W, G*C) with slot-major channels (see `dpack_weight`).
    The parameter tree is IDENTICAL to the unpacked form (the packed
    weight is expanded from the same (kd, kh, kw, Cin, Cout) kernel each
    call), so checkpoints and the torch port are unaffected; kd=3 requires
    packed inputs, kd=1 applies per-plane and accepts packed input as a
    plain channel-grouped 2D conv only when groups are supported — so
    dpack with kd=1 is rejected (use the unpacked path; kd=1 convs have
    Cout>=32 context heads that already fill the lanes).
    """

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    strides: Tuple[int, int, int] = (1, 1, 1)
    dilation: Tuple[int, int] = (1, 1)  # (H, W) dilation
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    dpack: int = 1  # >1: D-packed layout with G = dpack planes per block
    dpack_mode: str = "tridiag"  # tridiag | halo (see dpack_weight[_tridiag])

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel
        if kd not in (1, 3) or self.strides[0] != 1:
            raise NotImplementedError(
                f"Conv3DMXU supports kd in {{1,3}}, unit D-stride; got "
                f"kernel={self.kernel} strides={self.strides}"
            )
        if self.dpack > 1:
            if kd != 3:
                raise NotImplementedError("dpack requires kd == 3")
            if self.dpack_mode not in ("halo", "tridiag"):
                raise ValueError(f"unknown dpack_mode {self.dpack_mode!r}")
            return self._call_packed(x)
        B, D, H, W, Cin = x.shape
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kd, kh, kw, Cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        x2 = x.reshape(B * D, H, W, Cin)
        dh, dw = self.dilation
        pads = [(dh * (kh // 2),) * 2, (dw * (kw // 2),) * 2]
        outs = [
            jax.lax.conv_general_dilated(
                x2, k[i], self.strides[1:], pads,
                rhs_dilation=(dh, dw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            for i in range(kd)
        ]
        Ho, Wo = outs[0].shape[1:3]
        outs = [o.reshape(B, D, Ho, Wo, self.features) for o in outs]
        if kd == 1:
            y = outs[0]
        else:
            # y[d] = conv(x[d-1], k0) + conv(x[d], k1) + conv(x[d+1], k2)
            z = jnp.zeros_like(outs[0][:, :1])
            y = (
                jnp.concatenate([z, outs[0][:, :-1]], axis=1)
                + outs[1]
                + jnp.concatenate([outs[2][:, 1:], z], axis=1)
            )
        if self.use_bias:
            y = y + self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(self.dtype)
        return y

    def _call_packed(self, x):
        kd, kh, kw = self.kernel
        G = self.dpack
        B, nb, H, W, GCi = x.shape
        Cin = GCi // G
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kd, kh, kw, Cin, self.features),
            jnp.float32,
        ).astype(self.dtype)
        x = x.astype(self.dtype)
        dh, dw = self.dilation
        pads = [(dh * (kh // 2),) * 2, (dw * (kw // 2),) * 2]

        def conv2d(inp, w):
            return jax.lax.conv_general_dilated(
                inp, w, self.strides[1:], pads,
                rhs_dilation=(dh, dw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        if self.dpack_mode == "halo":
            xh = _dpack_halo(x, G, Cin)
            y = conv2d(xh.reshape(B * nb, H, W, (G + 2) * Cin),
                       dpack_weight(k, G))
            Ho, Wo = y.shape[1:3]
            y = y.reshape(B, nb, Ho, Wo, G * self.features)
        else:  # tridiag: dense core + two small cross-block convs
            Co = self.features
            y = conv2d(x.reshape(B * nb, H, W, G * Cin),
                       dpack_weight_tridiag(k, G))
            Ho, Wo = y.shape[1:3]
            y = y.reshape(B, nb, Ho, Wo, G * Co)
            if nb > 1:  # single block needs no cross-block taps (zero D-pad)
                # out slot 0 of block b += k[0] (*) last slot of block b-1
                left_in = x[:, :-1, ..., (G - 1) * Cin:].reshape(
                    B * (nb - 1), H, W, Cin)
                left = conv2d(left_in, k[0]).reshape(B, nb - 1, Ho, Wo, Co)
                # out slot G-1 of block b += k[2] (*) first slot of block b+1
                right_in = x[:, 1:, ..., :Cin].reshape(B * (nb - 1), H, W, Cin)
                right = conv2d(right_in, k[2]).reshape(B, nb - 1, Ho, Wo, Co)
                zpad = ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0))
                y = y + jnp.pad(
                    jnp.pad(left, zpad),
                    ((0, 0),) * 4 + ((0, (G - 1) * Co),))
                y = y + jnp.pad(
                    jnp.pad(right, (zpad[0], (0, 1)) + zpad[2:]),
                    ((0, 0),) * 4 + (((G - 1) * Co, 0),))
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ).astype(self.dtype)
            y = y + jnp.tile(bias, G)
        return y


class ConvBN3D(nn.Module):
    """Conv3D + BatchNorm (ref `convbn_3d`, submodule.py:18). NDHWC."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Dtype = jnp.float32
    dpack: int = 1
    dpack_mode: str = "tridiag"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dpack > 1:
            # packed layout (B, nb, H, W, G*C): normalize per LOGICAL
            # channel by splitting the slot axis off before BatchNorm —
            # flax reduces over every non-feature axis, so the statistics
            # (and the parameter tree) are exactly the unpacked ones
            x = Conv3DMXU(
                self.features, self.kernel, self.stride, dtype=self.dtype,
                dpack=self.dpack, dpack_mode=self.dpack_mode,
            )(x)
            B, nb, H, W, GC = x.shape
            x = x.reshape(B, nb, H, W, self.dpack, self.features)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(x)
            return x.reshape(B, nb, H, W, GC)
        if self.kernel[0] in (1, 3) and self.stride[0] == 1:
            x = Conv3DMXU(
                self.features, self.kernel, self.stride, dtype=self.dtype
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel,
                strides=self.stride,
                padding=tuple(k // 2 for k in self.kernel),
                use_bias=False,
                dtype=self.dtype,
            )(x)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype
        )(x)


class BasicBlock(nn.Module):
    """Residual block (ref `BasicBlock`, submodule.py:23-45)."""

    features: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.features, 3, self.stride, self.dilation, self.dtype)(
            x, train
        )
        out = nn.relu(out)
        out = ConvBN(self.features, 3, 1, self.dilation, self.dtype)(out, train)
        if self.downsample:
            x = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(x)
        return out + x


def _interp_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """Dense 1-D align_corners=True interpolation matrix (n_out, n_in)."""
    import numpy as np

    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = np.linspace(0.0, n_in - 1.0, n_out)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), lo] += 1.0 - frac
    M[np.arange(n_out), hi] += frac
    return jnp.asarray(M)


def _interp_matrix_hp(n_out: int, n_in: int) -> jnp.ndarray:
    """Dense 1-D align_corners=False (half-pixel) interpolation matrix.

    torch's default `F.interpolate(..., align_corners=False)` maps output
    sample centers by (i + 0.5) * n_in / n_out - 0.5, clamped to the
    valid range (border replication at the edges).
    """
    import numpy as np

    pos = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    pos = np.clip(pos, 0.0, n_in - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), lo] += 1.0 - frac
    M[np.arange(n_out), hi] += frac
    return jnp.asarray(M)


def _interp_matrix_bicubic_hp(n_out: int, n_in: int) -> jnp.ndarray:
    """Dense 1-D bicubic half-pixel interpolation matrix.

    Matches torch `F.interpolate(mode='bicubic', align_corners=False)`:
    Keys cubic kernel with a = -0.75 over 4 taps, sample centers at
    (i + 0.5) * n_in / n_out - 0.5, out-of-range taps clamped to the
    border (index replication).
    """
    import numpy as np

    a = -0.75

    def k(t):
        t = np.abs(t)
        return np.where(
            t <= 1.0, (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2.0, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a,
                     0.0),
        )

    pos = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = pos - lo
    M = np.zeros((n_out, n_in), np.float32)
    for tap in range(-1, 3):
        idx = np.clip(lo + tap, 0, n_in - 1)
        M[np.arange(n_out), idx] += k(frac - tap)
    return jnp.asarray(M)


def resize_bicubic(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic half-pixel resize of (B, H, W, C) as separable matmuls
    (torch `F.interpolate(mode='bicubic')` default semantics)."""
    B, H, W, C = x.shape
    h, w = hw
    if (h, w) == (H, W):
        return x
    Ay = _interp_matrix_bicubic_hp(h, H).astype(x.dtype)
    Ax = _interp_matrix_bicubic_hp(w, W).astype(x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", Ay, x,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,bowc->bopc", Ax, out,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int],
                    align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C), matching torch `F.interpolate`.

    align_corners=True maps output corner pixels to input corner pixels;
    False (torch's default — the reference's cost-volume trilinear
    upsamples, `models/PSNet.py:194,207`, omit align_corners) uses
    half-pixel centers. Implemented as two separable interpolation
    matmuls (out = A_y x A_x^T per channel) so the work lands on the MXU
    — the naive per-pixel gather formulation is orders of magnitude
    slower on TPU (measured ~3 s for PSNet's 128-plane cost-volume
    upsample vs ~milliseconds as matmuls).
    """
    B, H, W, C = x.shape
    h, w = hw
    if (h, w) == (H, W):
        return x
    mk = _interp_matrix if align_corners else _interp_matrix_hp
    Ay = mk(h, H).astype(x.dtype)
    Ax = mk(w, W).astype(x.dtype)
    out = jnp.einsum("oh,bhwc->bowc", Ay, x,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("pw,bowc->bopc", Ax, out,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


class SPPFeatureExtractor(nn.Module):
    """Spatial-pyramid-pooling feature encoder at 1/4 resolution.

    Rebuild of `feature_extraction` (`models/submodule.py:108-184`):
    3 stride-2-entry convs, residual layers (32x3, 64x16/s2, 128x3,
    128x3/dil2), four avg-pool pyramid branches -> 1x1 -> upsample,
    concat(64+128+4*32=320) -> 3x3 128 -> 1x1 32. Output (B, H/4, W/4, 32).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        # firstconv: stride-2 + two 3x3
        x = nn.relu(ConvBN(32, 3, 2, 1, d)(x, train))
        x = nn.relu(ConvBN(32, 3, 1, 1, d)(x, train))
        x = nn.relu(ConvBN(32, 3, 1, 1, d)(x, train))

        def layer(x, feats, blocks, stride, dilation):
            x = BasicBlock(
                feats, stride, dilation,
                downsample=(stride != 1 or x.shape[-1] != feats), dtype=d,
            )(x, train)
            for _ in range(blocks - 1):
                x = BasicBlock(feats, 1, dilation, dtype=d)(x, train)
            return x

        x = layer(x, 32, 3, 1, 1)
        raw = layer(x, 64, 16, 2, 1)      # 1/4 res, 64ch
        x = layer(raw, 128, 3, 1, 1)
        skip = layer(x, 128, 3, 1, 2)     # 1/4 res, 128ch

        H, W = skip.shape[1], skip.shape[2]
        branches = []
        for pool in (32, 16, 8, 4):
            # plain non-overlapping pooling as in the reference
            # (AvgPool2d(pool)); clamped so sub-pool-size feature maps
            # (tiny inputs) degrade to global pooling instead of 0-size
            p = (min(pool, H), min(pool, W))
            b = nn.avg_pool(skip, p, strides=p)
            b = nn.relu(ConvBN(32, 1, 1, 1, d)(b, train))
            branches.append(resize_bilinear(b, (H, W)))

        feat = jnp.concatenate([raw, skip] + branches[::-1], axis=-1)  # 320ch
        feat = nn.relu(ConvBN(128, 3, 1, 1, d)(feat, train))
        feat = nn.Conv(32, (1, 1), use_bias=False, dtype=d)(feat)
        return feat


def soft_argmax_disparity(prob: jnp.ndarray, maxdisp: int,
                          trunc_soft: bool = False) -> jnp.ndarray:
    """Soft-argmax over disparity labels 1..maxdisp.

    prob (B, D, H, W) softmax weights -> (B, H, W) expected label.
    Matches `disparityregression` (`models/submodule.py:57-80`,
    TRUNC_SOFT=False default path).

    `trunc_soft` ≙ cfg.TRUNC_SOFT (`lib/config.py:77`): restrict the
    expectation to a window of half-width maxdisp//2 around the argmax
    label (the max-pooled one-hot mask of `submodule.py:68-75`) and
    renormalize the in-window mass. NOTE a faithful transliteration
    would be unusable: the reference masks the POST-softmax
    probabilities with -inf and never renormalizes
    (`submodule.py:74-79`), so any pixel whose argmax sits further than
    maxdisp//2 from either end sums to -inf. We implement the evident
    intent — the same windowed/renormalized soft-argmax the reference's
    own DICL `FlowRegression` TRUNCATED path uses (masking PRE-softmax
    then re-normalizing, `DICL_shallow.py:288-316`).
    """
    disp = jnp.arange(1, maxdisp + 1, dtype=prob.dtype)[None, :, None, None]
    if trunc_soft:
        wsize = maxdisp // 2
        idx = jnp.argmax(prob, axis=1)[:, None]  # (B, 1, H, W)
        lab = jnp.arange(maxdisp)[None, :, None, None]
        window = (jnp.abs(lab - idx) <= wsize).astype(prob.dtype)
        w = prob * window
        prob = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    return jnp.sum(prob * disp, axis=1)


def soft_argmax_depth(prob: jnp.ndarray, maxdisp: int, min_depth: float) -> jnp.ndarray:
    """Soft-argmax over metric depth labels (ref `depthregression`)."""
    d = jnp.arange(1, maxdisp + 1, dtype=prob.dtype)[None, :, None, None] * min_depth
    return jnp.sum(prob * d, axis=1)
