"""RAFT optical flow (recurrent all-pairs field transforms).

TPU-native rebuild of `models/RAFT/core/` (`raft.py:30` RAFT, encoders
`extractor.py:118`, correlation pyramid `corr.py:12-60`, ConvGRU update
block `update.py:115`, convex upsampling `raft.py:66-77`):

  * the all-pairs correlation volume is one batched matmul over 1/8-res
    features (MXU-native; ≙ `corr.py:19-27`), pooled into a 4-level
    pyramid;
  * per-iteration correlation lookup is a batched bilinear gather of a
    (2r+1)^2 window around the current correspondence at every level
    (≙ `corr.py:32-53`), implemented with `ops.camera.bilinear_sample`
    over a folded (B*H*W) batch axis;
  * the GRU recurrence runs under `lax.scan` with stacked per-iteration
    flow predictions for supervision (≙ `raft.py:131-148`);
  * convex upsampling combines 3x3 neighbors with a learned 8x8x9 softmax
    mask (≙ `raft.py:66-77`).

Returns (flow_up, None): RAFT has no entropy-confidence output, matching
the reference contract that SFMnet tolerates (`models/SFMnet.py:120-123`,
`raft.py:150`).

Layout NHWC; images in [-1, 1]. (The reference flips channels to BGR for
checkpoint compatibility, `raft.py:93-95`; irrelevant for from-scratch
training, so not reproduced.)
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import FlowConfig
from deep_sfm_revisited_tpu.ops.camera import bilinear_sample

Dtype = Any


class ResBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "instance"  # instance | batch | none
    dtype: Dtype = jnp.float32

    def _norm(self, x, train):
        if self.norm == "instance":
            # epsilon matches torch InstanceNorm2d (1e-5; flax default 1e-6)
            return nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                                dtype=self.dtype)(x)
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                dtype=self.dtype)(x)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=1, dtype=d)(x)
        y = nn.relu(self._norm(y, train))
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=d)(y)
        y = nn.relu(self._norm(y, train))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                        dtype=d)(x)
            x = self._norm(x, train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """1/8-resolution encoder (≙ `extractor.py:118`, BasicEncoder)."""

    out_features: int = 256
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=d)(x)
        if self.norm == "instance":
            x = nn.GroupNorm(num_groups=64, epsilon=1e-5, dtype=d)(x)
        elif self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=d)(x)
        x = nn.relu(x)
        for feats, stride in ((64, 1), (64, 1), (96, 2), (96, 1),
                              (128, 2), (128, 1)):
            x = ResBlock(feats, stride, self.norm, d)(x, train)
        return nn.Conv(self.out_features, (1, 1), dtype=d)(x)


def correlation_pyramid(f1: jnp.ndarray, f2: jnp.ndarray, levels: int,
                        radius: int = 4):
    """All-pairs correlation + average pyramid (≙ `corr.py:12-60`).

    f1, f2 (B, H, W, C) -> list of ((B*H*W, H/2^i + 2p, W/2^i + 2p),
    pad) zero-padded for the lookup window — padding is done HERE, once,
    instead of inside the 12-iteration GRU scan (a full-volume copy per
    iteration per level otherwise). Stored bf16: the lookup interpolates
    in f32, and halving the 236 MB level-0 volume halves the pad/pool/
    gather HBM traffic.
    """
    B, H, W, C = f1.shape
    a = f1.reshape(B, H * W, C)
    b = f2.reshape(B, H * W, C)
    # bf16 operands + f32 accumulation: the all-pairs product is the
    # single largest matmul in the pipeline (HW^2 C ~ 30 TFLOP at KITTI
    # eval size) and runs 4x faster on the MXU in bf16
    corr = jnp.einsum("bnc,bmc->bnm", a, b,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.asarray(C, jnp.float32))
    corr = corr.reshape(B * H * W, H, W, 1).astype(jnp.bfloat16)
    pad = 2 * radius + 3
    pyramid = []
    for _ in range(levels):
        pyramid.append(
            jnp.pad(corr[..., 0], ((0, 0), (pad, pad), (pad, pad)))
        )
        corr = nn.avg_pool(corr, (2, 2), strides=(2, 2))
    return pyramid, pad


def lookup_correlation(pyramid, coords: jnp.ndarray, radius: int):
    """Sample a (2r+1)^2 window at each level (≙ `corr.py:32-53`).

    coords (B, H, W, 2) current correspondences at 1/8 res. Returns
    (B, H, W, levels*(2r+1)^2).

    TPU formulation: gather-free. Each query extracts one contiguous
    (2r+2)x(2r+2) patch by two one-hot matmuls (row-select then
    column-select on the MXU), and the (2r+1)^2 window is interpolated
    from the patch with four static shifted products on the VPU. Both
    gather lowerings lose badly here: (2r+1)^2x4 per-scalar gathers are
    ~100x the FLOP cost, and a vmapped dynamic_slice patch gather still
    ran ~70 ms/iteration *inside the GRU scan* (measured on v5e) vs
    ~2 ms/iteration for the one-hot form — selection matmuls are exact
    (one nonzero per row) and ride the MXU. Pyramid levels arrive
    pre-padded (and bf16) from `correlation_pyramid`.
    """
    pyramid, pad = pyramid
    B, H, W, _ = coords.shape
    r = radius
    S = 2 * r + 2  # patch covering the (2r+1) window + 1 for bilinear
    Q = B * H * W
    flat = coords.reshape(Q, 2)
    out = []
    offs = jnp.arange(S)
    for i, img in enumerate(pyramid):
        Hp, Wp = img.shape[1], img.shape[2]
        Hl, Wl = Hp - 2 * pad, Wp - 2 * pad
        c = flat / (2.0 ** i)
        cx = jnp.clip(c[:, 0], -(r + 2.0), Wl + r + 1.0)
        cy = jnp.clip(c[:, 1], -(r + 2.0), Hl + r + 1.0)
        x0 = jnp.floor(cx - r)
        y0 = jnp.floor(cy - r)
        fx = (cx - r) - x0
        fy = (cy - r) - y0
        yi = (y0 + pad).astype(jnp.int32)[:, None] + offs[None]  # (Q, S)
        xi = (x0 + pad).astype(jnp.int32)[:, None] + offs[None]
        oh_y = jax.nn.one_hot(yi, Hp, dtype=img.dtype)  # (Q, S, Hp)
        oh_x = jax.nn.one_hot(xi, Wp, dtype=img.dtype)  # (Q, S, Wp)
        rows = jnp.einsum("qsh,qhw->qsw", oh_y, img)
        patch = jnp.einsum("qtw,qsw->qst", oh_x, rows).astype(jnp.float32)
        fx_ = fx[:, None, None]
        fy_ = fy[:, None, None]
        win = (
            (1 - fy_) * (1 - fx_) * patch[:, : S - 1, : S - 1]
            + (1 - fy_) * fx_ * patch[:, : S - 1, 1:]
            + fy_ * (1 - fx_) * patch[:, 1:, : S - 1]
            + fy_ * fx_ * patch[:, 1:, 1:]
        )  # (Q, 2r+1, 2r+1) as (dy, dx)
        # flatten dx-major: the reference adds a (dy, dx) meshgrid to its
        # (x, y) coords (corr.py:37-39), i.e. its window channels run
        # dx-major — matching it makes ported torch RAFT weights (whose
        # motion-encoder convc1 reads these channels) exact
        out.append(jnp.swapaxes(win, 1, 2).reshape(B, H, W, -1))
    return jnp.concatenate(out, axis=-1)


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) ConvGRU (≙ `update.py:65-112`)."""

    hidden: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        d = self.dtype
        for ksize in ((1, 5), (5, 1)):
            pad = tuple((k // 2, k // 2) for k in ksize)
            hx = jnp.concatenate([h, x], axis=-1)
            # z and r read the same input: ONE conv with 2*hidden outputs
            # (kernel = torch z|r kernels concatenated along Cout) — same
            # math, one MXU pass instead of two inside the scanned body
            zr = nn.Conv(2 * self.hidden, ksize, padding=pad, dtype=d)(hx)
            z = nn.sigmoid(zr[..., : self.hidden])
            r = nn.sigmoid(zr[..., self.hidden :])
            q = jnp.tanh(
                nn.Conv(self.hidden, ksize, padding=pad, dtype=d)(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            h = (1 - z) * h + z * q
        return h


class MotionEncoder(nn.Module):
    """Correlation+flow -> motion features (≙ `update.py:31-52`)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        d = self.dtype
        c = nn.relu(nn.Conv(256, (1, 1), dtype=d)(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=d)(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=d)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=d)(f))
        out = nn.relu(
            nn.Conv(126, (3, 3), padding=1, dtype=d)(
                jnp.concatenate([c, f], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)  # 128 ch


class UpdateBlock(nn.Module):
    """GRU update + flow head + upsample mask head (≙ `update.py:115`).

    Submodule names are EXPLICIT and frozen (Conv_0/1/2, MotionEncoder_0,
    SepConvGRU_0 — the auto-names of the original single-path body) so the
    mask_only eval path below cannot silently renumber the param tree and
    break checkpoints / torch-ported weights.

    `mask_only=True` computes just the upsample mask from a given hidden
    state: at eval only the FINAL iteration's mask feeds the convex
    upsample, so the scan skips the 576-out mask conv (and the stacked
    mask ys) and the mask is recovered once from the final carry.
    """

    hidden: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp=None, corr=None, flow=None,
                 need_mask: bool = True, mask_only: bool = False):
        d = self.dtype
        # the flow and mask heads' first 3x3 convs both read `net`: fused
        # into one 512-out conv (kernel = flow|mask kernels along Cout)
        heads_conv = nn.Conv(512, (3, 3), padding=1, dtype=d, name="Conv_0")
        flow_conv = nn.Conv(2, (3, 3), padding=1, dtype=d, name="Conv_1")
        mask_conv = nn.Conv(64 * 9, (1, 1), dtype=d, name="Conv_2")
        if mask_only:
            heads = heads_conv(net)
            return mask_conv(nn.relu(heads[..., 256:])) * 0.25
        motion = MotionEncoder(dtype=d, name="MotionEncoder_0")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden, d, name="SepConvGRU_0")(net, x)
        heads = heads_conv(net)
        dflow = flow_conv(nn.relu(heads[..., :256]))
        mask = (mask_conv(nn.relu(heads[..., 256:])) * 0.25
                if need_mask else None)
        return net, mask, dflow


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """8x learned convex upsampling (≙ `raft.py:66-77`).

    flow (B, h, w, 2); mask (B, h, w, 576). Returns (B, 8h, 8w, 2).
    """
    B, h, w, _ = flow.shape
    # channel layout (9, 8, 8) neighbor-major, matching the reference's
    # mask.view(N, 1, 9, 8, 8, H, W) (raft.py:69) so ported torch mask-head
    # weights are exact
    mask = mask.reshape(B, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=-3)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhood stack (unfold): (B, h, w, 9, 2)
    patches = jnp.stack(
        [
            fp[:, dy : dy + h, dx : dx + w]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-2,
    )
    # broadcast-multiply-reduce over the 9 neighbors: an einsum here is a
    # per-pixel (64x9)@(9x2) batched matmul, which lowers to a pathological
    # tiny-matmul loop on TPU (~25 ms measured); the VPU form is ~free
    up = jnp.sum(
        mask[..., None] * patches[:, :, :, :, None, None, :], axis=-4
    )  # (B, h, w, 8, 8, 2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * h, 8 * w, 2)


class RAFT(nn.Module):
    """RAFT flow estimator. Input: ref+target stacked (B, H, W, 6) in [-1,1].

    Returns (flow_predictions, conf): flow_predictions is the final
    (B, H, W, 2) flow at eval, or the (iters, B, H, W, 2) stack when
    `all_iters=True` for the multi-iteration training loss
    (≙ `raft.py:84-150`); conf is None (see module docstring).
    """

    cfg: FlowConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pair: jnp.ndarray, train: bool = False,
                 all_iters: bool = False):
        cfg = self.cfg
        d = self.dtype
        ref, tgt = pair[..., :3].astype(d), pair[..., 3:].astype(d)
        B, H, W, _ = ref.shape
        h, w = H // 8, W // 8

        fmaps = BasicEncoder(256, "instance", d, name="fnet")(
            jnp.concatenate([ref, tgt], axis=0), train
        )
        f1, f2 = fmaps[:B], fmaps[B:]
        pyramid = correlation_pyramid(f1, f2, cfg.raft_corr_levels,
                                      cfg.raft_corr_radius)

        cmap = BasicEncoder(cfg.raft_hidden_dim + cfg.raft_context_dim,
                            "batch", d, name="cnet")(ref, train)
        net = jnp.tanh(cmap[..., : cfg.raft_hidden_dim])
        inp = nn.relu(cmap[..., cfg.raft_hidden_dim :])

        update = UpdateBlock(cfg.raft_hidden_dim, d)

        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        coords0 = jnp.broadcast_to(
            jnp.stack([gx, gy], axis=-1)[None], (B, h, w, 2)
        )

        iters = cfg.raft_iters_train if train else cfg.raft_iters_eval

        # the recurrence runs under nn.scan so the update block is traced
        # and compiled ONCE (the reference unrolls a python loop,
        # raft.py:131-148 — an unrolled graph is 12-24x slower to compile
        # for zero runtime benefit under XLA)
        def step(update_mod, carry, _):
            net, coords1 = carry
            corr = lookup_correlation(
                pyramid, coords1, cfg.raft_corr_radius
            ).astype(d)
            flow = (coords1 - coords0).astype(d)
            net, mask, dflow = update_mod(net, inp, corr, flow,
                                          need_mask=all_iters)
            coords1 = coords1 + dflow.astype(jnp.float32)
            ys = (coords1 - coords0,)
            if all_iters:
                ys = ys + (mask.astype(jnp.float32),)
            return (net, coords1), ys

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=iters,
        )
        if all_iters:
            (_, _), (flows_lr, masks) = scan(update, (net, coords0), None)
            # full-res supervision stack (training): upsample every iter
            flows = jax.vmap(convex_upsample)(flows_lr, masks)
            return flows, None  # (iters, B, H, W, 2)
        # eval: only the final prediction needs the full-res upsample, and
        # only the final mask is ever used — skip the mask conv inside the
        # scan and recover it once from the final hidden state
        (net_f, coords1_f), _ = scan(update, (net, coords0), None)
        mask_f = update(net_f, mask_only=True).astype(jnp.float32)
        return convex_upsample(coords1_f - coords0, mask_f), None
