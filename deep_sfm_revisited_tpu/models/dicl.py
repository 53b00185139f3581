"""DICL: displacement-invariant cost-volume learning optical flow.

TPU-native rebuild of `models/DICL_shallow.py` (the reference's default
flow estimator, `lib/config.py:178`):

  * `FeatureGA` 6-level shared encoder-decoder (`:134-249`) -> GANet-style
    U-net emitting 32-ch features at strides 4..64 (SEP_LEVEL=5);
  * displacement-invariant cost volumes: the reference builds each
    (2U+1)(2V+1) shift by python-looped zero-padded slicing and runs the
    matching MLP on a folded batch (`compute_cost`, `:672-728`); here the
    shifted stack is built with static `jnp.pad`+slice (a fixed 49-way
    unroll for search range 3) folded into the batch axis so the shared
    matching network is ONE batched convolution — the TPU-friendly
    formulation of "run the same 2D matcher at every displacement";
  * `MatchingShallow_down` per-level matching MLP (`:737-777`);
  * learned 1x1 cost smoothing initialized to identity (`smooth_cost`
    `:324-348`, SMOOTH_INIT_BY_ID);
  * soft-argmax 2D flow regression (`FlowRegression` `:271-321`,
    FLOW_REG_BY_MAX=True) + entropy confidence (`FlowEntropy` `:256-269`);
  * coarse-to-fine levels 6->2 with warping, per-level dilated context
    nets scaled by SCALE_CONTEXT{6..2} (`:584-668`), warp-hole masking
    (REMOVE_WARP_HOLE), detached up-flows;
  * returns (full-res flow x4-upsampled, entropy confidence)
    (`:665-668`), matching the SFMnet contract.

Layout NHWC; input (B, H, W, 6) with H, W divisible by 64.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from deep_sfm_revisited_tpu.config import FlowConfig
from deep_sfm_revisited_tpu.models.submodules import resize_bilinear
from deep_sfm_revisited_tpu.ops.camera import bilinear_sample

Dtype = Any


class BasicConv(nn.Module):
    """Conv(+BN)+ReLU, optionally transposed (ref `BasicConv`, :96-117)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    deconv: bool = False
    bn: bool = True
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # the reference's BasicConv passes bias=False to Conv2d AND
        # ConvTranspose2d unconditionally (DICL_shallow.py:82-84), even
        # with bn=False — so no bias here either
        if self.deconv:
            # 'SAME' gives the exact 2x upsampling of torch
            # ConvTranspose2d(kernel=4, stride=2, padding=1)
            x = nn.ConvTranspose(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding="SAME",
                use_bias=False, dtype=self.dtype,
            )(x)
        else:
            pad = self.dilation if self.dilation > 1 else self.kernel // 2
            x = nn.Conv(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding=pad,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False, dtype=self.dtype,
            )(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class Conv2x(nn.Module):
    """Stride-2 (de)conv + skip concat + fuse conv (ref `Conv2x`, :96-128)."""

    features: int
    deconv: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rem, train: bool = False):
        k = 4 if self.deconv else 3
        x = BasicConv(self.features, k, 2, deconv=self.deconv, bn=False,
                      dtype=self.dtype)(x, train)
        x = jnp.concatenate([x, rem], axis=-1)
        x = BasicConv(self.features, 3, 1, dtype=self.dtype)(x, train)
        return x


class FeatureGA(nn.Module):
    """6-level shared feature U-net (ref `FeatureGA`, :134-249).

    Returns [x2, x3, x4, x5, x6]: 32-ch maps at strides 4, 8, 16, 32, 64.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = BasicConv(32, 3, 1, dtype=d)(x, train)
        x = BasicConv(32, 3, 2, dtype=d)(x, train)
        x = BasicConv(32, 3, 1, dtype=d)(x, train)
        rem0 = x
        chans = [48, 64, 96, 128, 160, 192]
        rems = []
        for c in chans:
            x = BasicConv(c, 3, 2, dtype=d)(x, train)
            rems.append(x)
        # decoder a
        rems_a = []
        for c, rem in zip([160, 128, 96, 64, 48, 32],
                          rems[-2::-1] + [rem0]):
            x = Conv2x(c, deconv=True, dtype=d)(x, rem, train)
            rems_a.append(x)
        # encoder b (skip from decoder a outputs, then rem6)
        rems_b = []
        for c, rem in zip(chans[:-1], rems_a[-2::-1]):
            x = Conv2x(c, dtype=d)(x, rem, train)
            rems_b.append(x)
        x = Conv2x(192, dtype=d)(x, rems[-1], train)
        # decoder b with per-level 32-ch output heads
        outs = []
        for c, rem in zip([160, 128, 96, 64, 48], rems_b[::-1]):
            x = Conv2x(c, deconv=True, dtype=d)(x, rem, train)
            outs.append(BasicConv(32, 3, 1, dtype=d)(x, train))
        # outs: levels 6, 5, 4, 3, 2 -> return fine-to-coarse [x2..x6]
        return outs[::-1]


class MatchingNet(nn.Module):
    """Shared matching MLP over concat feature pairs
    (ref `MatchingShallow_down`, :758-777, SHALLOW_Down=True)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = BasicConv(96, 3, 1, dtype=d)(x, train)
        x = BasicConv(128, 3, 2, dtype=d)(x, train)
        x = BasicConv(128, 3, 1, dtype=d)(x, train)
        x = BasicConv(64, 3, 1, dtype=d)(x, train)
        x = BasicConv(32, 4, 2, deconv=True, dtype=d)(x, train)
        return nn.Conv(1, (3, 3), padding=1, dtype=d)(x)


def shifted_pairs(x: jnp.ndarray, y: jnp.ndarray, md: int,
                  mask_holes: bool = True) -> jnp.ndarray:
    """Build the displacement stack: (B, S*S, H, W, 2C), S = 2*md+1.

    For displacement (du, dv), pairs x[p] with y[p + (du, dv)], zero
    outside (≙ the zero-initialized cost tensor of `compute_cost`,
    DICL_shallow.py:705-717). With mask_holes, positions whose warped
    y-features are all-zero are zeroed entirely (REMOVE_WARP_HOLE,
    `:719-722`).
    """
    B, H, W, C = x.shape
    yp = jnp.pad(y, ((0, 0), (md, md), (md, md), (0, 0)))
    stacks = []
    for dv in range(-md, md + 1):      # vertical (indd)
        for du in range(-md, md + 1):  # horizontal (ind)
            ys = jax.lax.dynamic_slice(
                yp, (0, dv + md, du + md, 0), (B, H, W, C)
            )
            # valid region of x for this displacement
            vy0, vy1 = max(0, -dv), H - max(0, dv)
            vx0, vx1 = max(0, -du), W - max(0, du)
            m = jnp.zeros((H, W, 1), x.dtype)
            m = m.at[vy0:vy1, vx0:vx1].set(1.0)
            pair = jnp.concatenate([x * m, ys * m], axis=-1)
            if mask_holes:
                hole = (jnp.sum(jnp.abs(ys), axis=-1, keepdims=True) != 0)
                pair = pair * hole.astype(pair.dtype)
            stacks.append(pair)
    return jnp.stack(stacks, axis=1)  # (B, S2, H, W, 2C)


def flow_regression(cost: jnp.ndarray, md: int,
                    truncated_size: Optional[int] = None) -> jnp.ndarray:
    """Soft-argmax over the (2md+1)^2 displacement axis
    (≙ `FlowRegression`, :271-321, FLOW_REG_BY_MAX).

    `truncated_size` ≙ cfg.TRUNCATED/TRUNCATED_SIZE
    (`lib/config.py:298-299`, `DICL_shallow.py:277-316`): before the
    softmax, mask the cost to a ±truncated_size square window (in the
    2D displacement plane) around the argmax displacement — the
    reference builds the same window by 3D-max-pooling the one-hot
    argmax mask and filling the outside with -inf pre-softmax.
    """
    B, S2, H, W = cost.shape
    S = 2 * md + 1
    disp = jnp.arange(-md, md + 1, dtype=cost.dtype)
    # stack order: dv outer, du inner
    dv = jnp.repeat(disp, S)[None, :, None, None]
    du = jnp.tile(disp, S)[None, :, None, None]
    if truncated_size is not None and truncated_size < 2 * md:
        t = truncated_size
        amax = jnp.argmax(cost, axis=1)[:, None]  # (B, 1, H, W)
        dv_a = jnp.take(dv[0, :, 0, 0], amax)
        du_a = jnp.take(du[0, :, 0, 0], amax)
        window = ((jnp.abs(dv - dv_a) <= t) & (jnp.abs(du - du_a) <= t))
        cost = jnp.where(window, cost, -jnp.inf)
    prob = jax.nn.softmax(cost, axis=1)
    fu = jnp.sum(prob * du, axis=1)
    fv = jnp.sum(prob * dv, axis=1)
    return jnp.stack([fu, fv], axis=-1)  # (B, H, W, 2)


def flow_entropy(cost: jnp.ndarray) -> jnp.ndarray:
    """Normalized softmax entropy confidence (≙ `FlowEntropy`, :256-269)."""
    S2 = cost.shape[1]
    p = jax.nn.softmax(cost, axis=1)
    pc = jnp.clip(p, 1e-9, 1 - 1e-9)
    ent = -jnp.sum(p * jnp.log(pc), axis=1) / jnp.log(S2)
    return ent[..., None]  # (B, H, W, 1)


def warp_flow(y: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp y by flow with zero fill (≙ `warp`, :478-512)."""
    B, H, W, C = y.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    coords = jnp.stack([gx, gy], axis=-1)[None] + flow.astype(jnp.float32)
    return bilinear_sample(y, coords)


class DICLFlow(nn.Module):
    """Coarse-to-fine DICL flow. Input (B, H, W, 6), H, W % 64 == 0.

    __call__ returns (flow, entropy) at full res for eval; with
    `all_iters=True` returns (stack of per-level full-res-scaled flows
    coarse->fine, entropy) for multiscale supervision (incl. pre-context
    raw flows, SUP_RAW_FLOW).
    """

    cfg: FlowConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pair: jnp.ndarray, train: bool = False,
                 all_iters: bool = False):
        cfg = self.cfg
        d = self.dtype
        x_img = pair[..., :3].astype(d)
        y_img = pair[..., 3:].astype(d)
        B, H, W, _ = pair.shape

        feat = FeatureGA(dtype=d)
        if not train:
            # one batched U-net pass over both frames (identical math at
            # eval — BN running stats; the reference runs them separately
            # and so do we under train, matching its per-call BN batches)
            both = feat(jnp.concatenate([x_img, y_img], axis=0), train)
            xs = [f[:B] for f in both]
            ys = [f[B:] for f in both]
        else:
            xs = feat(x_img, train)  # [x2..x6] strides 4..64
            ys = feat(y_img, train)

        match = [MatchingNet(dtype=d, name=f"matching{lvl}")
                 for lvl in (2, 3, 4, 5, 6)]
        mds = list(cfg.dicl_search_range)  # fine->coarse, e.g. (3,)*5
        scale_ctx = list(cfg.dicl_scale_context)  # fine->coarse

        def level_cost(xf, yf, md, net):
            Bc, Hc, Wc, C = xf.shape
            stack = shifted_pairs(xf, yf, md)
            S2 = stack.shape[1]
            folded = stack.reshape(Bc * S2, Hc, Wc, 2 * C)
            out = net(folded, train)[..., 0]
            cost = out.reshape(Bc, S2, Hc, Wc)
            if cfg.dicl_smooth_cost:
                # learned 1x1 smoothing across displacements, identity init,
                # bias-free (≙ smooth_cost BasicConv(bn=False, relu=False)
                # + SMOOTH_INIT_BY_ID, DICL_shallow.py:324-337,466-476)
                cost = nn.Conv(
                    S2, (1, 1), use_bias=False, dtype=d,
                    kernel_init=lambda k, s, dt=jnp.float32: jnp.eye(
                        S2, dtype=dt
                    ).reshape(s),
                )(jnp.moveaxis(cost, 1, -1).astype(d))
                cost = jnp.moveaxis(cost, -1, 1)
            return cost.astype(jnp.float32)

        def context_net(feats, name):
            h = feats
            for c, dil in ((64, 1), (128, 2), (128, 4), (96, 8), (64, 16),
                           (32, 1)):
                h = BasicConv(c, 3, 1, dilation=dil, dtype=d)(h, train)
            return nn.Conv(2, (3, 3), padding=1, dtype=d)(h).astype(
                jnp.float32
            )

        flows_out: List[jnp.ndarray] = []  # coarse->fine, full-res scale
        up_flow = None
        entro = None
        # levels coarse->fine: 6, 5, 4, 3, 2 (strides 64..4)
        for li, lvl in enumerate((6, 5, 4, 3, 2)):
            idx = 4 - li  # index into fine->coarse lists
            xf, yf = xs[idx], ys[idx]
            md = mds[idx]
            stride = 4 * (2 ** idx)
            if up_flow is None:
                y_in = yf
            else:
                y_in = warp_flow(yf, up_flow)
            cost = level_cost(xf, y_in, md, match[idx])
            flow = flow_regression(
                cost, md,
                truncated_size=(cfg.dicl_truncated_size
                                if cfg.dicl_truncated else None),
            )
            if up_flow is not None:
                flow = flow + up_flow
            if cfg.dicl_sup_raw_flow and all_iters:
                flows_out.append(flow * stride)
            if cfg.dicl_ctf_context:
                entro = flow_entropy(cost)
                g = resize_bilinear(x_img, xf.shape[1:3])
                fin = jnp.concatenate(
                    [
                        jax.lax.stop_gradient(flow).astype(d),
                        jax.lax.stop_gradient(entro).astype(d),
                        xf,
                        g,
                    ],
                    axis=-1,
                )  # 2 + 1 + 32 + 3 = 38 ch (≙ :409-446)
                flow = flow + context_net(fin, f"ctx{lvl}") * scale_ctx[idx]
            flows_out.append(flow * stride)
            if lvl > 2:
                nxt = xs[idx - 1].shape[1:3]
                up_flow = jax.lax.stop_gradient(
                    2.0 * resize_bilinear(flow, nxt)
                )

        # full-res outputs (≙ :665-668)
        flow0 = resize_bilinear(flows_out[-1], (H, W))  # already in px units
        entro0 = resize_bilinear(entro, (H, W)) if entro is not None else None

        if all_iters:
            # fixed-shape stack for the multiscale loss: resize every
            # level's (already full-res-scaled) flow to full res
            stack = jnp.stack(
                [resize_bilinear(f, (H, W)) for f in flows_out], axis=0
            )
            return stack, entro0
        return flow0, entro0
