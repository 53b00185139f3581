"""UpdateBlock sub-part timing at bench 1/8-res shape (48x160)."""
import time
import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.models.raft import MotionEncoder, SepConvGRU, UpdateBlock

B, h, w = 1, 48, 160
d = jnp.bfloat16
ITERS = 8


def timeit(name, fn, *args, warmup=2):
    def scal(*a):
        out = fn(*a)
        return sum(jnp.sum(jnp.abs(o.astype(jnp.float32))) for o in jax.tree.leaves(out))
    sc = jax.jit(scal)
    for _ in range(warmup):
        float(sc(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(sc(*args))
    print(f"{name:28s} {(time.perf_counter()-t0)/ITERS*1000:8.1f} ms", flush=True)


key = jax.random.PRNGKey(0)
net = jax.random.normal(key, (B, h, w, 128), d)
inp = jax.random.normal(key, (B, h, w, 128), d)
corr = jax.random.normal(key, (B, h, w, 324), d)
flow = jnp.zeros((B, h, w, 2), d)

me = MotionEncoder(dtype=d)
mv = me.init(jax.random.PRNGKey(1), flow, corr)
timeit("MotionEncoder", lambda v, f, c: me.apply(v, f, c), mv, flow, corr)

gru = SepConvGRU(128, d)
gx = jax.random.normal(key, (B, h, w, 256), d)
gv = gru.init(jax.random.PRNGKey(2), net, gx)
timeit("SepConvGRU (2 dirs)", lambda v, n, x: gru.apply(v, n, x), gv, net, gx)

from flax import linen as nn
class Heads(nn.Module):
    @nn.compact
    def __call__(self, net):
        heads = nn.Conv(512, (3, 3), padding=1, dtype=d)(net)
        dflow = nn.Conv(2, (3, 3), padding=1, dtype=d)(nn.relu(heads[..., :256]))
        mask = nn.Conv(64 * 9, (1, 1), dtype=d)(nn.relu(heads[..., 256:])) * 0.25
        return dflow, mask

hd = Heads()
hv = hd.init(jax.random.PRNGKey(3), net)
timeit("heads (fused)", lambda v, n: hd.apply(v, n), hv, net)

ub = UpdateBlock(128, d)
uv = ub.init(jax.random.PRNGKey(4), net, inp, corr, flow)
timeit("UpdateBlock total", lambda v, *a: ub.apply(v, *a), uv, net, inp, corr, flow)

# 12 chained update blocks (scan-free, measures steady-state per-iter cost)
def chain(v, net, inp, corr, flow):
    def body(carry, _):
        net, flow = carry
        n2, m, df = ub.apply(v, net, inp, corr, flow)
        return (n2, flow + df.astype(jnp.float32)), None
    (net, flow), _ = jax.lax.scan(body, (net, flow), None, length=12)
    return net, flow

timeit("12x UpdateBlock scan", chain, uv, net, inp, corr, jnp.zeros((B, h, w, 2), jnp.float32))
