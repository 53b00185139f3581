"""Mosaic warp kernel vs XLA quad-gather at the flagship plane-sweep shape.

Scan protocol over distinct coord sets (the feature map is per-item too
so nothing hoists). XLA quad-gather reference is ~13.5 ms/volume in the
stage table; the kernel targets the ~1 ms HBM floor of its real traffic.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from deep_sfm_revisited_tpu.ops import camera as C
from deep_sfm_revisited_tpu.ops.pallas.sweep_warp import bilinear_sample_pallas
from deep_sfm_revisited_tpu.utils.profiling import throughput

B, H, W, Ch = 1, 96, 320, 32
D = 128
N_ITEMS = 8

key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
feats = jax.random.normal(k1, (N_ITEMS, B, H, W, Ch), jnp.bfloat16)
K = jnp.asarray([[[180.0, 0, W / 2], [0, 180.0, H / 2], [0, 0, 1]]],
                jnp.float32)
K_inv = jnp.linalg.inv(K)
rots = jax.random.normal(k2, (N_ITEMS, B, 3, 1), jnp.float32) * 0.02
trans = (jnp.asarray([[[0.6], [0.05], [0.2]]], jnp.float32)
         + 0.1 * jax.random.normal(k3, (N_ITEMS, B, 3, 1), jnp.float32))
poses = jnp.concatenate(
    [jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (N_ITEMS, B, 3, 3))
     + 0.0 * rots, trans], axis=-1)
depths = 0.5 * 128 / jnp.arange(1, D + 1, dtype=jnp.float32)

coords = jax.vmap(
    lambda p: C.plane_sweep_coords(depths, p, K, K_inv, H, W)
)(poses)  # (N, B, D, H, W, 2)


def main():
    t0 = time.time()
    dt_xla = throughput(
        lambda it: C.bilinear_sample(it[0], it[1]), (feats, coords))
    print(f"XLA quad-gather: {dt_xla*1000:8.2f} ms/volume "
          f"(setup {time.time()-t0:.0f}s)", flush=True)

    for tile in (2048, 8192):
        t0 = time.time()
        try:
            dt_k = throughput(
                lambda it: bilinear_sample_pallas(it[0], it[1], tile=tile),
                (feats, coords))
            print(f"pallas tile={tile}: {dt_k*1000:8.2f} ms/volume "
                  f"(compile+run {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas tile={tile} FAIL {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)

    # numeric check on-device at the real shape
    ref = C.bilinear_sample(feats[0], coords[0])
    out = bilinear_sample_pallas(feats[0], coords[0])
    d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32))))
    print(f"max abs diff vs XLA on-device: {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
