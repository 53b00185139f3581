"""Probe whether this platform's Mosaic can legalize pallas_call today.

Last session (2026-08-18): gridless compiles; ANY gridded pallas_call
fails with "failed to legalize operation 'func.return'". Re-check both.
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def main():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)

    t = time.time()
    try:
        y = pl.pallas_call(
            copy_kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype)
        )(x)
        ok = bool(jnp.allclose(y, x * 2))
        print(f"GRIDLESS: ok={ok} in {time.time()-t:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"GRIDLESS: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)

    t = time.time()
    try:
        y = pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct((4, 8, 128), jnp.float32),
            grid=(4,),
            in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        )(jnp.ones((4, 8, 128), jnp.float32))
        print(f"GRIDDED: ok={bool(jnp.allclose(y, 2.0))} in {time.time()-t:.1f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"GRIDDED: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
