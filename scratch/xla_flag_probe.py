"""Probe: do XLA_FLAGS move the hourglass-tap conv ceiling on this chip?

The MXU efficiency map (conv_micro.py) pinned the 32-ch hourglass tap
conv at ~25% of peak and every re-formulation at <=45%; the one lever
never tried is XLA's own tuning flags. Each setting runs in a fresh
subprocess (flags are read at backend init). A deliberately bogus flag
first verifies flags are parsed at all on the axon platform (XLA aborts
on unknown flags -> nonzero rc proves the env var reaches the compiler).

Usage: python scratch/xla_flag_probe.py
"""
import os
import subprocess
import sys

CHILD = r"""
import time, jax, jax.numpy as jnp
key = jax.random.PRNGKey(0)
x = jax.random.uniform(key, (128, 96, 320, 32), jnp.bfloat16, -1, 1)
k = jax.random.uniform(key, (3, 3, 32, 32), jnp.bfloat16, -1, 1)
def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
sc = jax.jit(lambda a, b: jnp.sum(jnp.abs(conv(a, b).astype(jnp.float32))))
for _ in range(3):
    float(sc(x, k))
t0 = time.perf_counter()
for _ in range(8):
    float(sc(x, k))
dt = (time.perf_counter() - t0) / 8 * 1000
fl = 2 * 128 * 96 * 320 * 9 * 32 * 32
print(f"RESULT ms={dt:.1f} tflops_minus_floor={fl / max(dt - 25, 1e-9) / 1e9:.1f}")
"""

SETTINGS = [
    ("bogus-flag (parse check)", "--xla_this_flag_does_not_exist=1"),
    ("baseline", ""),
    ("scoped_vmem 64MiB", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scoped_vmem 128MiB", "--xla_tpu_scoped_vmem_limit_kib=131072"),
]


def main():
    for name, flags in SETTINGS:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=600)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        print(f"{name:28s} rc={r.returncode} {line[0] if line else r.stderr.strip().splitlines()[-1][:120] if r.stderr.strip() else ''}",
              flush=True)


if __name__ == "__main__":
    main()
