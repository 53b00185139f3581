"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on CPU per standard JAX practice
(the reference has no counterpart: it is single-process DataParallel,
see SURVEY.md §2.7). Real-TPU execution is exercised by bench.py.

The axon sitecustomize registers a remote-TPU platform at interpreter
startup and forces jax_platforms='axon,cpu'; re-select CPU here (env vars
alone are overridden by that registration). XLA_FLAGS must be set before
the CPU client initializes, which happens on first backend use — after
this conftest runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
