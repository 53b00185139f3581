"""Numeric-safety / debugging utilities.

TPU-native replacement for the reference's scattered NaN guards: the
pdb traps (`epipolar_utils.py:82-83`, `main.py:411`), `check_tensor`
(`models/SFMnet.py:281-282`), and the NaN prints in
`EpipolarCorrelationLayer` (`models/correlation.py:80-126`). Under jit
there is no pdb; the idioms are:

  * `enable_nan_debugging()` — flip `jax_debug_nans` so any NaN produced
    under jit re-runs un-jitted and raises at the producing op;
  * `check_finite(tree)` — host-side assertion over a pytree;
  * `checked(fn)` — wrap a jit-able function with `checkify` so finite-
    ness errors are returned as values (works inside jit/scan, unlike
    exceptions);
  * `guard(x)` — in-graph finite-or-zero scrubbing with an error count,
    for fault-tolerant serving paths.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def enable_nan_debugging(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def check_finite(tree: Any, name: str = "tree") -> None:
    """Raise ValueError naming the first non-finite leaf (host-side)."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise ValueError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )


def checked(fn):
    """checkify-wrap fn: returns (error, output); error.throw() to raise.

    Keeps NaN detection inside jit (float_checks), the jit-compatible
    counterpart of the reference's pdb traps.
    """
    return checkify.checkify(fn, errors=checkify.float_checks)


def guard(x: jnp.ndarray, name: str = "") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scrub non-finite entries to zero; returns (clean, n_bad)."""
    finite = jnp.isfinite(x)
    return jnp.where(finite, x, 0.0), jnp.sum(~finite)
