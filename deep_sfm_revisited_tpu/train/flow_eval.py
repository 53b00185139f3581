"""Flow-estimator evaluation.

Rebuild of `models/RAFT/evaluate.py` (`validate_chairs` / `validate_sintel`
/ `validate_kitti` `:75-131`, benchmark submission writers `:22-74`):
EPE / F1-all over the standard flow benchmarks, plus Sintel/KITTI
submission file generation via data/flow_io.py. Works with any of the
framework's flow estimators (RAFT/DICL/PWC share the `(pair) ->
(flow, conf)` contract).
"""

from __future__ import annotations

import os
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from deep_sfm_revisited_tpu.data.loader import pad_to_multiple


def _pad_pair(img1: np.ndarray, img2: np.ndarray, multiple: int):
    h, w = img1.shape[:2]
    p1 = pad_to_multiple(img1, multiple)
    p2 = pad_to_multiple(img2, multiple)
    return p1, p2, (h, w)


def evaluate_flow_dataset(
    forward: Callable,          # (pair (1,H,W,6)) -> flow (1,H,W,2)
    dataset,                    # data/flow_datasets.py dataset (no augment)
    pad_multiple: int = 64,
    max_items: int | None = None,
) -> Dict[str, float]:
    """EPE (+ KITTI F1-all: err > 3px and > 5% of magnitude) over a
    dataset (≙ validate_* of models/RAFT/evaluate.py)."""
    epes = []
    out_frac = []
    n = len(dataset) if max_items is None else min(len(dataset), max_items)
    for i in range(n):
        s = dataset[i]
        img1, img2, (h, w) = _pad_pair(s["ref"], s["target"], pad_multiple)
        pair = jnp.asarray(
            np.concatenate([img1, img2], axis=-1)[None], jnp.float32
        )
        flow = np.asarray(forward(pair))[0, :h, :w]
        gt = s["flow_gt"][:h, :w]
        valid = np.asarray(s["flow_valid"])[:h, :w] > 0.5
        err = np.linalg.norm(flow - gt, axis=-1)
        mag = np.linalg.norm(gt, axis=-1)
        if valid.any():
            epes.append(err[valid].mean())
            out_frac.append(
                ((err > 3.0) & (err > 0.05 * mag))[valid].mean()
            )
    return {
        "epe": float(np.mean(epes)) if epes else float("nan"),
        "f1_all": float(100 * np.mean(out_frac)) if out_frac else float("nan"),
        "n": len(epes),
    }


def create_sintel_submission(forward, dataset, out_dir: str,
                             pad_multiple: int = 64) -> None:
    """Write .flo predictions in the Sintel submission layout
    (≙ create_sintel_submission, evaluate.py:22-46)."""
    from deep_sfm_revisited_tpu.data.flow_io import write_flo

    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(dataset)):
        s = dataset[i]
        img1, img2, (h, w) = _pad_pair(s["ref"], s["target"], pad_multiple)
        pair = jnp.asarray(
            np.concatenate([img1, img2], axis=-1)[None], jnp.float32
        )
        flow = np.asarray(forward(pair))[0, :h, :w]
        write_flo(os.path.join(out_dir, f"frame_{i:04d}.flo"), flow)


def create_kitti_submission(forward, dataset, out_dir: str,
                            pad_multiple: int = 64) -> None:
    """Write 16-bit png predictions in the KITTI submission layout
    (≙ create_kitti_submission, evaluate.py:48-74)."""
    from deep_sfm_revisited_tpu.data.flow_io import write_flow_kitti

    os.makedirs(out_dir, exist_ok=True)
    for i in range(len(dataset)):
        s = dataset[i]
        img1, img2, (h, w) = _pad_pair(s["ref"], s["target"], pad_multiple)
        pair = jnp.asarray(
            np.concatenate([img1, img2], axis=-1)[None], jnp.float32
        )
        flow = np.asarray(forward(pair))[0, :h, :w]
        write_flow_kitti(os.path.join(out_dir, f"{i:06d}_10.png"), flow)
