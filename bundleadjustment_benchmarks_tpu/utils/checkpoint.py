"""Checkpoint/resume for LM optimization state.

The reference has no checkpointing (state lives in a mutated-in-place
InputType, SURVEY.md section 5); long BAL runs on preemptible TPU capacity
want it. A checkpoint captures (BAState, lambda, iteration, fun_evals,
energy-history) — everything needed to resume the LM loop mid-run — as a
single .npz file (host-side, no orbax dependency needed at this scale).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from bundleadjustment_benchmarks_tpu.models.problem import BAState

_STATE_FIELDS = ("K", "R", "T", "k1", "k2", "points")


def save_checkpoint(
    path: str,
    state: BAState,
    lam: float = 1e-3,
    iteration: int = 0,
    fun_evals: int = 0,
    energy_history=None,
    extra: Dict[str, Any] | None = None,
) -> None:
    arrays = {f"state.{k}": np.asarray(getattr(state, k)) for k in _STATE_FIELDS}
    arrays["lam"] = np.asarray(lam)
    arrays["iteration"] = np.asarray(iteration)
    arrays["fun_evals"] = np.asarray(fun_evals)
    arrays["energy_history"] = np.asarray(
        energy_history if energy_history is not None else [0.0, 0.0]
    )
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, dtype=None):
    """Returns (state, meta) where meta has lam/iteration/fun_evals/history/extra."""
    with np.load(path) as data:
        kw = {}
        for k in _STATE_FIELDS:
            arr = data[f"state.{k}"]
            kw[k] = jnp.asarray(arr if dtype is None else arr.astype(dtype))
        state = BAState(**kw)
        meta = {
            "lam": float(data["lam"]),
            "iteration": int(data["iteration"]),
            "fun_evals": int(data["fun_evals"]),
            "energy_history": data["energy_history"].tolist(),
            "extra": {
                k[len("extra."):]: data[k]
                for k in data.files
                if k.startswith("extra.")
            },
        }
    return state, meta
