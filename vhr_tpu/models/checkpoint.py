"""Checkpoint / resume.

The reference's only persistence is file-level caching (degradation outputs,
ROI-mean ``.npy``; SURVEY.md §5).  The framework adds real checkpointing:

* **model checkpoints** — landmark-model params (+ optimizer state) via
  orbax, mesh/sharding-aware on restore;
* **streaming-state snapshots** — the live pipeline's carried state (ring
  buffers, SOS ``zi``, holdover trackers) so long monitoring sessions resume
  mid-stream, which the reference cannot do.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_params", "load_params", "save_live_state",
           "load_live_state"]


def save_params(path: str, params, opt_state=None) -> None:
    """Save a param (and optional optimizer-state) pytree with orbax."""
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like=None):
    """Restore a params pytree; ``like`` provides structure/shardings."""
    import orbax.checkpoint as ocp
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    target = {"params": like} if like is not None else None
    restored = ckptr.restore(path, target)
    return restored["params"]


def save_live_state(path: str, state) -> None:
    """Snapshot a live-pipeline state pytree (NamedTuple of arrays)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    p = Path(path)
    if p.parent != Path("."):
        p.parent.mkdir(parents=True, exist_ok=True)
    np.savez(p, n_leaves=len(leaves), **arrays)


def load_live_state(path: str, like):
    """Restore a live-pipeline state with the structure of ``like``."""
    import jax.numpy as jnp
    z = np.load(path)
    n = int(z["n_leaves"])
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(n)]
    treedef = jax.tree.structure(like)
    return jax.tree.unflatten(treedef, leaves)
