"""Long-recording BPM over a time-sharded signal (sequence parallelism).

Completes the SURVEY.md §5 long-context plan end to end: an hour-scale green
trace is sharded over the ``time`` mesh axis; each chip receives a
``window_len - 1`` halo from its left neighbor over ICI (one ``ppermute``)
and computes its frames' steady-state FFT-peak estimates locally — the
rolling windows become embarrassingly parallel after one neighbor exchange,
bit-matching the unsharded :func:`vhr_tpu.ops.windows.rolling_bpm_fft`
steady region.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import HRBand
from ..dsp import spectral
from ..ops import windows as vwin

__all__ = ["sharded_steady_bpm"]


def sharded_steady_bpm(signal: jnp.ndarray, fps: float, band: HRBand,
                       window_len: int, mesh: Mesh,
                       axis_name: str = "time"
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame steady-state BPM of a time-sharded ``(T,)`` signal.

    Frame ``i`` (global) sees ``signal[i - window_len + 1 : i + 1]``; frames
    earlier than ``window_len - 1`` are invalid (the acquisition ramp is a
    prefix-local computation — run it on shard 0's data if needed).

    Returns ``(bpm, valid)`` sharded like the input.
    """
    n_shards = mesh.shape[axis_name]
    halo = window_len - 1

    def body(xl):
        idx = jax.lax.axis_index(axis_name)
        fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        left = jax.lax.ppermute(xl[-halo:], axis_name, fwd)
        # Shard 0 has no real left context: zero halo, frames masked invalid.
        left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        ext = jnp.concatenate([left, xl], axis=0)     # (halo + T_local,)
        wins = vwin.sliding_windows(ext, window_len)  # (T_local, W)
        wins = wins - jnp.mean(wins, axis=-1, keepdims=True)
        est = spectral.estimate_bpm(wins, fps, band)
        t_local = xl.shape[0]
        global_i = idx * t_local + jnp.arange(t_local)
        valid = jnp.logical_and(est.valid, global_i >= window_len - 1)
        return est.bpm, valid

    return shard_map(body, mesh=mesh, in_specs=(P(axis_name),),
                     out_specs=(P(axis_name), P(axis_name)),
                     check_vma=False)(signal)
