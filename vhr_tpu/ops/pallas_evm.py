"""Pallas kernel #2: fused EVM front-end (blur + 2x decimate + YIQ).

The EVM path's bandwidth hazard is materializing full-resolution float YIQ
(25 MB/1080p frame) before the pyramid shrinks it.  This kernel fuses the
first pyramid level with the colorspace change in one HBM pass:

  uint8 planar BGR (T, 3, H, W)  --DMA overlapping row blocks-->
  5-tap binomial blur + 2x decimate in H and W  -->
  YIQ linear combine (blur commutes with the linear color map)  -->
  f32 (T, 3, H/2, W/2) written once.

Read 6 MB + write 6 MB per 1080p frame instead of read 6 + write 25 + read
25 MB.  Remaining pyramid levels run on the quarter-size tensor via XLA.

Blur+decimate rides the MXU as two banded-matrix products (Mosaic has no
strided vector slices): ``out = V @ plane @ D`` with constant ``V`` (rows)
and ``D`` (cols, edge-clamped so boundary semantics match pad-then-blur
exactly).  DMA row offsets stay 8-aligned by construction (output blocks are
multiples of 4 rows; the input is host-padded by 8 rows on top); ``W`` must
be a multiple of 128 — 1080p/720p qualify, others take the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["yiq_pyrdown_pallas", "to_planar"]

_W5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float64) / 16.0


def to_planar(frames: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, 3) channel-interleaved -> (T, 3, H, W) planar."""
    return jnp.transpose(frames, (0, 3, 1, 2))


def _vert_matrix(rb_out: int, s_in: int) -> np.ndarray:
    """V[k, r] applies the binomial taps at input row 6 + 2k + t."""
    V = np.zeros((rb_out, s_in), np.float32)
    for k in range(rb_out):
        for t in range(5):
            V[k, 6 + 2 * k + t] = _W5[t]
    return V


def _horiz_matrix(w: int) -> np.ndarray:
    """D[c, j] applies taps at column clamp(2j + t - 2) (edge-replicate)."""
    w_out = w // 2
    D = np.zeros((w, w_out), np.float32)
    for j in range(w_out):
        for t in range(5):
            c = min(max(2 * j + t - 2, 0), w - 1)
            D[c, j] += _W5[t]
    return D


def _kernel(v_ref, d_ref, in_hbm, out_ref, scratch, sems, *, rb_out: int,
            w: int, s_in: int, n_blocks: int):
    t = pl.program_id(0)
    i = pl.program_id(1)

    def get_dma(slot, tt, ii):
        start = pl.multiple_of(ii * (2 * rb_out), 8)
        return pltpu.make_async_copy(
            in_hbm.at[tt, :, pl.ds(start, s_in), :],
            scratch.at[slot],
            sems.at[slot],
        )

    step = t * n_blocks + i
    slot = jax.lax.rem(step, jnp.int32(2))

    @pl.when(step == 0)
    def _():
        get_dma(0, t, i).start()

    # Prefetch the next grid step's window while computing this one.
    nxt = step + 1
    nt = nxt // n_blocks
    ni = jax.lax.rem(nxt, jnp.int32(n_blocks))

    @pl.when(nxt < pl.num_programs(0) * n_blocks)
    def _():
        get_dma(jax.lax.rem(nxt, jnp.int32(2)), nt, ni).start()

    get_dma(slot, t, i).wait()

    planes = scratch[slot].astype(jnp.int32).astype(jnp.float32)  # (3, S, w)
    V = v_ref[...]
    D = d_ref[...]

    outs = []
    for c in range(3):
        v = jnp.dot(V, planes[c], preferred_element_type=jnp.float32)
        h = jnp.dot(v, D, preferred_element_type=jnp.float32)
        outs.append(h)                                  # (rb_out, w_out)

    b, g, r = outs[0], outs[1], outs[2]
    y = 0.30 * r + 0.59 * g + 0.11 * b
    iq1 = 0.74 * (r - y) - 0.27 * (b - y)
    iq2 = 0.48 * (r - y) + 0.41 * (b - y)
    scale = jnp.float32(1.0 / 255.0)
    out_ref[0, 0] = y * scale
    out_ref[0, 1] = iq1 * scale
    out_ref[0, 2] = iq2 * scale


def yiq_pyrdown_pallas(frames: jnp.ndarray, rb_out: int = 64,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused u8 -> blur -> 2x decimate -> YIQ.

    Args:
      frames: ``(T, H, W, 3)`` uint8 BGR (interleaved; transposed to planar
        internally with one XLA pass — decode layers can deliver planar).
    Returns:
      ``(T, 3, H//2, W//2)`` float32 YIQ (luma scale [0, 1]).
    """
    T, H, W, C = frames.shape
    assert C == 3
    h_out, w_out = H // 2, W // 2
    if W % 128 != 0 or rb_out % 4 != 0:
        raise ValueError("W must be a multiple of 128 and rb_out of 4")

    n_blocks = -(-h_out // rb_out)
    pad_rows = 2 * n_blocks * rb_out + 16 - H

    planar = to_planar(frames)
    planar = jnp.pad(planar, ((0, 0), (0, 0), (8, pad_rows - 8), (0, 0)),
                     mode="edge")
    s_in = 2 * rb_out + 16

    kernel = functools.partial(_kernel, rb_out=rb_out, w=W, s_in=s_in,
                               n_blocks=n_blocks)

    out = pl.pallas_call(
        kernel,
        grid=(T, n_blocks),
        in_specs=[
            pl.BlockSpec((rb_out, s_in), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, w_out), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 3, rb_out, w_out),
                               lambda t, i: (t, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 3, n_blocks * rb_out, w_out),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, s_in, W), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(_vert_matrix(rb_out, s_in)),
      jnp.asarray(_horiz_matrix(W)), planar)
    return out[:, :, :h_out, :]
