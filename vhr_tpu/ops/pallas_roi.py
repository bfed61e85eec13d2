"""Pallas kernel #1: fused per-frame ROI channel means.

The hot spatial-pooling op of the rPPG pipeline (the reference's
``np.mean(roi[:, :, c])`` per frame, ``rppg_VIDEO.py:60-66``): for every
frame, average each color channel over a per-frame ROI rectangle.

Why a kernel instead of the XLA masked reduction
(``vhr_tpu.ops.reduce.roi_channel_means``): the ROI is typically a small
fraction of the frame (a cheek patch inside 1080p), and XLA must stream the
*entire* frame from HBM to apply the mask.  Here the per-frame ROI boxes are
scalar-prefetched (``pltpu.PrefetchScalarGridSpec``) so the kernel DMAs only
the ROI's rows — HBM traffic drops by ~H/roi_h — with double-buffered copies
overlapping the masked VPU reduction.

Layout: frames enter as ``(T, H, W*3)`` uint8 (channel-interleaved rows make
the last dim contiguous lanes); channel separation happens in-register via
``lane % 3`` masks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["roi_channel_means_pallas"]


def _roi_mean_kernel(roi_ref, frames_hbm, out_ref, scratch, sems,
                     *, row_block: int, height: int, wc: int,
                     channels: int):
    t = pl.program_id(0)
    x1 = roi_ref[t, 0]
    y1 = roi_ref[t, 1]
    x2 = roi_ref[t, 2]
    y2 = roi_ref[t, 3]
    # DMA row offsets must be 8-aligned (Mosaic tiles HBM memrefs (8, 128)):
    # chunks start at y1 aligned down to 8 and step by row_block (mult of 8).
    base = (y1 // 8) * 8
    n_chunks = jnp.maximum(pl.cdiv(y2 - base, jnp.int32(row_block)), 0)
    max_start = height - row_block

    def chunk_start(i):
        start = jnp.clip(base + i * row_block, 0, max_start)
        # All operands are multiples of 8 (base by construction, row_block
        # and height by the wrapper's contract); tell the compiler.
        return pl.multiple_of(start, 8)

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            frames_hbm.at[t, pl.ds(chunk_start(i), row_block), :],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(i, u):
        slot = jax.lax.rem(i, jnp.int32(2))

        @pl.when(i + 1 < n_chunks)
        def _():
            get_dma(jax.lax.rem(i + 1, jnp.int32(2)), i + 1).start()

        get_dma(slot, i).wait()

        start = chunk_start(i)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, row_block), 1) + start
        # Clip this chunk's rows to [y1, y2) and, for overlapping clamped
        # chunks near the frame bottom, to rows not already accumulated by
        # earlier chunks (their unclamped extent ends at base + i*row_block).
        lo = jnp.maximum(base + i * row_block, y1)
        r = jnp.where(jnp.logical_and(row >= lo, row < y2), 1.0, 0.0
                      ).astype(jnp.float32)                       # (1, rb)
        # Row-masked column sums ride the MXU: (1, rb) @ (rb, wc).
        vals = scratch[slot].astype(jnp.int32).astype(jnp.float32)
        return u + jnp.dot(r, vals, preferred_element_type=jnp.float32)

    u0 = jnp.zeros((1, wc), jnp.float32)
    u = jax.lax.fori_loop(0, n_chunks, body, u0)

    # Split the accumulated per-lane column sums by channel and ROI columns:
    # lane j holds pixel column j // channels, channel j % channels.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, wc), 1)
    col = lane // channels
    ch = lane - col * channels
    col_ok = jnp.logical_and(col >= x1, col < x2)

    count = (jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)).astype(jnp.float32)
    denom = jnp.maximum(count, 1.0)
    for c in range(channels):
        sel = jnp.logical_and(col_ok, ch == c)
        out_ref[t, c] = jnp.sum(jnp.where(sel, u, 0.0)) / denom
    out_ref[t, channels] = count


def roi_channel_means_pallas(frames: jnp.ndarray, rois: jnp.ndarray,
                             row_block: int = 128,
                             interpret: bool = False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ROI channel means via the Pallas kernel.

    Args:
      frames: ``(T, H, W, C)`` uint8.
      rois: ``(T, 4)`` int32 ``[x1, y1, x2, y2]`` (exclusive ends).
      row_block: rows per DMA chunk (clamped to H).
      interpret: run in interpreter mode (for CPU tests).

    Returns:
      ``(means, count)`` matching
      :func:`vhr_tpu.ops.reduce.roi_channel_means`.
    """
    T, H, W, C = frames.shape
    if H % 8 != 0 and not interpret:
        # Mosaic DMA needs 8-aligned row extents; odd heights take the XLA
        # masked-reduction path instead (callers can pre-pad to avoid this).
        from .reduce import roi_channel_means
        return roi_channel_means(frames, rois)
    rb = max(8, min(row_block, H) // 8 * 8)
    flat = frames.reshape(T, H, W * C)
    # DMA slice widths must be 128-aligned: pad the flattened row.  HD widths
    # (1920/1280 x3) are already aligned — the pad copy only happens for odd
    # resolutions; IO layers should allocate pre-padded rows to avoid it.
    wc = -(-(W * C) // 128) * 128
    if wc != W * C:
        flat = jnp.pad(flat, ((0, 0), (0, 0), (0, wc - W * C)))

    kernel = functools.partial(_roi_mean_kernel, row_block=rb, height=H,
                               wc=wc, channels=C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        # Keep frames in HBM (untiled): the kernel DMAs dynamically-offset row
        # ranges, which tiled VMEM sources cannot express.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        # Tiny per-frame scalar results live whole in SMEM (VMEM tiling would
        # require 8x128-aligned blocks); each grid step writes its own row.
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rb, wc), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C + 1), jnp.float32),
        interpret=interpret,
    )(rois.astype(jnp.int32), flat)

    return out[:, :C], out[:, C]
