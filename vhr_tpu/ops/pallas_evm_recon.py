"""Pallas kernel #4: fused EVM reconstruction (upsample + add + BGR u8).

The magnification *output* path was the last unfused full-resolution float
round-trip (ROADMAP r1 item 3): XLA materializes full-res float YIQ
(read 6 MB u8 -> write 24 MB f32), a full-res upsampled band (24 MB), then
reads both to emit u8 (48 MB read + 6 MB write) — ~108 MB of HBM traffic per
1080p frame.  This kernel reads the u8 frame ONCE, rebuilds YIQ on the fly,
adds the bilinearly-upsampled amplified band, converts back, and writes u8
ONCE (~12 MB + transposes):

  u8 planar BGR block --DMA--> YIQ (linear combine) +
  Uv_blk @ band_c @ Uh  (bilinear upsample as two MXU banded products,
  matching ``jax.image.resize(..., "linear")`` half-pixel semantics)
  --> inverse YIQ, clamp, u8 planar BGR block.

The coarse band (T, 3, hb, wb) is tiny (98 KB/frame at 1080p L=4) and rides
whole-frame in VMEM; upsample matrices are constants.  ``W % 128 == 0``
(1080p/720p qualify; others take the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["evm_reconstruct_pallas", "resize_matrix"]


def resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear-upsample matrix with ``jax.image.resize``
    'linear' semantics (half-pixel centers, edge clamp)."""
    M = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for r in range(n_out):
        x = (r + 0.5) * scale - 0.5
        lo = int(np.floor(x))
        frac = x - lo
        lo_c = min(max(lo, 0), n_in - 1)
        hi_c = min(max(lo + 1, 0), n_in - 1)
        M[r, lo_c] += 1.0 - frac
        M[r, hi_c] += frac
    return M


def _kernel(uv_ref, uh_ref, band_ref, in_hbm, out_ref, scratch, sems, *,
            rb: int, w: int, n_blocks: int):
    t = pl.program_id(0)
    i = pl.program_id(1)

    def get_dma(slot, tt, ii):
        start = pl.multiple_of(ii * rb, 8)
        return pltpu.make_async_copy(
            in_hbm.at[tt, :, pl.ds(start, rb), :],
            scratch.at[slot],
            sems.at[slot],
        )

    step = t * n_blocks + i
    slot = jax.lax.rem(step, jnp.int32(2))

    @pl.when(step == 0)
    def _():
        get_dma(0, t, i).start()

    nxt = step + 1
    nt = nxt // n_blocks
    ni = jax.lax.rem(nxt, jnp.int32(n_blocks))

    @pl.when(nxt < pl.num_programs(0) * n_blocks)
    def _():
        get_dma(jax.lax.rem(nxt, jnp.int32(2)), nt, ni).start()

    get_dma(slot, t, i).wait()

    planes = scratch[slot].astype(jnp.int32).astype(jnp.float32)  # (3, rb, w)
    scale = jnp.float32(1.0 / 255.0)
    b = planes[0] * scale
    g = planes[1] * scale
    r = planes[2] * scale

    # Forward YIQ (colorsys coefficients; ops/color.py is the golden ref).
    y = 0.30 * r + 0.59 * g + 0.11 * b
    iq1 = 0.74 * (r - y) - 0.27 * (b - y)
    iq2 = 0.48 * (r - y) + 0.41 * (b - y)

    # Upsampled amplified band for this row block: Uv_blk @ band_c @ Uh.
    Uv = uv_ref[...]                        # (rb, hb)
    Uh = uh_ref[...]                        # (wb, w)
    band = band_ref[0]                      # (3, hb, wb)
    ups = []
    for c in range(3):
        v = jnp.dot(Uv, band[c], preferred_element_type=jnp.float32)
        ups.append(jnp.dot(v, Uh, preferred_element_type=jnp.float32))
    y = y + ups[0]
    iq1 = iq1 + ups[1]
    iq2 = iq2 + ups[2]

    # Inverse YIQ (colorsys yiq_to_rgb) + clamp + u8.
    r2 = y + 0.9468822170900693 * iq1 + 0.6235565819861433 * iq2
    g2 = y - 0.27478764629897834 * iq1 - 0.6356910791873801 * iq2
    b2 = y - 1.1085450346420322 * iq1 + 1.7090069284064666 * iq2

    def to_u8(x):
        return jnp.clip(x * 255.0 + 0.5, 0.0, 255.0).astype(
            jnp.int32).astype(jnp.uint8)

    out_ref[0, 0] = to_u8(b2)
    out_ref[0, 1] = to_u8(g2)
    out_ref[0, 2] = to_u8(r2)


def evm_reconstruct_pallas(planar: jnp.ndarray, band: jnp.ndarray,
                           rb: int = 128,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused u8 + upsampled band -> magnified u8 (planar in, planar out).

    Args:
      planar: ``(T, 3, H, W)`` uint8 BGR (``pallas_evm.to_planar`` layout).
      band: ``(T, 3, hb, wb)`` float32 amplified band-passed YIQ (gains
        already applied), luma scale [0, 1].
    Returns:
      ``(T, 3, H, W)`` uint8 BGR planar.
    """
    T, C, H, W = planar.shape
    assert C == 3 and band.shape[:2] == (T, 3)
    hb, wb = band.shape[2], band.shape[3]
    if W % 128 != 0 or rb % 8 != 0:
        raise ValueError("W must be a multiple of 128 and rb of 8")

    n_blocks = -(-H // rb)
    Hp = n_blocks * rb
    if Hp != H:
        planar = jnp.pad(planar, ((0, 0), (0, 0), (0, Hp - H), (0, 0)),
                         mode="edge")

    Uv = resize_matrix(hb, H)                       # (H, hb)
    if Hp != H:                                     # pad rows (values unused)
        Uv = np.pad(Uv, ((0, Hp - H), (0, 0)))
    Uh = resize_matrix(wb, W).T                     # (wb, W)

    kernel = functools.partial(_kernel, rb=rb, w=W, n_blocks=n_blocks)
    out = pl.pallas_call(
        kernel,
        grid=(T, n_blocks),
        in_specs=[
            pl.BlockSpec((rb, hb), lambda t, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, W), lambda t, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, hb, wb), lambda t, i: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 3, rb, W), lambda t, i: (t, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 3, Hp, W), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, 3, rb, W), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(Uv), jnp.asarray(Uh), band, planar)
    return out[:, :, :H, :]
