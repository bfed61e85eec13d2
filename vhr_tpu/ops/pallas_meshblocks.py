"""VMEM-resident fused residual bottleneck stages for the face nets.

The MediaPipe face-mesh graph (`models/tflite.py`, executed by
`models/tflite_exec.build_jax`; reference consumer `rppg_VIDEO.py:380`)
spends 48% of its activation HBM traffic in the 128x128 stage and another
29% at 64x64 — runs of identical residual bottleneck blocks::

    entry: PRELU(C)
    block: 1x1 conv (C->Cm) + bias -> PRELU(Cm)
           -> depthwise 3x3 SAME (Cm) + bias
           -> 1x1 conv (Cm->C) + bias -> ADD(residual) -> PRELU(C)

Executed op-by-op, every block round-trips ~5 feature maps through HBM
(docs/PERFORMANCE.md r4 roofline: the conv stack is ACTIVATION-bound, with
VMEM-resident fusion named as the next >2x).  This kernel runs a whole
stage per frame out of VMEM: one HBM read of the stage input, one write of
its output — a 128x128x16 bf16 map is 512 KB, so even the largest stage's
working set (~4 MB f32) fits comfortably.

Layout: channels-first ``(B, C, S)`` with the flattened ``S = H*W`` spatial
axis in lanes (full 128-lane VPU utilization; the natural NHWC layout would
put C=8..16 in lanes and waste 7/8 of every vector op).  The 1x1 convs are
``(C', C) @ (C, S)`` MXU dots; the depthwise 3x3 is nine ``pltpu.roll``
lane shifts of ``W*dy + dx`` with iota masks reproducing SAME zero-padding
(row edges must not bleed across the flattened rows).  All arithmetic is
f32 in registers; only the stage input/output touch HBM (bf16 in the
product's ``activation_dtype=bf16`` mode) — strictly MORE precise than the
unfused bf16 path, which rounds every op boundary.

The graph-side pattern detector and wiring live in
``models/tflite_exec.build_jax(fuse_stages=...)``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["StageWeights", "pack_stage_weights", "residual_stage_pallas"]

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


class StageWeights(NamedTuple):
    """Stacked weights for an N-block residual stage (see module doc).

    Shapes: ``a0 (C,1)``; per-block stacks ``w1 (N,Cm,C)``, ``b1 (N,Cm,1)``,
    ``a1 (N,Cm,1)``, ``dw (N,9,Cm)``, ``bdw (N,Cm,1)``, ``w2 (N,C,Cm)``,
    ``b2 (N,C,1)``, ``a2 (N,C,1)``.
    """

    a0: jnp.ndarray
    w1: jnp.ndarray
    b1: jnp.ndarray
    a1: jnp.ndarray
    dw: jnp.ndarray
    bdw: jnp.ndarray
    w2: jnp.ndarray
    b2: jnp.ndarray
    a2: jnp.ndarray


def pack_stage_weights(a0, blocks) -> StageWeights:
    """Host-side packing from TFLite tensors.

    ``a0``: entry PRELU alpha ``(1,1,C)`` (or ``(C,)``); ``blocks``: list of
    dicts with keys ``w1 (Cm,1,1,C)``, ``b1 (Cm,)``, ``a1 (1,1,Cm)``,
    ``dw (1,3,3,Cm)``, ``bdw (Cm,)``, ``w2 (C,1,1,Cm)``, ``b2 (C,)``,
    ``a2 (1,1,C)`` — the raw TFLite constant layouts.
    """
    f = np.float32
    a0 = np.asarray(a0, f).reshape(-1, 1)
    C = a0.shape[0]

    def col(v):
        return np.asarray(v, f).reshape(-1, 1)

    w1 = np.stack([np.asarray(b["w1"], f).reshape(-1, C) for b in blocks])
    Cm = w1.shape[1]
    return StageWeights(
        a0=jnp.asarray(a0),
        w1=jnp.asarray(w1),
        b1=jnp.asarray(np.stack([col(b["b1"]) for b in blocks])),
        a1=jnp.asarray(np.stack([col(b["a1"]) for b in blocks])),
        dw=jnp.asarray(np.stack(
            [np.asarray(b["dw"], f).reshape(9, Cm) for b in blocks])),
        bdw=jnp.asarray(np.stack([col(b["bdw"]) for b in blocks])),
        w2=jnp.asarray(np.stack(
            [np.asarray(b["w2"], f).reshape(C, Cm) for b in blocks])),
        b2=jnp.asarray(np.stack([col(b["b2"]) for b in blocks])),
        a2=jnp.asarray(np.stack([col(b["a2"]) for b in blocks])),
    )


def _prelu(x, alpha_col):
    return jnp.where(x >= 0, x, x * alpha_col)


def _kernel(x_ref, a0, w1, b1, a1, dw, bdw, w2, b2, a2, o_ref,
            *, w_row: int, n_blocks: int):
    f32 = jnp.float32
    x = x_ref[0].astype(f32)                       # (C, S)
    S = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    xcol = jax.lax.rem(lane, jnp.int32(w_row))   # int32 even under x64

    x = _prelu(x, a0[:, :])
    for k in range(n_blocks):
        h = jnp.dot(w1[k], x, preferred_element_type=f32) + b1[k]
        h = _prelu(h, a1[k])
        # Depthwise 3x3 SAME: nine lane rolls of the flattened spatial
        # axis; masks keep row edges from bleeding into neighbors and
        # reproduce the zero padding exactly.
        d = bdw[k] * jnp.ones_like(h)
        for t, (dy, dx) in enumerate(_TAPS):
            s = w_row * dy + dx
            # pltpu.roll wants a non-negative shift; (-s) % S is the same
            # circular rotation (wrapped values are masked off below).
            src = h if s == 0 else pltpu.roll(h, shift=(-s) % S, axis=1)
            ok = (xcol + dx >= 0) & (xcol + dx < w_row) \
                & (lane + s >= 0) & (lane + s < S)
            d = d + jnp.where(ok, src, 0.0) * dw[k, t][:, None]
        y = jnp.dot(w2[k], d, preferred_element_type=f32) + b2[k]
        x = _prelu(x + y, a2[k])
    o_ref[0] = x.astype(o_ref.dtype)


def residual_stage_pallas(x: jnp.ndarray, wts: StageWeights, w_row: int,
                          interpret: bool = False) -> jnp.ndarray:
    """Run an N-block residual bottleneck stage VMEM-resident.

    ``x``: ``(B, C, S)`` channels-first with ``S = H * w_row`` flattened
    spatial lanes (``S % 128 == 0``); returns the same shape/dtype.  One
    grid program per frame: the stage input is the only HBM read, the
    stage output the only write.
    """
    B, C, S = x.shape
    if S % 128 != 0 or S < 128:
        raise ValueError(f"flattened spatial dim {S} must be a multiple "
                         f"of 128 (w_row={w_row})")
    n_blocks = wts.w1.shape[0]
    kernel = functools.partial(_kernel, w_row=w_row, n_blocks=n_blocks)
    rep = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape))
    Cm = wts.w1.shape[1]
    N = n_blocks
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, C, S), lambda b: (b, 0, 0)),
                  rep(C, 1),            # a0
                  rep(N, Cm, C),        # w1
                  rep(N, Cm, 1),        # b1
                  rep(N, Cm, 1),        # a1
                  rep(N, 9, Cm),        # dw
                  rep(N, Cm, 1),        # bdw
                  rep(N, C, Cm),        # w2
                  rep(N, C, 1),         # b2
                  rep(N, C, 1)],        # a2
        out_specs=pl.BlockSpec((1, C, S), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, C, S), x.dtype),
        interpret=interpret,
    )(x, *wts)
