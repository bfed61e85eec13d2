"""Pallas kernel #3: single-pass skin detection + ROI reduction.

The flagship pipeline reads every frame at least twice from HBM (detector
pass + ROI-mean pass).  This kernel fuses them into ONE streaming read per
frame: each row chunk contributes simultaneously to

* the skin-occupancy accumulators (column-occupancy vector + per-row-group
  flags) that produce this frame's face box, and
* the cheek-ROI channel sums, masked by the box tracked from *previous*
  frames (carried in SMEM scratch across the sequential grid — exactly the
  temporal tolerance the reference's landmark holdover already grants,
  ``analysis/utils/roi.py:91-95``: the ROI may lag detection by a frame).

Outputs per frame: BGR ROI means + pixel count, the detected box, detection
validity.  The grid is (T,) and MUST iterate t in order (the default) — the
SMEM box carry is the tracking state.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ROIConfig
from ..models.skin_detector import SkinDetectorConfig

__all__ = ["fused_detect_roi_pallas", "fused_detect_roi_carry",
           "fused_detect_roi_slots", "init_carry", "FusedResult"]

# HBM->VMEM staging: DMA_DEPTH copies stay in flight (issue chunk g+DEPTH
# while processing chunk g) across N_SLOTS rotating buffers.  N_SLOTS must
# exceed DMA_DEPTH so a landing copy never overwrites the chunk being read.
DMA_DEPTH = 3
N_SLOTS = 4


class FusedResult(NamedTuple):
    means: jnp.ndarray    # (T, 3) float32 cheek-ROI channel means
    count: jnp.ndarray    # (T,) float32 ROI pixel count
    boxes: jnp.ndarray    # (T, 4) int32 detected face boxes (this frame)
    det_valid: jnp.ndarray  # (T,) bool skin-area validity (this frame)
    roi_valid: jnp.ndarray  # (T,) bool tracked-box validity used for the ROI


def _kernel(in_hbm, t0_ref, phase_ref, state_in, means_ref, box_ref,
            flags_ref, state_out, scratch, colacc, sems,
            state, *, rb: int, h: int, w: int, wc: int, n_chunks: int,
            det: SkinDetectorConfig, roi: ROIConfig, min_area: float,
            detect_every: int, gate_margin: Optional[float],
            rescan_every: int, row_pool: int, seq_len: Optional[int],
            per_slot: bool = False):
    t = pl.program_id(0)
    t0 = t0_ref[0]     # launch's offset into the (possibly longer) clip —
    # long clips run as several launches over ONE HBM array (no per-chunk
    # device copies); only ``t_launch`` frames process per launch.
    # phase = this frame's GLOBAL index for detect_every / rescan_every /
    # seq_len cadence; usually == t0, but a T=1 live launch passes its frame
    # counter here while indexing the single-frame HBM array at t0=0.
    # ``per_slot`` repurposes the time axis as S INDEPENDENT serving slots:
    # each grid step is one slot's single frame — the tracking state is
    # seeded from state_in[t] (not carried between grid steps), written
    # back to state_out[t], and the cadence phase is that slot's own frame
    # counter phase_ref[t].  The cross-"frame" DMA pipeline is unchanged
    # (chunks of successive slots prefetch exactly like chunks of
    # successive frames).
    phase = (phase_ref[t] if per_slot else phase_ref[0] + t)
    do_detect = jax.lax.rem(phase, jnp.int32(detect_every)) == 0
    n_total = pl.num_programs(0) * n_chunks   # global chunk count (static)

    def dma_for(g):
        # Global chunk g = frame g//n_chunks, chunk g%n_chunks.  Clamp so the
        # last chunk never reads past the frame; both i*rb and h - rb are
        # multiples of 8 (wrapper contract).
        tt = g // jnp.int32(n_chunks)
        ii = g - tt * jnp.int32(n_chunks)
        slot = jax.lax.rem(g, jnp.int32(N_SLOTS))
        start = pl.multiple_of(jnp.minimum(ii * rb, h - rb), 8)
        return pltpu.make_async_copy(
            in_hbm.at[t0 + tt, pl.ds(start, rb), :],
            scratch.at[slot],
            sems.at[slot],
        )

    step = t * n_chunks
    # state (SMEM int32): [0:4] last_box, [4] budget, [5] has_last —
    # seeded from state_in so long clips chunk over T with carried tracking.
    @pl.when(t == 0)
    def _():
        for d in range(min(DMA_DEPTH, n_total)):
            dma_for(jnp.int32(d)).start()
        if not per_slot:
            for j in range(6):
                state[j] = state_in[j]
        colacc[0, :] = jnp.zeros_like(colacc[0, :])  # scratch is uninit
    if per_slot:
        # Slots are independent: every grid step re-seeds from its own row.
        for j in range(6):
            state[j] = state_in[t, j]

    # Tracked box from previous frames decides this frame's ROI (cheek
    # sub-rectangle of the carried face box).  With ``seq_len`` set, the
    # flat time axis is a concatenation of independent streams: tracking
    # state never crosses a stream boundary (the first frame of each stream
    # sees no carried box, exactly like frame 0 of a single clip).
    bx1, by1, bx2, by2 = state[0], state[1], state[2], state[3]
    has_prev = state[5] > 0
    if seq_len is not None:
        fresh = jax.lax.rem(phase, jnp.int32(seq_len)) == 0
        has_prev = jnp.logical_and(has_prev, ~fresh)
        do_detect = jnp.logical_or(do_detect, fresh)   # acquire immediately
    bw = (bx2 - bx1).astype(jnp.float32)
    bh = (by2 - by1).astype(jnp.float32)
    rx1 = bx1 + jnp.floor(roi.cheek_horizontal * bw).astype(jnp.int32)
    rx2 = bx2 - jnp.ceil(roi.cheek_horizontal * bw).astype(jnp.int32)
    ry1 = by1 + jnp.floor(roi.cheek_top * bh).astype(jnp.int32)
    ry2 = by1 + jnp.floor(roi.cheek_bottom * bh).astype(jnp.int32)

    # Spatial gate for the skin test: on tracked frames, only row chunks in
    # a ``gate_margin``-expanded band around the carried box pay the VPU mask
    # math.  Full-frame scans happen (a) every ``rescan_every``-th detection
    # frame, (b) while nothing is tracked, and (c) once the holdover budget
    # drains (the face left the band) — so reacquisition latency is bounded
    # by the reference's own <=15-frame tolerance (roi.py:91-95).
    if gate_margin is None:
        gy1, gy2 = jnp.int32(0), jnp.int32(h)
    else:
        periodic = jax.lax.rem(
            phase, jnp.int32(detect_every * rescan_every)) == 0
        full_scan = jnp.logical_or(
            periodic, jnp.logical_or(~has_prev, state[4] <= 0))
        marg = jnp.ceil(jnp.float32(gate_margin) * bh).astype(jnp.int32)
        gy1 = jnp.where(full_scan, 0, jnp.maximum(by1 - marg, 0))
        gy2 = jnp.where(full_scan, h, jnp.minimum(by2 + 1 + marg, h))

    # Lane-indexed constants (chunk-invariant).
    lane = jax.lax.broadcasted_iota(jnp.int32, (rb, wc), 1)
    col = lane // 3
    ch = lane - col * 3
    col_in_roi = jnp.logical_and(col >= rx1, col < rx2)

    def body(i, acc):
        # Slots index by the GLOBAL chunk counter so cross-frame prefetch
        # lands in the slot the matching wait expects.  The pipeline keeps
        # DMA_DEPTH copies in flight (issue g+DEPTH, wait g): the per-chunk
        # HBM fetch latency amortizes instead of serializing — with the
        # 2-slot double buffer the floor was DMA-latency-bound (measured
        # 55 us/frame at 1080p vs ~8 us of pure HBM throughput).
        g = t * n_chunks + i
        slot = jax.lax.rem(g, jnp.int32(N_SLOTS))

        @pl.when(g + DMA_DEPTH < n_total)
        def _():
            dma_for(g + DMA_DEPTH).start()

        dma_for(g).wait()

        row0 = i * rb                      # unclamped chunk origin
        start = jnp.minimum(row0, h - rb)  # clamped DMA origin
        rows = jax.lax.broadcasted_iota(jnp.int32, (rb, wc), 0) + start
        # Rows below row0 were already processed by the previous chunk
        # (clamped overlap near the frame bottom).
        in_frame = rows >= row0

        # --- skin mask (YCbCr box test) on this chunk -------------------
        # Runs only on detection frames (t % detect_every == 0) and, when
        # gated, only on chunks intersecting the [gy1, gy2) band: the VPU
        # mask math is the kernel's dominant cost at full resolution.  The
        # u8->f32 conversion happens *inside* each branch so fully skipped
        # chunks pay DMA only.  ``row_pool > 1`` mean-pools that many
        # adjacent rows before the chroma test (the fused counterpart of
        # ``SkinDetectorConfig.downsample`` / ``pool_mode='mean'``): the
        # ~30-op/lane mask math runs on 1/pool of the lanes, at the price of
        # ``row_pool``-row box-edge quantization.
        def detect_branch(in_frame):
            rbp = rb // row_pool
            if row_pool > 1:
                vi = scratch[slot].astype(jnp.int32)
                vals = (jnp.sum(vi.reshape(rbp, row_pool, wc), axis=1)
                        .astype(jnp.float32) * (1.0 / row_pool))
                lane_p = jax.lax.broadcasted_iota(jnp.int32, (rbp, wc), 1)
                ch_p = lane_p - (lane_p // 3) * 3
                # start and row0 are both multiples of 8 (hence of row_pool),
                # so pooled cells never straddle the clamped-overlap boundary.
                rows_p = (jax.lax.broadcasted_iota(jnp.int32, (rbp, wc), 0)
                          * row_pool + start)
                in_f = rows_p >= row0
            else:
                vals = scratch[slot].astype(jnp.int32).astype(jnp.float32)
                ch_p, in_f = ch, in_frame
            # Channels are interleaved: shift lanes to align b/g/r.  Lanes
            # with ch != 0 compute garbage and are masked out below.
            bb = vals
            gg = pltpu.roll(vals, wc - 1, 1)   # left-shift by 1 (shift >= 0)
            rr = pltpu.roll(vals, wc - 2, 1)   # left-shift by 2
            y = 0.299 * rr + 0.587 * gg + 0.114 * bb
            cb = 128.0 - 0.168736 * rr - 0.331264 * gg + 0.5 * bb
            cr = 128.0 + 0.5 * rr - 0.418688 * gg - 0.081312 * bb
            skin = ((cb >= det.cb_min) & (cb <= det.cb_max) &
                    (cr >= det.cr_min) & (cr <= det.cr_max) &
                    (y >= det.y_min) & (ch_p == 0) & in_f)
            skin_f = skin.astype(jnp.float32)
            colinc = jnp.sum(skin_f, axis=0)
            rowsum = jnp.sum(skin_f, axis=1)                # (rbp,)
            # >=2-pixel row threshold stands in for mask smoothing.
            ridx = (jax.lax.broadcasted_iota(jnp.int32, (rbp, 1), 0)[:, 0]
                    * row_pool + start)
            has_row = rowsum >= 2.0
            rmin = jnp.min(jnp.where(has_row, ridx, h))
            rmax = jnp.max(jnp.where(has_row, ridx + (row_pool - 1), -1))
            return colinc, jnp.sum(skin_f) * row_pool, rmin, rmax

        def skip_branch(in_frame):
            return (jnp.zeros((wc,), jnp.float32), jnp.float32(0.0),
                    jnp.int32(h), jnp.int32(-1))

        chunk_detect = jnp.logical_and(
            do_detect,
            jnp.logical_and(start < gy2, start + rb > gy1))
        colinc, a_inc, rmin, rmax = jax.lax.cond(
            chunk_detect, detect_branch, skip_branch, in_frame)
        colacc[0, :] = colacc[0, :] + colinc
        area, cur_rmin, cur_rmax, a0, a1, a2 = acc
        area = area + a_inc
        cur_rmin = jnp.minimum(cur_rmin, rmin)
        cur_rmax = jnp.maximum(cur_rmax, rmax)

        # --- ROI channel sums under the carried box ---------------------
        # Chunks with no ROI rows skip the masked reduction entirely.
        def roi_branch(rows, in_frame):
            vals = scratch[slot].astype(jnp.int32).astype(jnp.float32)
            row_in_roi = jnp.logical_and(rows >= ry1, rows < ry2)
            sel = jnp.logical_and(jnp.logical_and(row_in_roi, col_in_roi),
                                  in_frame)
            selv = jnp.where(sel, vals, 0.0)
            s0 = jnp.sum(jnp.where(ch == 0, selv, 0.0))
            s1 = jnp.sum(jnp.where(ch == 1, selv, 0.0))
            s2 = jnp.sum(jnp.where(ch == 2, selv, 0.0))
            return s0, s1, s2

        def roi_skip(rows, in_frame):
            z = jnp.float32(0.0)
            return z, z, z

        intersects = jnp.logical_and(start < ry2, start + rb > ry1)
        s0, s1, s2 = jax.lax.cond(intersects, roi_branch, roi_skip,
                                  rows, in_frame)
        return (area, cur_rmin, cur_rmax, a0 + s0, a1 + s1, a2 + s2)

    init = (jnp.float32(0.0), jnp.int32(h), jnp.int32(-1),
            jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    area, rmin, rmax, s0, s1, s2 = jax.lax.fori_loop(0, n_chunks, body, init)

    # Column occupancy -> x extent; then reset the accumulator for the next
    # frame (SMEM/VMEM scratch persists across grid steps).
    colv = colacc[0, :]
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, wc), 1)[0]
    col1 = lane1 // 3
    # Smoothing stand-in, see row threshold above; colv counts pooled cells,
    # so the 2-pixel threshold scales by the pool factor.
    occ = colv >= 2.0 / row_pool
    xmin = jnp.min(jnp.where(occ, col1, w))
    xmax = jnp.max(jnp.where(occ, col1, -1))
    colacc[0, :] = jnp.zeros((wc,), jnp.float32)

    det_ok = jnp.logical_and(area >= min_area, do_detect)
    # Holdover update (analysis/utils/roi.py:91-101 rule); between-detection
    # frames just keep tracking the carried box.
    tracked = jnp.logical_and(~do_detect, has_prev)
    reuse_ok = jnp.logical_and(jnp.logical_and(do_detect, ~det_ok),
                               jnp.logical_and(has_prev, state[4] > 0))
    new_valid = jnp.logical_or(det_ok, jnp.logical_or(reuse_ok, tracked))

    nx1 = jnp.where(det_ok, xmin, bx1)
    ny1 = jnp.where(det_ok, rmin, by1)
    nx2 = jnp.where(det_ok, xmax, bx2)
    ny2 = jnp.where(det_ok, rmax, by2)
    state[0] = nx1
    state[1] = ny1
    state[2] = nx2
    state[3] = ny2
    state[4] = jnp.where(det_ok, jnp.int32(roi.landmark_hold_frames),
                         jnp.where(reuse_ok, state[4] - 1, state[4]))
    state[5] = jnp.where(jnp.logical_or(det_ok, has_prev), 1, 0)

    # Outputs for this frame: ROI means from the carried (pre-update) box.
    count = (jnp.maximum(ry2 - ry1, 0) * jnp.maximum(rx2 - rx1, 0)
             ).astype(jnp.float32)
    roi_ok = jnp.logical_and(has_prev, count > 0)
    denom = jnp.maximum(count, 1.0)
    means_ref[t, 0] = s0 / denom
    means_ref[t, 1] = s1 / denom
    means_ref[t, 2] = s2 / denom
    means_ref[t, 3] = jnp.where(roi_ok, count, 0.0)
    box_ref[t, 0] = nx1
    box_ref[t, 1] = ny1
    box_ref[t, 2] = nx2
    box_ref[t, 3] = ny2
    flags_ref[t, 0] = jnp.logical_or(det_ok, tracked).astype(jnp.int32)
    flags_ref[t, 1] = roi_ok.astype(jnp.int32)
    if per_slot:
        for j in range(6):       # each slot returns its own carry row
            state_out[t, j] = state[j]
    else:
        for j in range(6):       # final value = carry for the next chunk
            state_out[j] = state[j]


def fused_detect_roi_carry(frames: jnp.ndarray,
                           carry: jnp.ndarray,
                           det: SkinDetectorConfig = SkinDetectorConfig(),
                           roi: ROIConfig = ROIConfig(),
                           row_block: int = 128,
                           detect_every: int = 1,
                           gate_margin: Optional[float] = None,
                           rescan_every: int = 30,
                           detect_row_pool: int = 1,
                           seq_len: Optional[int] = None,
                           interpret: bool = False,
                           t_start: int = 0,
                           t_len: Optional[int] = None,
                           phase=None
                           ) -> Tuple[FusedResult, jnp.ndarray]:
    """One kernel launch over frames ``[t_start, t_start + t_len)`` with
    explicit tracking carry.

    ``gate_margin`` (fraction of the tracked box height) spatially gates the
    skin test to a band around the carried box; see
    :func:`fused_detect_roi_pallas`.

    ``carry`` is the ``(6,) int32`` SMEM tracking state
    ``[x1, y1, x2, y2, hold_budget, has_last]`` (:func:`init_carry` for a
    fresh one); the final state returns so long clips run as several
    launches over ONE resident HBM array — the offset rides in as an SMEM
    scalar, so there are no per-chunk device copies, and the per-frame SMEM
    output arrays (which Mosaic sizes by the launch's ``t_len``) stay under
    the ~1 MB SMEM budget (measured cliff between T=512 and T=960 at 1080p).
    """
    if frames.ndim == 3:
        # Pre-flattened (T, H, W*3): the zero-copy layout — an in-jit 4D
        # reshape at this custom-call boundary materializes a full HBM
        # copy (docs/PERFORMANCE.md rule 2); streaming callers flatten on
        # the host instead.
        T, H, WC = frames.shape
        assert WC % 3 == 0
        W, C = WC // 3, 3
    else:
        T, H, W, C = frames.shape
        assert C == 3
    static_start = isinstance(t_start, (int, np.integer))
    if t_len is None:
        assert static_start, "t_len is required when t_start is traced"
        t_len = T - t_start
    if static_start:
        assert 0 <= t_start and t_start + t_len <= T
    wc = W * C
    if H % 8 != 0 or wc % 128 != 0:
        raise ValueError("fused kernel needs H % 8 == 0 and W*3 % 128 == 0")
    rb = max(8, min(row_block, H) // 8 * 8)
    n_chunks = -(-H // rb)
    min_area = det.min_area_fraction * H * W
    if detect_row_pool not in (1, 2, 4, 8):
        raise ValueError("detect_row_pool must be 1, 2, 4 or 8 (must divide "
                         "the 8-row DMA alignment)")

    kernel = functools.partial(_kernel, rb=rb, h=H, w=W, wc=wc,
                               n_chunks=n_chunks, det=det, roi=roi,
                               min_area=min_area, detect_every=detect_every,
                               gate_margin=gate_margin,
                               rescan_every=rescan_every,
                               row_pool=detect_row_pool, seq_len=seq_len)

    flat = frames if frames.ndim == 3 else frames.reshape(T, H, wc)
    t0 = jnp.reshape(jnp.asarray(t_start, jnp.int32), (1,))
    # ``phase`` is the first frame's GLOBAL index for the detect_every /
    # rescan_every / seq_len cadences — it may be a traced scalar (e.g. the
    # live driver's frame counter, while t_start stays 0 into a T=1 array).
    ph = t0 if phase is None else jnp.reshape(
        jnp.asarray(phase, jnp.int32), (1,))
    means, boxes, flags, carry_out = pl.pallas_call(
        kernel,
        grid=(t_len,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((t_len, 4), jnp.float32),
                   jax.ShapeDtypeStruct((t_len, 4), jnp.int32),
                   jax.ShapeDtypeStruct((t_len, 2), jnp.int32),
                   jax.ShapeDtypeStruct((6,), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, rb, wc), jnp.uint8),
            pltpu.VMEM((8, wc), jnp.float32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
            pltpu.SMEM((6,), jnp.int32),
        ],
        interpret=interpret,
    )(flat, t0, ph, carry.astype(jnp.int32))

    res = FusedResult(means=means[:, :3], count=means[:, 3],
                      boxes=boxes, det_valid=flags[:, 0] > 0,
                      roi_valid=flags[:, 1] > 0)
    return res, carry_out


def init_carry() -> jnp.ndarray:
    """Fresh tracking state for :func:`fused_detect_roi_carry`."""
    return jnp.zeros((6,), jnp.int32)


def fused_detect_roi_slots(frames: jnp.ndarray,
                           carry: jnp.ndarray,
                           phase: jnp.ndarray,
                           det: SkinDetectorConfig = SkinDetectorConfig(),
                           roi: ROIConfig = ROIConfig(),
                           row_block: int = 128,
                           detect_every: int = 1,
                           gate_margin: Optional[float] = None,
                           rescan_every: int = 30,
                           detect_row_pool: int = 1,
                           interpret: bool = False
                           ) -> Tuple[FusedResult, jnp.ndarray]:
    """Slot-batched fused kernel: S INDEPENDENT live streams, one frame
    each, in ONE launch — the serving-pool tick (``vhr_tpu.serving``).

    Unlike :func:`fused_detect_roi_carry` (one stream, carry chained
    through the sequential grid), every grid step here is a different
    slot: tracking state is seeded per-row from ``carry (S, 6) int32``
    and written back per-row, and the detection cadence runs on each
    slot's OWN frame counter ``phase (S,) int32`` (clients attach at
    different times, so their cadences are not aligned).  A zeroed carry
    row is a fresh slot (``has_last = 0``), so the pool's attach-reset is
    just zeroing the row.  DMA prefetch crosses slot boundaries exactly
    as it crosses frame boundaries in the clip kernel — the per-tick HBM
    traffic is ONE streaming read of the (S, H, W, 3) batch, versus the
    XLA pool tick's detector pass + ROI-mean pass (>=2 reads;
    docs/PERFORMANCE.md).  Per-slot semantics are pinned equal to the
    single-stream fused live step in tests/test_serving.py.

    Args: ``frames (S, H, W, 3)`` or pre-flattened ``(S, H, W*3)`` u8;
    ``carry (S, 6)``; ``phase (S,)``.  Returns (:class:`FusedResult` with
    leading ``(S,)``, ``carry_out (S, 6)``).
    """
    if frames.ndim == 3:
        S, H, WC = frames.shape
        assert WC % 3 == 0
        W = WC // 3
    else:
        S, H, W, C = frames.shape
        assert C == 3
    wc = W * 3
    if H % 8 != 0 or wc % 128 != 0:
        raise ValueError("fused kernel needs H % 8 == 0 and W*3 % 128 == 0")
    rb = max(8, min(row_block, H) // 8 * 8)
    n_chunks = -(-H // rb)
    min_area = det.min_area_fraction * H * W
    if detect_row_pool not in (1, 2, 4, 8):
        raise ValueError("detect_row_pool must be 1, 2, 4 or 8")

    kernel = functools.partial(_kernel, rb=rb, h=H, w=W, wc=wc,
                               n_chunks=n_chunks, det=det, roi=roi,
                               min_area=min_area, detect_every=detect_every,
                               gate_margin=gate_margin,
                               rescan_every=rescan_every,
                               row_pool=detect_row_pool, seq_len=None,
                               per_slot=True)

    flat = frames if frames.ndim == 3 else frames.reshape(S, H, wc)
    t0 = jnp.zeros((1,), jnp.int32)
    means, boxes, flags, carry_out = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((S, 4), jnp.float32),
                   jax.ShapeDtypeStruct((S, 4), jnp.int32),
                   jax.ShapeDtypeStruct((S, 2), jnp.int32),
                   jax.ShapeDtypeStruct((S, 6), jnp.int32)),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, rb, wc), jnp.uint8),
            pltpu.VMEM((8, wc), jnp.float32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
            pltpu.SMEM((6,), jnp.int32),
        ],
        interpret=interpret,
    )(flat, t0, phase.astype(jnp.int32).reshape(S),
      carry.astype(jnp.int32))

    res = FusedResult(means=means[:, :3], count=means[:, 3],
                      boxes=boxes, det_valid=flags[:, 0] > 0,
                      roi_valid=flags[:, 1] > 0)
    return res, carry_out


def fused_detect_roi_pallas(frames: jnp.ndarray,
                            det: SkinDetectorConfig = SkinDetectorConfig(),
                            roi: ROIConfig = ROIConfig(),
                            row_block: int = 128,
                            detect_every: int = 1,
                            gate_margin: Optional[float] = None,
                            rescan_every: int = 30,
                            detect_row_pool: int = 1,
                            seq_len: Optional[int] = None,
                            interpret: bool = False,
                            t_block: int = 256) -> FusedResult:
    """One HBM pass per frame: skin box detection + cheek-ROI means.

    The ROI uses the face box tracked from *previous* frames (one-frame lag,
    inside the reference's own holdover tolerance); frame 0 therefore has
    ``roi_valid=False``.  ``detect_every=N`` runs the skin test on one frame
    in N and tracks the box in between (the mask math dominates the kernel's
    VPU cost at full resolution).  Requires ``H % 8 == 0`` and
    ``W*3 % 128 == 0``.

    ``gate_margin`` (e.g. 0.5, in fractions of the tracked box height)
    spatially gates the skin test: tracked frames test only row chunks in a
    margin-expanded band around the carried box, while full-frame scans run
    every ``rescan_every``-th detection frame, whenever nothing is tracked,
    and once the holdover budget drains — so a face that jumps out of the
    band reacquires within the reference's own <=15-frame holdover tolerance
    (``analysis/utils/roi.py:91-95``).  ``None`` (default) disables gating
    (every detection frame scans the full frame).

    ``detect_row_pool=p`` mean-pools ``p`` adjacent rows before the chroma
    test (the fused counterpart of ``SkinDetectorConfig.downsample`` with
    ``pool_mode='mean'``): the dominant VPU mask math runs on ``1/p`` of the
    lanes at the price of ``p``-row box-edge quantization (<=4 rows of a
    1080p frame at p=4 — well under the cheek-ROI ratios' sensitivity).

    ``seq_len=T`` treats the flat time axis as a concatenation of
    independent ``T``-frame streams (``(S, T, H, W, 3).reshape(S*T, ...)``):
    tracking state resets at every stream boundary and the first frame of
    each stream always detects — the multistream monitoring layout
    (``vhr_tpu.parallel.streams``) on one kernel launch.

    Long clips launch in ``t_block``-frame chunks with the tracking state
    carried between launches (Mosaic allocates the per-frame SMEM outputs
    for the whole launch, so a single huge-``T`` launch exhausts the ~1 MB
    SMEM — measured cliff between T=512 and T=960 at 1080p).
    """
    T = frames.shape[0]
    run = functools.partial(fused_detect_roi_carry, det=det, roi=roi,
                            row_block=row_block, detect_every=detect_every,
                            gate_margin=gate_margin,
                            rescan_every=rescan_every,
                            detect_row_pool=detect_row_pool,
                            seq_len=seq_len, interpret=interpret)
    if T <= t_block:
        res, _ = run(frames, init_carry())
        return res
    parts = []
    carry = init_carry()
    for s in range(0, T, t_block):
        res, carry = run(frames, carry, t_start=s,
                         t_len=min(t_block, T - s))
        parts.append(res)
    return FusedResult(*(jnp.concatenate([getattr(p, f) for p in parts])
                         for f in FusedResult._fields))
