"""Stream-parallel batched monitoring: N subjects across a chip mesh.

The BASELINE 64-concurrent-720p-streams configuration: frames arrive as
``(streams, T, H, W, 3)``; each stream runs the full rPPG pipeline
independently, so the natural layout shards the ``streams`` axis across
chips via ``shard_map`` — zero collectives in steady state, ICI only at
input distribution.  Contrast with the reference, which can only process one
video per Python process (``analysis/main.py`` loops serially).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import PipelineConfig
from ..models import skin_detector
from ..ops import reduce as vreduce
from ..ops import roi as vroi
from ..ops import windows as vwin

__all__ = ["multistream_green_bpm", "MultiStreamResult"]


class MultiStreamResult(NamedTuple):
    bpm: jnp.ndarray      # (streams, T)
    valid: jnp.ndarray    # (streams, T)
    green: jnp.ndarray    # (streams, T)


def _single_stream(frames, detector, fps: float, cfg: PipelineConfig,
                   det: skin_detector.SkinDetectorConfig):
    """Per-shard pipeline body: (S_local, T, H, W, 3) -> per-frame BPM.

    ``detector`` is an optional pipeline detector callable (``frames ->
    (boxes, valid)``, e.g. the production MediaPipe port) whose weights ride
    the shard_map as replicated inputs; ``None`` selects skin chroma.

    Detection is frame-local, so a pluggable detector runs once over the
    FLATTENED (S_local*T) frame batch rather than vmapped per stream:
    measured on the MediaPipe port, the per-stream vmap structure alone
    cost 3x (2,843 vs 8,781 fps at 64x8 720p) — the flat batch keeps the
    conv/resize ops in their natural layout.  Tracking/DSP stay
    per-stream (the holdover scan is the only cross-frame state and never
    crosses a stream boundary)."""
    if detector is not None:
        S, T, H, W, _ = frames.shape
        boxes_f, valid_f = detector(frames.reshape(S * T, H, W, 3))
        boxes_sk = boxes_f.reshape(S, T, 4)
        valid_sk = valid_f.reshape(S, T)
    else:
        boxes_sk = valid_sk = None

    def one(fr, bx, vl):
        T, H, W, _ = fr.shape
        if detector is not None:
            boxes, valid = bx, vl
        else:
            boxes, valid = skin_detector.detect_faces(fr, det)
        track = vroi.holdover(boxes, valid, cfg.roi.landmark_hold_frames)
        rois = vroi.cheek_roi(track.box, cfg.roi, W, H)
        rois = jnp.where(track.valid[:, None], rois, 0)
        means, _ = vreduce.roi_channel_means(fr, rois)
        # Forward-fill over dropout frames before windowing so the XLA and
        # fused paths are numerically comparable (and match the offline
        # measure_green_avg convention) — raw zeros on invalid frames would
        # otherwise leak into the FFT windows.
        green = _ffill(means[:, cfg.channel], track.valid)
        rolling = vwin.rolling_bpm_fft(
            green, fps, cfg.band, cfg.window_len(fps),
            cfg.acquisition_len(fps))
        ok = jnp.logical_and(rolling.valid, track.valid)
        return rolling.bpm, ok, green

    if detector is not None:
        return jax.vmap(one)(frames, boxes_sk, valid_sk)
    return jax.vmap(lambda fr: one(fr, None, None))(frames)


def _ffill(x, ok):
    """Carry the last valid sample forward over dropouts (per stream) —
    the shared primitive, zero init (masked out downstream)."""
    from ..dsp.filters import forward_fill
    return forward_fill(x, ok, init="zeros")


def _single_stream_fused(frames, fps: float, cfg: PipelineConfig,
                         det: skin_detector.SkinDetectorConfig,
                         detect_row_pool: int, gate_margin,
                         interpret: bool):
    """Fused-kernel shard body: one ``(S_local*T,)`` kernel launch covers
    every stream in the shard (``seq_len=T`` resets tracking at stream
    boundaries), replacing the detector pass + masked ROI reduction with a
    single HBM read per frame.  ``det.downsample`` is ignored here —
    ``detect_row_pool`` is the fused kernel's resolution knob."""
    from ..ops.pallas_fused import fused_detect_roi_pallas

    S, T, H, W, _ = frames.shape
    res = fused_detect_roi_pallas(
        frames.reshape(S * T, H, W, 3), det=det, roi=cfg.roi, seq_len=T,
        detect_row_pool=detect_row_pool, gate_margin=gate_margin,
        interpret=interpret)
    means = res.means.reshape(S, T, 3)
    valid = res.roi_valid.reshape(S, T)
    green = jax.vmap(_ffill)(means[..., cfg.channel], valid)
    rolling = jax.vmap(functools.partial(
        vwin.rolling_bpm_fft, fps=fps, band=cfg.band,
        window_len=cfg.window_len(fps),
        acquisition_len=cfg.acquisition_len(fps)))(green)
    ok = jnp.logical_and(rolling.valid, valid)
    return rolling.bpm, ok, green


def multistream_green_bpm(frames: jnp.ndarray, fps: float,
                          mesh: Mesh,
                          cfg: PipelineConfig = PipelineConfig(),
                          det: skin_detector.SkinDetectorConfig = None,
                          use_fused: bool = False,
                          detect_row_pool: int = 1,
                          gate_margin=None,
                          detector=None) -> MultiStreamResult:
    """Run the green-channel pipeline for ``(streams, T, H, W, 3)`` frames
    sharded over the mesh's ``stream`` axis.

    Each chip independently processes ``streams / n_chips`` subjects — the
    embarrassingly-parallel layout; ``shard_map`` keeps XLA from gathering
    the video tensor anywhere.  ``det`` tunes detection (e.g.
    ``downsample=4`` strided sampling for many-stream 720p monitoring).

    ``use_fused=True`` runs each shard through the single-HBM-pass Pallas
    kernel instead (one launch per shard covering all its streams via
    ``seq_len``); ``detect_row_pool`` / ``gate_margin`` are its resolution
    and gating knobs (``vhr_tpu.ops.pallas_fused``).  Requires
    ``H % 8 == 0`` and ``W*3 % 128 == 0``.

    ``detector`` swaps the per-stream face stage for any pipeline detector
    callable (e.g. :func:`vhr_tpu.models.mediapipe_face
    .make_mediapipe_detector` — the production weights then run
    data-parallel across the mesh, weights replicated per chip).
    """
    det = det or skin_detector.SkinDetectorConfig()
    spec = P("stream")
    if use_fused:
        if detector is not None:
            raise ValueError("use_fused=True embeds its own detection; "
                             "pass detector=None")
        fn = functools.partial(
            _single_stream_fused, fps=fps, cfg=cfg, det=det,
            detect_row_pool=detect_row_pool, gate_margin=gate_margin,
            interpret=jax.default_backend() != "tpu")
        mapped = shard_map(
            fn, mesh=mesh,
            in_specs=(spec,),
            out_specs=(spec, spec, spec),
            check_vma=False,
        )
        bpm, valid, green = mapped(frames)
    else:
        fn = functools.partial(_single_stream, fps=fps, cfg=cfg, det=det)
        # detector weights (a Partial pytree, e.g. the MediaPipe port)
        # enter as replicated shard_map inputs — traced arguments, never
        # baked XLA literals.
        mapped = shard_map(
            fn, mesh=mesh,
            in_specs=(spec, P()),
            out_specs=(spec, spec, spec),
            check_vma=False,
        )
        bpm, valid, green = mapped(frames, detector)
    return MultiStreamResult(bpm=bpm, valid=valid, green=green)
