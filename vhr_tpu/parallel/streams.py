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


def _single_stream(frames, fps: float, cfg: PipelineConfig,
                   det: skin_detector.SkinDetectorConfig):
    """Per-shard pipeline body: (S_local, T, H, W, 3) -> per-frame BPM."""
    def one(fr):
        T, H, W, _ = fr.shape
        boxes, valid = skin_detector.detect_faces(fr, det)
        track = vroi.holdover(boxes, valid, cfg.roi.landmark_hold_frames)
        rois = vroi.cheek_roi(track.box, cfg.roi, W, H)
        rois = jnp.where(track.valid[:, None], rois, 0)
        means, _ = vreduce.roi_channel_means(fr, rois)
        green = means[:, cfg.channel]
        rolling = vwin.rolling_bpm_fft(
            green, fps, cfg.band, cfg.window_len(fps),
            cfg.acquisition_len(fps))
        ok = jnp.logical_and(rolling.valid, track.valid)
        return rolling.bpm, ok, green
    return jax.vmap(one)(frames)


def multistream_green_bpm(frames: jnp.ndarray, fps: float,
                          mesh: Mesh,
                          cfg: PipelineConfig = PipelineConfig(),
                          det: skin_detector.SkinDetectorConfig = None
                          ) -> MultiStreamResult:
    """Run the green-channel pipeline for ``(streams, T, H, W, 3)`` frames
    sharded over the mesh's ``stream`` axis.

    Each chip independently processes ``streams / n_chips`` subjects — the
    embarrassingly-parallel layout; ``shard_map`` keeps XLA from gathering
    the video tensor anywhere.  ``det`` tunes detection (e.g.
    ``downsample=4`` strided sampling for many-stream 720p monitoring).
    """
    det = det or skin_detector.SkinDetectorConfig()
    fn = functools.partial(_single_stream, fps=fps, cfg=cfg, det=det)
    spec = P("stream")
    mapped = shard_map(
        fn, mesh=mesh,
        in_specs=(spec,),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    bpm, valid, green = mapped(frames)
    return MultiStreamResult(bpm=bpm, valid=valid, green=green)
