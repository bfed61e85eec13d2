"""Adaptive measurement plugin: per-window SNR-ranked method selection.

Beyond the reference's fixed-method sweeps (``analysis/main.py:79-81``
runs one method per pass): each rolling window's BPM comes from whichever
pulse construction — raw green mean or the CHROM/POS/OMIT chrominance
projections — scores the highest in-band spectral SNR on that window.
Same sweep contract as ``green_avg.py:11-52``.
"""

from __future__ import annotations

import numpy as np

from ...config import PipelineConfig
from ...io import video as vio
from ...pipeline import offline

WINDOW_SIZE = 30.0
ACQUISITION_TIME = 10.0


def measure(video_path: str) -> np.ndarray:
    import jax.numpy as jnp
    frames, fps = vio.read_video(video_path)
    if frames.shape[0] == 0:
        return np.empty((0, 2))
    cfg = PipelineConfig(window_seconds=WINDOW_SIZE,
                         acquisition_seconds=ACQUISITION_TIME)
    from .. import context
    res = offline.measure_adaptive(
        jnp.asarray(frames), fps, cfg,
        detector=context.current_detector(),
        detect_every=context.current_detect_every())
    return offline.to_measurement_array(res.ts, res.bpm, res.valid)
