"""CHROM measurement plugin: chrominance-projected pulse -> rolling BPM.

Beyond the reference's method set (its ``analysis/measurement/`` ships
green_avg/ica/psd variants only): CHROM (de Haan & Jeanne 2013) projects
the RGB means onto chrominance axes that cancel common-mode intensity
changes.  Same sweep contract as ``green_avg.py:11-52`` (30 s window,
10 s acquisition, (N, 2) result).
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
    ts, bpm, valid = offline.measure_projection(
        jnp.asarray(frames), fps, "chrom", cfg,
        detector=context.current_detector(),
        detect_every=context.current_detect_every())
    return offline.to_measurement_array(ts, bpm, valid)
