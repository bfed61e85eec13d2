"""OMIT measurement plugin: QR-orthogonalized pulse -> rolling BPM.

Beyond the reference's method set: OMIT (Alvarez Casado & Bordallo Lopez,
"Face2PPG", 2023) orthogonalizes the RGB channel matrix per window and
takes the green residual after removing the dominant direction — a
data-adaptive alternative to CHROM/POS's fixed projection axes.  Same
sweep contract as ``green_avg.py:11-52``.
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
        jnp.asarray(frames), fps, "omit", cfg,
        detector=context.current_detector(),
        detect_every=context.current_detect_every())
    return offline.to_measurement_array(ts, bpm, valid)
