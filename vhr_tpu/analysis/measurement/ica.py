"""ICA measurement: blind source separation over BGR ROI means.

Contract parity with ``analysis/measurement/ica.py`` (10 s window / 5 s
acquisition, FastICA with convergence-skip, best-component FFT peak),
executed as one batched masked-FastICA program
(``vhr_tpu.pipeline.offline.measure_ica``).
"""

from __future__ import annotations

import numpy as np

from ...config import ICAConfig, PipelineConfig
from ...io import video as vio
from ...pipeline import offline


def measure(video_path: str) -> np.ndarray:
    import jax.numpy as jnp
    frames, fps = vio.read_video(video_path)
    if frames.shape[0] == 0:
        return np.empty((0, 2))
    from .. import context
    ts, bpm, valid = offline.measure_ica(
        jnp.asarray(frames), fps, PipelineConfig(), ICAConfig(),
        detector=context.current_detector(),
        detect_every=context.current_detect_every())
    return offline.to_measurement_array(ts, bpm, valid)
