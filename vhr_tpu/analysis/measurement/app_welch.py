"""App-style measurement: 10 s window, zero-phase bandpass, Welch PSD peak.

Exposes the interactive app's analysis loop (``rppg_VIDEO.py:392-415``) as a
measurement plugin so the degradation harness can sweep it too (the
reference never could — its app is UI-entangled).
"""

from __future__ import annotations

import numpy as np

from ...config import BAND_VIDEO, FilterConfig, PipelineConfig
from ...io import video as vio
from ...pipeline import offline


def measure(video_path: str) -> np.ndarray:
    import jax.numpy as jnp
    frames, fps = vio.read_video(video_path)
    if frames.shape[0] == 0:
        return np.empty((0, 2))
    cfg = PipelineConfig(window_seconds=10.0, band=BAND_VIDEO,
                         filter=FilterConfig(kind="cheby2", order=4))
    from .. import context
    ts, bpm, valid = offline.measure_app_welch(
        jnp.asarray(frames), fps, cfg,
        detector=context.current_detector(),
        detect_every=context.current_detect_every())
    return offline.to_measurement_array(ts, bpm, valid)
