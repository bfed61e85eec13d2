"""green_avg with per-stage PSD capture and an ROI-mean signal cache.

Parity surface for ``analysis/measurement/green_avg_psd_plot.py``: the same
BPM trace as ``green_avg`` plus, per window, Welch PSDs of the four
processing variants the reference compares (raw / z-scored / bandpassed /
z-scored+bandpassed, :148-208), and an ``.npy`` cache of the per-frame ROI
means keyed by video (:79-113) so the expensive detection pass runs once.
Stage PSDs are saved to ``cache/psd_stages/<stem>.npz`` for offline plotting
(``vhr_tpu.utils.psd_plot``) instead of an interactive blocking figure.

The reference's inconsistent failure return (``(bpm, psd)`` vs bare
``np.nan``, SURVEY.md §4 item 4) is replaced by validity masking throughout.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ...config import BAND_ANALYSIS, PipelineConfig
from ...dsp import design, filters, spectral
from ...io import video as vio
from ...pipeline import offline

WINDOW_SIZE = 30.0
ACQUISITION_TIME = 10.0


def _cache_dir() -> Path:
    """Read VHR_CACHE_DIR at call time (an import-time binding would pin
    the first process-wide value and ignore later env changes)."""
    return Path(os.environ.get("VHR_CACHE_DIR", "cache"))


def _cached_green(video_path: str):
    """Per-frame (green, valid, fps), cached as .npz keyed by the video
    AND the harness detector configuration (a skin-detector cache entry
    must never serve a `--detector mediapipe` sweep)."""
    import jax.numpy as jnp
    from .. import context
    key = Path(video_path).stem
    det_key = context.current_detector_name()
    if context.current_detect_every() > 1:
        det_key += f"-e{context.current_detect_every()}"
    if det_key != "skin":
        key = f"{key}.{det_key}"
    cache = _cache_dir() / "roi_mean_data" / f"{key}.npz"
    if cache.exists():
        z = np.load(cache)
        return z["green"], z["valid"], float(z["fps"])
    frames, fps = vio.read_video(video_path)
    if frames.shape[0] == 0:
        return np.zeros(0, np.float32), np.zeros(0, bool), fps
    trace = offline.extract_signals(
        jnp.asarray(frames),
        detector=context.current_detector(),
        detect_every=context.current_detect_every())
    green = np.asarray(trace.bgr[:, 1])
    valid = np.asarray(trace.valid)
    cache.parent.mkdir(parents=True, exist_ok=True)
    np.savez(cache, green=green, valid=valid, fps=fps)
    return green, valid, fps


def measure(video_path: str) -> np.ndarray:
    import jax.numpy as jnp
    from ...ops import windows as vwin

    green, valid, fps = _cached_green(video_path)
    T = green.shape[0]
    if T == 0:
        return np.empty((0, 2))
    cfg = PipelineConfig(window_seconds=WINDOW_SIZE,
                         acquisition_seconds=ACQUISITION_TIME)
    g = jnp.asarray(green)
    rolling = vwin.rolling_bpm_fft(g, fps, cfg.band, cfg.window_len(fps),
                                   cfg.acquisition_len(fps))
    ok = np.asarray(rolling.valid) & valid

    # Stage PSDs over steady-state windows (the reference's 4-variant
    # comparison), computed as one batched program and saved for replay.
    # Clips shorter than the 30 s window capture one full-length window.
    W = min(cfg.window_len(fps), T)
    if T >= W:
        wins = vwin.sliding_windows(g, W)
        raw = wins
        z = (wins - jnp.mean(wins, -1, keepdims=True)) / (
            jnp.std(wins, -1, keepdims=True) + 1e-12)
        sos = design.sos_design("butterworth", fps, cfg.band.low_hz,
                                cfg.band.high_hz, 2)
        bp = filters.sosfiltfilt(sos, wins.T).T
        zbp = filters.sosfiltfilt(sos, z.T).T
        nperseg = int(min(W, fps * 9))
        stages = {}
        for name, sig in [("raw", raw), ("zscore", z),
                          ("bandpass", bp), ("zscore_bandpass", zbp)]:
            f, p = spectral.welch_psd(
                sig - jnp.mean(sig, -1, keepdims=True), fps, nperseg)
            stages[name] = np.asarray(p)
        out = (_cache_dir() / "psd_stages"
               / f"{Path(video_path).stem}.npz")
        out.parent.mkdir(parents=True, exist_ok=True)
        np.savez(out, freqs=f, **stages)

    ts = np.arange(T) / fps
    return offline.to_measurement_array(ts, np.asarray(rolling.bpm), ok)
