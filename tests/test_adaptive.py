"""Adaptive per-window method selection (SNR-ranked green/CHROM/POS/OMIT)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vhr_tpu.config import PipelineConfig
from vhr_tpu.dsp.spectral import band_snr
from vhr_tpu.pipeline import offline
from vhr_tpu.utils.synth import SynthSpec, synthesize


def _band():
    return PipelineConfig().band


def _bvp_traces(T=900, fps=30.0, bpm=75.0, flicker_bpm=None,
                flicker_amp=0.0, noise=0.0, seed=0):
    """Skin-reflection BGR means, as in test_projections.py: pulsatile
    absorption strongest in G; optional common-mode intensity flicker."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fps
    p = np.sin(2 * np.pi * (bpm / 60.0) * t)
    i = np.ones(T)
    if flicker_bpm is not None:
        i = i + flicker_amp * np.sin(2 * np.pi * (flicker_bpm / 60.0) * t)
    r = 180.0 * i * (1.0 + 0.004 * p)
    g = 135.0 * i * (1.0 + 0.010 * p)
    b = 105.0 * i * (1.0 + 0.006 * p)
    bgr = np.stack([b, g, r], axis=1) + rng.normal(0, noise, (T, 3))
    return jnp.asarray(bgr, jnp.float32)


def test_band_snr_ranks_clean_over_noisy():
    fps, T = 30.0, 300
    t = np.arange(T) / fps
    clean = np.sin(2 * np.pi * 1.25 * t)
    rng = np.random.default_rng(0)
    noisy = clean + 3.0 * rng.normal(size=T)
    band = _band()
    s_clean = float(band_snr(jnp.asarray(clean, jnp.float32), fps, band))
    s_noisy = float(band_snr(jnp.asarray(noisy, jnp.float32), fps, band))
    assert s_clean > 10.0 * s_noisy
    # Batched over leading axes.
    both = jnp.asarray(np.stack([clean, noisy]), jnp.float32)
    s = np.asarray(band_snr(both, fps, band))
    assert s.shape == (2,) and s[0] > s[1]


def test_adaptive_select_prefers_projection_under_flicker():
    """In-band common-mode flicker fools the green mean (it locks to the
    flicker frequency) but not the chrominance projections; the SNR ranking
    must route steady-state estimates away from green."""
    fps = 30.0
    bgr = _bvp_traces(bpm=72.0, flicker_bpm=120.0, flicker_amp=0.2,
                      noise=0.05)
    valid = jnp.ones(bgr.shape[0], bool)
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    bpm, ok, choice, snr = offline.adaptive_pulse_select(bgr, valid, fps, cfg)
    W = cfg.window_len(fps)
    bpm = np.asarray(bpm)[W:]
    ok = np.asarray(ok)[W:]
    choice = np.asarray(choice)[W:]
    assert ok.all()
    assert (choice != 0).mean() > 0.9          # green de-selected
    assert abs(np.median(bpm) - 72.0) <= 3.0   # pulse, not flicker
    assert np.asarray(snr).shape[0] == 4


def test_adaptive_select_green_competitive_when_clean():
    """On a clean trace every candidate carries the pulse; whatever wins
    the SNR race must still produce the right BPM on every steady frame."""
    fps = 30.0
    bgr = _bvp_traces(bpm=66.0, noise=0.02)
    valid = jnp.ones(bgr.shape[0], bool)
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    bpm, ok, choice, _ = offline.adaptive_pulse_select(bgr, valid, fps, cfg)
    W = cfg.window_len(fps)
    assert np.asarray(ok)[W:].all()
    err = np.abs(np.asarray(bpm)[W:] - 66.0)
    assert np.median(err) <= 3.0
    # Ramp frames fall back to methods[0] (green) by construction.
    A = cfg.acquisition_len(fps)
    assert (np.asarray(choice)[A - 1:W - 1] == 0).all()


def test_measure_adaptive_pipeline():
    clip = synthesize(SynthSpec(duration_s=16.0, bpm=78.0, height=48,
                                width=64, noise_std=0.5))
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    res = offline.measure_adaptive(jnp.asarray(clip.frames), clip.fps, cfg)
    steady = slice(cfg.window_len(clip.fps), None)
    assert res.valid[steady].all()
    assert abs(float(np.median(res.bpm[steady])) - 78.0) <= 3.0
    assert res.choice.shape == res.bpm.shape
    assert res.snr.shape == (4, res.bpm.shape[0])


def test_adaptive_plugin_registered(tmp_path):
    from vhr_tpu.analysis import registry
    from vhr_tpu.io import video as vio

    assert "adaptive" in registry.measurements()
    clip = synthesize(SynthSpec(duration_s=14.0, bpm=72.0, height=48,
                                width=64, noise_std=0.5))
    path = tmp_path / "c.mp4"
    vio.write_video(clip.frames, str(path), clip.fps)
    out = registry.get_measurement("adaptive").measure(str(path))
    assert out.ndim == 2 and out.shape[1] == 2
