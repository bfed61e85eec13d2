"""CHROM / POS / OMIT chrominance projections: pulse recovery + motion rejection."""

import numpy as np
import pytest
import jax.numpy as jnp

from vhr_tpu.dsp.projections import chrom_pulse, omit_pulse, pos_pulse
from vhr_tpu.config import PipelineConfig
from vhr_tpu.pipeline import offline
from vhr_tpu.utils.synth import SynthSpec, synthesize


def _bvp_traces(T=900, fps=30.0, bpm=75.0, flicker_bpm=None,
                flicker_amp=0.0, noise=0.0, seed=0):
    """Skin-reflection-model BGR means: pulsatile absorption strongest in
    G, weaker in B/R; optional COMMON-MODE intensity flicker (the artifact
    CHROM/POS are built to cancel) and white noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(T) / fps
    p = np.sin(2 * np.pi * (bpm / 60.0) * t)
    i = np.ones(T)
    if flicker_bpm is not None:
        i = i + flicker_amp * np.sin(2 * np.pi * (flicker_bpm / 60.0) * t)
    # Stationary skin tone * intensity, pulse modulating absorption.
    r = 180.0 * i * (1.0 + 0.004 * p)
    g = 135.0 * i * (1.0 + 0.010 * p)
    b = 105.0 * i * (1.0 + 0.006 * p)
    bgr = np.stack([b, g, r], axis=1) + rng.normal(0, noise, (T, 3))
    return jnp.asarray(bgr, jnp.float32), t


def _peak_bpm(x, fps=30.0):
    x = np.asarray(x, np.float64)
    x = x - x.mean()
    F = np.abs(np.fft.rfft(x))
    fr = np.fft.rfftfreq(len(x), 1.0 / fps) * 60.0
    band = (fr >= 40) & (fr <= 200)
    return fr[band][np.argmax(F[band])]


@pytest.mark.parametrize("fn", [chrom_pulse, pos_pulse, omit_pulse])
def test_projection_recovers_clean_pulse(fn):
    bgr, _ = _bvp_traces(bpm=75.0, noise=0.05)
    valid = jnp.ones(bgr.shape[0], bool)
    pulse = fn(bgr, valid, 30.0)
    assert abs(_peak_bpm(pulse) - 75.0) <= 2.5


@pytest.mark.parametrize("fn", [chrom_pulse, pos_pulse, omit_pulse])
def test_projection_rejects_common_mode_flicker(fn):
    """An in-band intensity flicker 20x stronger than the pulse dominates
    the raw green trace but not the chrominance projections — the defining
    property of CHROM/POS vs the reference's green_avg."""
    bgr, _ = _bvp_traces(bpm=72.0, flicker_bpm=120.0, flicker_amp=0.2,
                         noise=0.05)
    valid = jnp.ones(bgr.shape[0], bool)
    assert abs(_peak_bpm(np.asarray(bgr[:, 1])) - 120.0) <= 2.5  # green fooled
    pulse = fn(bgr, valid, 30.0)
    assert abs(_peak_bpm(pulse) - 72.0) <= 2.5                   # proj robust


@pytest.mark.parametrize("fn", [chrom_pulse, pos_pulse, omit_pulse])
def test_projection_handles_dropouts(fn):
    bgr, _ = _bvp_traces(bpm=66.0, noise=0.05)
    valid = np.ones(bgr.shape[0], bool)
    valid[100:115] = False                 # detection dropout: ffilled
    pulse = fn(bgr, jnp.asarray(valid), 30.0)
    assert abs(_peak_bpm(pulse) - 66.0) <= 2.5
    assert np.isfinite(np.asarray(pulse)).all()


@pytest.mark.parametrize("method", ["chrom", "pos", "omit"])
def test_measure_projection_pipeline(method):
    """Full pipeline: synthetic face video -> detector -> projection ->
    rolling BPM."""
    clip = synthesize(SynthSpec(duration_s=16.0, bpm=78.0, height=48,
                                width=64, noise_std=0.5))
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    ts, bpm, ok = offline.measure_projection(jnp.asarray(clip.frames),
                                             clip.fps, method, cfg)
    steady = slice(cfg.window_len(clip.fps), None)
    assert ok[steady].all()
    assert abs(float(np.median(bpm[steady])) - 78.0) <= 3.0


def test_projection_plugins_registered(tmp_path):
    from vhr_tpu.analysis import registry
    from vhr_tpu.io import video as vio

    assert "chrom" in registry.measurements()
    assert "pos" in registry.measurements()
    assert "omit" in registry.measurements()
    clip = synthesize(SynthSpec(duration_s=14.0, bpm=72.0, height=48,
                                width=64, noise_std=0.5))
    path = tmp_path / "c.mp4"
    vio.write_video(clip.frames, str(path), clip.fps)
    mod = registry.get_measurement("pos")
    out = mod.measure(str(path))
    assert out.ndim == 2 and out.shape[1] == 2
