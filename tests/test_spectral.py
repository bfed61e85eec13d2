"""Golden tests: spectral BPM estimators vs the reference math (numpy/scipy)."""

import numpy as np
import pytest
import scipy.signal as sp
import jax.numpy as jnp

from vhr_tpu.config import BAND_ANALYSIS, BAND_VIDEO, HRBand
from vhr_tpu.dsp import spectral

FPS = 30.0
RNG = np.random.default_rng(7)


def _pulse(T, bpm, fps=FPS, noise=0.05, batch=()):
    t = np.arange(T) / fps
    x = np.sin(2 * np.pi * (bpm / 60.0) * t)
    x = x[(...,) + (None,) * len(batch)] + noise * RNG.standard_normal((T,) + batch)
    return x.astype(np.float64)


def _ref_estimate_bpm(signal, fs, band):
    """Line-for-line numpy port of analysis/utils/estimate_bpm.py:12-82."""
    X = np.asarray(signal, dtype=np.float64)
    if X.ndim == 1:
        X = X[:, None]
    N = X.shape[0]
    if N < 8:
        return None
    fft_vals = np.fft.fft(X, axis=0)
    freqs = np.fft.fftfreq(N, d=1 / fs)
    pos = freqs > 0
    freqs_pos = freqs[pos]
    mags = np.abs(fft_vals[pos, ...])
    band_mask = (freqs_pos >= band.low_hz) & (freqs_pos <= band.high_hz)
    if not np.any(band_mask):
        return None
    band_mags = mags[band_mask, :]
    peak_idx = np.argmax(band_mags, axis=0)
    peak_mag = band_mags[peak_idx, np.arange(band_mags.shape[1])]
    best = int(np.argmax(peak_mag))
    return float(freqs_pos[band_mask][peak_idx[best]]) * 60.0


def _ref_estimate_bpm_welch(signal, fps, band):
    """Port of rppg_VIDEO.py:172-235."""
    x = np.asarray(signal, dtype=np.float64)
    x = x - np.mean(x)
    nperseg = int(min(len(x), fps * 9))
    freqs, psd = sp.welch(x, fs=fps, window="hann", nperseg=nperseg,
                          noverlap=nperseg // 2, detrend="constant",
                          scaling="density", average="mean")
    mask = (freqs >= band.low_hz) & (freqs <= band.high_hz)
    if not np.any(mask):
        return None
    k = int(np.argmax(psd[mask]))
    return float(freqs[mask][k] * 60.0)


@pytest.mark.parametrize("bpm", [48.0, 72.0, 110.0, 160.0])
def test_estimate_bpm_matches_reference(bpm):
    x = _pulse(300, bpm)
    ours = spectral.estimate_bpm(jnp.asarray(x), FPS, BAND_ANALYSIS)
    ref = _ref_estimate_bpm(x, FPS, BAND_ANALYSIS)
    assert bool(ours.valid)
    assert float(ours.bpm) == pytest.approx(ref, abs=1e-9)


def test_estimate_bpm_batched():
    bpms = [55.0, 80.0, 125.0]
    xs = np.stack([_pulse(256, b) for b in bpms])
    ours = spectral.estimate_bpm(jnp.asarray(xs), FPS, BAND_ANALYSIS)
    for i, b in enumerate(bpms):
        ref = _ref_estimate_bpm(xs[i], FPS, BAND_ANALYSIS)
        assert float(ours.bpm[i]) == pytest.approx(ref, abs=1e-9)


def test_estimate_bpm_short_signal_invalid():
    x = _pulse(6, 72.0)
    ours = spectral.estimate_bpm(jnp.asarray(x), FPS, BAND_ANALYSIS)
    assert not bool(ours.valid)  # reference returns None for N < 8


def test_estimate_bpm_empty_band_invalid():
    # A band so narrow no FFT bin falls inside it (reference returns None).
    x = _pulse(16, 72.0)
    band = HRBand(1.0001, 1.0002)
    ours = spectral.estimate_bpm(jnp.asarray(x), FPS, band)
    assert not bool(ours.valid)


def test_estimate_bpm_multichannel_matches_reference():
    T = 300
    chans = np.stack([_pulse(T, 70.0), _pulse(T, 95.0) * 3.0,
                      0.2 * RNG.standard_normal(T)], axis=-1)  # (T, 3)
    ours = spectral.estimate_bpm_multichannel(
        jnp.asarray(chans), FPS, BAND_ANALYSIS)
    ref = _ref_estimate_bpm(chans, FPS, BAND_ANALYSIS)
    assert float(ours.bpm) == pytest.approx(ref, abs=1e-9)


def test_welch_psd_matches_scipy():
    x = _pulse(320, 72.0)
    nperseg = int(min(len(x), FPS * 9))
    f_ref, p_ref = sp.welch(x - x.mean(), fs=FPS, window="hann",
                            nperseg=nperseg, noverlap=nperseg // 2,
                            detrend="constant", scaling="density",
                            average="mean")
    f, p = spectral.welch_psd(jnp.asarray(x - x.mean()), FPS, nperseg)
    np.testing.assert_allclose(f, f_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-8, atol=1e-12)


def test_welch_psd_odd_nperseg_matches_scipy():
    x = _pulse(200, 100.0)
    nperseg = 61
    f_ref, p_ref = sp.welch(x, fs=FPS, window="hann", nperseg=nperseg,
                            noverlap=nperseg // 2, detrend="constant",
                            scaling="density", average="mean")
    f, p = spectral.welch_psd(jnp.asarray(x), FPS, nperseg)
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("bpm", [50.0, 72.0, 115.0])
def test_estimate_bpm_welch_matches_reference(bpm):
    x = _pulse(450, bpm)
    ours = spectral.estimate_bpm_welch(jnp.asarray(x), FPS, BAND_VIDEO)
    ref = _ref_estimate_bpm_welch(x, FPS, BAND_VIDEO)
    assert float(ours.bpm) == pytest.approx(ref, abs=1e-9)


def test_estimate_bpm_welch_batched():
    xs = np.stack([_pulse(450, 60.0), _pulse(450, 90.0)])
    ours = spectral.estimate_bpm_welch(jnp.asarray(xs), FPS, BAND_VIDEO)
    assert float(ours.bpm[0]) == pytest.approx(
        _ref_estimate_bpm_welch(xs[0], FPS, BAND_VIDEO), abs=1e-9)
    assert float(ours.bpm[1]) == pytest.approx(
        _ref_estimate_bpm_welch(xs[1], FPS, BAND_VIDEO), abs=1e-9)


def test_welch_median_average_matches_scipy():
    x = _pulse(320, 72.0, noise=0.3)
    nperseg = 90
    f_ref, p_ref = sp.welch(x, fs=FPS, window="hann", nperseg=nperseg,
                            noverlap=nperseg // 2, detrend="constant",
                            scaling="density", average="median")
    f, p = spectral.welch_psd(jnp.asarray(x), FPS, nperseg, average="median")
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-8, atol=1e-12)


def test_nyquist_bin_excluded_like_fftfreq():
    """ADVICE r1: at fs <= 2*high_hz the +Nyquist rfft bin is in-band, but
    the reference masks fftfreq where Nyquist is stored as -fs/2 (excluded).
    Build a 5 fps signal whose strongest in-rfft-band peak IS Nyquist."""
    fs, T = 5.0, 64
    t = np.arange(T) / fs
    x = (1.0 * np.cos(2 * np.pi * 2.5 * t)      # Nyquist: 150 BPM
         + 0.5 * np.sin(2 * np.pi * 1.5 * t))   # in-band:  90 BPM
    ref = _ref_estimate_bpm(x, fs, BAND_ANALYSIS)
    ours = spectral.estimate_bpm(jnp.asarray(x), fs, BAND_ANALYSIS)
    ours_mc = spectral.estimate_bpm_multichannel(jnp.asarray(x)[:, None],
                                                 fs, BAND_ANALYSIS)
    assert ref == pytest.approx(90.0, abs=2.0)   # nearest grid bin, not 150
    assert float(ours.bpm) == pytest.approx(ref, abs=1e-9)
    assert float(ours_mc.bpm) == pytest.approx(ref, abs=1e-9)
