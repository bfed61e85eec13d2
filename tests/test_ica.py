"""Golden tests: JAX FastICA vs sklearn on the reference's exact configuration."""

import numpy as np
import pytest
import jax.numpy as jnp

from vhr_tpu.config import BAND_ANALYSIS
from vhr_tpu.dsp import ica, spectral

FPS = 30.0
RNG = np.random.default_rng(3)


def _mixed_window(T=300, bpm=72.0):
    """Synthetic 3-channel BGR-mean-like window: pulse + drift + noise mix."""
    t = np.arange(T) / FPS
    pulse = np.sin(2 * np.pi * (bpm / 60.0) * t)
    drift = 0.7 * np.sin(2 * np.pi * 0.15 * t)
    noise = RNG.standard_normal(T)
    S = np.stack([pulse, drift, noise], axis=1)          # (T, 3)
    A = np.array([[0.6, 0.3, 0.05],
                  [1.0, 0.2, 0.05],
                  [0.4, 0.5, 0.05]])
    X = S @ A.T
    # Reference std-normalizes channels before ICA (ica.py:59-61, ddof=1).
    std = np.std(X, axis=0, ddof=1)
    return (X / std).astype(np.float64)


def _sklearn_sources(X):
    from sklearn.decomposition import FastICA
    import warnings
    m = FastICA(n_components=3, algorithm="parallel", fun="logcosh",
                max_iter=300, tol=1e-6, whiten="unit-variance",
                random_state=0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        S = m.fit_transform(X)
        converged = not any("onverge" in str(wi.message) for wi in w)
    return S, converged, m.n_iter_


def test_fastica_matches_sklearn_sources():
    X = _mixed_window()
    S_ref, conv_ref, n_iter_ref = _sklearn_sources(X)
    res = ica.fastica(jnp.asarray(X), ica.default_w_init(3, seed=0))
    assert bool(res.converged) == conv_ref
    S = np.asarray(res.sources)
    # Components must match up to sign (same w_init => same order).
    for c in range(3):
        err_pos = np.max(np.abs(S[:, c] - S_ref[:, c]))
        err_neg = np.max(np.abs(S[:, c] + S_ref[:, c]))
        assert min(err_pos, err_neg) < 1e-5, f"component {c} mismatch"


def test_fastica_iteration_count_close_to_sklearn():
    X = _mixed_window()
    _, _, n_iter_ref = _sklearn_sources(X)
    res = ica.fastica(jnp.asarray(X), ica.default_w_init(3, seed=0))
    assert abs(int(res.n_iter) - n_iter_ref) <= 2


def test_fastica_recovers_pulse_bpm():
    """End goal: the ICA method's BPM comes out right on the mixed window."""
    X = _mixed_window(bpm=84.0)
    res = ica.fastica(jnp.asarray(X), ica.default_w_init(3, seed=0))
    est = spectral.estimate_bpm_multichannel(res.sources, FPS, BAND_ANALYSIS)
    # FFT bin resolution at T=300, fps=30 is 6 BPM.
    assert abs(float(est.bpm) - 84.0) <= 6.0


def test_ica_sources_batched():
    windows = np.stack([_mixed_window(bpm=66.0), _mixed_window(bpm=102.0)])
    res = ica.ica_sources(jnp.asarray(windows), ica.default_w_init(3, seed=0))
    assert res.sources.shape == (2, 300, 3)
    assert res.converged.shape == (2,)
    est = spectral.estimate_bpm_multichannel(res.sources, FPS, BAND_ANALYSIS)
    assert abs(float(est.bpm[0]) - 66.0) <= 6.0
    assert abs(float(est.bpm[1]) - 102.0) <= 6.0
