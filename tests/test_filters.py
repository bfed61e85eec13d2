"""Golden tests: JAX filter application vs scipy on identical inputs."""

import numpy as np
import pytest
import scipy.signal as sp
import jax.numpy as jnp

from vhr_tpu.dsp import design, filters

FPS = 30.0
RNG = np.random.default_rng(42)


def _norm(lo_hz, hi_hz, fps=FPS):
    nyq = 0.5 * fps
    return lo_hz / nyq, hi_hz / nyq


def _signal(T=300, batch=()):
    t = np.arange(T) / FPS
    base = np.sin(2 * np.pi * 1.2 * t) + 0.3 * np.sin(2 * np.pi * 0.2 * t)
    x = base[(...,) + (None,) * len(batch)] + 0.1 * RNG.standard_normal((T,) + batch)
    return x.astype(np.float64)


@pytest.fixture(scope="module")
def sos_butter():
    lo, hi = _norm(0.7, 2.0)
    return design.butter_bandpass_sos(2, lo, hi)


@pytest.fixture(scope="module")
def sos_cheby2():
    lo, hi = _norm(0.7, 2.0)
    return design.cheby2_bandpass_sos(4, 40.0, lo, hi)


def test_sosfilt_matches_scipy(sos_butter):
    x = _signal()
    y_ref = sp.sosfilt(sos_butter, x)
    y, _ = filters.sosfilt(sos_butter, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-9, atol=1e-12)


def test_sosfilt_with_zi_matches_scipy(sos_butter):
    x = _signal()
    zi = sp.sosfilt_zi(sos_butter) * x[0]
    y_ref, zf_ref = sp.sosfilt(sos_butter, x, zi=zi)
    y, zf = filters.sosfilt(sos_butter, jnp.asarray(x), jnp.asarray(zi))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(zf), zf_ref, rtol=1e-9, atol=1e-12)


def test_sosfilt_batched(sos_butter):
    x = _signal(batch=(4, 3))
    y, _ = filters.sosfilt(sos_butter, jnp.asarray(x))
    for i in range(4):
        for j in range(3):
            np.testing.assert_allclose(
                np.asarray(y)[:, i, j], sp.sosfilt(sos_butter, x[:, i, j]),
                rtol=1e-9, atol=1e-12)


def test_sosfilt_parallel_matches_sequential(sos_cheby2):
    x = _signal(batch=(2,))
    y_seq, _ = filters.sosfilt(sos_cheby2, jnp.asarray(x))
    y_par, _ = filters.sosfilt_parallel(sos_cheby2, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_seq),
                               rtol=1e-7, atol=1e-9)


def test_sosfiltfilt_matches_scipy(sos_butter, sos_cheby2):
    x = _signal()
    for sos in [sos_butter, sos_cheby2]:
        y_ref = sp.sosfiltfilt(sos, x)
        y = filters.sosfiltfilt(sos, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8, atol=1e-10)


def test_sosfiltfilt_parallel_path(sos_butter):
    x = _signal()
    y_ref = sp.sosfiltfilt(sos_butter, x)
    y = filters.sosfiltfilt(sos_butter, jnp.asarray(x), parallel=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-6, atol=1e-8)


def test_sosfiltfilt_batched_matches_scipy_axis0(sos_butter):
    x = _signal(batch=(5,))
    y_ref = sp.sosfiltfilt(sos_butter, x, axis=0)
    y = filters.sosfiltfilt(sos_butter, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8, atol=1e-10)


def test_lfilter_matches_scipy():
    lo, hi = _norm(0.7, 2.0)
    b = design.firwin_bandpass(41, lo, hi)
    x = _signal()
    y_ref = sp.lfilter(b, [1.0], x)
    y, _ = filters.lfilter(b, [1.0], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-9, atol=1e-12)


def test_filtfilt_fir_matches_scipy():
    lo, hi = _norm(0.7, 2.0)
    b = design.firwin_bandpass(41, lo, hi)
    x = _signal()
    y_ref = sp.filtfilt(b, [1.0], x)
    y = filters.filtfilt_fir(b, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-8, atol=1e-10)


def test_stream_push_matches_scipy_sample_by_sample():
    """The live path: one-sample SOS pushes == scipy sosfilt with carried zi
    (rppg_LIVESTREAM.py:245-251)."""
    lo, hi = _norm(40 / 60, 150 / 60)
    sos = design.butter_bandpass_sos(4, lo, hi)
    x = _signal(T=100)
    z = filters.sos_stream_init(sos, dtype=jnp.float64)
    zi_ref = np.zeros((sos.shape[0], 2))
    for t in range(100):
        y, z = filters.sos_stream_push(sos, z, jnp.asarray(x[t]))
        y_ref, zi_ref = sp.sosfilt(sos, [x[t]], zi=zi_ref)
        np.testing.assert_allclose(float(y), y_ref[0], rtol=1e-9, atol=1e-12)


def test_float32_accuracy_is_sufficient(sos_butter):
    """The production dtype: float32 zero-phase output stays within 1e-4 of
    float64 scipy — far below the 0.5 BPM MAE budget."""
    x = _signal()
    y_ref = sp.sosfiltfilt(sos_butter, x)
    y = filters.sosfiltfilt(sos_butter, jnp.asarray(x, dtype=jnp.float32))
    assert np.max(np.abs(np.asarray(y) - y_ref)) < 1e-4
