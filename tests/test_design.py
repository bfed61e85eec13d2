"""Golden tests: first-party filter design vs scipy.signal.

The designs under test are exactly the ones the reference uses:
Butterworth order 2 (rppg_VIDEO.py:402), Chebyshev-II order 4 / 40 dB
(rppg_VIDEO.py:403), FIR 41 taps Hamming (rppg_VIDEO.py:404), Butterworth
order 4 for the livestream (rppg_LIVESTREAM.py:294-300).
"""

import numpy as np
import pytest
import scipy.signal as sp

from vhr_tpu.dsp import design

FPS = 30.0


def _norm(lo_hz, hi_hz, fps=FPS):
    nyq = 0.5 * fps
    return lo_hz / nyq, hi_hz / nyq


def _freq_response_sos(sos, n=512):
    w = np.linspace(1e-3, np.pi - 1e-3, n)
    z = np.exp(1j * w)
    h = np.ones_like(z)
    for s in sos:
        h *= (s[0] + s[1] / z + s[2] / z**2) / (s[3] + s[4] / z + s[5] / z**2)
    return w, h


CASES = [
    ("butter2_video", lambda lo, hi: design.butter_bandpass_sos(2, lo, hi),
     lambda lo, hi: sp.butter(2, [lo, hi], btype="band", output="sos"), (0.7, 2.0)),
    ("butter4_live", lambda lo, hi: design.butter_bandpass_sos(4, lo, hi),
     lambda lo, hi: sp.butter(4, [lo, hi], btype="band", output="sos"),
     (40 / 60, 150 / 60)),
    ("cheby2_video", lambda lo, hi: design.cheby2_bandpass_sos(4, 40.0, lo, hi),
     lambda lo, hi: sp.cheby2(4, 40.0, [lo, hi], btype="band", output="sos"),
     (0.7, 2.0)),
]


@pytest.mark.parametrize("name,ours,ref,band_hz", CASES)
def test_sos_transfer_function_matches_scipy(name, ours, ref, band_hz):
    lo, hi = _norm(*band_hz)
    sos_ours = ours(lo, hi)
    sos_ref = ref(lo, hi)
    assert sos_ours.shape == sos_ref.shape
    _, h_ours = _freq_response_sos(sos_ours)
    _, h_ref = _freq_response_sos(sos_ref)
    np.testing.assert_allclose(np.abs(h_ours), np.abs(h_ref),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.angle(h_ours * np.conj(h_ref)),
                               0.0, atol=1e-6)


@pytest.mark.parametrize("name,ours,ref,band_hz", CASES)
def test_sos_sections_match_scipy(name, ours, ref, band_hz):
    """Section-by-section match (same pairing as scipy for these designs)."""
    lo, hi = _norm(*band_hz)
    sos_ours = ours(lo, hi)
    sos_ref = ref(lo, hi)
    # Compare as sets of sections: normalize each row by its a0 and sort.
    def canon(sos):
        rows = sos / sos[:, 3:4]
        return rows[np.lexsort(rows.T[::-1])]
    np.testing.assert_allclose(canon(sos_ours), canon(sos_ref),
                               rtol=1e-6, atol=1e-9)


def test_firwin_matches_scipy():
    lo, hi = _norm(0.7, 2.0)
    ours = design.firwin_bandpass(41, lo, hi)
    ref = sp.firwin(41, [lo, hi], pass_zero=False, window="hamming")
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_lfilter_zi_matches_scipy():
    lo, hi = _norm(0.7, 2.0)
    b = design.firwin_bandpass(41, lo, hi)
    np.testing.assert_allclose(design.lfilter_zi(b, [1.0]),
                               sp.lfilter_zi(b, [1.0]), rtol=1e-8, atol=1e-12)
    sos = design.butter_bandpass_sos(2, lo, hi)
    for s in range(sos.shape[0]):
        np.testing.assert_allclose(
            design.lfilter_zi(sos[s, :3], sos[s, 3:]),
            sp.lfilter_zi(sos[s, :3], sos[s, 3:]), rtol=1e-8, atol=1e-12)


def test_sosfilt_zi_matches_scipy():
    lo, hi = _norm(40 / 60, 200 / 60)
    for sos in [design.butter_bandpass_sos(2, lo, hi),
                design.cheby2_bandpass_sos(4, 40.0, lo, hi)]:
        np.testing.assert_allclose(design.sosfilt_zi(sos),
                                   sp.sosfilt_zi(sos), rtol=1e-7, atol=1e-10)


def test_padlen_matches_scipy_defaults():
    lo, hi = _norm(0.7, 2.0)
    sos = design.butter_bandpass_sos(2, lo, hi)
    # scipy sosfiltfilt default padlen for this design
    ntaps = 2 * sos.shape[0] + 1
    ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
    assert design.sosfiltfilt_padlen(sos) == 3 * ntaps
    b = design.firwin_bandpass(41, lo, hi)
    assert design.filtfilt_padlen(b, [1.0]) == 3 * 41
