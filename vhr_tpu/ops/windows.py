"""Sliding-window BPM estimation over a whole signal at once.

The reference recomputes its estimate from a ``deque`` *every frame*
(``analysis/measurement/green_avg.py:32-50``): after ``acquisition_len``
samples it FFTs the deque contents (length grows from A to the 30 s window
W, then slides).  Per-frame recompute is O(T*W) serialized Python; here the
same per-frame results come from two fixed-shape batched programs:

* **ramp** (deque still filling, lengths A..W-1): every window starts at
  sample 0, so an explicit masked DFT over the shared prefix evaluates all
  growing-length spectra exactly — including each length's own frequency
  grid, matching ``np.fft.fft`` bin-for-bin;
* **steady** (length W): one gather into ``(T-W+1, W)`` windows and one
  batched rfft peak pick.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HRBand
from ..dsp import spectral

__all__ = ["sliding_windows", "RollingBPM", "rolling_bpm_fft",
           "rolling_bpm_welch", "rolling_bpm", "rolling_band_snr"]


def sliding_windows(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """All length-``length`` sliding windows of ``(T, ...)`` -> ``(T-L+1, L, ...)``."""
    T = x.shape[0]
    starts = np.arange(T - length + 1)
    idx = starts[:, None] + np.arange(length)[None, :]
    return x[idx]


class RollingBPM(NamedTuple):
    bpm: jnp.ndarray     # (T,) per-frame estimate (0 where invalid)
    valid: jnp.ndarray   # (T,) bool — False during acquisition / empty band


def _ramp_bpm(x: jnp.ndarray, fps: float, band: HRBand,
              lengths: np.ndarray, chunk: int = 64) -> tuple:
    """Exact DFT peak for growing windows ``x[:N]`` for each N in lengths."""
    w_max = int(lengths.max())
    xs = x[:w_max]
    dt = x.dtype
    n = jnp.arange(w_max, dtype=dt)
    k_max = int(np.floor(band.high_hz * w_max / fps))
    k = jnp.arange(k_max + 1, dtype=dt)

    def one(N_f):
        N = N_f.astype(dt)
        keep = n < N
        mean = jnp.sum(jnp.where(keep, xs, 0.0)) / N
        xm = jnp.where(keep, xs - mean, 0.0)
        ang = (-2.0 * jnp.pi / N) * k[:, None] * n[None, :]
        re = jnp.sum(jnp.cos(ang) * xm, axis=-1)
        im = jnp.sum(jnp.sin(ang) * xm, axis=-1)
        mag = jnp.sqrt(re * re + im * im)
        freq = k * (fps / N)
        # Positive-frequency band, mirroring np.fft.fftfreq's sign convention
        # (for even N the k = N/2 bin is *negative*, hence excluded).
        half = jnp.floor((N - 1.0) / 2.0)
        mask = ((freq >= band.low_hz) & (freq <= band.high_hz)
                & (k >= 1.0) & (k <= half))
        neg = jnp.asarray(-jnp.inf, mag.dtype)
        banded = jnp.where(mask, mag, neg)
        idx = jnp.argmax(banded)
        return freq[idx] * 60.0, jnp.any(mask)

    Ns = jnp.asarray(lengths, dtype=jnp.int32)
    bpm, valid = jax.lax.map(one, Ns, batch_size=min(chunk, len(lengths)))
    return bpm, valid


def rolling_bpm_fft(signal: jnp.ndarray, fps: float, band: HRBand,
                    window_len: int, acquisition_len: int) -> RollingBPM:
    """Per-frame FFT-peak BPM with deque semantics.

    Frame ``i`` sees ``signal[max(0, i-window_len+1) : i+1]`` demeaned, and
    produces an estimate once at least ``acquisition_len`` samples exist —
    exactly the reference's rolling deque + ``estimate_bpm``
    (``green_avg.py:24-50`` with ``estimate_bpm.py:12-82``).
    """
    T = signal.shape[0]
    x = (signal if jnp.issubdtype(signal.dtype, jnp.floating)
         else signal.astype(jnp.float32))
    bpm = jnp.zeros((T,), x.dtype)
    valid = jnp.zeros((T,), bool)

    first = acquisition_len - 1
    if first >= T:
        return RollingBPM(bpm, valid)

    # Ramp: frames first .. min(window_len-1, T)-1 (deque length < window).
    ramp_end = min(window_len - 1, T - 1)
    if ramp_end >= first:
        lengths = np.arange(first + 1, ramp_end + 2)
        r_bpm, r_valid = _ramp_bpm(x, fps, band, lengths)
        # estimate_bpm returns None for N < 8 (estimate_bpm.py:31).
        r_valid = jnp.logical_and(r_valid, jnp.asarray(lengths >= 8))
        bpm = bpm.at[first:ramp_end + 1].set(r_bpm)
        valid = valid.at[first:ramp_end + 1].set(r_valid)

    # Steady: frames window_len-1 .. T-1 (full-length windows).
    if T >= window_len:
        wins = sliding_windows(x, window_len)              # (T-W+1, W)
        wins = wins - jnp.mean(wins, axis=-1, keepdims=True)
        est = spectral.estimate_bpm(wins, fps, band)
        ok = jnp.logical_and(est.valid, window_len >= 8)
        bpm = bpm.at[window_len - 1:].set(est.bpm)
        valid = valid.at[window_len - 1:].set(ok)

    return RollingBPM(bpm=bpm, valid=valid)


def rolling_bpm_welch(signal: jnp.ndarray, fps: float, band: HRBand,
                      window_len: int,
                      segment_seconds: float = 9.0) -> RollingBPM:
    """Per-frame Welch-PSD BPM over full-length sliding windows.

    The Welch companion of :func:`rolling_bpm_fft` (the reference's apps run
    Welch over their deque, ``rppg_VIDEO.py:407-409``).  Welch's segment
    framing needs the full window, so frames before ``window_len - 1`` are
    invalid (no variable-``nperseg`` ramp; fixed shapes keep one compile).
    """
    T = signal.shape[0]
    x = (signal if jnp.issubdtype(signal.dtype, jnp.floating)
         else signal.astype(jnp.float32))
    bpm = jnp.zeros((T,), x.dtype)
    valid = jnp.zeros((T,), bool)
    if T >= window_len:
        wins = sliding_windows(x, window_len)
        est = spectral.estimate_bpm_welch(wins, fps, band, segment_seconds)
        bpm = bpm.at[window_len - 1:].set(est.bpm)
        valid = valid.at[window_len - 1:].set(est.valid)
    return RollingBPM(bpm=bpm, valid=valid)


def rolling_band_snr(signal: jnp.ndarray, fps: float, band: HRBand,
                     window_len: int,
                     target_bpm=None) -> jnp.ndarray:
    """Per-frame in-band SNR over full-length sliding windows -> ``(T,)``.

    The rolling companion of :func:`vhr_tpu.dsp.spectral.band_snr`: frame
    ``i >= window_len - 1`` scores ``signal[i-W+1 : i+1]`` (at its own
    dominant bin, or at ``target_bpm[i]`` when a per-frame hypothesis is
    given); earlier (ramp) frames get ``-inf`` — the adaptive selector
    treats "no full window yet" as "no quality information" and falls back
    to its first-listed method.
    """
    T = signal.shape[0]
    x = (signal if jnp.issubdtype(signal.dtype, jnp.floating)
         else signal.astype(jnp.float32))
    out = jnp.full((T,), -jnp.inf, x.dtype)
    if T >= window_len:
        wins = sliding_windows(x, window_len)               # (T-W+1, W)
        tgt = None if target_bpm is None else target_bpm[window_len - 1:]
        out = out.at[window_len - 1:].set(
            spectral.band_snr(wins, fps, band, target_bpm=tgt))
    return out


def rolling_bpm(signal: jnp.ndarray, fps: float, band: HRBand,
                window_len: int, acquisition_len: int,
                estimator: str = "fft",
                segment_seconds: float = 9.0) -> RollingBPM:
    """Dispatch on ``PipelineConfig.estimator``: ``"fft"`` | ``"welch"``."""
    if estimator == "fft":
        return rolling_bpm_fft(signal, fps, band, window_len, acquisition_len)
    if estimator == "welch":
        return rolling_bpm_welch(signal, fps, band, window_len,
                                 segment_seconds)
    raise ValueError(f"unknown estimator {estimator!r} (fft | welch)")
