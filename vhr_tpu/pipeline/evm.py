"""Eulerian color magnification (EVM) — the working version of the
reference's dead stub.

The reference planned but never implemented this path (broken ``bgr2yiq``
stub at ``rppg_VIDEO.py:120-124``, README mention).  Classic Wu et al. color
magnification, built TPU-first:

  uint8 BGR -> YIQ -> Gaussian pyramid (separable binomial convs, stride 2,
  MXU-friendly) -> ideal temporal bandpass on the coarsest level (one
  ``rfft``/``irfft`` over the whole time axis — no per-frame IIR state) ->
  amplify (chroma-attenuated) -> upsample -> add -> uint8 BGR.

Everything is a single jitted program over the ``(T, H, W, 3)`` tensor.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EVMConfig, HRBand
from ..ops import color

__all__ = ["gaussian_downsample", "gaussian_pyramid_level",
           "temporal_ideal_bandpass", "magnify", "magnified_pulse"]

_BINOMIAL = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_conv(x: jnp.ndarray, axis: int, stride: int) -> jnp.ndarray:
    """Binomial 5-tap filter along ``axis`` of ``(T, H, W, C)``, edge-padded."""
    k = jnp.asarray(_BINOMIAL, x.dtype)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (2, 2)
    xp = jnp.pad(x, pad, mode="edge")
    # conv via gather-free shifted adds (5 taps): cheaper to express than
    # conv_general for this tiny separable kernel, and XLA fuses the adds.
    idx = [slice(None)] * x.ndim
    out = None
    for tap in range(5):
        sl = list(idx)
        sl[axis] = slice(tap, tap + x.shape[axis])
        term = k[tap] * xp[tuple(sl)]
        out = term if out is None else out + term
    if stride > 1:
        sl = list(idx)
        sl[axis] = slice(0, None, stride)
        out = out[tuple(sl)]
    return out


def gaussian_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """One pyramid level: blur + 2x decimate in H and W of ``(T, H, W, C)``."""
    return _sep_conv(_sep_conv(x, axis=1, stride=2), axis=2, stride=2)


def gaussian_pyramid_level(x: jnp.ndarray, levels: int) -> jnp.ndarray:
    for _ in range(levels):
        x = gaussian_downsample(x)
    return x


def temporal_ideal_bandpass(x: jnp.ndarray, fps: float, band: HRBand
                            ) -> jnp.ndarray:
    """Zero out temporal-frequency content outside ``band`` (axis 0)."""
    T = x.shape[0]
    freqs = np.fft.rfftfreq(T, d=1.0 / fps)
    keep = jnp.asarray(((freqs >= band.low_hz) & (freqs <= band.high_hz))
                       .astype(np.float32))
    X = jnp.fft.rfft(x, axis=0)
    shape = (len(freqs),) + (1,) * (x.ndim - 1)
    X = X * keep.reshape(shape)
    return jnp.fft.irfft(X, n=T, axis=0).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("fps", "cfg", "use_pallas",
                                              "interpret"))
def magnify(frames: jnp.ndarray, fps: float,
            cfg: EVMConfig = EVMConfig(),
            use_pallas: bool = False,
            interpret: bool = False) -> jnp.ndarray:
    """Amplify subtle color oscillations in the EVM band.

    With ``use_pallas`` (needs ``W % 128 == 0``) both full-resolution stages
    run as fused Pallas kernels — pyramid front-end (``ops.pallas_evm``) and
    upsample-add-reconstruct back-end (``ops.pallas_evm_recon``) — so no
    full-res float tensor ever hits HBM (~108 MB -> ~24 MB traffic per 1080p
    frame incl. layout transposes).

    Args:
      frames: ``(T, H, W, 3)`` uint8 BGR.
    Returns:
      magnified ``(T, H, W, 3)`` uint8 BGR.
    """
    T, H, W, _ = frames.shape
    gains = jnp.asarray([cfg.amplification,
                         cfg.amplification * cfg.attenuate_chroma,
                         cfg.amplification * cfg.attenuate_chroma],
                        jnp.float32)
    if use_pallas and W % 128 == 0 and cfg.pyramid_levels >= 1:
        from ..ops.pallas_evm import to_planar, yiq_pyrdown_pallas
        from ..ops.pallas_evm_recon import evm_reconstruct_pallas

        low = jnp.moveaxis(yiq_pyrdown_pallas(frames, interpret=interpret),
                           1, -1)                       # (T, H/2, W/2, 3)
        low = gaussian_pyramid_level(low, cfg.pyramid_levels - 1)
        band = temporal_ideal_bandpass(low, fps, cfg.band) * gains
        out = evm_reconstruct_pallas(to_planar(frames),
                                     jnp.moveaxis(band, -1, 1),
                                     interpret=interpret)
        return jnp.transpose(out, (0, 2, 3, 1))
    yiq = color.bgr_u8_to_yiq(frames)
    low = gaussian_pyramid_level(yiq, cfg.pyramid_levels)
    band = temporal_ideal_bandpass(low, fps, cfg.band)
    band = band * gains
    up = jax.image.resize(band, (T, H, W, 3), "linear")
    return color.yiq_to_bgr_u8(yiq + up)


def magnified_pulse(frames: jnp.ndarray, fps: float, band: HRBand,
                    levels: int = 4, use_pallas: bool = False) -> jnp.ndarray:
    """The EVM analysis signal: spatial mean of the band-passed coarse level's
    luminance+chroma per frame, shape ``(T, 3)`` — a pulse trace that needs
    no face detection (whole-frame Eulerian pooling).

    With ``use_pallas`` the first pyramid level runs as the fused Pallas
    front-end (``vhr_tpu.ops.pallas_evm``): 4.1x faster than the XLA path on
    v5e at 1080p with per-rep input materialization (never materializes
    full-res float YIQ; ``bench.py bench_evm``, BENCH_DETAIL.json evm row).
    """
    W = frames.shape[2]
    if use_pallas and W % 128 == 0 and levels >= 1:
        from ..ops.pallas_evm import yiq_pyrdown_pallas
        low = jnp.moveaxis(yiq_pyrdown_pallas(frames), 1, -1)
        low = gaussian_pyramid_level(low, levels - 1)
    else:
        yiq = color.bgr_u8_to_yiq(frames)
        low = gaussian_pyramid_level(yiq, levels)
    bp = temporal_ideal_bandpass(low, fps, band)
    return jnp.mean(bp, axis=(1, 2))
