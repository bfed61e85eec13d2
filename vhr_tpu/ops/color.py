"""Batched colorspace conversions.

The reference's EVM path exists only as a broken stub (``bgr2yiq`` at
``rppg_VIDEO.py:120-124`` calls ``colorsys.rgb_to_yiq`` with arrays — a
TypeError if ever invoked; SURVEY.md §4 item 3).  These are the working
batched equivalents, using colorsys's exact NTSC YIQ coefficients so the
intended transform is preserved.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bgr_u8_to_yiq", "yiq_to_bgr_u8", "rgb_to_yiq", "yiq_to_rgb",
           "i420_to_bgr_flat"]

# OpenCV's ITU-R BT.601 studio-swing fixed-point constants (20-bit descale,
# modules/imgproc color_yuv: CY=1.164, CVR=1.596, CVG=-0.813, CUG=-0.391,
# CUB=2.018).  Kept as the exact integers so the device reconstruction is
# BIT-EXACT vs cv2.COLOR_YUV2BGR_I420 (pinned in tests/test_native_io.py).
_CY, _CUB, _CUG, _CVG, _CVR = 1220542, 2116026, -409993, -852492, 1673527


def i420_to_bgr_flat(chunk: jnp.ndarray, h: int, w: int,
                     w_out: int | None = None) -> jnp.ndarray:
    """Planar YUV 4:2:0 bytes -> flat interleaved BGR, on device.

    ``chunk`` is ``(n, stride)`` uint8 with the first ``h*w*3//2`` bytes of
    each row holding Y (h, w) then U, V ((h//2, w//2) each) — the layout the
    native framestore stages in ``fmt="i420"`` mode (1.5 B/px, a 4x cut in
    host->device traffic vs interleaved BGR; that link is the decode->BPM
    bottleneck on network-attached chips, BENCH_DETAIL decode_e2e).

    Chroma is replicated over each 2x2 block and the studio-swing BT.601
    matrix applied in int32 fixed point — bit-exact vs OpenCV's
    ``cv2.COLOR_YUV2BGR_I420`` (the decoder the reference's whole pipeline
    rides through, ``analysis/utils/video_io.py:19-31``).

    Returns ``(n, h, w_out*3)`` uint8 (``w_out`` defaults to ``w``; pass the
    128-lane padded width to feed the Pallas kernels directly — padding
    columns are zero, matching the BGR staging path's row padding).
    """
    n = chunk.shape[0]
    ysz, csz = h * w, (h // 2) * (w // 2)
    y = chunk[:, :ysz].reshape(n, h, w).astype(jnp.int32)
    u = chunk[:, ysz:ysz + csz].reshape(n, h // 2, w // 2).astype(jnp.int32)
    v = (chunk[:, ysz + csz:ysz + 2 * csz]
         .reshape(n, h // 2, w // 2).astype(jnp.int32))
    up = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2) - 128
    vp = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2) - 128
    yv = jnp.maximum(y - 16, 0) * _CY
    half = 1 << 19
    b = (yv + _CUB * up + half) >> 20
    g = (yv + _CUG * up + _CVG * vp + half) >> 20
    r = (yv + _CVR * vp + half) >> 20
    bgr = jnp.clip(jnp.stack([b, g, r], axis=-1), 0, 255).astype(jnp.uint8)
    if w_out is not None and w_out != w:
        bgr = jnp.pad(bgr, ((0, 0), (0, 0), (0, w_out - w), (0, 0)))
    return bgr.reshape(n, h, -1)


def rgb_to_yiq(rgb: jnp.ndarray) -> jnp.ndarray:
    """``(..., 3)`` RGB in [0,1] -> YIQ (colorsys.rgb_to_yiq coefficients)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.30 * r + 0.59 * g + 0.11 * b
    i = 0.74 * (r - y) - 0.27 * (b - y)
    q = 0.48 * (r - y) + 0.41 * (b - y)
    return jnp.stack([y, i, q], axis=-1)


def yiq_to_rgb(yiq: jnp.ndarray) -> jnp.ndarray:
    """YIQ -> RGB in [0,1] (colorsys.yiq_to_rgb coefficients + clamp)."""
    y, i, q = yiq[..., 0], yiq[..., 1], yiq[..., 2]
    r = y + 0.9468822170900693 * i + 0.6235565819861433 * q
    g = y - 0.27478764629897834 * i - 0.6356910791873801 * q
    b = y - 1.1085450346420322 * i + 1.7090069284064666 * q
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def bgr_u8_to_yiq(frames: jnp.ndarray) -> jnp.ndarray:
    """``(..., 3)`` uint8 BGR -> float32 YIQ in [0,1] luminance scale."""
    rgb = frames[..., ::-1].astype(jnp.float32) / 255.0
    return rgb_to_yiq(rgb)


def yiq_to_bgr_u8(yiq: jnp.ndarray) -> jnp.ndarray:
    rgb = yiq_to_rgb(yiq)
    bgr = rgb[..., ::-1]
    return jnp.clip(jnp.round(bgr * 255.0), 0, 255).astype(jnp.uint8)
