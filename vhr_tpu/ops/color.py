"""Batched colorspace conversions.

The reference's EVM path exists only as a broken stub (``bgr2yiq`` at
``rppg_VIDEO.py:120-124`` calls ``colorsys.rgb_to_yiq`` with arrays — a
TypeError if ever invoked; SURVEY.md §4 item 3).  These are the working
batched equivalents, using colorsys's exact NTSC YIQ coefficients so the
intended transform is preserved.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["bgr_u8_to_yiq", "yiq_to_bgr_u8", "rgb_to_yiq", "yiq_to_rgb"]


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
