"""Colour bit-depth reduction to {7, 6, 5, 4} bits per channel.

Parity with ``analysis/degradation/colour_quantisation.py``: levels below the
assumed 8-bit source (:10-11), control re-encode first, quantisation rule
``(frame // scale) * scale`` with ``scale = 256 >> bits`` (:12-25) — here a
single on-device mask op per chunk.
"""

from __future__ import annotations

import functools
from typing import Generator, Tuple

import numpy as np

from . import common

SOURCE_DEPTH = 8
COLOUR_DEPTHS = [7, 6, 5, 4]


def _quantise_op(bits: int):
    import jax
    import jax.numpy as jnp

    scale = 256 // (2 ** bits)

    @jax.jit
    def op(frames):
        return (frames // scale) * scale

    return lambda chunk: np.asarray(op(chunk))


def apply(input_path: str) -> Generator[Tuple[str, str], None, None]:
    root = common.output_root(input_path, "colour_quantisation")

    control = root / f"{SOURCE_DEPTH}-bit.mp4"
    yield common.cached_level(
        control, f"{SOURCE_DEPTH}-bit",
        lambda: common.per_frame_device_op(input_path, control, lambda x: x))

    for bits in COLOUR_DEPTHS:
        label = f"{bits}-bit"
        out = root / f"{label}.mp4"
        op = _quantise_op(bits)
        yield common.cached_level(
            out, label,
            functools.partial(common.per_frame_device_op, input_path, out, op))
