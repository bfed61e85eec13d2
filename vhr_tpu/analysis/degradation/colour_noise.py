"""Additive Gaussian colour noise at sigma in {5, 10, 20, 40}.

Parity with ``analysis/degradation/colour_noise.py`` (levels at :8, control
``0std`` first, float add + clip to uint8), but the noise is generated and
applied *on device* as one batched JAX op per chunk, and — unlike the
reference's unseeded ``np.random.normal`` (SURVEY.md §4 determinism gap) —
it is deterministic per (video, sigma).
"""

from __future__ import annotations

import functools
from typing import Generator, Tuple

import numpy as np

from . import common

NOISE_LEVELS = [5, 10, 20, 40]
_SEED = 0x5EED


def _noisy_op(std_dev: float, seed: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def op(frames):
        key = jax.random.PRNGKey(seed)
        noise = std_dev * jax.random.normal(key, frames.shape, jnp.float32)
        out = jnp.clip(frames.astype(jnp.float32) + noise, 0, 255)
        return out.astype(jnp.uint8)

    return lambda chunk: np.asarray(op(chunk))


def apply(input_path: str) -> Generator[Tuple[str, str], None, None]:
    root = common.output_root(input_path, "colour_noise")

    control = root / "0std.mp4"
    yield common.cached_level(
        control, "0std",
        lambda: common.per_frame_device_op(input_path, control, lambda x: x))

    for std in NOISE_LEVELS:
        label = f"{int(std)}std"
        out = root / f"{label}.mp4"
        op = _noisy_op(float(std), _SEED + std)
        yield common.cached_level(
            out, label,
            functools.partial(common.per_frame_device_op, input_path, out, op))
