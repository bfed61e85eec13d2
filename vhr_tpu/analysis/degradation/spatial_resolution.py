"""Spatial downscaling to target heights {720, 480, 360, 240}.

Parity with ``analysis/degradation/spatial_resolution.py`` (targets at :7,
below-original only, even-width fixup, original yielded first as control).
With an ffmpeg binary the rescale is the reference's exact libx264 command
(:36-47); without one (this image) it is a batched on-device
``jax.image.resize`` + cv2 write.
"""

from __future__ import annotations

import functools
from typing import Generator, Tuple

import numpy as np

from . import common
from ...io import video as vio

TARGET_HEIGHTS = [720, 480, 360, 240]


def _resize_op(h: int, w: int):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def op(frames):
        T = frames.shape[0]
        out = jax.image.resize(frames.astype(jnp.float32),
                               (T, h, w, 3), "linear")
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    return lambda chunk: np.asarray(op(chunk))


def apply(input_path: str) -> Generator[Tuple[str, str], None, None]:
    root = common.output_root(input_path, "spatial_resolution")
    width, height, _, _, _ = vio.video_metadata(input_path)

    yield str(input_path), f"{height}p"

    for th in [t for t in TARGET_HEIGHTS if t < height]:
        tw = int(round(width * th / height))
        tw -= tw % 2  # even-width fixup, rounding down like the reference
        label = f"{th}p"
        out = root / f"{label}.mp4"

        def gen(o=out, t_h=th, t_w=tw):
            if common.have_ffmpeg():   # reference spatial_resolution.py:36-47
                common.run_ffmpeg(["-i", str(input_path), "-c:v", "libx264",
                                   "-s", f"{t_w}x{t_h}",
                                   "-pix_fmt", "yuv420p", str(o)])
            else:
                common.per_frame_device_op(input_path, o,
                                           _resize_op(t_h, t_w))

        yield common.cached_level(out, label, gen)
