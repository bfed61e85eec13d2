"""Stage F: the EXACT bench_multistream farm program (scan over reps).

Stage A (debug_farm.py) showed the farm body healthy in isolation; the
bench wraps it in ``lax.scan`` over 24 reps.  Reproduce verbatim, then
bisect scan length / seed values.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import cv2

    from vhr_tpu.config import PipelineConfig
    from vhr_tpu.models.mediapipe_face import make_mediapipe_detector
    from vhr_tpu.parallel import mesh as vmesh, streams
    from vhr_tpu.utils.realface import real_face_image

    H, W = 720, 1280
    Sm, Tm, REPSm = 64, 8, 24
    fps_mp = 10.0
    cfg_mp = PipelineConfig(window_seconds=0.8, acquisition_seconds=0.8)

    img = real_face_image()
    frame_mp = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
    det_mp = make_mediapipe_detector()
    smesh = vmesh.stream_mesh(jax.devices()[:1])
    frame_j = jnp.asarray(frame_mp)
    offs_mp = jnp.asarray(np.random.default_rng(7).integers(
        0, 4, (Sm, Tm, 1, 1, 1), np.uint8))
    jax.block_until_ready((frame_j, offs_mp))

    def make_reps(n):
        @jax.jit
        def reps_mp(frame, offs, seed):
            def body(c, i):
                fr = jax.lax.optimization_barrier(
                    frame[None, None] + offs
                    + jax.lax.rem(i + seed, jnp.uint8(4)))
                res = streams.multistream_green_bpm(
                    fr, fps_mp, smesh, cfg_mp, detector=det_mp)
                return (c[0] + jnp.sum(res.bpm),
                        c[1] + jnp.sum(res.valid.astype(jnp.int32))), None
            out, _ = jax.lax.scan(body, (jnp.float32(0), jnp.int32(0)),
                                  jnp.arange(n, dtype=jnp.uint8))
            return out

        return reps_mp

    print("== stage F: exact bench scan program", flush=True)
    for n in (1, 2, 24):
        reps = make_reps(n)
        s, v = reps(frame_j, offs_mp, jnp.uint8(0))
        print(f"F: scan length {n:3d} seed 0: n_valid={int(v)} "
              f"(expect {64*n}), bpm_sum={float(s):.1f}", flush=True)
    reps24 = make_reps(24)
    for seed in (1, 57, 198):
        s, v = reps24(frame_j, offs_mp, jnp.uint8(seed))
        print(f"F: scan 24 seed {seed}: n_valid={int(v)} (expect 1536)",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
