"""On-chip A/B: VMEM-fused residual stages vs unfused executor (VERDICT
r4 #3), plus exact-crop block-size sweep (VERDICT r4 #4).

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site \
             python tools/measure_fused_stages.py
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_median(fn, n=3):
    fn()                                     # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import cv2

    from vhr_tpu.models import mediapipe_face as mpf
    from vhr_tpu.utils.realface import real_face_image

    T, H, W = 256, 720, 1280
    REPS = 12
    img = real_face_image()
    frame = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
    frames_j = jnp.asarray(np.broadcast_to(frame[None], (T, H, W, 3)).copy())
    jax.block_until_ready(frames_j)

    def run_mode(fuse, label, activation_dtype=jnp.bfloat16,
                 crop_mode="axis"):
        params, det_apply, lm_apply = mpf.load_face_models(
            compute_dtype=jnp.bfloat16, activation_dtype=activation_dtype,
            fuse_stages=fuse)

        @jax.jit
        def reps(frames, seed):
            def body(c, i):
                fr = jax.lax.optimization_barrier(
                    frames + jax.lax.rem(i + seed, jnp.uint8(4)))
                boxes, valid = mpf._detect_single(
                    params, det_apply, lm_apply, fr, crop_mode=crop_mode)
                return c + jnp.sum(boxes) + jnp.sum(valid), None
            out, _ = jax.lax.scan(body, jnp.int32(0),
                                  jnp.arange(REPS, dtype=jnp.uint8))
            return out

        last = {}

        def call(seed=jnp.uint8(0)):
            last["v"] = int(reps(frames_j, seed))

        dt = timed_median(call)
        fps = T * REPS / dt
        boxes, valid = mpf._detect_single(params, det_apply, lm_apply,
                                          frames_j[:1], crop_mode=crop_mode)
        print(f"{label}: {fps:,.1f} fps  ({dt / (T * REPS) * 1e6:.1f} us/f)"
              f"  face_found={bool(np.asarray(valid)[0])}"
              f"  box={np.asarray(boxes)[0].tolist()}", flush=True)
        return fps

    print("== mesh-stage fusion A/B (bf16 activations, T=256, 720p)",
          flush=True)
    fps_unfused = run_mode(False, "unfused  ")
    fps_fused = run_mode(True, "fused    ")
    print(f"fusion speedup: {fps_fused / fps_unfused:.3f}x", flush=True)

    # Accuracy cross-check on-chip: landmarks from fused vs unfused path.
    p0, d0, l0 = mpf.load_face_models(compute_dtype=jnp.bfloat16,
                                      activation_dtype=jnp.bfloat16,
                                      fuse_stages=False)
    p1, d1, l1 = mpf.load_face_models(compute_dtype=jnp.bfloat16,
                                      activation_dtype=jnp.bfloat16,
                                      fuse_stages=True)
    fr = frames_j[:4]
    rects0, _, _ = mpf.detect_faces_mp(p0, d0, fr)
    lm0, pr0 = mpf.face_landmarks(p0, l0, fr, rects0)
    rects1, _, _ = mpf.detect_faces_mp(p1, d1, fr)
    lm1, pr1 = mpf.face_landmarks(p1, l1, fr, rects1)
    rms = float(jnp.sqrt(jnp.mean((lm0 - lm1) ** 2)))
    print(f"landmark RMS fused-vs-unfused (px): {rms:.4f}  "
          f"presence delta: {float(jnp.max(jnp.abs(pr0 - pr1))):.5f}",
          flush=True)

    print("== exact-crop block-size sweep (f32, T=256)", flush=True)
    for blk in (16, 32, 64):
        mpf._CROP_BLOCK = blk
        # bust the jit cache by rebuilding the partial chain each time
        try:
            fps = run_mode(False, f"exact blk={blk:3d}",
                           activation_dtype=None, crop_mode="exact")
        except Exception as e:
            print(f"exact blk={blk}: FAILED {e!r}", flush=True)
    mpf._CROP_BLOCK = 16


if __name__ == "__main__":
    sys.exit(main())
