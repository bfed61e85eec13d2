"""On-chip bisect of the r4 production-farm validity regression.

BENCH_r04 `bench_multistream` farm leg found 0/1536 valid BPMs (S=64
streams x T=8 frames, 720p portrait, production MediaPipe detector under
shard_map) while `bench_mediapipe` (plain T=256 batch, same defaults)
found the face fine.  This script reproduces the farm program and
bisects which stage drops validity:

  stage A  exact farm program (multistream_green_bpm + detector)
  stage B  detector alone on the flat 512 batch (no shard_map)
  stage C  detector alone vs batch size [8, 64, 256, 512]
  stage D  f32 opt-out (activation_dtype=None) at 512
  stage E  DSP-only: rolling window validity on synthetic green

Run ON TPU:  PYTHONPATH=/root/repo:/root/.axon_site python tools/debug_farm.py
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
    Sm, Tm = 64, 8
    fps_mp = 10.0
    cfg_mp = PipelineConfig(window_seconds=0.8, acquisition_seconds=0.8)

    img = real_face_image()
    assert img is not None
    frame_mp = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
    frame_j = jnp.asarray(frame_mp)
    offs_mp = jnp.asarray(np.random.default_rng(7).integers(
        0, 4, (Sm, Tm, 1, 1, 1), np.uint8))
    jax.block_until_ready((frame_j, offs_mp))

    det_mp = make_mediapipe_detector()
    smesh = vmesh.stream_mesh(jax.devices()[:1])

    print("== stage A: exact farm program (one rep, seed 0)", flush=True)

    @jax.jit
    def farm_one(frame, offs):
        fr = jax.lax.optimization_barrier(
            frame[None, None] + offs + jax.lax.rem(jnp.uint8(0),
                                                   jnp.uint8(4)))
        res = streams.multistream_green_bpm(
            fr, fps_mp, smesh, cfg_mp, detector=det_mp)
        return (jnp.sum(res.valid.astype(jnp.int32)),
                res.bpm, res.valid, res.green)

    nv, bpm, valid, green = farm_one(frame_j, offs_mp)
    nv = int(nv)
    print(f"A: res.valid sum = {nv} (expect ~{Sm})")
    bpm = np.asarray(bpm); valid = np.asarray(valid); green = np.asarray(green)
    print("A: valid per-frame counts over streams:",
          valid.sum(axis=0).tolist())
    print("A: green[0] =", np.round(green[0], 3).tolist())
    print("A: bpm[0] =", np.round(bpm[0], 2).tolist())

    print("== stage B: detector alone on flat 512 batch", flush=True)
    frames_flat = jax.lax.optimization_barrier(
        frame_j[None, None] + offs_mp).reshape(Sm * Tm, H, W, 3)
    frames_flat = jax.block_until_ready(jnp.asarray(frames_flat))

    @jax.jit
    def det_flat(frames):
        boxes, ok = det_mp(frames)
        return boxes, ok

    boxes, ok = det_flat(frames_flat)
    okn = int(jnp.sum(ok.astype(jnp.int32)))
    print(f"B: detector valid = {okn}/{Sm*Tm}")
    b = np.asarray(boxes)
    print("B: box[0] =", b[0].tolist(), " box[256] =", b[256].tolist())

    print("== stage C: detector vs batch size", flush=True)
    for bs in (8, 64, 128, 256, 512):
        sub = frames_flat[:bs]
        bx, okk = jax.jit(lambda f: det_mp(f))(sub)
        print(f"C: batch {bs:4d}: valid {int(jnp.sum(okk.astype(jnp.int32)))}"
              f"/{bs}  box0={np.asarray(bx)[0].tolist()}")

    print("== stage D: f32 opt-out at 512", flush=True)
    det_f32 = make_mediapipe_detector(activation_dtype=None)
    bx, okk = jax.jit(lambda f: det_f32(f))(frames_flat)
    print(f"D: f32 valid = {int(jnp.sum(okk.astype(jnp.int32)))}/{Sm*Tm}")

    print("== stage E: DSP-only rolling validity", flush=True)
    from vhr_tpu.ops import windows as vwin
    g = jnp.asarray(np.random.default_rng(0).normal(
        100.0, 1.0, (Tm,)).astype(np.float32))
    roll = vwin.rolling_bpm_fft(g, fps_mp, cfg_mp.band,
                                cfg_mp.window_len(fps_mp),
                                cfg_mp.acquisition_len(fps_mp))
    print("E: window_len =", cfg_mp.window_len(fps_mp),
          "acq_len =", cfg_mp.acquisition_len(fps_mp))
    print("E: rolling.valid =", np.asarray(roll.valid).tolist())


if __name__ == "__main__":
    sys.exit(main())
