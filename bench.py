"""Benchmark: offline 1080p rPPG throughput per chip (frames/sec).

Measures the full flagship pipeline — skin detection (8x reduced), landmark
holdover, cheek-ROI channel means, rolling FFT BPM — on 1080p uint8 frames
resident in HBM, against the BASELINE target of >=500 frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes for this environment: the chip sits behind a remote relay
with ~25 ms call RTT, deferred execution, and result caching for identical
calls.  So (a) repetition happens *inside* one jitted call via ``lax.scan``
over distinct per-rep offsets (one RTT per measurement, honest distinct
compute per rep), (b) the input batch materializes on device each rep behind
an ``optimization_barrier`` (a cheap face template + noise plate + per-frame
offsets — models an HBM-resident batch; its write cost is included, so the
number is conservative), and (c) all large buffers are jit *arguments*
(closure constants make the compiler embed them as literals).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 500.0  # BASELINE.md: >=500 sustained 1080p frames/sec/chip


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vhr_tpu.config import PipelineConfig
    from vhr_tpu.models import skin_detector
    from vhr_tpu.ops import reduce as vreduce
    from vhr_tpu.ops import roi as vroi
    from vhr_tpu.ops import windows as vwin

    on_tpu = jax.devices()[0].platform != "cpu"
    T, H, W = (128, 1080, 1920) if on_tpu else (32, 144, 192)
    REPS = 16 if on_tpu else 2
    fps = 30.0
    cfg = PipelineConfig(window_seconds=4.0, acquisition_seconds=2.0)
    det = skin_detector.SkinDetectorConfig(downsample=8 if on_tpu else 1)

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    cx, cy, rx, ry = 0.5 * W, 0.45 * H, 0.16 * W, 0.26 * H
    face = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) <= 1.0
    base = np.where(face[..., None],
                    np.array([105, 135, 180], np.float32),
                    np.array([60, 60, 60], np.float32)).astype(np.uint8)
    noise = np.random.default_rng(0).integers(0, 8, (H, W, 3), np.uint8)
    offs = np.random.default_rng(1).integers(0, 4, (T, 1, 1, 1), np.uint8)
    base_j = jnp.asarray(base)
    noise_j = jnp.asarray(noise)
    offs_j = jnp.asarray(offs)
    jax.block_until_ready((base_j, noise_j, offs_j))

    def one(base, noise, offs, i):
        frames = jax.lax.optimization_barrier(
            base[None] + noise[None] + offs + i.astype(jnp.uint8))
        boxes, valid = skin_detector.detect_faces(frames, det)
        track = vroi.holdover(boxes, valid, cfg.roi.landmark_hold_frames)
        rois = vroi.cheek_roi(track.box, cfg.roi, W, H)
        rois = jnp.where(track.valid[:, None], rois, 0)
        means, _ = vreduce.roi_channel_means(frames, rois)
        rolling = vwin.rolling_bpm_fft(
            means[:, cfg.channel], fps, cfg.band,
            cfg.window_len(fps), cfg.acquisition_len(fps))
        return jnp.sum(rolling.bpm)

    @jax.jit
    def reps(base, noise, offs, seed):
        def body(c, i):
            return c + one(base, noise, offs, i + seed), None
        out, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REPS, dtype=jnp.uint8))
        return out

    float(reps(base_j, noise_j, offs_j, jnp.uint8(0)))   # compile + warm
    # Clock-derived seed: distinct args every run (defeats any relay-level
    # result caching across processes).
    seed = jnp.uint8(1 + time.time_ns() % 200)
    t0 = time.perf_counter()
    float(reps(base_j, noise_j, offs_j, seed))
    dt = time.perf_counter() - t0
    fps_chip = T * REPS / dt

    print(json.dumps({
        "metric": "offline_1080p_rppg_frames_per_sec_per_chip",
        "value": round(fps_chip, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps_chip / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
