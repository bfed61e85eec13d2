"""Benchmark: offline 1080p rPPG throughput per chip (frames/sec).

Measures the full flagship pipeline — skin detection, landmark holdover,
cheek-ROI channel means, rolling FFT BPM — on 1080p uint8 frames resident in
HBM, against the BASELINE target of >=500 frames/sec/chip sustained.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes for this environment: the chip sits behind a remote relay
with ~25 ms call RTT and result caching for identical calls, so each timed
call processes a large frame batch and takes a *distinct* input (a fresh PRNG
key folded into on-device frame synthesis behind an optimization barrier).
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
    T, H, W = (512, 1080, 1920) if on_tpu else (32, 144, 176)
    fps = 30.0
    cfg = PipelineConfig(window_seconds=4.0, acquisition_seconds=2.0)

    # Face template: skin-tone ellipse, synthesized on device per call so
    # every timed call is distinct (defeats relay-level result caching).
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    cx, cy, rx, ry = 0.5 * W, 0.45 * H, 0.16 * W, 0.26 * H
    face_mask = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) <= 1.0
    base = np.where(face_mask[..., None],
                    np.array([105, 135, 180], np.float32),
                    np.array([60, 60, 60], np.float32)).astype(np.uint8)
    base_j = jnp.asarray(base)

    def pipeline(key):
        noise = jax.random.randint(key, (T, H, W, 3), 0, 8, jnp.uint8)
        frames = jax.lax.optimization_barrier(base_j[None] + noise)
        boxes, valid = skin_detector.detect_faces(frames)
        track = vroi.holdover(boxes, valid, cfg.roi.landmark_hold_frames)
        rois = vroi.cheek_roi(track.box, cfg.roi, W, H)
        rois = jnp.where(track.valid[:, None], rois, 0)
        means, _ = vreduce.roi_channel_means(frames, rois)
        rolling = vwin.rolling_bpm_fft(
            means[:, cfg.channel], fps, cfg.band,
            cfg.window_len(fps), cfg.acquisition_len(fps))
        return jnp.sum(rolling.bpm), jnp.sum(track.valid)

    fn = jax.jit(pipeline)
    keys = [jax.random.PRNGKey(i) for i in range(12)]
    jax.block_until_ready(fn(keys[0]))        # compile + warm

    # Timed: distinct keys, sync per call (per-call work >> relay RTT).
    n = 8
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        jax.block_until_ready(fn(keys[i]))
    dt = time.perf_counter() - t0
    fps_chip = T * n / dt

    print(json.dumps({
        "metric": "offline_1080p_rppg_frames_per_sec_per_chip",
        "value": round(fps_chip, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps_chip / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
