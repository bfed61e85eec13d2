"""Worker process for the 2-process DCN test (tests/test_dcn.py).

Run as: python tests/dcn_worker.py PROCESS_ID NUM_PROCESSES PORT OUTDIR

Each process owns 4 virtual CPU devices; both synthesize the same
deterministic 8-stream clip, contribute their own 4-stream half to the
global array, run ``multistream_green_bpm`` over the 2x4 cluster mesh,
allgather, and compare against an in-process single-mesh reference.
"""

import json
import os
import sys


def main() -> int:
    process_id, num_processes, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4")

    import numpy as np
    import jax

    from vhr_tpu.config import PipelineConfig
    from vhr_tpu.parallel import dcn
    from vhr_tpu.parallel.streams import multistream_green_bpm
    from vhr_tpu.utils.synth import SynthSpec, synthesize

    dcn.init_cluster(f"localhost:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == 4
    mesh = dcn.cluster_stream_mesh()
    assert mesh.devices.size == 4 * num_processes

    # Deterministic 8-stream clip, same on every host; each process
    # contributes its own quarter x num_processes.
    fps, S = 30.0, 4 * num_processes
    clips = [synthesize(SynthSpec(duration_s=2.0, height=48, width=64,
                                  fps=fps, bpm=66.0 + 6 * s, noise_std=0.3,
                                  seed=s))
             for s in range(S)]
    frames = np.stack([c.frames for c in clips])          # (S, T, H, W, 3)
    lo = process_id * (S // num_processes)
    hi = lo + S // num_processes
    cfg = PipelineConfig(window_seconds=1.0, acquisition_seconds=0.5)

    gframes = dcn.distribute_streams(frames[lo:hi], mesh)
    res = multistream_green_bpm(gframes, fps, mesh, cfg)
    bpm = dcn.gather_streams(res.bpm)
    valid = dcn.gather_streams(res.valid)
    assert bpm.shape == (S, frames.shape[1])
    assert valid[:, -1].all(), "every stream must converge by the last frame"

    # Single-mesh in-process reference over this host's local devices.
    import jax.numpy as jnp
    from jax.sharding import Mesh
    ref_mesh = Mesh(np.asarray(jax.local_devices()), ("stream",))
    ref = multistream_green_bpm(jnp.asarray(frames[lo:hi]), fps,
                                ref_mesh, cfg)
    np.testing.assert_allclose(bpm[lo:hi], np.asarray(ref.bpm),
                               rtol=0, atol=0)

    # --- production-weights farm across the cluster ----------------------
    # The ported MediaPipe detector as the multistream face stage: weights
    # load from disk on EVERY host and ride the shard_map as replicated
    # inputs; detection runs flat-batch per shard (parallel/streams.py).
    mp_out = {}
    from vhr_tpu.models.mediapipe_face import default_task_path
    if os.path.exists(default_task_path()):
        from vhr_tpu.models.mediapipe_face import make_mediapipe_detector
        from vhr_tpu.utils import realface

        det = make_mediapipe_detector()
        rclip = realface.synthesize_real_face_clip(
            bpm=72.0, fps=10.0, duration_s=2.0, scale=0.25, seed=0)
        # Distinct per-stream brightness so streams are distinguishable.
        rframes = np.stack([
            np.clip(rclip.frames.astype(np.int16) + 2 * s, 0, 255)
            .astype(np.uint8) for s in range(S)])
        cfg_mp = PipelineConfig(window_seconds=0.8,
                                acquisition_seconds=0.8)
        g_mp = dcn.distribute_streams(rframes[lo:hi], mesh)
        res_mp = multistream_green_bpm(g_mp, 10.0, mesh, cfg_mp,
                                       detector=det)
        green_mp = dcn.gather_streams(res_mp.green)
        valid_mp = dcn.gather_streams(res_mp.valid)
        assert valid_mp[:, -1].all(), "production farm must detect+estimate"
        mp_out = {"mp_green_last": [round(float(x), 4)
                                    for x in green_mp[:, -1]]}

    # --- SPMD serving farm: BpmServer over the cluster mesh --------------
    # Host 0 is the camera source (the front-end host in a deployment);
    # its frames reach every worker over DCN (broadcast_one_to_all), then
    # every process performs the SAME attach/tick sequence — the pool
    # dispatches SPMD and fetch() allgathers each tick's packed outputs,
    # so every host sees every slot's BPM.
    from jax.experimental import multihost_utils
    from vhr_tpu import serving
    from vhr_tpu.pipeline import live as vlive

    S_pool, T = 8, 100
    if process_id == 0:
        pool_clips = [synthesize(SynthSpec(duration_s=10.0, height=48,
                                           width=64, fps=10.0, bpm=78.0,
                                           noise_std=0.4, seed=100 + s))
                      for s in range(S_pool)]
        src = np.stack([c.frames[:T] for c in pool_clips])
    else:
        src = np.zeros((S_pool, T, 48, 64, 3), np.uint8)  # no local camera
    src = np.asarray(multihost_utils.broadcast_one_to_all(src))
    assert src.any(), "host 0's frames must have arrived over DCN"

    lcfg = vlive.LiveConfig(fps=10.0, ring_len=128,
                            welch_segment_seconds=4.0)
    pool = serving.BpmServer(lcfg, n_slots=S_pool, mesh=mesh,
                             slot_axis="stream")
    slots = [pool.attach() for _ in range(S_pool)]
    last = {}
    for t in range(T):
        last = pool.tick({s: src[s, t] for s in slots})
    assert all(bool(o.face_valid) for o in last.values())
    assert all(bool(o.bpm_valid) for o in last.values())
    for o in last.values():
        assert abs(float(o.bpm) - 78.0) <= 10.0, float(o.bpm)
    farm_out = {"serve_bpm_last": [round(float(last[s].bpm), 4)
                                   for s in slots],
                "serve_src_sum": int(src.astype(np.int64).sum())}

    with open(os.path.join(outdir, f"ok_{process_id}.json"), "w") as f:
        json.dump({"bpm_last": bpm[:, -1].tolist(), **mp_out, **farm_out}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
