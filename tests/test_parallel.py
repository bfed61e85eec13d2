"""Multi-chip tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vhr_tpu.config import PipelineConfig
from vhr_tpu.dsp import design, filters
from vhr_tpu.parallel import mesh as vmesh
from vhr_tpu.parallel import streams, time_shard
from vhr_tpu.utils.synth import SynthSpec, synthesize


@pytest.fixture(scope="module")
def devices():
    ds = jax.devices()
    assert len(ds) >= 8, "conftest must fake 8 CPU devices"
    return ds[:8]


def test_multistream_sharded_matches_single(devices):
    m = vmesh.stream_mesh(devices)
    clips = [synthesize(SynthSpec(duration_s=12.0, bpm=60.0 + 5 * i,
                                  height=48, width=64, seed=i))
             for i in range(8)]
    frames = jnp.asarray(np.stack([c.frames for c in clips]))
    fps = clips[0].fps
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    frames = vmesh.shard(frames, m, "stream")
    res = streams.multistream_green_bpm(frames, fps, m, cfg)
    bpm = np.asarray(res.bpm)
    valid = np.asarray(res.valid)
    W = cfg.window_len(fps)
    for i in range(8):
        assert valid[i, W:].all()
        err = np.abs(bpm[i, W:] - (60.0 + 5 * i))
        assert err.mean() <= 8.0, f"stream {i}: {err.mean()}"


def test_multistream_fused_kernel_sharded(devices):
    """The fused-kernel shard body (seq_len stream concatenation) recovers
    each stream's BPM independently — faces sit at stream-specific positions
    so any tracking leak across a stream boundary would misplace the ROI."""
    m = vmesh.stream_mesh(devices)
    clips = [synthesize(SynthSpec(duration_s=12.0, bpm=60.0 + 5 * i,
                                  height=48, width=128, seed=i,
                                  face_center=(0.3 + 0.05 * i, 0.45)))
             for i in range(8)]
    frames = jnp.asarray(np.stack([c.frames for c in clips]))
    fps = clips[0].fps
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    frames = vmesh.shard(frames, m, "stream")
    res = streams.multistream_green_bpm(frames, fps, m, cfg,
                                        use_fused=True, detect_row_pool=8)
    bpm = np.asarray(res.bpm)
    valid = np.asarray(res.valid)
    W = cfg.window_len(fps)
    assert not valid[:, 0].any()       # stream starts carry no box
    for i in range(8):
        assert valid[i, W:].all()
        err = np.abs(bpm[i, W:] - (60.0 + 5 * i))
        assert err.mean() <= 8.0, f"stream {i}: {err.mean()}"


def test_halo_sosfiltfilt_matches_global(devices):
    m = vmesh.make_mesh(("time",), devices=devices)
    sos = design.butter_bandpass_sos(2, 0.7 / 15.0, 2.0 / 15.0)
    rng = np.random.default_rng(0)
    T = 8 * 512
    t = np.arange(T) / 30.0
    x = np.sin(2 * np.pi * 1.2 * t) + 0.1 * rng.standard_normal(T)
    x = jnp.asarray(x, jnp.float64)

    y_global = filters.sosfiltfilt(sos, x)
    xs = vmesh.shard(x, m, "time")
    y_sharded = time_shard.halo_sosfiltfilt(sos, xs, m)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_global),
                               rtol=1e-6, atol=1e-9)


def test_default_halo_reasonable():
    sos = design.butter_bandpass_sos(2, 0.7 / 15.0, 2.0 / 15.0)
    h = time_shard.default_halo(sos)
    assert 10 < h < 5000


def test_train_step_sharded(devices):
    """dp x tp sharded landmark training step runs and reduces the loss."""
    from vhr_tpu.models import train as vtrain
    m = vmesh.train_mesh(4, 2, devices=devices)
    cfg = vtrain.TrainConfig(batch_size=16)
    model, params, tx, opt_state = vtrain.init_state(
        cfg, jax.random.PRNGKey(0))
    step = vtrain.make_train_step(model, tx, cfg, mesh=m,
                                  params_example=params)
    rng = np.random.default_rng(0)
    p_shard = vtrain.param_shardings(params, m)
    params = jax.tree.map(jax.device_put, params, p_shard)
    losses = []
    for _ in range(3):
        batch = {k: jnp.asarray(v) for k, v in
                 vtrain.synth_batch(cfg, rng).items()}
        params, opt_state, loss, aux = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # Check tensor-parallel layout actually applied to a big kernel.
    trunk = params["trunk"]["kernel"]
    assert "model" in str(trunk.sharding.spec)


def test_landmarker_learns_synthetic_faces():
    """A short single-device training run reduces loss markedly (gradients
    flow through the flatten head + bbox term).  Uses an EASY generator
    config — the HARD task needs thousands of steps and is validated by the
    committed checkpoint's held-out IoU tests (test_landmarker.py)."""
    from vhr_tpu.models import facegen, train as vtrain
    easy = facegen.FaceGenConfig(skin_background_prob=0.0,
                                 light_gain=(1.0, 1.0), occlusion_prob=0.0,
                                 texture_amp=0.0, max_distractors=0,
                                 angle_deg=0.0)
    cfg = vtrain.TrainConfig(batch_size=32, total_steps=40, gen=easy)
    model, params, losses = vtrain.train(cfg, steps=40, seed=1)
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_sharded_steady_bpm_matches_unsharded(devices):
    """Time-sharded rolling BPM == unsharded steady region, bit for bit."""
    from vhr_tpu.config import BAND_ANALYSIS
    from vhr_tpu.ops import windows as vwin
    from vhr_tpu.parallel import long as vlong

    m = vmesh.make_mesh(("time",), devices=devices)
    fps, W = 20.0, 128
    rng = np.random.default_rng(5)
    t = np.arange(8 * 256) / fps
    sig = np.sin(2 * np.pi * 1.1 * t) + 0.3 * rng.standard_normal(len(t))
    x = jnp.asarray(sig, jnp.float64)

    ref = vwin.rolling_bpm_fft(x, fps, BAND_ANALYSIS, W, W)  # steady only
    xs = vmesh.shard(x, m, "time")
    bpm, valid = vlong.sharded_steady_bpm(xs, fps, BAND_ANALYSIS, W, m)
    bpm, valid = np.asarray(bpm), np.asarray(valid)
    ref_bpm, ref_valid = np.asarray(ref.bpm), np.asarray(ref.valid)
    assert not valid[:W - 1].any()
    np.testing.assert_array_equal(valid[W - 1:], ref_valid[W - 1:])
    np.testing.assert_allclose(bpm[valid], ref_bpm[valid], atol=1e-9)


@pytest.mark.slow
def test_multistream_mediapipe_detector_sharded(devices):
    """The production MediaPipe detector runs data-parallel over the stream
    mesh (weights as replicated shard_map inputs) and agrees exactly with
    the direct single-stream call — the 'production face model at farm
    scale' path."""
    from tests.test_mediapipe_face import draw_face
    from vhr_tpu.models.mediapipe_face import make_mediapipe_detector

    m = vmesh.stream_mesh(devices)
    img = draw_face(H=192, W=224, cx=112, cy=96, rx=45, ry=62)
    rng = np.random.default_rng(5)
    # Streams differ by per-stream photometric jitter so each shard does
    # real, distinct work.
    frames = np.stack([
        np.clip(img.astype(np.int16) + rng.integers(-6, 7), 0, 255)
        .astype(np.uint8)[None].repeat(2, axis=0) for _ in range(8)])
    frames_j = jnp.asarray(frames)

    det = make_mediapipe_detector()
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    sharded = vmesh.shard(frames_j, m, "stream")
    res = streams.multistream_green_bpm(sharded, 30.0, m, cfg,
                                        detector=det)
    # T=2 is below acquisition so BPM validity stays False; detection
    # success shows in the green trace (zero iff the detector missed).
    assert not np.asarray(res.valid).any()
    green = np.asarray(res.green)
    assert (green > 0).all()
    # Shard 0 must reproduce the unsharded detector bit-exactly.
    boxes0, v0 = det(frames_j[0])
    assert np.asarray(v0).all()
    x1, y1, x2, y2 = np.asarray(boxes0)[0]
    assert 60 <= x1 <= 100 and 120 <= x2 <= 165
    assert 30 <= y1 <= 70 and 140 <= y2 <= 180


def test_multistream_degradation_sweep_on_device(devices):
    """BASELINE config 5's full wording — concurrent streams x degradation
    sweep: each stream carries a different Gaussian-noise degradation level
    (the colour_noise ladder), applied ON DEVICE, and the sharded pipeline
    recovers every stream's BPM in one program; accuracy decays
    monotonically-ish with sigma but stays in-band across the ladder."""
    m = vmesh.stream_mesh(devices)
    base = synthesize(SynthSpec(duration_s=12.0, bpm=75.0, height=48,
                                width=64, seed=3, noise_std=0.0))
    frames = jnp.asarray(np.stack([base.frames] * 8))
    sigmas = jnp.asarray([0.0, 1.0, 2.0, 4.0, 6.0, 8.0, 12.0, 16.0])

    def noisy(fr, sd, key):
        n = sd * jax.random.normal(key, fr.shape, jnp.float32)
        return jnp.clip(fr.astype(jnp.float32) + n, 0, 255).astype(jnp.uint8)

    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    frames = jax.jit(jax.vmap(noisy))(frames, sigmas, keys)

    fps = base.fps
    cfg = PipelineConfig(window_seconds=8.0, acquisition_seconds=4.0)
    frames = vmesh.shard(frames, m, "stream")
    res = streams.multistream_green_bpm(frames, fps, m, cfg)
    bpm, valid = np.asarray(res.bpm), np.asarray(res.valid)
    W = cfg.window_len(fps)
    for i in range(8):
        assert valid[i, W:].all(), f"stream {i} lost validity"
        err = np.abs(bpm[i, W:] - 75.0)
        assert err.mean() <= 8.0, f"sigma={float(sigmas[i])}: {err.mean()}"


def test_sharded_holdover_matches_sequential(devices):
    """Time-sharded detection holdover (two local scans + one carry
    all_gather, parallel/long.py) is EXACTLY the sequential
    ops.roi.holdover scan — across shard-boundary dropouts, cadence
    'attempted' gaps, and a no-detection-in-shard chain."""
    from vhr_tpu.ops import roi as vroi
    from vhr_tpu.parallel.long import sharded_holdover

    m = vmesh.make_mesh(("time",), devices=devices)
    rng = np.random.default_rng(0)
    T = 8 * 25
    cases = []
    for drop in (0.2, 0.5):
        cases.append((rng.random(T) > drop, np.ones(T, bool)))
        cases.append((rng.random(T) > drop, rng.random(T) > 0.3))
    v_single = np.zeros(T, bool)
    v_single[137] = True                      # carry chains across 4 shards
    cases.append((v_single, np.ones(T, bool)))
    for valid, att in cases:
        valid = np.asarray(valid) & np.asarray(att)   # failed == attempted
        box = rng.integers(0, 100, (T, 4)).astype(np.int32)
        ref = vroi.holdover(jnp.asarray(box), jnp.asarray(valid), 15,
                            attempted=jnp.asarray(att))
        sh = NamedSharding(m, P("time"))
        got = sharded_holdover(
            jax.device_put(jnp.asarray(box), sh),
            jax.device_put(jnp.asarray(valid), sh), m, 15,
            attempted=jax.device_put(jnp.asarray(att), sh))
        np.testing.assert_array_equal(np.asarray(got.box),
                                      np.asarray(ref.box))
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(ref.valid))
