"""Fused single-pass detect+ROI kernel (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vhr_tpu.config import ROIConfig
from vhr_tpu.ops import reduce as vreduce
from vhr_tpu.ops import roi as vroi
from vhr_tpu.ops.pallas_fused import fused_detect_roi_pallas
from vhr_tpu.utils.synth import SynthSpec, synthesize


@pytest.fixture(scope="module")
def clip():
    # H=104 exercises the clamped-overlap last chunk; W*3=384 is 128-aligned.
    return synthesize(SynthSpec(duration_s=2.0, height=104, width=128,
                                bpm=80.0, motion_amplitude=1.0))


def test_boxes_match_raw_skin_mask(clip):
    res = fused_detect_roi_pallas(jnp.asarray(clip.frames), row_block=64,
                                  interpret=True)
    assert np.abs(np.asarray(res.boxes) - clip.face_boxes).max() <= 1
    assert bool(np.asarray(res.det_valid).all())


def test_means_match_two_pass_with_prev_frame_box(clip):
    res = fused_detect_roi_pallas(jnp.asarray(clip.frames), row_block=64,
                                  interpret=True)
    t = np.asarray(res.boxes)
    prev = np.roll(t, 1, axis=0)
    prev[0] = 0
    rois = vroi.cheek_roi(jnp.asarray(prev), ROIConfig(), 128, 104)
    m_ref, c_ref = vreduce.roi_channel_means(jnp.asarray(clip.frames), rois)
    np.testing.assert_allclose(np.asarray(res.means)[1:],
                               np.asarray(m_ref)[1:], rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.count)[1:],
                               np.asarray(c_ref)[1:])
    assert not bool(np.asarray(res.roi_valid)[0])   # no box yet at frame 0


def test_detect_every_tracks_box(clip):
    res = fused_detect_roi_pallas(jnp.asarray(clip.frames), row_block=64,
                                  detect_every=4, interpret=True)
    # Tracked boxes stay within one motion step of truth.
    assert np.abs(np.asarray(res.boxes) - clip.face_boxes).max() <= 3
    assert bool(np.asarray(res.roi_valid)[4:].all())


def test_rejects_unaligned_width():
    frames = np.zeros((2, 32, 100, 3), np.uint8)
    with pytest.raises(ValueError):
        fused_detect_roi_pallas(jnp.asarray(frames), interpret=True)


def test_gated_matches_ungated_when_face_in_band(clip):
    """A face that stays inside the gate band produces bit-identical
    results: the gate only skips chunks the detector would find empty."""
    frames = jnp.asarray(clip.frames)
    ref = fused_detect_roi_pallas(frames, row_block=64, interpret=True)
    gated = fused_detect_roi_pallas(frames, row_block=64, gate_margin=0.5,
                                    rescan_every=10000, interpret=True)
    np.testing.assert_array_equal(np.asarray(gated.boxes),
                                  np.asarray(ref.boxes))
    np.testing.assert_array_equal(np.asarray(gated.means),
                                  np.asarray(ref.means))
    np.testing.assert_array_equal(np.asarray(gated.det_valid),
                                  np.asarray(ref.det_valid))


def test_pooled_gated_detect_recovers_bpm():
    """detect_row_pool=8 + gating still recovers the synthetic BPM through
    the full fused pipeline (box-edge quantization <= pool rows)."""
    from vhr_tpu.config import PipelineConfig
    from vhr_tpu.ops import windows as vwin
    from vhr_tpu.pipeline import offline

    v = synthesize(SynthSpec(duration_s=40.0, bpm=72.0, noise_std=1.0,
                             height=96, width=128))
    cfg = PipelineConfig(window_seconds=10.0, acquisition_seconds=5.0)
    trace = offline.extract_signals_fused(jnp.asarray(v.frames), cfg,
                                          detect_row_pool=8,
                                          gate_margin=0.25,
                                          interpret=True)
    green = offline._fill_invalid(trace.bgr[:, cfg.channel], trace.valid)
    rolling = vwin.rolling_bpm_fft(green, v.fps, cfg.band,
                                   cfg.window_len(v.fps),
                                   cfg.acquisition_len(v.fps))
    steady = slice(cfg.window_len(v.fps), None)
    ok = np.asarray(jnp.logical_and(rolling.valid, trace.valid))
    assert ok[steady].all()
    assert float(np.abs(np.asarray(rolling.bpm)[steady] - 72.0).mean()) <= 4.0


def test_gated_reacquires_after_jump():
    """A face jumping out of the gate band drains the holdover budget and
    triggers full-frame rescans: reacquisition within <= hold+1 frames."""
    import dataclasses

    spec1 = SynthSpec(duration_s=1.0, height=104, width=128, bpm=70.0,
                      face_center=(0.5, 0.28), face_radii=(0.16, 0.14))
    spec2 = dataclasses.replace(spec1, face_center=(0.5, 0.75))
    v1, v2 = synthesize(spec1), synthesize(spec2)
    frames = np.concatenate([v1.frames, v2.frames])
    T1 = v1.frames.shape[0]
    res = fused_detect_roi_pallas(jnp.asarray(frames), row_block=8,
                                  gate_margin=0.2, rescan_every=10000,
                                  interpret=True)
    boxes = np.asarray(res.boxes)
    hold = ROIConfig().landmark_hold_frames
    # After the jump the stale box rides the holdover budget, then budget
    # drain forces full scans: the tail must have locked onto face #2.
    tail = slice(T1 + hold + 2, None)
    assert np.abs(boxes[tail] - v2.face_boxes[hold + 2:]).max() <= 1
    assert bool(np.asarray(res.roi_valid)[tail].all())
    # Before the jump it tracked face #1 exactly.
    assert np.abs(boxes[1:T1] - v1.face_boxes[1:]).max() <= 1
