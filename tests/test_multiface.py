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


CKPT = __import__("pathlib").Path(__file__).resolve().parent.parent \
    / "checkpoints" / "landmarker"
SKIN_BG = (80.0, 102.0, 135.0)      # darker skin tone: inside the chroma box


def _iou(a, b):
    ix1 = np.maximum(a[..., 0], b[..., 0])
    iy1 = np.maximum(a[..., 1], b[..., 1])
    ix2 = np.minimum(a[..., 2], b[..., 2])
    iy2 = np.minimum(a[..., 3], b[..., 3])
    inter = np.maximum(ix2 - ix1 + 1, 0) * np.maximum(iy2 - iy1 + 1, 0)
    area = lambda x: (np.maximum(x[..., 2] - x[..., 0] + 1, 0) *
                      np.maximum(x[..., 3] - x[..., 1] + 1, 0))
    return inter / np.maximum(area(a) + area(b) - inter, 1)


def _tiled_det(k_faces=2):
    from vhr_tpu.models import cascade
    from vhr_tpu.models.landmarker import load_default_detector
    from vhr_tpu.models.train import TrainConfig
    params = load_default_detector().args[0]
    return cascade.make_tiled_detector_multi(params, TrainConfig().model,
                                             k_faces=k_faces)


@pytest.mark.skipif(not CKPT.exists(), reason="no trained checkpoint")
def test_tiled_detector_survives_skin_background():
    """The fully-learned proposal stage closes the cascade's documented gap:
    on a skin-chroma background the occupancy proposals collapse (the mask
    floods), while tiled landmarker proposals keep both subjects."""
    duo = synthesize_multi(
        (FaceSpec(center=(0.25, 0.45), bpm=60.0),
         FaceSpec(center=(0.72, 0.5), bpm=96.0)),
        height=144, width=256, duration_s=1.0, noise_std=1.0,
        background_bgr=SKIN_BG)
    frames = jnp.asarray(duo.frames)

    chroma_b, chroma_v = detect_faces_multi(frames, k_faces=2)
    chroma_iou = _iou(np.asarray(chroma_b), duo.face_boxes)
    chroma_iou = np.where(np.asarray(chroma_v), chroma_iou, 0.0)
    assert chroma_iou.mean() < 0.3          # chroma proposals defeated

    b, v = _tiled_det()(frames)
    assert bool(np.asarray(v).all())
    ious = _iou(np.asarray(b), duo.face_boxes)
    # Bar calibrated to the shipped checkpoint on this flat-ellipse
    # fixture (measured 0.69/0.83 — the wide r2 model boxes these sharp
    # synthetic ellipses slightly tighter than the facegen faces it
    # trains on, where it scores 0.91 on the same background row).  The
    # cross-face mean keeps a drift tripwire above the per-face floor.
    assert (ious.mean(axis=0) >= 0.65).all(), ious.mean(axis=0)
    assert float(ious.mean()) >= 0.74, float(ious.mean())


@pytest.mark.skipif(not CKPT.exists(), reason="no trained checkpoint")
def test_tiled_detector_single_face_no_phantom():
    """k_faces=2 on a one-face clip: the half-face window proposals refine
    onto the same face and dedupe — exactly one valid slot."""
    solo = synthesize_multi((FaceSpec(center=(0.5, 0.45), bpm=72.0),),
                            duration_s=1.0)
    b, v = _tiled_det()(jnp.asarray(solo.frames))
    v = np.asarray(v)
    assert v[:, 0].all() and not v[:, 1].any()
    assert _iou(np.asarray(b)[:, 0], solo.face_boxes[:, 0]).mean() >= 0.7


@pytest.mark.skipif(not CKPT.exists(), reason="no trained checkpoint")
def test_tiled_multi_bpm_on_skin_background():
    """Matrix-level multi-subject robustness (ROADMAP r2 item 1): both BPMs
    recovered through the pipeline on the background that defeats the
    chroma proposal stage."""
    duo = synthesize_multi(
        (FaceSpec(center=(0.25, 0.45), bpm=60.0),
         FaceSpec(center=(0.72, 0.5), bpm=96.0)),
        height=144, width=256, duration_s=14.0, noise_std=1.0,
        background_bgr=SKIN_BG)
    cfg = PipelineConfig(window_seconds=10.0, acquisition_seconds=5.0)
    ts, bpm, ok = offline.measure_green_avg_multi(
        jnp.asarray(duo.frames), duo.fps, k_faces=2, cfg=cfg,
        detector=_tiled_det())
    steady = slice(cfg.window_len(duo.fps), None)
    assert ok[steady].all()
    err = np.abs(bpm[steady] - duo.bpm_truth[None, :])
    assert float(err[:, 0].mean()) <= 3.0
    assert float(err[:, 1].mean()) <= 3.0


def test_single_candidate_degrades_gracefully():
    """k_faces=2 on a one-face clip: slot 1 invalid, slot 0 tracks."""
    duo = synthesize_multi((FaceSpec(center=(0.5, 0.45), bpm=72.0),),
                           duration_s=2.0)
    boxes, valid = detect_faces_multi(jnp.asarray(duo.frames), k_faces=2)
    v = np.asarray(valid)
    assert v[:, 0].all() and not v[:, 1].any()
    assert (np.asarray(boxes)[:, 1] == 0).all()


@pytest.mark.skipif(not CKPT.exists(), reason="no trained checkpoint")
def test_tiled_detector_no_face_no_detection():
    """False-positive control: a faceless scene (background + noise only)
    yields zero valid slots — the presence head, NMS threshold, and refine
    veto must not hallucinate subjects."""
    duo = synthesize_multi((), height=144, width=256, duration_s=1.0,
                           noise_std=2.0, background_bgr=(60.0,) * 3)
    b, v = _tiled_det()(jnp.asarray(duo.frames))
    assert not np.asarray(v).any()
