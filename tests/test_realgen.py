"""Real-photo distillation generator (``models/realgen.py``): teacher-asset
freshness, label/image affine consistency, batch contract, mixing."""

import numpy as np
import pytest

from vhr_tpu.models import realgen
from vhr_tpu.models.realgen import RealGenConfig


@pytest.fixture(scope="module")
def teacher():
    t = realgen.load_teacher()
    if t is None:
        pytest.skip("no real-photo / teacher asset in this environment")
    return t


def test_teacher_asset_fresh(teacher):
    """The committed landmark cloud must match a fresh production-model
    run — the asset cannot silently go stale."""
    import jax.numpy as jnp
    from vhr_tpu.models.mediapipe_face import (load_face_models,
                                               detect_faces_mp,
                                               face_landmarks)
    from vhr_tpu.utils.realface import real_face_image

    img = real_face_image()
    params, det_apply, lm_apply = load_face_models()
    frames = jnp.asarray(img[None])
    rects, _, ok = detect_faces_mp(params, det_apply, frames, k_faces=1)
    # The asset was distilled with MediaPipe-exact rotated sampling; the
    # axis-crop product default deviates by up to ~1 px (documented
    # tradeoff, docs/DETECTION.md), so freshness pins the exact mode.
    lm_px, presence = face_landmarks(params, lm_apply, frames, rects,
                                     crop_mode="exact")
    assert bool(np.asarray(ok)[0, 0])
    fresh = np.asarray(lm_px[0, 0])
    assert np.max(np.abs(fresh - teacher.cloud)) < 0.5   # px


def test_affine_label_image_consistency(teacher):
    """The label transform and the image warp must be the SAME map: a
    marker pixel at a cloud point must land where the label math puts it."""
    rng = np.random.default_rng(3)
    cfg = RealGenConfig(feather_px=0.0)
    checked = 0
    for trial in range(5):
        m = realgen._affine(teacher, cfg, rng, (0.5, 0.5))
        pt = teacher.cloud[rng.integers(0, len(teacher.cloud))]
        marker = realgen._Teacher(np.zeros_like(teacher.photo),
                                  teacher.cloud)
        yi, xi = int(round(pt[1])), int(round(pt[0]))
        # 5x5 block: survives the ~4x downscale point-sampling of
        # cv2.warpAffine (a single pixel can fall between output samples)
        marker.photo[yi - 2:yi + 3, xi - 2:xi + 3] = 1.0
        img = np.zeros((cfg.size, cfg.size, 3), np.float32)
        realgen._paste(img, marker, m, cfg)
        expect = np.asarray([xi, yi], np.float64) @ m[:, :2].T + m[:, 2]
        if not (3 <= expect[0] < cfg.size - 3
                and 3 <= expect[1] < cfg.size - 3):
            continue
        total = img[..., 0].sum()
        assert total > 1e-6, trial
        ys, xs = np.nonzero(img[..., 0] > 1e-6)
        got = np.asarray([(xs * img[ys, xs, 0]).sum() / total,
                          (ys * img[ys, xs, 0]).sum() / total])
        assert np.all(np.abs(got - expect) < 3.0), (trial, got, expect)
        checked += 1
    assert checked >= 2


def test_batch_contract_and_determinism(teacher):
    cfg = RealGenConfig()
    b = realgen.sample_batch_real(cfg, np.random.default_rng(0), 16, 68)
    assert b["image"].shape == (16, 96, 96, 3)
    assert b["image"].dtype == np.uint8
    assert b["landmarks"].shape == (16, 68, 2)
    assert b["has_face"].dtype == bool
    assert 0.0 <= b["landmarks"].min() and b["landmarks"].max() <= 1.0
    b2 = realgen.sample_batch_real(cfg, np.random.default_rng(0), 16, 68)
    for k in b:
        assert np.array_equal(b[k], b2[k])


def test_positive_labels_sized_by_scale_range(teacher):
    cfg = RealGenConfig(face_prob=1.0, occlusion_prob=0.0)
    b = realgen.sample_batch_real(cfg, np.random.default_rng(1), 48, 68)
    lm = b["landmarks"]
    w = lm[..., 0].max(axis=1) - lm[..., 0].min(axis=1)
    h = lm[..., 1].max(axis=1) - lm[..., 1].min(axis=1)
    # face half-width frac in cfg.scale; width = 2*rx (modulo clipping and
    # the cloud box being the *landmark* extent, slightly inside the warp)
    assert w.min() > 0.15 and w.max() < 0.75
    assert (h > w * 0.7).all()      # faces are taller than wide-ish


def test_mixed_batch_fn_fraction(teacher):
    from vhr_tpu.models.train import TrainConfig

    cfg = TrainConfig(batch_size=16)
    rng = np.random.default_rng(2)
    fn = realgen.make_mixed_batch_fn(real_frac=0.5)
    mixed = fn(cfg, rng)
    assert mixed["image"].shape == (16, 96, 96, 3)
    # zero-frac passthrough equals pure synth for the same rng stream
    fn0 = realgen.make_mixed_batch_fn(real_frac=0.0)
    from vhr_tpu.models.train import synth_batch
    r1, r2 = np.random.default_rng(5), np.random.default_rng(5)
    a, b = fn0(cfg, r1), synth_batch(cfg, r2)
    assert np.array_equal(a["image"], b["image"])
