"""Real-photo distillation generator: teacher-labeled augmented views.

Round 3 measured the learned landmarker's real-face domain gap — IoU 0.20
on the bundled real portrait vs 1.0 for the ported production weights
(``docs/DETECTION.md``, ``tests/test_realface.py``).  This module closes it
by *distillation*: the production MediaPipe model (the teacher, ported in
:mod:`vhr_tpu.models.mediapipe_face`) labels the one real photograph this
image ships, and heavy affine/photometric augmentation turns that single
labeled example into a training stream whose labels stay exact under every
transform (affine maps of the teacher's 478-point landmark cloud — no
per-sample teacher inference needed, and no label noise from teacher
failures on augmented inputs).

The teacher cloud is committed as ``checkpoints/realface_teacher_lm.npy``
(478 x 2 px on the unscaled portrait); ``tests/test_realgen.py`` recomputes
it from the production model so the asset cannot go stale.

Label convention matches :mod:`vhr_tpu.models.facegen`: ``num_landmarks``
ellipse-boundary points whose min/max equals the face box — the only
quantity the rPPG pipeline consumes (``/root/reference/rppg_VIDEO.py:93-98``)
— normalized to the window, plus a ``has_face`` flag.  Samples mix directly
with facegen batches in ``train.train`` via :func:`make_mixed_batch_fn`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np

from . import facegen

__all__ = ["RealGenConfig", "load_teacher", "sample_batch_real",
           "make_mixed_batch_fn", "teacher_asset_path"]


def teacher_asset_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(here), "checkpoints",
                        "realface_teacher_lm.npy")


@dataclasses.dataclass(frozen=True)
class RealGenConfig:
    """Augmentation ranges mirror ``FaceGenConfig`` where they share
    semantics, so the mixed stream is homogeneous in difficulty."""
    size: int = 96
    face_prob: float = 0.9
    # Target face half-width as a fraction of the window (facegen `scale`).
    scale: Tuple[float, float] = (0.11, 0.30)
    # Extra anisotropic stretch on top of the photo's own face aspect.
    stretch: Tuple[float, float] = (0.9, 1.15)
    angle_deg: float = 35.0
    flip_prob: float = 0.5
    light_gain: Tuple[float, float] = (0.6, 1.4)
    noise_std: float = 0.02
    occlusion_prob: float = 0.3
    skin_background_prob: float = 0.35
    max_distractors: int = 3
    # On no-face samples: paste a face-free region of the SAME photo, so
    # photo-paste edges/texture alone never predict "face" (the clipped-
    # face-negative convention of facegen, adapted to photo crops).
    photo_neg_prob: float = 0.5
    # Feather width (px) of the pasted photo edge.
    feather_px: float = 2.0


class _Teacher:
    def __init__(self, photo_rgb: np.ndarray, cloud_px: np.ndarray):
        self.photo = photo_rgb            # (H, W, 3) float32 RGB [0,1]
        self.cloud = cloud_px             # (478, 2) px
        box = (cloud_px[:, 0].min(), cloud_px[:, 1].min(),
               cloud_px[:, 0].max(), cloud_px[:, 1].max())
        self.box = np.asarray(box, np.float64)
        self.face_w = float(box[2] - box[0])
        self.face_h = float(box[3] - box[1])
        self.face_c = np.asarray([(box[0] + box[2]) / 2.0,
                                  (box[1] + box[3]) / 2.0])


_CACHE: Dict[str, _Teacher] = {}


def load_teacher(path: Optional[str] = None) -> Optional[_Teacher]:
    """The portrait + its production-model landmark cloud, or ``None`` when
    either asset is absent (consumers fall back to pure facegen)."""
    from ..utils.realface import real_face_image
    path = path or teacher_asset_path()
    if path in _CACHE:
        return _CACHE[path]
    img = real_face_image()
    if img is None or not os.path.exists(path):
        return None
    rgb = img[..., ::-1].astype(np.float32) / 255.0
    cloud = np.load(path).astype(np.float64)
    _CACHE[path] = _Teacher(rgb, cloud)
    return _CACHE[path]


def _affine(teacher: _Teacher, cfg: RealGenConfig,
            rng: np.random.Generator, center_uv: Tuple[float, float]):
    """Photo->window affine (2x3) putting the face center at ``center_uv``
    (window fraction) with a sampled scale/stretch/rotation/flip."""
    s = cfg.size
    rx_frac = rng.uniform(*cfg.scale)
    sx = (2.0 * rx_frac * s) / teacher.face_w
    sy = sx * rng.uniform(*cfg.stretch)
    ang = np.deg2rad(rng.uniform(-cfg.angle_deg, cfg.angle_deg))
    flip = rng.random() < cfg.flip_prob
    ca, sa = np.cos(ang), np.sin(ang)
    fs = -sx if flip else sx
    lin = np.asarray([[ca * fs, -sa * sy], [sa * fs, ca * sy]])
    tx = center_uv[0] * s - lin[0] @ teacher.face_c
    ty = center_uv[1] * s - lin[1] @ teacher.face_c
    return np.concatenate([lin, [[tx], [ty]]], axis=1)   # (2, 3)


def _paste(img: np.ndarray, teacher: _Teacher, m: np.ndarray,
           cfg: RealGenConfig) -> None:
    """Warp the photo by ``m`` and feather-blend it over ``img`` in place."""
    import cv2
    s = cfg.size
    m32 = m.astype(np.float32)
    warped = cv2.warpAffine(teacher.photo, m32, (s, s),
                            flags=cv2.INTER_LINEAR,
                            borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    alpha = cv2.warpAffine(np.ones(teacher.photo.shape[:2], np.float32),
                           m32, (s, s), flags=cv2.INTER_LINEAR,
                           borderMode=cv2.BORDER_CONSTANT, borderValue=0.0)
    if cfg.feather_px > 0:
        k = max(1, int(round(cfg.feather_px)) * 2 + 1)
        alpha = cv2.GaussianBlur(alpha, (k, k), 0.0)
    a = alpha[..., None]
    img *= (1.0 - a)
    img += warped * a


def _background(cfg: RealGenConfig, rng: np.random.Generator) -> np.ndarray:
    s = cfg.size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    if rng.random() < cfg.skin_background_prob:
        bg = facegen._skin_like(rng)
    else:
        bg = rng.uniform(0.05, 0.75, 3)
    img = np.broadcast_to(bg.astype(np.float32), (s, s, 3)).copy()
    if rng.random() < 0.5:
        g = rng.uniform(-0.25, 0.25)
        img *= (1.0 + g * (xx[..., None] / s - 0.5))
    for _ in range(rng.integers(0, cfg.max_distractors + 1)):
        dcx, dcy = rng.uniform(0, 1, 2) * s
        dr = rng.uniform(0.03, 0.10) * s
        dmask = ((xx - dcx) ** 2 + (yy - dcy) ** 2) <= dr ** 2
        img[dmask] = facegen._skin_like(rng) if rng.random() < 0.5 \
            else rng.uniform(0.1, 0.9, 3)
    return img


def _ellipse_targets(box: np.ndarray, s: int, n: int) -> np.ndarray:
    """Axis-aligned ellipse boundary inscribed in ``box`` (px) -> (n, 2)
    normalized landmarks whose min/max reproduces the box (the facegen
    supervision convention; consumers use only min/max)."""
    cx, cy = (box[0] + box[2]) / 2.0, (box[1] + box[3]) / 2.0
    rx, ry = (box[2] - box[0]) / 2.0, (box[3] - box[1]) / 2.0
    theta = 2.0 * np.pi * np.arange(n) / n
    lm = np.stack([cx + rx * np.cos(theta), cy + ry * np.sin(theta)],
                  axis=-1) / s
    return np.clip(lm, 0.0, 1.0).astype(np.float32)


def _sample_one(teacher: _Teacher, cfg: RealGenConfig,
                rng: np.random.Generator, num_landmarks: int):
    s = cfg.size
    img = _background(cfg, rng)
    lms = np.zeros((num_landmarks, 2), np.float32)
    has = rng.random() < cfg.face_prob

    if has:
        center = (rng.uniform(0.25, 0.75), rng.uniform(0.3, 0.7))
        m = _affine(teacher, cfg, rng, center)
        _paste(img, teacher, m, cfg)
        cloud = teacher.cloud @ m[:, :2].T + m[:, 2]      # (478, 2) px
        box = np.asarray([cloud[:, 0].min(), cloud[:, 1].min(),
                          cloud[:, 0].max(), cloud[:, 1].max()])
        box = np.clip(box, 0.0, s - 1.0)
        lms = _ellipse_targets(box, s, num_landmarks)
        if rng.random() < cfg.occlusion_prob:
            ocx = rng.uniform(box[0], box[2])
            ocy = rng.uniform(box[1], box[3])
            ow, oh = rng.uniform(0.05, 0.18, 2) * s
            om = ((np.abs(np.arange(s)[None, :] - ocx) <= ow)
                  & (np.abs(np.arange(s)[:, None] - ocy) <= oh))
            img[om] = rng.uniform(0.1, 0.9, 3)
    elif rng.random() < cfg.photo_neg_prob:
        # Face-free photo crop: same paste machinery, face center pushed
        # outside the window (facegen's clipped-face-negative semantics —
        # <~half a face visible must NOT be claimed).
        side = rng.choice([-1.0, 1.0])
        if rng.random() < 0.5:
            center = (0.5 + side * rng.uniform(0.75, 1.4),
                      rng.uniform(0.2, 0.8))
        else:
            center = (rng.uniform(0.2, 0.8),
                      0.5 + side * rng.uniform(0.75, 1.4))
        m = _affine(teacher, cfg, rng, center)
        _paste(img, teacher, m, cfg)

    gain = rng.uniform(*cfg.light_gain, 3).astype(np.float32)
    img *= gain
    img += rng.normal(0, cfg.noise_std, img.shape)
    return np.clip(img, 0, 1).astype(np.float32), lms, has


def sample_batch_real(cfg: RealGenConfig, rng: np.random.Generator,
                      batch: int, num_landmarks: int
                      ) -> Optional[Dict[str, np.ndarray]]:
    """A facegen-compatible batch of teacher-labeled real-photo views
    (``None`` when the photo/teacher assets are absent)."""
    teacher = load_teacher()
    if teacher is None:
        return None
    s = cfg.size
    images = np.empty((batch, s, s, 3), np.float32)
    lms = np.zeros((batch, num_landmarks, 2), np.float32)
    has = np.zeros((batch,), bool)
    for b in range(batch):
        images[b], lms[b], has[b] = _sample_one(teacher, cfg, rng,
                                                num_landmarks)
    return {"image": (images * 255.0 + 0.5).astype(np.uint8),
            "landmarks": lms, "has_face": has}


def make_mixed_batch_fn(real_frac: float = 0.25,
                        real_cfg: Optional[RealGenConfig] = None):
    """A ``train.train`` batch_fn mixing facegen and real-photo samples.

    Each batch draws ``round(batch * real_frac)`` distillation samples and
    fills the rest from the hard synthetic generator — the fine-tune recipe
    that closes the real-face gap without regressing the held-out synthetic
    family (measured in ``docs/DETECTION.md``).
    """
    from .train import TrainConfig, synth_batch

    def batch_fn(cfg: TrainConfig, rng: np.random.Generator):
        synth = synth_batch(cfg, rng)
        rcfg = real_cfg or RealGenConfig(size=cfg.model.input_size)
        if rcfg.size != cfg.model.input_size:
            rcfg = dataclasses.replace(rcfg, size=cfg.model.input_size)
        n_real = int(round(cfg.batch_size * real_frac))
        if n_real == 0:
            return synth
        real = sample_batch_real(rcfg, rng, n_real,
                                 cfg.model.num_landmarks)
        if real is None:
            return synth
        out = {k: synth[k].copy() for k in synth}
        idx = rng.permutation(cfg.batch_size)[:n_real]
        for k in out:
            out[k][idx] = real[k]
        return out

    return batch_fn
