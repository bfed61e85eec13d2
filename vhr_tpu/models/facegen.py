"""Hard synthetic-face generator for landmarker training and evaluation.

The round-1 landmarker trained on plain skin-tone ellipses — a generator the
weight-free chroma-box skin detector also solves, so the learned model added
no robustness (VERDICT r1 item 4).  This generator covers exactly the
conditions that BREAK a fixed YCbCr chroma box (the failure matrix in
``docs/DETECTION.md``):

* **full skin-tone range** — anchors spanning light..dark tones plus jitter
  that deliberately samples the chroma-box *edges*;
* **colored lighting** — per-channel gain 0.6..1.4 (shifts Cb/Cr out of any
  fixed box);
* **skin-colored backgrounds** — walls/panels inside the chroma box, the
  classic occupancy-box killer;
* **texture + facial features** — low-frequency shading, eye/mouth blobs;
* **pose** — rotated ellipses, wide scale range, partial occluders;
* **distractors** — skin-colored non-face blobs, so color alone never wins.

``held_out=True`` draws from a disjoint parameter family (interpolated
tones, shifted scale/aspect/angle ranges, elliptical instead of rectangular
occluders) — the evaluation bar (IoU >= 0.8) is measured there, never on the
training family.

The MediaPipe asset this replaces: ``face_landmarker.task``, consumed at
``/root/reference/analysis/utils/roi.py:70-90`` and ``rppg_VIDEO.py:380``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np

__all__ = ["FaceGenConfig", "sample_batch", "render_clip"]

# RGB anchors, light -> dark (floats in [0, 1]).
_TONES = np.array([
    [0.96, 0.80, 0.69],
    [0.87, 0.68, 0.53],
    [0.78, 0.57, 0.44],
    [0.65, 0.46, 0.33],
    [0.51, 0.35, 0.24],
    [0.38, 0.26, 0.18],
    [0.26, 0.18, 0.13],
], np.float32)


@dataclasses.dataclass(frozen=True)
class FaceGenConfig:
    size: int = 96
    face_prob: float = 0.9
    scale: Tuple[float, float] = (0.11, 0.30)       # rx as fraction of size
    aspect: Tuple[float, float] = (1.1, 1.6)        # ry / rx
    angle_deg: float = 35.0
    occlusion_prob: float = 0.3
    skin_background_prob: float = 0.35
    light_gain: Tuple[float, float] = (0.6, 1.4)
    texture_amp: float = 0.12
    noise_std: float = 0.02
    max_distractors: int = 3
    held_out: bool = False
    # Multi-face-scene training (VERDICT r2 #5): the tiled multi-face
    # detector sweeps windows that often contain a SECOND subject at the
    # edge; train-time samples mirror that.  ``second_face_prob``: render a
    # partial off-center secondary face UNDER the primary (supervision
    # stays pinned to the primary — the model must box the dominant face,
    # not the union).  ``clipped_face_neg_prob``: on no-face samples, draw
    # a mostly-out-of-frame face and keep the label negative (a window
    # seeing <~half a face should NOT claim it; the overlapping neighbor
    # window sees it centered).
    second_face_prob: float = 0.25
    clipped_face_neg_prob: float = 0.15
    # Fraction of faces rendered FLAT (no texture/shading/features) — the
    # multi-subject monitoring fixtures use plain-tone ellipses, and a
    # model trained only on textured faces boxes their sharp boundary
    # ~10% too tight (measured: duo-fixture IoU 0.69 vs 0.91 on facegen
    # faces, docs/DETECTION.md).
    flat_face_prob: float = 0.3


def _tone(cfg: FaceGenConfig, rng: np.random.Generator) -> np.ndarray:
    if cfg.held_out:
        # Convex combination of two adjacent anchors: tones *between* the
        # training anchors, never identical to them.
        i = rng.integers(0, len(_TONES) - 1)
        a = rng.uniform(0.25, 0.75)
        t = (1 - a) * _TONES[i] + a * _TONES[i + 1]
    else:
        t = _TONES[rng.integers(0, len(_TONES))]
        t = t + rng.uniform(-0.06, 0.06, 3).astype(np.float32)
    return np.clip(t, 0.02, 1.0)


def _ranges(cfg: FaceGenConfig):
    if cfg.held_out:
        return ((cfg.scale[0] - 0.02, cfg.scale[1] + 0.03),
                (cfg.aspect[0] - 0.05, cfg.aspect[1] + 0.15),
                cfg.angle_deg + 8.0)
    return cfg.scale, cfg.aspect, cfg.angle_deg


def _render_face(img, xx, yy, cx, cy, rx, ry, ang, tone, cfg, rng,
                 flat=False):
    """Draw one rotated face (textured + featured, or ``flat`` plain-tone
    like the monitoring fixtures); returns its pixel mask."""
    ca, sa = np.cos(ang), np.sin(ang)
    u = ((xx - cx) * ca + (yy - cy) * sa) / rx
    v = (-(xx - cx) * sa + (yy - cy) * ca) / ry
    mask = u * u + v * v <= 1.0
    if flat:
        img[mask] = tone
        return mask
    # Shading gradient across the face + low-frequency texture.
    shade = 1.0 + rng.uniform(-0.2, 0.2) * u + rng.uniform(-0.15, 0.15) * v
    fy = rng.uniform(1.0, 3.0, 2)
    tex = 1.0 + cfg.texture_amp * np.sin(fy[0] * np.pi * u) * \
        np.cos(fy[1] * np.pi * v)
    col = tone[None, None, :] * (shade * tex)[..., None]
    img[mask] = np.clip(col, 0, 1.2)[mask]
    # Features: two eyes + mouth (darkened ellipses in face coordinates).
    for (fu, fv, fr) in ((-0.42, -0.25, 0.14), (0.42, -0.25, 0.14),
                         (0.0, 0.55, 0.22)):
        feat = ((u - fu) / fr) ** 2 + ((v - fv) / (fr * 0.6)) ** 2 <= 1.0
        img[feat & mask] *= rng.uniform(0.35, 0.65)
    return mask


def _skin_like(rng) -> np.ndarray:
    t = _TONES[rng.integers(0, len(_TONES))]
    return np.clip(t + rng.uniform(-0.05, 0.05, 3), 0.02, 1.0)


def sample_one(cfg: FaceGenConfig, rng: np.random.Generator,
               num_landmarks: int):
    """One (image RGB float, landmarks (L,2) normalized, has_face) sample."""
    s = cfg.size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    scale_r, aspect_r, angle_max = _ranges(cfg)

    # Background: plain, gradient, or skin-colored (chroma-box killer).
    if rng.random() < cfg.skin_background_prob:
        bg = _skin_like(rng)
    else:
        bg = rng.uniform(0.05, 0.75, 3)
    img = np.broadcast_to(bg.astype(np.float32), (s, s, 3)).copy()
    if rng.random() < 0.5:   # background gradient
        g = rng.uniform(-0.25, 0.25)
        img *= (1.0 + g * (xx[..., None] / s - 0.5))

    # Distractors: non-face blobs, half of them skin-colored.
    for _ in range(rng.integers(0, cfg.max_distractors + 1)):
        dcx, dcy = rng.uniform(0, 1, 2) * s
        dr = rng.uniform(0.03, 0.10) * s
        dmask = ((xx - dcx) ** 2 + (yy - dcy) ** 2) <= dr ** 2
        img[dmask] = _skin_like(rng) if rng.random() < 0.5 \
            else rng.uniform(0.1, 0.9, 3)

    lms = np.zeros((num_landmarks, 2), np.float32)
    has = rng.random() < cfg.face_prob
    if has:
        rx = rng.uniform(*scale_r) * s
        ry = rx * rng.uniform(*aspect_r)
        cx = rng.uniform(0.25, 0.75) * s
        cy = rng.uniform(0.3, 0.7) * s
        ang = np.deg2rad(rng.uniform(-angle_max, angle_max))
        tone = _tone(cfg, rng)
        if rng.random() < cfg.second_face_prob:
            # Secondary subject at/over the window edge, drawn FIRST so the
            # primary occludes on overlap; supervision stays the primary.
            rx2 = rng.uniform(*scale_r) * s
            ry2 = rx2 * rng.uniform(*aspect_r)
            side = rng.choice([-1.0, 1.0])
            cx2 = (0.5 + side * rng.uniform(0.45, 0.65)) * s
            cy2 = rng.uniform(0.2, 0.8) * s
            ang2 = np.deg2rad(rng.uniform(-angle_max, angle_max))
            _render_face(img, xx, yy, cx2, cy2, rx2, ry2, ang2,
                         _tone(cfg, rng), cfg, rng,
                         flat=rng.random() < cfg.flat_face_prob)
        _render_face(img, xx, yy, cx, cy, rx, ry, ang, tone, cfg, rng,
                     flat=rng.random() < cfg.flat_face_prob)
        # Occluder AFTER the face (covers part of it).
        if rng.random() < cfg.occlusion_prob:
            ocx, ocy = cx + rng.uniform(-rx, rx), cy + rng.uniform(-ry, ry)
            ow, oh = rng.uniform(0.05, 0.18, 2) * s
            ocol = rng.uniform(0.1, 0.9, 3)
            if cfg.held_out:   # elliptical occluders only at eval time
                om = (((xx - ocx) / ow) ** 2 + ((yy - ocy) / oh) ** 2) <= 1.0
            else:
                om = ((np.abs(xx - ocx) <= ow) & (np.abs(yy - ocy) <= oh))
            img[om] = ocol
        # Ground truth: rotated ellipse boundary points (the pipeline uses
        # only their min/max box, rppg_VIDEO.py:93-98).
        theta = 2.0 * np.pi * np.arange(num_landmarks) / num_landmarks
        ex = rx * np.cos(theta)
        ey = ry * np.sin(theta)
        ca, sa = np.cos(ang), np.sin(ang)
        lms[:, 0] = (cx + ex * ca - ey * sa) / s
        lms[:, 1] = (cy + ex * sa + ey * ca) / s
        lms = np.clip(lms, 0.0, 1.0)

    if not has and rng.random() < cfg.clipped_face_neg_prob:
        # Hard negative: a face with its center OUTSIDE the window (under
        # half visible) — windows must not claim a subject the overlapping
        # neighbor window owns.
        rxn = rng.uniform(*scale_r) * s
        ryn = rxn * rng.uniform(*aspect_r)
        side = rng.choice([-1.0, 1.0])
        if rng.random() < 0.5:
            cxn = (0.5 + side * rng.uniform(0.52, 0.62)) * s
            cyn = rng.uniform(0.2, 0.8) * s
        else:
            cxn = rng.uniform(0.2, 0.8) * s
            cyn = (0.5 + side * rng.uniform(0.52, 0.62)) * s
        angn = np.deg2rad(rng.uniform(-angle_max, angle_max))
        _render_face(img, xx, yy, cxn, cyn, rxn, ryn, angn,
                     _tone(cfg, rng), cfg, rng,
                     flat=rng.random() < cfg.flat_face_prob)

    # Colored lighting: independent per-channel gain.
    gain = rng.uniform(*cfg.light_gain, 3).astype(np.float32)
    img *= gain
    img += rng.normal(0, cfg.noise_std, img.shape)
    return np.clip(img, 0, 1).astype(np.float32), lms, has


def sample_batch(cfg: FaceGenConfig, rng: np.random.Generator,
                 batch: int, num_landmarks: int) -> Dict[str, np.ndarray]:
    s = cfg.size
    images = np.empty((batch, s, s, 3), np.float32)
    lms = np.zeros((batch, num_landmarks, 2), np.float32)
    has = np.zeros((batch,), bool)
    for b in range(batch):
        images[b], lms[b], has[b] = sample_one(cfg, rng, num_landmarks)
    # uint8 images: 4x smaller host->device transfer; the train step and
    # detector normalize on device.
    return {"image": (images * 255.0 + 0.5).astype(np.uint8),
            "landmarks": lms, "has_face": has}


def render_clip(cfg: FaceGenConfig, rng: np.random.Generator, T: int,
                height: int, width: int):
    """A T-frame BGR uint8 clip of ONE persistent face (slow sway) from the
    generator's family, with ground-truth boxes — detector evaluation input.

    Returns ``(frames (T, H, W, 3) u8 BGR, boxes (T, 4) int32)``.
    """
    s_cfg = dataclasses.replace(cfg, size=max(height, width))
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    scale_r, aspect_r, angle_max = _ranges(cfg)
    base = min(height, width)
    rx = rng.uniform(*scale_r) * base
    ry = rx * rng.uniform(*aspect_r)
    cx0 = rng.uniform(0.35, 0.65) * width
    cy0 = rng.uniform(0.35, 0.65) * height
    ang = np.deg2rad(rng.uniform(-angle_max, angle_max))
    tone = _tone(cfg, rng)
    if rng.random() < cfg.skin_background_prob:
        bg = _skin_like(rng)
    else:
        bg = rng.uniform(0.05, 0.75, 3)
    gain = rng.uniform(*cfg.light_gain, 3).astype(np.float32)

    frames = np.empty((T, height, width, 3), np.uint8)
    boxes = np.zeros((T, 4), np.int32)
    face_seed = int(rng.integers(1 << 31))   # texture persists across frames
    noise_rng = np.random.default_rng(face_seed + 1)
    for t in range(T):
        img = np.broadcast_to(bg.astype(np.float32),
                              (height, width, 3)).copy()
        cx = cx0 + 2.0 * np.sin(2 * np.pi * 0.1 * t / 30.0)
        cy = cy0
        face_rng = np.random.default_rng(face_seed)
        mask = _render_face(img, xx, yy, cx, cy, rx, ry, ang, tone,
                            s_cfg, face_rng)
        img = np.clip(img * gain
                      + noise_rng.normal(0, cfg.noise_std, img.shape), 0, 1)
        frames[t] = (img[..., ::-1] * 255.0 + 0.5).astype(np.uint8)  # -> BGR
        ys, xs = np.nonzero(mask)
        boxes[t] = [xs.min(), ys.min(), xs.max(), ys.max()]
    return frames, boxes
