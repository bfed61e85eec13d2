"""Two-stage cascade detection: proposals + landmarker crop refinement.

The reference's MediaPipe pipeline is itself a cascade (BlazeFace proposal
-> face-mesh refinement on a crop).  Two compositions here, measured on the
held-out hard generator (see tests):

* **self-refinement** (:func:`make_refined_detector`) — full-frame
  landmarker proposes, a second landmarker pass on a pad-0.3 crop around
  its own box sharpens it: held-out IoU 0.890 -> 0.924.  The accuracy
  flagship for single-face.
* **multi-face cascade** (:func:`make_cascade_detector_multi`) — top-K skin
  proposals, each refined on its crop with a presence veto.  Refinement
  helps when proposals are roughly right (clean scenes) and vetoes junk
  regions; when the skin stage itself collapses (skin-colored backgrounds)
  the crops miss the faces, so matrix-level multi-face robustness still
  requires a learned proposal stage (ROADMAP).

All crops are fixed-size bilinear gathers (static shapes, vmappable over
time and faces); weights ride as `jax.tree_util.Partial` args (traced, not
baked literals).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .landmarker import FaceLandmarker, LandmarkerConfig
from .skin_detector import SkinDetectorConfig

__all__ = ["crop_boxes_bilinear", "refine_boxes", "make_refined_detector",
           "make_cascade_detector_multi"]


def crop_boxes_bilinear(frames: jnp.ndarray, boxes: jnp.ndarray,
                        out_size: int, pad: float = 0.5) -> Tuple[
                            jnp.ndarray, jnp.ndarray]:
    """Sample padded square crops around per-frame boxes.

    Args:
      frames: ``(T, H, W, 3)`` uint8 BGR.
      boxes: ``(T, 4)`` int32 ``[x1, y1, x2, y2]``.
      pad: fractional margin per side (0.3 measured best for
        self-refinement; the face then spans ~60% of the crop).
    Returns:
      ``(crops (T, S, S, 3) float32 RGB in [0, 1], origins (T, 4) float32
      [x0, y0, w, h])`` — origins map crop coordinates back to pixels.
    """
    T, H, W, _ = frames.shape
    S = out_size
    b = boxes.astype(jnp.float32)
    cx = (b[:, 0] + b[:, 2]) * 0.5
    cy = (b[:, 1] + b[:, 3]) * 0.5
    half = jnp.maximum(jnp.maximum(b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]),
                       2.0) * 0.5 * (1.0 + 2.0 * pad)
    x0, y0 = cx - half, cy - half
    side = 2.0 * half

    u = jnp.arange(S, dtype=jnp.float32) / (S - 1)            # (S,)
    xs = x0[:, None] + u[None, :] * side[:, None]             # (T, S)
    ys = y0[:, None] + u[None, :] * side[:, None]

    def sample_one(img, xr, yr):
        """Bilinear gather of one frame at the (S, S) grid."""
        xc = jnp.clip(xr, 0.0, W - 1.0)
        yc = jnp.clip(yr, 0.0, H - 1.0)
        x0i = jnp.clip(jnp.floor(xc).astype(jnp.int32), 0, W - 2)
        y0i = jnp.clip(jnp.floor(yc).astype(jnp.int32), 0, H - 2)
        fx = (xc - x0i.astype(jnp.float32))[None, :, None]    # (1, S, 1)
        fy = (yc - y0i.astype(jnp.float32))[:, None, None]    # (S, 1, 1)
        imgf = img.astype(jnp.float32)
        g00 = imgf[y0i][:, x0i]                               # (S, S, 3)
        g01 = imgf[y0i][:, x0i + 1]
        g10 = imgf[y0i + 1][:, x0i]
        g11 = imgf[y0i + 1][:, x0i + 1]
        top = g00 * (1 - fx) + g01 * fx
        bot = g10 * (1 - fx) + g11 * fx
        return top * (1 - fy) + bot * fy

    crops = jax.vmap(sample_one)(frames, xs, ys)              # (T, S, S, 3)
    crops = crops[..., ::-1] / 255.0                          # BGR -> RGB
    origins = jnp.stack([x0, y0, side, side], axis=-1)
    return crops, origins


def refine_boxes(params, frames: jnp.ndarray, boxes: jnp.ndarray,
                 valid: jnp.ndarray,
                 cfg: LandmarkerConfig = LandmarkerConfig(),
                 threshold: float = 0.0, pad: float = 0.3
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine proposal boxes with the landmarker on padded crops.

    Returns refined ``(boxes, valid)``; invalid proposals pass through
    unchanged (masked), and a proposal whose crop the landmarker rejects
    (presence below ``threshold``) turns invalid.
    """
    T, H, W, _ = frames.shape
    model = FaceLandmarker(cfg)
    crops, origins = crop_boxes_bilinear(frames, boxes, cfg.input_size, pad)
    lm, presence = model.apply({"params": params}, crops)    # (T, L, 2)
    px = origins[:, 0:1] + lm[..., 0] * origins[:, 2:3]      # (T, L)
    py = origins[:, 1:2] + lm[..., 1] * origins[:, 3:4]
    x1 = jnp.clip(jnp.min(px, axis=1), 0, W - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.min(py, axis=1), 0, H - 1).astype(jnp.int32)
    x2 = jnp.clip(jnp.max(px, axis=1), 0, W - 1).astype(jnp.int32)
    y2 = jnp.clip(jnp.max(py, axis=1), 0, H - 1).astype(jnp.int32)
    refined = jnp.stack([x1, y1, x2, y2], axis=-1)
    ok = jnp.logical_and(valid, presence > threshold)
    out = jnp.where(ok[:, None], refined, boxes)
    return out, ok


def make_refined_detector(params,
                          cfg: LandmarkerConfig = LandmarkerConfig(),
                          threshold: float = 0.0, pad: float = 0.3,
                          passes: int = 1):
    """Single-face accuracy flagship: landmarker + crop self-refinement.

    Full-frame landmarker proposes; ``passes`` additional landmarker runs on
    a crop around the current box sharpen it (held-out IoU 0.890 -> 0.924
    with one pass).  Same ``frames -> (boxes, valid)`` interface as
    ``skin_detector.detect_faces``; drops into ``extract_signals``.
    """
    from .landmarker import landmarks_to_bbox_valid, preprocess_frames

    model = FaceLandmarker(cfg)

    def _detect(p, frames):
        T, H, W, _ = frames.shape
        x = preprocess_frames(frames, cfg.input_size)
        lm, presence = model.apply({"params": p}, x)
        boxes, valid = landmarks_to_bbox_valid(lm, presence, W, H, threshold)
        for _ in range(passes):
            boxes, valid = refine_boxes(p, frames, boxes, valid, cfg,
                                        threshold, pad)
        return boxes, valid

    return jax.tree_util.Partial(_detect, params)


def load_default_refined_detector(path: str = None, threshold: float = 0.0,
                                  passes: int = 1):
    """The repo checkpoint wrapped as the self-refining detector."""
    from .landmarker import load_default_detector

    det = load_default_detector(path, threshold)   # Partial(_detect, params)
    params = det.args[0]
    from .train import TrainConfig
    return make_refined_detector(params, TrainConfig().model, threshold,
                                 passes=passes)


def make_cascade_detector_multi(params,
                                cfg: LandmarkerConfig = LandmarkerConfig(),
                                k_faces: int = 2,
                                det: SkinDetectorConfig = SkinDetectorConfig(),
                                threshold: float = 0.0, pad: float = 0.3):
    """Multi-face cascade: top-K skin proposals, each refined on its crop.

    ``frames -> (boxes (T, K, 4), valid (T, K))`` — the multi-face detector
    interface of ``multiface.detect_faces_multi``.
    """
    from .multiface import detect_faces_multi

    def _detect(p, frames):
        boxes, valid = detect_faces_multi(frames, k_faces, det)

        def one(bk, vk):
            return refine_boxes(p, frames, bk, vk, cfg, threshold, pad)

        return jax.vmap(one, in_axes=(1, 1), out_axes=1)(boxes, valid)

    return jax.tree_util.Partial(_detect, params)
