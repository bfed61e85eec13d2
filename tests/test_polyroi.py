"""Mesh-polygon skin-mask ROI (ops/polyroi + extract_signals_polygon).

Beyond-parity surface: the reference measures a rectangle carved from the
landmark bbox (``/root/reference/analysis/utils/roi.py:53-59``); here the
measurement region is a convex polygon of face-mesh vertices."""

import numpy as np
import pytest
import jax.numpy as jnp

from vhr_tpu.ops import polyroi


def _gradient_frame(H=120, W=160):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([xx, yy, (xx + yy) / 2.0], -1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _exact_polygon_mean(frame, verts):
    from matplotlib.path import Path
    H, W = frame.shape[:2]
    pts = np.stack(np.mgrid[0:H, 0:W][::-1], -1).reshape(-1, 2).astype(float)
    mask = Path(verts).contains_points(pts).reshape(H, W)
    return frame[mask].astype(np.float64).mean(0), mask.sum()


def test_polygon_means_match_exact_rasterization():
    frame = _gradient_frame()
    verts = np.array([[30.0, 20.0], [130.0, 40.0], [60.0, 100.0]],
                     np.float32)
    m, c = polyroi.polygon_channel_means(
        jnp.asarray(frame[None]), jnp.asarray(verts[None]), grid=64)
    exact, npx = _exact_polygon_mean(frame, verts)
    np.testing.assert_allclose(np.asarray(m[0]), exact, atol=0.05)
    assert abs(float(c[0]) - npx) / npx < 0.02


def test_polygon_winding_invariance():
    frame = _gradient_frame()
    verts = np.array([[30.0, 20.0], [130.0, 40.0], [90.0, 90.0],
                      [40.0, 80.0]], np.float32)
    f = jnp.asarray(frame[None])
    m1, c1 = polyroi.polygon_channel_means(f, jnp.asarray(verts[None]))
    m2, c2 = polyroi.polygon_channel_means(f, jnp.asarray(verts[::-1][None]))
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-3)
    np.testing.assert_allclose(float(c1[0]), float(c2[0]), rtol=1e-5)


def test_polygon_rectangle_matches_roi_channel_means():
    from vhr_tpu.ops.reduce import roi_channel_means
    frame = _gradient_frame()
    x1, y1, x2, y2 = 24, 30, 120, 96
    verts = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)
    f = jnp.asarray(frame[None])
    m, _ = polyroi.polygon_channel_means(f, jnp.asarray(verts[None]),
                                         grid=64)
    rect_m, _ = roi_channel_means(f, jnp.asarray([[x1, y1, x2, y2]],
                                                 np.int32))
    # Resampled-grid estimate vs exact pixel mean of the same rectangle.
    np.testing.assert_allclose(np.asarray(m[0]), np.asarray(rect_m[0]),
                               atol=0.6)


def test_polygon_degenerate_vertices_zero():
    frame = _gradient_frame()
    m, c = polyroi.polygon_channel_means(
        jnp.asarray(frame[None]), jnp.zeros((1, 5, 2), jnp.float32))
    assert float(c[0]) == 0.0
    np.testing.assert_array_equal(np.asarray(m[0]), 0.0)


def test_polygon_means_clip_to_image():
    """A polygon hanging off the frame edge contributes NO off-image area:
    means match exact rasterization of the clipped region and count
    reports only in-image pixels (reference clips its ROI to the frame,
    ``analysis/utils/roi.py:56-59``; ADVICE r3)."""
    frame = _gradient_frame()
    H, W = frame.shape[:2]
    # Triangle whose left third hangs off x<0 and top corner off y<0.
    verts = np.array([[-50.0, -10.0], [100.0, 30.0], [20.0, 110.0]],
                     np.float32)
    m, c = polyroi.polygon_channel_means(
        jnp.asarray(frame[None]), jnp.asarray(verts[None]), grid=96)
    from matplotlib.path import Path
    pts = np.stack(np.mgrid[0:H, 0:W][::-1], -1).reshape(-1, 2).astype(float)
    mask = Path(verts).contains_points(pts).reshape(H, W)
    exact = frame[mask].astype(np.float64).mean(0)
    npx = mask.sum()
    # Edge-clamped (unclipped) sampling would drag channel 0 (the x ramp)
    # toward 0 by replicating column 0; the clipped mean must agree with
    # the in-image rasterization instead.
    np.testing.assert_allclose(np.asarray(m[0]), exact, atol=1.0)
    assert abs(float(c[0]) - npx) / npx < 0.05


def test_polygon_bbox_clipping():
    verts = np.array([[[-10.0, 5.5], [200.0, 20.0], [50.0, 300.0]]],
                     np.float32)
    bb = np.asarray(polyroi.polygon_bbox(jnp.asarray(verts), 160, 120))
    np.testing.assert_array_equal(bb[0], [0, 5, 160, 120])


# --- production-weights integration (slow: drives the mediapipe graph) ---


@pytest.fixture(scope="module")
def portrait():
    from vhr_tpu.utils.realface import real_face_image
    img = real_face_image()
    if img is None:
        pytest.skip("no bundled real-face asset in this environment")
    return img


def test_cheek_poly_idx_derivation_pinned(portrait):
    """CHEEK_POLY_IDX provenance: on the portrait these mesh vertices lie
    inside the reference cheek band (rolled-frame ratios) and their hull
    covers most of it, clipped to the silhouette."""
    from vhr_tpu.models import mediapipe_face as mp
    from vhr_tpu.config import ROIConfig

    params, det_apply, lm_apply = mp.load_face_models()
    frames = jnp.asarray(portrait[None])
    rects, _, ok = mp.detect_faces_mp(params, det_apply, frames, k_faces=1)
    assert bool(ok[0, 0])
    lm_px, _ = mp.face_landmarks(params, lm_apply, frames, rects)
    lm = np.asarray(lm_px[0, 0])
    rot = float(rects.rot[0, 0])
    c, s = np.cos(rot), np.sin(rot)
    px = lm[:, 0] * c + lm[:, 1] * s
    py = -lm[:, 0] * s + lm[:, 1] * c
    x1, x2, y1, y2 = px.min(), px.max(), py.min(), py.max()
    w, h = x2 - x1, y2 - y1
    r = ROIConfig()
    bx1, bx2 = x1 + r.cheek_horizontal * w, x2 - r.cheek_horizontal * w
    by1, by2 = y1 + r.cheek_top * h, y1 + r.cheek_bottom * h
    idx = np.asarray(polyroi.CHEEK_POLY_IDX)
    tol = 1.0  # px: crop-mode default differs from the exact derivation
    assert (px[idx] >= bx1 - tol).all() and (px[idx] <= bx2 + tol).all()
    assert (py[idx] >= by1 - tol).all() and (py[idx] <= by2 + tol).all()
    # Hull area: most of the band, minus the off-silhouette corners.
    v = np.stack([px[idx], py[idx]], -1)
    area = 0.5 * abs(np.sum(v[:, 0] * np.roll(v[:, 1], -1)
                            - np.roll(v[:, 0], -1) * v[:, 1]))
    frac = area / ((bx2 - bx1) * (by2 - by1))
    assert 0.6 < frac < 0.95


def test_polygon_excludes_band_corner_contamination(portrait):
    """The mask semantics the polygon exists for: content in the cheek
    band's corners (outside the silhouette hull) shifts the rectangle
    mean but not the polygon mean."""
    from vhr_tpu.models.mediapipe_face import (make_mediapipe_poly_detector,
                                               make_mediapipe_roi_detector)
    from vhr_tpu.ops.reduce import roi_channel_means

    det_p = make_mediapipe_poly_detector()
    det_r = make_mediapipe_roi_detector()
    f = jnp.asarray(portrait[None])
    _, verts, okp = det_p(f)
    _, rois, okr = det_r(f)
    assert bool(okp[0]) and bool(okr[0])
    # Paint band-minus-polygon pixels saturated green.
    from matplotlib.path import Path
    H, W = portrait.shape[:2]
    x1, y1, x2, y2 = np.asarray(rois[0])
    pts = (np.stack(np.mgrid[0:H, 0:W][::-1], -1)
           .reshape(-1, 2).astype(float))
    inside_poly = Path(np.asarray(verts[0])).contains_points(pts)
    inside_poly = inside_poly.reshape(H, W)
    band = np.zeros((H, W), bool)
    band[y1:y2, x1:x2] = True
    corner = band & ~inside_poly
    assert corner.sum() > 50  # the rectangle really does include extra area
    dirty = portrait.copy()
    dirty[corner] = (0, 255, 0)
    fd = jnp.asarray(dirty[None])
    m_clean, _ = polyroi.polygon_channel_means(f, verts)
    m_dirty, _ = polyroi.polygon_channel_means(fd, verts)
    r_clean, _ = roi_channel_means(f, rois)
    r_dirty, _ = roi_channel_means(fd, rois)
    poly_shift = abs(float(m_dirty[0, 1]) - float(m_clean[0, 1]))
    rect_shift = abs(float(r_dirty[0, 1]) - float(r_clean[0, 1]))
    assert rect_shift > 5.0           # rectangle swallows the contamination
    assert poly_shift < 0.5 * rect_shift   # polygon mask rejects most of it


def test_polygon_pipeline_recovers_bpm_real_face():
    from vhr_tpu.utils.realface import synthesize_real_face_clip
    from vhr_tpu.models.mediapipe_face import make_mediapipe_poly_detector
    from vhr_tpu.pipeline.offline import extract_signals_polygon
    from vhr_tpu.config import PipelineConfig

    try:
        clip = synthesize_real_face_clip(duration_s=12.0, fps=10.0,
                                         noise_std=1.0, scale=0.5)
    except RuntimeError:
        pytest.skip("no bundled real-face asset in this environment")
    fr = jnp.asarray(clip.frames)
    det = make_mediapipe_poly_detector()
    trace = extract_signals_polygon(fr, det, PipelineConfig())
    assert bool(trace.valid.all())
    g = np.asarray(trace.bgr[:, 1], np.float64)
    g -= g.mean()
    p = clip.pulse - clip.pulse.mean()
    assert np.corrcoef(g, p)[0, 1] > 0.95
    # ROI bboxes stay inside the tracked face box (it is a face subregion).
    rois = np.asarray(trace.rois)
    boxes = np.asarray(trace.boxes)
    assert (rois[:, 0] >= boxes[:, 0] - 2).all()
    assert (rois[:, 2] <= boxes[:, 2] + 2).all()


def test_polygon_pipeline_cadence_and_holdover(portrait):
    """detect_every=N equals cadence-1 on a static clip, and the vertex
    ring holds through a forced dropout (lmroi holdover semantics)."""
    from vhr_tpu.models.mediapipe_face import make_mediapipe_poly_detector
    from vhr_tpu.pipeline.offline import extract_signals_polygon
    from vhr_tpu.config import PipelineConfig

    small = portrait[::2, ::2]
    fr = jnp.asarray(np.repeat(small[None], 8, axis=0))
    det = make_mediapipe_poly_detector()
    cfg = PipelineConfig()
    t1 = extract_signals_polygon(fr, det, cfg)
    t2 = extract_signals_polygon(fr, det, cfg, detect_every=2)
    assert bool((t1.valid == t2.valid).all())
    np.testing.assert_allclose(np.asarray(t1.bgr), np.asarray(t2.bgr),
                               atol=1e-3)

    # Dropout: blank frames mid-clip -> holdover reuses the vertex ring.
    import jax
    if isinstance(det, jax.tree_util.Partial):
        base_fn, base_args = det.func, tuple(det.args)

    def flaky(*args):
        frames = args[-1]
        b, v, ok = base_fn(*base_args, frames)
        drop = jnp.zeros((frames.shape[0],), bool).at[3].set(True) \
                  .at[4].set(True)
        return (jnp.where(drop[:, None], 0, b),
                jnp.where(drop[:, None, None], 0.0, v),
                jnp.logical_and(ok, ~drop))

    t3 = extract_signals_polygon(fr, flaky, cfg)
    assert bool(t3.valid.all())           # held through the dropout
    np.testing.assert_allclose(np.asarray(t3.bgr[3]), np.asarray(t3.bgr[2]),
                               atol=1e-3)
