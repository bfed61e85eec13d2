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
