"""Native C++ framestore tests (skipped if the toolchain can't build it)."""

import numpy as np
import pytest

from vhr_tpu.io import video as vio
from vhr_tpu.utils.synth import SynthSpec, synthesize

native = pytest.importorskip("vhr_tpu.io.native")

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native framestore unavailable")


@pytest.fixture(scope="module")
def clip_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    clip = synthesize(SynthSpec(duration_s=4.0, height=48, width=70))
    path = root / "clip.mp4"
    vio.write_video(clip.frames, str(path), clip.fps)
    return {"path": str(path), "clip": clip, "root": root}


def test_native_reader_matches_cv2(clip_file):
    ref, fps = vio.read_video(clip_file["path"])
    with native.NativeVideoReader(clip_file["path"], chunk_frames=32,
                                  pad_row_to=128) as r:
        assert r.width == 70 and r.height == 48
        assert r.fps == pytest.approx(fps)
        # 70*3=210 bytes/row padded to 256 -> padded width not a multiple of
        # 3 pixels is rounded up in bytes: padded_width*3 % 128 == 0.
        assert (r.padded_width * 3) % 128 == 0
        chunks = list(r)
    got = np.concatenate(chunks)
    assert got.shape[0] == ref.shape[0]
    np.testing.assert_array_equal(got[:, :, :70, :], ref)
    assert np.all(got[:, :, 70:, :] == 0)  # zero padding


def test_native_reader_chunk_boundaries(clip_file):
    with native.NativeVideoReader(clip_file["path"], chunk_frames=7) as r:
        sizes = [c.shape[0] for c in r]
    assert sum(sizes) == 120
    assert all(s == 7 for s in sizes[:-1])


def test_native_writer_roundtrip(clip_file):
    clip = clip_file["clip"]
    out = str(clip_file["root"] / "out.mp4")
    with native.NativeVideoWriter(out, 70, 48, clip.fps) as w:
        w.write(clip.frames[:50])
        w.write(clip.frames[50])
    got, fps = vio.read_video(out)
    assert got.shape[0] == 51
    assert fps == pytest.approx(clip.fps)
    assert float(np.mean(np.abs(got[:50].astype(float)
                                - clip.frames[:50].astype(float)))) < 4.0


@pytest.mark.parametrize("n_dec,chunk", [(2, 16), (4, 7), (8, 16)])
def test_parallel_decode_bit_identical(clip_file, n_dec, chunk):
    """Segment-parallel decode (n_decoders>1) re-serializes to exactly the
    sequential frame stream — order, count, and bytes (VERDICT r2 #2)."""
    def read_all(n):
        with native.NativeVideoReader(clip_file["path"], chunk_frames=chunk,
                                      n_decoders=n) as r:
            chunks = list(r)
        return np.concatenate(chunks), [c.shape[0] for c in chunks]

    seq, seq_sizes = read_all(1)
    par, par_sizes = read_all(n_dec)
    assert par_sizes == seq_sizes
    np.testing.assert_array_equal(par, seq)


def test_parallel_decode_stats(clip_file):
    with native.NativeVideoReader(clip_file["path"], chunk_frames=16,
                                  n_decoders=4) as r:
        n = sum(c.shape[0] for c in r)
        st = r.stats()
    assert n == 120
    assert st["produced"] == st["consumed"] == 8


def test_i420_staging_bit_exact_vs_cv2(clip_file):
    """fmt="i420" stages exactly cv2's BGR2YUV_I420 bytes, and the device
    reconstruction (ops.color.i420_to_bgr_flat) is bit-exact vs cv2's own
    YUV2BGR_I420 of those bytes (studio-swing BT.601 fixed point)."""
    import cv2
    import jax.numpy as jnp

    from vhr_tpu.ops import color

    with native.NativeVideoReader(clip_file["path"], chunk_frames=32) as r:
        bgr = np.concatenate([c[:, :, :r.width] for c in r])
        H, W, wpad = r.height, r.width, r.padded_width
    with native.NativeVideoReader(clip_file["path"], chunk_frames=32,
                                  fmt="i420") as r:
        assert r.frame_stride % 128 == 0
        raw = np.concatenate(list(r))
    assert raw.shape == (bgr.shape[0], r.frame_stride)
    payload = H * W * 3 // 2
    assert np.all(raw[:, payload:] == 0)  # zero stride padding

    # staged bytes == cv2's forward conversion of the decoded BGR frames
    for i in range(0, bgr.shape[0], 37):
        fwd = cv2.cvtColor(bgr[i], cv2.COLOR_BGR2YUV_I420)
        np.testing.assert_array_equal(raw[i, :payload],
                                      fwd.reshape(-1))

    # device reconstruction == cv2's inverse, bit for bit
    dev = np.asarray(color.i420_to_bgr_flat(jnp.asarray(raw), H, W, wpad))
    dev = dev.reshape(-1, H, wpad, 3)
    assert np.all(dev[:, :, W:] == 0)     # zero column padding
    for i in range(0, bgr.shape[0], 37):
        ref = cv2.cvtColor(raw[i, :payload].reshape(H * 3 // 2, W),
                           cv2.COLOR_YUV2BGR_I420)
        np.testing.assert_array_equal(dev[i, :, :W], ref)


def test_i420_streaming_pipeline_equivalence(clip_file):
    """extract_signals_streaming(transfer="i420") tracks identically to BGR
    staging and its ROI means sit within the chroma-subsample loss bound;
    the recovered BPM is unchanged (the 4:2:0 loss is spatial, averaged out
    by the ROI mean and removed by the bandpass)."""
    from vhr_tpu.config import PipelineConfig
    from vhr_tpu.pipeline import offline

    cfg = PipelineConfig(window_seconds=2.0, acquisition_seconds=1.0)
    a, va, fps = offline.extract_signals_streaming(
        clip_file["path"], cfg, chunk_frames=32)
    b, vb, _ = offline.extract_signals_streaming(
        clip_file["path"], cfg, chunk_frames=32, transfer="i420")
    np.testing.assert_array_equal(va, vb)
    assert float(np.abs(a - b).max()) < 1.5

    import jax.numpy as jnp

    from vhr_tpu.ops import windows as vwin

    def bpm_of(means, valid):
        g = jnp.asarray(np.where(valid, means[:, 1], 0.0), jnp.float32)
        res = vwin.rolling_bpm_fft(g, fps, cfg.band,
                                   int(cfg.window_seconds * fps),
                                   int(cfg.acquisition_seconds * fps))
        return np.asarray(res.bpm)[np.asarray(res.valid)]

    np.testing.assert_allclose(bpm_of(a, va), bpm_of(b, vb), atol=1.0)


def test_i420_roi_means_matches_reconstruction():
    """Plane-domain ROI means (affine map of Y/U/V plane means, RGB never
    materialized) match reconstruct-then-reduce within the per-pixel
    rounding bound for even-aligned boxes, and within ~1 u8 for odd
    edges (half-pixel chroma boundary)."""
    import jax.numpy as jnp

    from vhr_tpu.ops import color, reduce as vreduce

    import cv2

    rng = np.random.default_rng(7)
    T, H, W = 6, 64, 96
    # gamut-valid, spatially smooth frames (like real video): per-pixel
    # random colors put neighbor-Y + shared-chroma combinations out of
    # gamut, where the per-pixel clip the affine map drops dominates
    bgr = rng.integers(10, 246, (T, H, W, 3), np.uint8)
    bgr = np.stack([cv2.GaussianBlur(f, (9, 9), 3) for f in bgr])
    raw = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420).reshape(-1)
                    for f in bgr])
    chunk = jnp.asarray(raw)

    flat = color.i420_to_bgr_flat(chunk, H, W)
    frames = np.asarray(flat).reshape(T, H, W, 3)

    # even-aligned boxes: only the dropped per-pixel descale/clip remains
    rois_even = jnp.asarray(
        np.stack([np.full(T, 8), np.full(T, 12), np.full(T, 72),
                  np.full(T, 48)], axis=1), jnp.int32)
    ref, cnt_ref = vreduce.roi_channel_means(jnp.asarray(frames), rois_even)
    got, cnt = color.i420_roi_means(chunk, rois_even, H, W)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))
    assert float(np.abs(np.asarray(got) - np.asarray(ref)).max()) < 0.51

    # odd edges: half-pixel chroma boundary approximation
    rois_odd = jnp.asarray(
        np.stack([np.full(T, 9), np.full(T, 13), np.full(T, 71),
                  np.full(T, 47)], axis=1), jnp.int32)
    ref2, _ = vreduce.roi_channel_means(jnp.asarray(frames), rois_odd)
    got2, _ = color.i420_roi_means(chunk, rois_odd, H, W)
    assert float(np.abs(np.asarray(got2) - np.asarray(ref2)).max()) < 1.5

    # empty ROI -> zeros, zero count (roi_channel_means convention)
    rois_zero = jnp.zeros((T, 4), jnp.int32)
    gz, cz = color.i420_roi_means(chunk, rois_zero, H, W)
    assert np.all(np.asarray(gz) == 0) and np.all(np.asarray(cz) == 0)


def test_i420_streaming_cadence_plane_path():
    """The i420 streaming path runs detection at cadence on reconstructed
    frames and means on the planes; cadence-4 equals cadence-1 under
    stable detection (the uniform cadence invariant)."""
    import tempfile

    from vhr_tpu.config import PipelineConfig
    from vhr_tpu.pipeline import offline
    from vhr_tpu.utils.synth import SynthSpec, synthesize

    v = synthesize(SynthSpec(duration_s=3.0, height=96, width=128, bpm=72.0))
    path = tempfile.mktemp(suffix=".avi")
    with native.NativeVideoWriter(path, 128, 96, v.fps, "MJPG") as w:
        w.write(v.frames)

    cfg = PipelineConfig(window_seconds=2.0, acquisition_seconds=1.0)
    m1, v1, _ = offline.extract_signals_streaming(
        path, cfg, chunk_frames=32, transfer="i420", detect_every=1)
    m4, v4, _ = offline.extract_signals_streaming(
        path, cfg, chunk_frames=32, transfer="i420", detect_every=4)
    np.testing.assert_array_equal(v1, v4)
    np.testing.assert_allclose(m1, m4, atol=1e-4)
