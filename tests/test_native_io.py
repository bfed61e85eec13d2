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
