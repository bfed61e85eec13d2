"""App-level tests driven through their CLI entry points (headless)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vhr_tpu.io import video as vio
from vhr_tpu.utils.synth import SynthSpec, synthesize


@pytest.fixture(scope="module")
def clip_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("apps")
    clip = synthesize(SynthSpec(duration_s=24.0, bpm=75.0, height=64,
                                width=80, noise_std=0.5))
    path = root / "clip.mp4"
    vio.write_video(clip.frames, str(path), clip.fps)
    return {"path": path, "root": root, "clip": clip}


def test_rppg_video_app(clip_file):
    from vhr_tpu.apps import rppg_video
    out_dir = clip_file["root"] / "video_out"
    rc = rppg_video.main([str(clip_file["path"]), "--out-dir", str(out_dir)])
    assert rc == 0
    assert (out_dir / "annotated.mp4").exists()
    assert (out_dir / "signals.png").exists()
    frames, fps = vio.read_video(str(out_dir / "annotated.mp4"))
    assert frames.shape[0] == clip_file["clip"].frames.shape[0]


def test_rppg_video_app_live_panels(clip_file):
    """--live-panels: the reference's in-loop three-panel display
    (rppg_VIDEO.py:305-328) — panel data batched in ONE device call
    (apps.rppg_video.live_panel_data), headless runs snapshot the final
    panel state.  The panel BPM readouts must agree with the injected
    rate to the in-band Welch bin."""
    import numpy as np
    from vhr_tpu.apps import rppg_video
    out_dir = clip_file["root"] / "panels_out"
    rc = rppg_video.main([str(clip_file["path"]), "--out-dir", str(out_dir),
                          "--live-panels"])
    assert rc == 0
    assert (out_dir / "live_panels.png").exists()
    res = rppg_video.analyze(str(clip_file["path"]))
    panels = rppg_video.live_panel_data(res)
    assert panels is not None
    W0, freqs, pb, pc, bpm_b, bpm_c = panels
    assert pb.shape == pc.shape == (len(res["green"]) - W0 + 1, len(freqs))
    assert abs(float(np.median(bpm_b[-20:])) - 75.0) <= 8.0
    assert abs(float(np.median(bpm_c[-20:])) - 75.0) <= 8.0


def test_rppg_livestream_app_on_file(clip_file, capsys):
    from vhr_tpu.apps import rppg_livestream
    rc = rppg_livestream.main(["--video", str(clip_file["path"]),
                               "--no-display"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Bpm after filtering" in out
    bpms = [float(l.split(":")[1]) for l in out.splitlines()
            if l.startswith("Bpm after filtering")]
    # Late estimates only: the ring must first evict the causal filter's
    # cold-start transient (the reference's deque behaves identically).
    # Welch bins are 6.7 BPM apart at 9 s segments.
    assert abs(np.median(bpms[-60:]) - 75.0) <= 8.0


def test_bpp_app(clip_file, capsys):
    from vhr_tpu.apps import bpp
    rc = bpp.main([str(clip_file["path"]), "--json"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["width"] == 80 and stats["height"] == 64
    assert stats["frames"] == clip_file["clip"].frames.shape[0]
    assert 0.0 < stats["avg_entropy"] < 8.0
    assert stats["avg_nsr"] > 0.0


def test_psd_plot_from_cache(clip_file, tmp_path):
    os.environ["VHR_CACHE_DIR"] = str(tmp_path / "cache")
    from vhr_tpu.analysis.measurement import green_avg_psd
    arr = green_avg_psd.measure(str(clip_file["path"]))
    npz = tmp_path / "cache" / "psd_stages" / "clip.npz"
    assert npz.exists()
    from vhr_tpu.utils import psd_plot
    out_png = tmp_path / "psd.png"
    psd_plot.plot_stage_psds(str(npz), arr, acquisition_s=10.0,
                             out_path=str(out_png))
    assert out_png.exists()
    # ROI-mean cache reused on second call.
    roi_cache = tmp_path / "cache" / "roi_mean_data" / "clip.npz"
    assert roi_cache.exists()
    m1 = roi_cache.stat().st_mtime_ns
    green_avg_psd.measure(str(clip_file["path"]))
    assert roi_cache.stat().st_mtime_ns == m1


def test_evm_magnify_app(clip_file, tmp_path):
    from vhr_tpu.apps import evm_magnify
    out = str(tmp_path / "magnified.mp4")
    rc = evm_magnify.main([str(clip_file["path"]), out, "--alpha", "25",
                           "--low-hz", "1.0", "--high-hz", "1.5",
                           "--levels", "2"])
    assert rc == 0
    clip = clip_file["clip"]
    mag, fps = vio.read_video(out)
    assert mag.shape == clip.frames.shape

    def pulse_amp(frames):
        g = frames[:, 20:44, 28:52, 1].astype(float).mean((1, 2))
        s = np.abs(np.fft.rfft(g - g.mean()))
        f = np.fft.rfftfreq(len(g), 1 / clip.fps)
        return s[np.argmin(np.abs(f - 1.25))]     # 75 BPM

    assert pulse_amp(mag) > 4.0 * pulse_amp(clip.frames)


def test_rppg_video_app_multiface(tmp_path, capsys):
    """--faces 2: annotated multi output + two distinct per-face BPMs."""
    from vhr_tpu.apps import rppg_video
    from vhr_tpu.utils.synth import FaceSpec, synthesize_multi

    duo = synthesize_multi(
        (FaceSpec(center=(0.25, 0.45), bpm=60.0),
         FaceSpec(center=(0.72, 0.5), bpm=96.0)),
        height=144, width=256, duration_s=16.0, noise_std=1.0)
    path = tmp_path / "duo.mp4"
    vio.write_video(duo.frames, str(path), duo.fps)
    out_dir = tmp_path / "out"
    rc = rppg_video.main([str(path), "--out-dir", str(out_dir),
                          "--faces", "2"])
    assert rc == 0
    assert (out_dir / "annotated_multi.mp4").exists()
    assert (out_dir / "signals_multi.png").exists()
    out = capsys.readouterr().out
    vals = {}
    for line in out.splitlines():
        if line.startswith("face") and "BPM" in line:
            k, v = line.split(" BPM: ")
            vals[k] = float(v)
    assert set(vals) == {"face0", "face1"}
    assert abs(vals["face0"] - 60.0) <= 8.0     # welch bin ~6.7 BPM
    assert abs(vals["face1"] - 96.0) <= 8.0


def test_rppg_video_app_learned_detector(clip_file, capsys):
    """--detector landmarker routes the offline app through the learned
    model (weights as traced Partial args) end to end."""
    from vhr_tpu.apps import rppg_video
    out_dir = clip_file["root"] / "video_out_lmk"
    rc = rppg_video.main([str(clip_file["path"]), "--out-dir", str(out_dir),
                          "--detector", "landmarker"])
    assert rc == 0
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("BPM Butterworth")]
    assert line
    bpm = float(line[0].split(":")[1].split("|")[0])
    assert abs(bpm - 75.0) <= 8.0


def test_livestream_plot_out(tmp_path):
    """--plot with --no-display writes the signal summary panel
    (reference in-loop plot parity, rppg_LIVESTREAM.py:78-91)."""
    from vhr_tpu.apps import rppg_livestream
    from vhr_tpu.io import video as vio
    from vhr_tpu.utils.synth import SynthSpec, synthesize

    clip = synthesize(SynthSpec(duration_s=2.0, height=48, width=64))
    path = str(tmp_path / "clip.avi")
    vio.write_video(clip.frames, path, clip.fps)
    out = str(tmp_path / "signals.png")
    rc = rppg_livestream.main(["--video", path, "--max-frames", "20",
                               "--no-display", "--plot", "--plot-out", out])
    assert rc == 0
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 5000


def test_livestream_profile_trace(clip_file, tmp_path):
    """--profile-trace wraps the run in a jax.profiler device trace
    (SURVEY §5: the reference never times anything; tracing is product
    surface here)."""
    from vhr_tpu.apps import rppg_livestream
    trace_dir = tmp_path / "trace"
    rc = rppg_livestream.main(["--video", str(clip_file["path"]),
                               "--no-display", "--max-frames", "12",
                               "--profile-trace", str(trace_dir)])
    assert rc == 0
    produced = list(trace_dir.rglob("*"))
    assert any(p.is_file() for p in produced), produced
