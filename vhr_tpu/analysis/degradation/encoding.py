"""Codec-matrix re-encoding: MJPEG / H.264-class / lossless.

Parity with ``analysis/degradation/encoding.py`` (codec matrix at :7-20).
Codecs are resolved against what the host OpenCV build actually provides;
unavailable entries are skipped with a notice (the reference assumed an
ffmpeg binary).
"""

from __future__ import annotations

from pathlib import Path
from typing import Generator, Tuple

import numpy as np

from . import common
from ...io import video as vio

# (label, fourcc, container extension)
CODECS = [
    ("mjpeg", "MJPG", ".avi"),
    ("h264", "avc1", ".mp4"),
    ("lossless", "FFV1", ".avi"),
]


def _reencode(input_path: str, out_path: Path, fourcc: str) -> bool:
    import cv2
    writer = None
    ok = True
    for chunk, fps, _ in vio.iter_video_chunks(input_path, 128):
        if writer is None:
            h, w = chunk.shape[1:3]
            writer = cv2.VideoWriter(str(out_path),
                                     cv2.VideoWriter_fourcc(*fourcc),
                                     fps, (w, h))
            if not writer.isOpened():
                ok = False
                break
        for f in chunk:
            writer.write(np.ascontiguousarray(f))
    if writer is not None:
        writer.release()
    if not ok and out_path.exists():
        out_path.unlink()
    return ok


def apply(input_path: str) -> Generator[Tuple[str, str], None, None]:
    root = common.output_root(input_path, "encoding")

    yield str(input_path), "original"

    for label, fourcc, ext in CODECS:
        out = root / f"{label}{ext}"
        if out.exists():
            yield str(out), label
            continue
        if _reencode(input_path, out, fourcc):
            yield str(out), label
        else:
            print(f"[encoding] codec {label} ({fourcc}) unavailable; skipped")
