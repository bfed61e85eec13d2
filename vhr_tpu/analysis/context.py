"""Sweep-wide options shared by the measurement plugins.

The reference's measurement contract is ``measure(video_path) ->
(N, 2)`` with no detector parameter because its harness hard-codes
MediaPipe (``/root/reference/analysis/utils/roi.py:17-20``).  Here the
face-localization family is a *harness-level* choice (`--detector` on
``analysis.main``), threaded to the plugins through this context so the
plugin contract stays exactly the reference's.

``set_detector`` accepts the app detector names
(``skin|landmarker|landmarker-real|refined|mediapipe[-bf16|-exact]``);
``current_detector()`` resolves lazily (weights load once per process)
and returns the pipeline detector callable, or ``None`` for the default
skin-chroma stage.  ``set_detect_every``/``current_detect_every`` thread
the detection cadence the same way.
"""

from __future__ import annotations

_detector_name = "skin"
_detect_every = 1
_cache: dict = {}

__all__ = ["set_detector", "current_detector", "current_detector_name",
           "set_detect_every", "current_detect_every"]


def set_detector(name: str) -> None:
    global _detector_name
    _detector_name = name


def set_detect_every(n: int) -> None:
    global _detect_every
    if n < 1:
        raise ValueError("detect_every must be >= 1")
    _detect_every = int(n)


def current_detect_every() -> int:
    return _detect_every


def current_detector_name() -> str:
    return _detector_name


def current_detector():
    if _detector_name == "skin":
        return None
    if _detector_name not in _cache:
        from ..apps.rppg_video import _resolve_detector
        _cache[_detector_name] = _resolve_detector(_detector_name)
    return _cache[_detector_name]
