"""Face localization models: classical skin detector + learned landmarker."""

from . import skin_detector  # noqa: F401
