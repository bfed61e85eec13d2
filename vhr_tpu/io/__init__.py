"""Host-side I/O: video decode/encode, ground-truth handling, caching."""

from . import video  # noqa: F401
