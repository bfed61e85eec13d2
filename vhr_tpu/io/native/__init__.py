"""Native (C++) host decode/staging service with ctypes bindings."""

from .binding import (  # noqa: F401
    NativeVideoReader,
    NativeVideoWriter,
    build,
    is_available,
)
