"""End-to-end rPPG pipelines (offline batch, live streaming, EVM)."""

from . import offline  # noqa: F401
