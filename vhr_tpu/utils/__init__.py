"""Utilities: synthetic data generation, logging, profiling."""

from . import synth  # noqa: F401
