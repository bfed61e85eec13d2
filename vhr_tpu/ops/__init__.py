"""Batched image/ROI ops: geometry, reductions, Pallas kernels."""

from . import reduce, roi  # noqa: F401
