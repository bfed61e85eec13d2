"""DSP core: filter design (host numpy) + filtering/spectral/ICA on TPU."""

from . import design, filters, ica, projections, spectral  # noqa: F401
