"""Fused EVM front-end kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vhr_tpu.ops import color
from vhr_tpu.ops.pallas_evm import yiq_pyrdown_pallas
from vhr_tpu.pipeline import evm

RNG = np.random.default_rng(9)


def _xla_reference(frames):
    yiq = color.bgr_u8_to_yiq(jnp.asarray(frames))      # (T, H, W, 3)
    low = evm.gaussian_downsample(yiq)                   # (T, H/2, W/2, 3)
    return np.moveaxis(np.asarray(low), -1, 1)           # (T, 3, H/2, W/2)


@pytest.mark.parametrize("shape", [(2, 64, 256), (1, 90, 384)])
def test_yiq_pyrdown_matches_xla(shape):
    T, H, W = shape
    frames = RNG.integers(0, 256, size=(T, H, W, 3), dtype=np.uint8)
    got = np.asarray(yiq_pyrdown_pallas(jnp.asarray(frames), rb_out=16,
                                        interpret=True))
    ref = _xla_reference(frames)
    assert got.shape == ref.shape
    # Exact math incl. edge-clamp boundary handling; f32 op-order tolerance.
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=5e-7)


def test_yiq_pyrdown_rejects_bad_width():
    frames = RNG.integers(0, 256, size=(1, 32, 100, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        yiq_pyrdown_pallas(jnp.asarray(frames), interpret=True)
