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


def test_evm_reconstruct_matches_xla():
    """Kernel #4 parity: fused upsample-add-u8 vs the XLA reconstruction."""
    import jax
    import jax.numpy as jnp
    from vhr_tpu.ops import color
    from vhr_tpu.ops.pallas_evm import to_planar
    from vhr_tpu.ops.pallas_evm_recon import evm_reconstruct_pallas

    rng = np.random.default_rng(3)
    T, H, W = 4, 72, 128
    hb, wb = 9, 16
    frames = rng.integers(0, 255, (T, H, W, 3), np.uint8)
    band = (0.04 * rng.standard_normal((T, 3, hb, wb))).astype(np.float32)

    got = evm_reconstruct_pallas(jnp.asarray(to_planar(jnp.asarray(frames))),
                                 jnp.asarray(band), rb=24, interpret=True)
    got = np.transpose(np.asarray(got), (0, 2, 3, 1))

    yiq = color.bgr_u8_to_yiq(jnp.asarray(frames))
    up = jax.image.resize(jnp.asarray(np.moveaxis(band, 1, -1)),
                          (T, H, W, 3), "linear")
    want = np.asarray(color.yiq_to_bgr_u8(yiq + up))
    # Identical math modulo u8 rounding mode (round-half-even vs +0.5).
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert (got != want).mean() < 0.02


def test_magnify_pallas_path_matches_xla():
    from vhr_tpu.config import EVMConfig
    from vhr_tpu.pipeline import evm as evm_mod

    rng = np.random.default_rng(4)
    T, H, W = 30, 48, 128
    base = rng.integers(40, 200, (1, H, W, 3), np.uint8).astype(np.float32)
    t = np.arange(T) / 30.0
    pulse = 1.5 * np.sin(2 * np.pi * 0.9 * t)
    frames = np.clip(base + pulse[:, None, None, None], 0,
                     255).astype(np.uint8)
    cfg = EVMConfig(pyramid_levels=2, amplification=20.0)
    a = np.asarray(evm_mod.magnify(jnp.asarray(frames), 30.0, cfg))
    b = np.asarray(evm_mod.magnify(jnp.asarray(frames), 30.0, cfg,
                                   use_pallas=True, interpret=True))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 2
