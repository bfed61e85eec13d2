"""Checkpoint/resume tests: model params and live streaming state."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vhr_tpu.models import checkpoint as ckpt


def test_params_roundtrip(tmp_path):
    from vhr_tpu.models import train as vtrain
    cfg = vtrain.TrainConfig(batch_size=4)
    model, params, tx, opt_state = vtrain.init_state(cfg, jax.random.PRNGKey(0))
    path = tmp_path / "ckpt"
    ckpt.save_params(str(path), params)
    restored = ckpt.load_params(str(path), like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_live_state_resume_is_seamless(tmp_path):
    """Snapshot mid-stream, restore, continue: outputs identical to an
    uninterrupted run (the resume capability the reference lacks)."""
    from vhr_tpu.pipeline import live
    from vhr_tpu.utils.synth import SynthSpec, synthesize

    clip = synthesize(SynthSpec(duration_s=6.0, height=48, width=64))
    cfg = live.LiveConfig(fps=clip.fps)
    stp = live.make_step(cfg, donate=False)

    # Uninterrupted run.
    st = live.init_state(cfg)
    ref = []
    for f in clip.frames:
        st, out = stp(st, jnp.asarray(f))
        ref.append(float(out.green_filtered))

    # Interrupted at frame 80: snapshot -> restore -> continue.
    st = live.init_state(cfg)
    for f in clip.frames[:80]:
        st, _ = stp(st, jnp.asarray(f))
    ckpt.save_live_state(tmp_path / "live.npz", st)
    st2 = ckpt.load_live_state(tmp_path / "live.npz", like=st)
    got = []
    for f in clip.frames[80:]:
        st2, out = stp(st2, jnp.asarray(f))
        got.append(float(out.green_filtered))

    np.testing.assert_allclose(got, ref[80:], rtol=1e-6, atol=1e-6)


def test_stage_timer():
    from vhr_tpu.utils.profiling import StageTimer
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2
    assert rep["a"]["total_s"] >= 0.0
