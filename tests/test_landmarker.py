"""Learned landmark model: forward, adapter interface, checkpoint detector."""

import os
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vhr_tpu.models import landmarker as lmk
from vhr_tpu.models import train as vtrain
from vhr_tpu.utils.synth import SynthSpec, synthesize

CKPT = Path(__file__).resolve().parent.parent / "checkpoints" / "landmarker"


def test_forward_shapes():
    cfg = lmk.LandmarkerConfig()
    model = lmk.FaceLandmarker(cfg)
    x = jnp.zeros((3, cfg.input_size, cfg.input_size, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    lm, presence = model.apply({"params": params}, x)
    assert lm.shape == (3, cfg.num_landmarks, 2)
    assert presence.shape == (3,)
    assert float(jnp.min(lm)) >= 0.0 and float(jnp.max(lm)) <= 1.0


def test_detector_adapter_interface():
    cfg = vtrain.TrainConfig(batch_size=8)
    model, params, _, _ = vtrain.init_state(cfg, jax.random.PRNGKey(0))
    det = lmk.make_detector(params, cfg.model)
    clip = synthesize(SynthSpec(duration_s=1.0, height=60, width=80))
    boxes, valid = det(jnp.asarray(clip.frames))
    assert boxes.shape == (30, 4) and valid.shape == (30,)
    # Drops into the pipeline.
    from vhr_tpu.pipeline import offline
    trace = offline.extract_signals(jnp.asarray(clip.frames), detector=det)
    assert trace.bgr.shape == (30, 3)


@pytest.mark.skipif(not CKPT.exists(), reason="no trained checkpoint in repo")
def test_trained_checkpoint_localizes_faces():
    det = lmk.load_default_detector()
    clip = synthesize(SynthSpec(duration_s=2.0, height=96, width=120))
    boxes, valid = det(jnp.asarray(clip.frames))
    assert bool(np.asarray(valid).all())
    b = np.asarray(boxes)
    t = clip.face_boxes

    def iou(a, c):
        ix = max(0, min(a[2], c[2]) - max(a[0], c[0]))
        iy = max(0, min(a[3], c[3]) - max(a[1], c[1]))
        inter = ix * iy
        union = ((a[2] - a[0]) * (a[3] - a[1])
                 + (c[2] - c[0]) * (c[3] - c[1]) - inter)
        return inter / union

    ious = [iou(b[i], t[i]) for i in range(0, len(b), 10)]
    assert float(np.mean(ious)) > 0.5, ious
