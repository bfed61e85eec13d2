"""Landmark-model training: synthetic supervision, mesh-sharded train step.

The reference ships frozen MediaPipe weights (``face_landmarker.task``) and
has no training capability at all.  Here the landmark model trains end to end
on the synthetic face generator (``vhr_tpu.utils.synth``) with a mesh-sharded
``train_step``:

* **dp** — batch sharded over the ``data`` mesh axis; gradients reduced by
  XLA collectives inserted from the shardings (no hand-written psum);
* **tp** — dense-layer kernels sharded over the ``model`` axis (the trunk
  and head matmuls are the FLOPs).

The same step runs on one chip (trivial mesh) or a pod slice; the driver's
``dryrun_multichip`` exercises it on a virtual 8-device mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .landmarker import FaceLandmarker, LandmarkerConfig

__all__ = ["TrainConfig", "init_state", "make_train_step", "synth_batch",
           "param_shardings", "train"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: LandmarkerConfig = LandmarkerConfig()
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    batch_size: int = 64
    presence_weight: float = 0.2


def init_state(cfg: TrainConfig, rng: jax.Array):
    model = FaceLandmarker(cfg.model)
    s = cfg.model.input_size
    params = model.init(rng, jnp.zeros((1, s, s, 3)))["params"]
    tx = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    return model, params, tx, opt_state


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel layout: shard every >=2-D kernel's output features
    over the ``model`` axis when divisible; replicate the rest."""
    model_size = mesh.shape["model"]

    def spec_for(path, x):
        if x.ndim >= 2 and x.shape[-1] % model_size == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _loss_fn(model, params, batch, presence_weight):
    lm, presence = model.apply({"params": params}, batch["image"])
    lm_err = jnp.sum((lm - batch["landmarks"]) ** 2, axis=-1)   # (B, L)
    lm_loss = jnp.mean(jnp.where(batch["has_face"][:, None], lm_err, 0.0))
    bce = optax.sigmoid_binary_cross_entropy(
        presence, batch["has_face"].astype(jnp.float32))
    return lm_loss + presence_weight * jnp.mean(bce), (lm_loss, jnp.mean(bce))


def make_train_step(model, tx, cfg: TrainConfig, mesh: Mesh = None,
                    params_example=None):
    """Build the jitted, mesh-sharded train step.

    With a mesh: params/opt-state follow :func:`param_shardings`, the batch
    shards over ``data``; XLA derives the all-reduce for the data-parallel
    gradient and the collectives for the model-sharded matmuls.
    """
    def step(params, opt_state, batch):
        (loss, aux), grads = jax.value_and_grad(
            lambda p: _loss_fn(model, p, batch, cfg.presence_weight),
            has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    if mesh is None:
        return jax.jit(step)

    p_shard = param_shardings(params_example, mesh)
    batch_spec = {
        "image": NamedSharding(mesh, P("data")),
        "landmarks": NamedSharding(mesh, P("data")),
        "has_face": NamedSharding(mesh, P("data")),
    }
    # adamw's mu/nu mirror the param tree -> same tensor-parallel layout;
    # scalar counts replicate.  `None` lets jit propagate from the params.
    return jax.jit(
        step,
        in_shardings=(p_shard, None, batch_spec),
        out_shardings=(p_shard, None, NamedSharding(mesh, P()),
                       (NamedSharding(mesh, P()), NamedSharding(mesh, P()))),
    )


def synth_batch(cfg: TrainConfig, rng: np.random.Generator
                ) -> Dict[str, np.ndarray]:
    """A batch of synthetic faces with landmark ground truth.

    Faces are skin-tone ellipses (as in ``vhr_tpu.utils.synth``) with the
    ground-truth landmarks placed uniformly on the ellipse boundary; 10% of
    samples are face-free backgrounds for presence supervision.
    """
    s = cfg.model.input_size
    L = cfg.model.num_landmarks
    B = cfg.batch_size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)

    images = np.empty((B, s, s, 3), np.float32)
    lms = np.zeros((B, L, 2), np.float32)
    has = np.zeros((B,), bool)
    theta = 2.0 * np.pi * np.arange(L) / L

    for b in range(B):
        bg = rng.uniform(0.1, 0.5, size=3).astype(np.float32)
        img = np.broadcast_to(bg, (s, s, 3)).copy()
        # Distractors: small non-face blobs (some skin-toned) so the model
        # can't shortcut on color alone.
        for _ in range(rng.integers(0, 3)):
            dcx, dcy = rng.uniform(0.0, 1.0, 2) * s
            dr = rng.uniform(0.02, 0.08) * s
            dmask = ((xx - dcx) ** 2 + (yy - dcy) ** 2) <= dr ** 2
            img[dmask] = rng.uniform(0.2, 0.9, 3).astype(np.float32)
        if rng.random() > 0.1:
            cx, cy = rng.uniform(0.3, 0.7, 2) * s
            rx = rng.uniform(0.12, 0.3) * s
            ry = rx * rng.uniform(1.1, 1.6)
            mask = (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2) <= 1.0
            skin = np.array([0.72, 0.55, 0.42], np.float32) \
                + rng.uniform(-0.08, 0.08, 3).astype(np.float32)  # RGB
            img[mask] = skin
            # Illumination gradient across the face (shading realism).
            grad = 1.0 + rng.uniform(-0.15, 0.15) * (xx - cx) / max(rx, 1.0)
            img[mask] *= np.clip(grad[mask, None], 0.6, 1.4)
            lms[b, :, 0] = (cx + rx * np.cos(theta)) / s
            lms[b, :, 1] = (cy + ry * np.sin(theta)) / s
            has[b] = True
        img += rng.normal(0, 0.02, img.shape).astype(np.float32)
        images[b] = np.clip(img, 0, 1)

    return {"image": images, "landmarks": lms,
            "has_face": has}


def train(cfg: TrainConfig, steps: int, seed: int = 0, mesh: Mesh = None):
    """Train the landmarker on synthetic faces; returns (model, params, losses)."""
    rng = np.random.default_rng(seed)
    model, params, tx, opt_state = init_state(cfg, jax.random.PRNGKey(seed))
    step = make_train_step(model, tx, cfg, mesh=mesh, params_example=params)
    if mesh is not None:
        params = jax.tree.map(jax.device_put, params,
                              param_shardings(params, mesh))
    losses = []
    for _ in range(steps):
        batch = jax.tree.map(jnp.asarray, synth_batch(cfg, rng))
        params, opt_state, loss, aux = step(params, opt_state, batch)
        losses.append(float(loss))
    return model, params, losses
