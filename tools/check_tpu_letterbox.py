"""On-chip regression check for the XLA:TPU reverse+einsum miscompile.

A channel reverse (``frames[..., ::-1]``) fused into the *input* of the
letterbox's two chained interp-matrix einsums compiles to wrong values on
XLA:TPU for every batch T >= 64: the letterbox content region comes out
with errors up to 197 (u8 scale) / 1.55 (on [-1, 1]) while T <= 16 is
exact, reproduced in BOTH f32 and bf16, deterministic across frames.
Downstream effect: the BlazeFace detector scores every anchor below
threshold and the production farm reports zero valid faces
(bench.py bench_multistream's validity assert is the tripwire that
caught it).  Fix: flip channels AFTER the products (bit-identical math,
resize is channel-wise) — models/mediapipe_face.py ``_letterbox`` /
``_crop_axis_mxu``.

Run on the real chip (CPU/interpret mode does not reproduce):

    PYTHONPATH=/root/repo:/root/.axon_site python tools/check_tpu_letterbox.py

Prints one PASS/FAIL line per (T, dtype); exits nonzero on any FAIL.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import cv2  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vhr_tpu.models import mediapipe_face as mp  # noqa: E402
from vhr_tpu.utils.realface import real_face_image  # noqa: E402


def main() -> int:
    img = real_face_image()
    frame = cv2.resize(img, (1280, 720), interpolation=cv2.INTER_AREA)
    H, W = frame.shape[:2]
    size = mp._DET_SIZE
    _, h2, w2, px, py = mp._letterbox_geometry(H, W, size)

    # f64 numpy oracle of the same separable product
    axm = mp._resize_matrix(W, w2).astype(np.float64)
    aym = mp._resize_matrix(H, h2).astype(np.float64)
    rgb = frame[..., ::-1].astype(np.float64)
    small = np.einsum("nh,hmc->nmc", aym, np.einsum("hwc,mw->hmc", rgb, axm))
    oracle = np.full((size, size, 3), 0.0)
    oracle[py:py + h2, px:px + w2] = small
    oracle = oracle * (2.0 / 255.0) - 1.0

    failed = False
    for T in (1, 16, 64, 256):
        fT = jnp.asarray(np.broadcast_to(frame[None], (T, H, W, 3)).copy())
        for dt, tag, tol in ((jnp.float32, "f32", 0.02),
                             (jnp.bfloat16, "bf16", 0.05)):
            lb = jax.jit(
                lambda f, d=dt: mp._letterbox(f, size, -1.0, 1.0, dtype=d)
            )(fT)
            a = np.asarray(lb, np.float32)
            err = np.abs(a[0] - oracle).max()
            spread = np.abs(a - a[0:1]).max()
            ok = err <= tol and spread == 0.0
            failed |= not ok
            print(f"{'PASS' if ok else 'FAIL'} T={T:3d} {tag}: "
                  f"err={err:.4f} batch-spread={spread:.4f}", flush=True)
        del fT
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
