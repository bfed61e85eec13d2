"""On-chip batch-consistency audit for every XLA-compiled detector path.

Motivation: XLA:TPU miscompiled the MediaPipe letterbox at batch >= 64
(a channel reverse fused into chained einsums — see
``check_tpu_letterbox.py``), producing silently-wrong values that only a
semantic assert downstream caught.  Fusion decisions change with batch
shape, so batch-1-vs-batch-N equality on IDENTICAL frames is a cheap
program-level tripwire for that whole bug class: every detector below is
deterministic per frame, so a batched run must agree with a single-frame
run up to matmul-tiling rounding (boxes within ~2 px, valid flags equal).
The EVM check cross-validates the Pallas kernel against the pure-XLA
formulation of the same math on-chip (CPU tests pin them in interpret
mode; this confirms the Mosaic lowering).

Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/check_tpu_consistency.py

One PASS/FAIL line per component; exits nonzero on any FAIL.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import cv2  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vhr_tpu.utils.realface import real_face_image  # noqa: E402

T_BIG = 64
FAILED = []


def _check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name}{': ' + detail if detail else ''}",
          flush=True)
    if not ok:
        FAILED.append(name)


def _boxes_consistent(name, det, frames, px_tol=2):
    """det(frames)->(boxes, valid): batch-T_BIG vs batch-1 agreement."""
    fT = jnp.asarray(np.broadcast_to(frames[None], (T_BIG,) + frames.shape)
                     .copy())
    bT, vT = jax.jit(lambda f: det(f))(fT)
    b1, v1 = jax.jit(lambda f: det(f))(fT[:1])
    bT, vT = np.asarray(bT, np.float32), np.asarray(vT)
    b1, v1 = np.asarray(b1, np.float32), np.asarray(v1)
    spread = np.abs(bT - bT[0:1]).max()           # determinism across batch
    dv = (vT != vT[0:1]).sum() + (vT[0:1] != v1).sum()
    db = np.abs(bT[0] - b1[0]).max()
    ok = bool(v1.any()) and dv == 0 and db <= px_tol and spread <= px_tol
    _check(name, ok, f"valid={bool(v1.any())} box_delta={db:.1f}px "
                     f"spread={spread:.1f}px valid_mismatches={int(dv)}")


def main() -> int:
    img = real_face_image()
    frame = cv2.resize(img, (1280, 720), interpolation=cv2.INTER_AREA)

    # 1. production MediaPipe weights (bf16 product default + f32 opt-out)
    from vhr_tpu.models.mediapipe_face import make_mediapipe_detector
    _boxes_consistent("mediapipe_bf16", make_mediapipe_detector(), frame)
    _boxes_consistent("mediapipe_f32",
                      make_mediapipe_detector(activation_dtype=None), frame)

    # 2. learned landmarker
    from vhr_tpu.models.landmarker import load_default_detector
    _boxes_consistent("landmarker", load_default_detector(), frame)

    # 3. refine cascade
    from vhr_tpu.models.cascade import load_default_refined_detector
    _boxes_consistent("cascade", load_default_refined_detector(), frame)

    # 4. chroma skin detector
    from vhr_tpu.models.skin_detector import detect_faces
    _boxes_consistent("skin", lambda f: detect_faces(f), frame)

    # 5. EVM: fused Pallas kernel vs the pure-XLA program, same math
    from vhr_tpu.config import HRBand
    from vhr_tpu.pipeline import evm
    rng = np.random.default_rng(3)
    clip = jnp.asarray(rng.integers(0, 255, (32, 256, 256, 3), np.uint8))
    fps = 30.0
    hp = np.asarray(jax.jit(
        lambda f: evm.magnified_pulse(f, fps, HRBand(0.7, 3.0),
                                      use_pallas=True))(clip), np.float32)
    hx = np.asarray(jax.jit(
        lambda f: evm.magnified_pulse(f, fps, HRBand(0.7, 3.0),
                                      use_pallas=False))(clip), np.float32)
    d = np.abs(hp - hx).max()
    rel = d / max(np.abs(hx).max(), 1e-6)
    _check("evm_pallas_vs_xla", rel <= 1e-3, f"maxdiff={d:.5f} rel={rel:.2e}")

    # 6. fused detect+ROI Pallas kernel vs the XLA detector+reduce pair
    #    (semantics already pinned on CPU; this asserts Mosaic-vs-XLA
    #    agreement on-chip where tiling differs)
    from vhr_tpu.ops import pallas_fused
    fT = jnp.asarray(np.broadcast_to(frame[None], (T_BIG,) + frame.shape)
                     .copy())
    try:
        res = jax.jit(lambda f: pallas_fused.fused_detect_roi_pallas(
            f, detect_row_pool=8))(fT)
        means_f = np.asarray(res.means, np.float32)
        # frame 0 has roi_valid=False (one-frame tracking lag); identical
        # frames must give identical means from frame 1 on
        spread = np.abs(means_f[1:] - means_f[1:2]).max()
        _check("fused_kernel_batch", bool(np.asarray(res.det_valid).any())
               and spread <= 0.5, f"means_spread={spread:.3f}")
    except Exception as e:  # keep the audit running
        _check("fused_kernel_batch", False, repr(e))

    if FAILED:
        print(f"FAILED: {FAILED}", flush=True)
        return 1
    print("all consistent", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
