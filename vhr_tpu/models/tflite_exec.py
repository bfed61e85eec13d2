"""Execute parsed TFLite graphs: a jittable JAX builder + a numpy oracle.

The MediaPipe face graphs (``vhr_tpu.models.tflite``) use a 10-op subset:
CONV_2D, DEPTHWISE_CONV_2D, ADD, RELU, PRELU, PAD, MAX_POOL_2D, RESHAPE,
CONCATENATION, LOGISTIC (+ fp16-constant DEQUANTIZE, folded at load).

Two independent executors of the same graph description:

* :func:`build_jax` — the product path: weights as a pytree, a pure
  ``apply(params, x)`` traced once under ``jit``; convs lower straight onto
  the MXU via ``lax.conv_general_dilated`` (NHWC/HWIO), everything else
  fuses.  Batch over frames by vmapping/batching the leading axis.
* :class:`NumpyInterpreter` — the validation oracle: an im2col conv
  interpreter written against numpy only, sharing *no* execution code with
  the JAX path (TF is not in this image, so op-level validation is
  two-independent-implementations agreement, checked in
  ``tests/test_tflite.py``).

Reference consumer of these graphs: mediapipe runtime at
``/root/reference/analysis/utils/roi.py:70-90``, ``rppg_VIDEO.py:25-46``.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .tflite import Operator, Subgraph, Tensor

__all__ = ["fold_dequantize", "build_jax", "NumpyInterpreter",
           "SUPPORTED_OPS"]

SUPPORTED_OPS = frozenset({
    "CONV_2D", "DEPTHWISE_CONV_2D", "ADD", "RELU", "PRELU", "PAD",
    "MAX_POOL_2D", "RESHAPE", "CONCATENATION", "LOGISTIC",
})


def fold_dequantize(graph: Subgraph) -> Subgraph:
    """Fold ``DEQUANTIZE(const fp16) -> fp32`` into fp32 constant tensors.

    Both face graphs store weights as fp16 constants dequantized at graph
    entry; after folding, the op stream contains only :data:`SUPPORTED_OPS`.
    """
    ops: List[Operator] = []
    for op in graph.operators:
        if op.op == "DEQUANTIZE":
            src = graph.tensors[op.inputs[0]]
            if src.data is None:
                raise NotImplementedError(
                    "runtime DEQUANTIZE (non-constant input) unsupported")
            dst = graph.tensors[op.outputs[0]]
            dst.data = src.data.astype(np.float32)
            continue
        if op.op not in SUPPORTED_OPS:
            raise NotImplementedError(f"op {op.op} not in supported subset")
        ops.append(op)
    return Subgraph(name=graph.name, tensors=graph.tensors,
                    inputs=graph.inputs, outputs=graph.outputs,
                    operators=ops)


def _activation(name):
    import jax.numpy as jnp
    if name is None:
        return lambda x: x
    if name == "RELU":
        return lambda x: jnp.maximum(x, 0.0)
    if name == "RELU6":
        return lambda x: jnp.clip(x, 0.0, 6.0)
    raise NotImplementedError(f"fused activation {name}")


def _find_residual_stages(ops: List[Operator], tensors: List[Tensor]):
    """Detect maximal fusible runs ``PRELU -> [1x1 conv, PRELU, dw3x3,
    1x1 conv, ADD, PRELU] x N`` at constant spatial shape — the face-mesh
    graph's residual bottleneck stages (48% of its activation traffic sits
    in the 128x128 stage alone; docs/PERFORMANCE.md).  Each hit is handed
    to the VMEM-resident Pallas kernel (``ops/pallas_meshblocks.py``)
    instead of op-by-op HBM round-trips.

    Safety rules: every op in the run must be activation-free where the
    pattern requires, the ADD must close exactly over the block entry, no
    tensor internal to the run may be read outside it, and the flattened
    spatial extent must be a lane multiple (``H*W % 128 == 0``)."""
    def shape(t):
        return tuple(tensors[t].shape)

    consumers: Dict[int, List[int]] = {}
    for oi, op in enumerate(ops):
        for t in op.inputs:
            if t >= 0 and tensors[t].data is None:
                consumers.setdefault(t, []).append(oi)

    stages = []
    i, n = 0, len(ops)
    while i < n:
        op = ops[i]
        if op.op != "PRELU" or len(shape(op.outputs[0])) != 4:
            i += 1
            continue
        _, H, W, C = shape(op.outputs[0])
        S = H * W
        if S < 128 or S % 128 != 0:
            i += 1
            continue
        blocks, cm = [], None
        cur = op.outputs[0]
        j = i + 1
        while j + 6 <= n:
            c1, p1, dwo, c2, addo, p2 = ops[j:j + 6]
            if not (c1.op == "CONV_2D" and c1.inputs[0] == cur
                    and c1.options.get("activation") is None
                    and tuple(c1.options["stride"]) == (1, 1)
                    and shape(c1.inputs[1])[1:3] == (1, 1)
                    and p1.op == "PRELU" and p1.inputs[0] == c1.outputs[0]
                    and dwo.op == "DEPTHWISE_CONV_2D"
                    and dwo.inputs[0] == p1.outputs[0]
                    and dwo.options.get("activation") is None
                    and tuple(dwo.options["stride"]) == (1, 1)
                    and dwo.options["padding"] == "SAME"
                    and dwo.options.get("depth_multiplier", 1) == 1
                    and shape(dwo.inputs[1])[1:3] == (3, 3)
                    and c2.op == "CONV_2D" and c2.inputs[0] == dwo.outputs[0]
                    and c2.options.get("activation") is None
                    and tuple(c2.options["stride"]) == (1, 1)
                    and shape(c2.inputs[1])[1:3] == (1, 1)
                    and shape(c2.outputs[0])[-1] == C
                    and addo.op == "ADD"
                    and addo.options.get("activation") is None
                    and set(addo.inputs) == {cur, c2.outputs[0]}
                    and p2.op == "PRELU"
                    and p2.inputs[0] == addo.outputs[0]):
                break
            cm_k = shape(c1.inputs[1])[0]
            if cm is None:
                cm = cm_k
            elif cm_k != cm:                  # kernel wants one Cm stack
                break
            blocks.append(dict(w1=c1.inputs[1], b1=c1.inputs[2],
                               a1=p1.inputs[1], dw=dwo.inputs[1],
                               bdw=dwo.inputs[2], w2=c2.inputs[1],
                               b2=c2.inputs[2], a2=p2.inputs[1]))
            cur = p2.outputs[0]
            j += 6
        # Internal tensors must have no readers outside the fused range
        # (and must not be graph outputs) — otherwise fusing would drop a
        # value someone needs.
        if blocks:
            internal = set()
            for jj in range(i, j):
                for t in ops[jj].outputs:
                    if t != cur:
                        internal.add(t)
            leaks = any(not (i <= r < j)
                        for t in internal for r in consumers.get(t, []))
            if leaks:
                blocks = []
        if blocks:
            stages.append(dict(start=i, n_ops=j - i, in_tensor=op.inputs[0],
                               out_tensor=cur, H=H, W=W, C=C, Cm=cm,
                               a0=op.inputs[1], blocks=blocks))
            i = j
        else:
            i += 1
    return stages


def build_jax(graph: Subgraph, compute_dtype=None,
              activation_dtype=None, fuse_stages: bool = False,
              fuse_interpret: bool = False):
    """Compile the graph description to ``(params, apply)``.

    ``params`` maps tensor-index strings to constant arrays (a flat pytree —
    weights stay jit *arguments*, never baked XLA literals); ``apply(params,
    x)`` returns the tuple of graph outputs.  Shapes are static, control
    flow is straight-line: one fused XLA program per input shape.

    ``compute_dtype=jnp.bfloat16`` runs conv inputs/filters in bf16 on the
    MXU (f32 accumulate via ``preferred_element_type``) — the weights ship
    as fp16 constants in the flatbuffer, so bf16's 8-bit mantissa costs only
    ~2 bits of stored precision while doubling MXU throughput.  Biases,
    PRELU and LOGISTIC stay f32; outputs are always f32.  Activations
    between ops stay f32, so HBM traffic is unchanged — measured, these
    nets are HBM-bound on activations (the face-mesh graph moves ~90 MB
    of f32 feature maps per frame, docs/PERFORMANCE.md), which is why
    this mode alone buys only ~2%.

    ``activation_dtype=jnp.bfloat16`` additionally STORES every feature
    map in bf16 (convs emit bf16; elementwise ops run in bf16) — halving
    activation HBM traffic, the dominant cost.  MXU accumulation is still
    f32 internally; only inter-op storage rounds.  LOGISTIC and the graph
    outputs are computed/returned in f32.  Precision on the real face
    graphs: <=0.35 px landmark RMS vs the f32 path
    (tests/test_mediapipe_face.py).

    ``fuse_stages=True`` runs each detected residual bottleneck stage
    (:func:`_find_residual_stages`) as ONE VMEM-resident Pallas kernel
    (``ops/pallas_meshblocks.py``): the stage input is the only HBM read,
    its output the only write — all intermediate feature maps stay
    on-core in f32 registers (strictly more precise than the unfused
    bf16-activation path, which rounds every op boundary).
    ``fuse_interpret=True`` runs those kernels in Pallas interpret mode
    (CPU tests).
    """
    import jax.numpy as jnp
    from jax import lax

    graph = fold_dequantize(graph)
    ad = activation_dtype
    cd = compute_dtype if ad is None else ad
    acc = (dict(preferred_element_type=jnp.float32)
           if (cd is not None and ad is None) else {})

    def _cd(t):
        return t.astype(cd) if cd is not None else t

    def _ad(t):
        return t.astype(ad) if ad is not None else t

    fused_by_start = {}
    fused_weights = {}
    if fuse_stages:
        from ..ops.pallas_meshblocks import pack_stage_weights
        for s_idx, st in enumerate(_find_residual_stages(graph.operators,
                                                         graph.tensors)):
            blocks = [{k: graph.tensors[t].data for k, t in b.items()}
                      for b in st["blocks"]]
            wts = pack_stage_weights(graph.tensors[st["a0"]].data, blocks)
            fused_by_start[st["start"]] = st
            fused_weights[st["start"]] = wts

    # Constants that ops actually read become params; PAD paddings and
    # RESHAPE shapes stay Python-side (they must be static).
    const_idx = set()
    for op in graph.operators:
        for i in op.inputs:
            if i >= 0 and graph.tensors[i].data is not None:
                if op.op in ("PAD", "RESHAPE") and i == op.inputs[-1]:
                    continue        # static geometry operand
                const_idx.add(i)
    params = {str(i): jnp.asarray(graph.tensors[i].data)
              for i in sorted(const_idx)}
    # Fused-stage weight stacks ride the params pytree too (traced
    # arguments, never baked XLA literals — ADVICE r1).
    for start, wts in fused_weights.items():
        for f_i, arr in enumerate(wts):
            params[f"_fs{start}_{f_i}"] = arr

    in_idx = graph.inputs[0]
    out_idx = tuple(graph.outputs)
    ops = graph.operators
    tensors = graph.tensors

    def apply(params, x):
        env: Dict[int, jnp.ndarray] = {in_idx: _ad(x)}

        def get(i):
            if i in env:
                return env[i]
            return params[str(i)]

        op_i = 0
        while op_i < len(ops):
            st = fused_by_start.get(op_i)
            if st is not None:
                from ..ops.pallas_meshblocks import (StageWeights,
                                                     residual_stage_pallas)
                xin = get(st["in_tensor"])           # NHWC (B, H, W, C)
                B = xin.shape[0]
                C, H, W = st["C"], st["H"], st["W"]
                wts = StageWeights(*(params[f"_fs{op_i}_{f_i}"]
                                     for f_i in range(9)))
                xcf = jnp.transpose(xin, (0, 3, 1, 2)).reshape(B, C, H * W)
                y = residual_stage_pallas(xcf, wts, W,
                                          interpret=fuse_interpret)
                env[st["out_tensor"]] = jnp.transpose(
                    y.reshape(B, C, H, W), (0, 2, 3, 1))
                op_i += st["n_ops"]
                continue
            op = ops[op_i]
            op_i += 1
            o = op.outputs[0]
            if op.op == "CONV_2D":
                inp, filt, bias = (get(i) for i in op.inputs)
                # TFLite filter is OHWI -> lax wants HWIO.
                y = lax.conv_general_dilated(
                    _cd(inp), _cd(jnp.transpose(filt, (1, 2, 3, 0))),
                    window_strides=op.options["stride"],
                    padding=op.options["padding"],
                    rhs_dilation=op.options["dilation"],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"), **acc)
                y = _activation(op.options["activation"])(y + _ad(bias))
            elif op.op == "DEPTHWISE_CONV_2D":
                inp, filt, bias = (get(i) for i in op.inputs)
                ch_in = inp.shape[-1]
                # TFLite DW filter is (1, kh, kw, ch_in*mult) -> lax rhs
                # (kh, kw, 1, ch_out) with feature_group_count=ch_in; both
                # order output channels input-channel-major, so the reshape
                # lines up exactly.
                y = lax.conv_general_dilated(
                    _cd(inp), _cd(jnp.transpose(filt, (1, 2, 0, 3))),
                    window_strides=op.options["stride"],
                    padding=op.options["padding"],
                    rhs_dilation=op.options["dilation"],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=ch_in, **acc)
                y = _activation(op.options["activation"])(y + _ad(bias))
            elif op.op == "ADD":
                y = _activation(op.options.get("activation"))(
                    get(op.inputs[0]) + _ad(get(op.inputs[1])))
            elif op.op == "RELU":
                y = jnp.maximum(get(op.inputs[0]), 0.0)
            elif op.op == "PRELU":
                xin = get(op.inputs[0])
                alpha = _ad(get(op.inputs[1]))
                y = jnp.where(xin >= 0, xin, xin * alpha)
            elif op.op == "PAD":
                pads = tensors[op.inputs[1]].data
                y = jnp.pad(get(op.inputs[0]),
                            [tuple(p) for p in np.asarray(pads)])
            elif op.op == "MAX_POOL_2D":
                xin = get(op.inputs[0])
                y = lax.reduce_window(
                    xin, jnp.asarray(-jnp.inf, xin.dtype), lax.max,
                    (1,) + tuple(op.options["filter"]) + (1,),
                    (1,) + tuple(op.options["stride"]) + (1,),
                    op.options["padding"])
                y = _activation(op.options["activation"])(y)
            elif op.op == "RESHAPE":
                shape = op.options.get("new_shape")
                if shape is None and len(op.inputs) > 1:
                    shape = tuple(int(s)
                                  for s in tensors[op.inputs[1]].data)
                if shape is None:
                    shape = tensors[o].shape     # static output shape
                xin = get(op.inputs[0])
                shape = tuple(int(s) for s in shape)
                if any(s < 0 for s in shape):
                    # Wildcard target (e.g. the mesh net's (-1, 1)
                    # presence reshape): resolve it against the baked
                    # batch-1 static output shape, then batch-scale below
                    # like any literal target — a raw jnp.reshape of a
                    # batched input against a (1, -1)-style target would
                    # fold the batch into the wrong axis (ADVICE r4).
                    shape = tuple(int(s) for s in tensors[o].shape)
                if int(np.prod(shape)) != xin.size:
                    # Batch-agnostic reshape: the flatbuffer bakes batch-1
                    # target shapes; scale the leading dim so apply() also
                    # accepts a flat (B, ...) batch without vmap.  Only a
                    # unit leading dim is provably batch-scalable; anything
                    # else would silently mis-fold the batch — refuse
                    # loudly instead (ADVICE r4).
                    if shape[0] != 1:
                        raise ValueError(
                            f"RESHAPE target {shape} is not batch-agnostic "
                            f"for input size {xin.size} (need a unit "
                            f"leading dim)")
                    rest = int(np.prod(shape[1:]))
                    if rest <= 0 or xin.size % rest != 0:
                        raise ValueError(
                            f"RESHAPE: input size {xin.size} not divisible "
                            f"by per-sample size {rest} (target {shape})")
                    shape = (xin.size // rest,) + shape[1:]
                y = jnp.reshape(xin, shape)
            elif op.op == "CONCATENATION":
                y = jnp.concatenate([get(i) for i in op.inputs],
                                    axis=op.options["axis"])
                y = _activation(op.options["activation"])(y)
            elif op.op == "LOGISTIC":
                x32 = get(op.inputs[0]).astype(jnp.float32)
                y = 1.0 / (1.0 + jnp.exp(-x32))
            else:                      # unreachable post-fold
                raise NotImplementedError(op.op)
            env[o] = y
        return tuple(env[i].astype(jnp.float32) for i in out_idx)

    return params, apply


# --- independent numpy oracle ----------------------------------------------

def _np_pad_amount(size: int, k: int, s: int, mode: str) -> Tuple[int, int]:
    if mode == "VALID":
        return (0, 0)
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return (total // 2, total - total // 2)


def _np_conv(x: np.ndarray, filt: np.ndarray, bias, stride, padding,
             groups: int = 1) -> np.ndarray:
    """im2col NHWC conv; ``filt`` is OHWI (TFLite layout)."""
    n, h, w, cin = x.shape
    co, kh, kw, ci_g = filt.shape
    sh, sw = stride
    ph = _np_pad_amount(h, kh, sh, padding)
    pw = _np_pad_amount(w, kw, sw, padding)
    xp = np.pad(x, ((0, 0), ph, pw, (0, 0)))
    oh = (xp.shape[1] - kh) // sh + 1
    ow = (xp.shape[2] - kw) // sw + 1
    # window view: (n, oh, ow, kh, kw, cin)
    sN, sH, sW, sC = xp.strides
    win = np.lib.stride_tricks.as_strided(
        xp, (n, oh, ow, kh, kw, cin),
        (sN, sH * sh, sW * sw, sH, sW, sC), writeable=False)
    if groups == 1:
        cols = win.reshape(n * oh * ow, kh * kw * cin)
        wmat = filt.transpose(1, 2, 3, 0).reshape(kh * kw * ci_g, co)
        y = (cols @ wmat).reshape(n, oh, ow, co)
    else:
        # depthwise: groups == cin, ci_g == 1 after the caller reshapes;
        # filt arrives as TFLite DW layout (1, kh, kw, cin*mult).
        mult = filt.shape[-1] // cin
        f = filt.reshape(kh, kw, cin, mult)
        y = np.einsum("nhwklc,klcm->nhwcm", win, f, optimize=True)
        y = y.reshape(n, oh, ow, cin * mult)
    return y + bias


class NumpyInterpreter:
    """Tensor-by-tensor numpy evaluation of a (folded) subgraph."""

    def __init__(self, graph: Subgraph):
        self.graph = fold_dequantize(graph)

    def __call__(self, x: np.ndarray) -> Tuple[np.ndarray, ...]:
        g = self.graph
        env: Dict[int, np.ndarray] = {g.inputs[0]: np.asarray(x, np.float32)}

        def get(i):
            if i in env:
                return env[i]
            return g.tensors[i].data

        def act(name, y):
            if name == "RELU":
                return np.maximum(y, 0.0)
            if name == "RELU6":
                return np.clip(y, 0.0, 6.0)
            return y

        for op in g.operators:
            if op.op == "CONV_2D":
                y = _np_conv(get(op.inputs[0]), get(op.inputs[1]),
                             get(op.inputs[2]), op.options["stride"],
                             op.options["padding"])
                y = act(op.options["activation"], y)
            elif op.op == "DEPTHWISE_CONV_2D":
                xin = get(op.inputs[0])
                y = _np_conv(xin, get(op.inputs[1]), get(op.inputs[2]),
                             op.options["stride"], op.options["padding"],
                             groups=xin.shape[-1])
                y = act(op.options["activation"], y)
            elif op.op == "ADD":
                y = act(op.options.get("activation"),
                        get(op.inputs[0]) + get(op.inputs[1]))
            elif op.op == "RELU":
                y = np.maximum(get(op.inputs[0]), 0.0)
            elif op.op == "PRELU":
                xin = get(op.inputs[0])
                alpha = get(op.inputs[1])
                y = np.where(xin >= 0, xin, xin * alpha)
            elif op.op == "PAD":
                pads = np.asarray(get(op.inputs[1]))
                y = np.pad(get(op.inputs[0]), [tuple(p) for p in pads])
            elif op.op == "MAX_POOL_2D":
                xin = get(op.inputs[0])
                kh, kw = op.options["filter"]
                sh, sw = op.options["stride"]
                n, h, w, c = xin.shape
                ph = _np_pad_amount(h, kh, sh, op.options["padding"])
                pw = _np_pad_amount(w, kw, sw, op.options["padding"])
                xp = np.pad(xin, ((0, 0), ph, pw, (0, 0)),
                            constant_values=-np.inf)
                oh = (xp.shape[1] - kh) // sh + 1
                ow = (xp.shape[2] - kw) // sw + 1
                sN, sH, sW, sC = xp.strides
                win = np.lib.stride_tricks.as_strided(
                    xp, (n, oh, ow, kh, kw, c),
                    (sN, sH * sh, sW * sw, sH, sW, sC), writeable=False)
                y = act(op.options["activation"], win.max(axis=(3, 4)))
            elif op.op == "RESHAPE":
                shape = op.options.get("new_shape")
                if shape is None and len(op.inputs) > 1:
                    shape = tuple(int(s)
                                  for s in g.tensors[op.inputs[1]].data)
                if shape is None:
                    shape = g.tensors[op.outputs[0]].shape
                y = np.reshape(get(op.inputs[0]), shape)
            elif op.op == "CONCATENATION":
                y = act(op.options["activation"],
                        np.concatenate([get(i) for i in op.inputs],
                                       axis=op.options["axis"]))
            elif op.op == "LOGISTIC":
                y = 1.0 / (1.0 + np.exp(-get(op.inputs[0])))
            else:
                raise NotImplementedError(op.op)
            env[op.outputs[0]] = y.astype(np.float32)
        return tuple(env[i] for i in g.outputs)
