"""In-situ quantization (ISQ): quantize dense weights at load time.

Reference parity: `IsqType` (diffusion_rs_backend/src/lib.rs:88-149) maps a
requested type to a GGML dtype and quantizes UnquantLinear weights in place.
Here `isq_quantize` converts a dense K-major Linear weight into the canonical
QuantizedTensor for any supported target, so a full-precision checkpoint can
run through the fused dequant-matmul kernels without a pre-quantized file.

Importance-matrix (imatrix) weighting: the reference threads per-input-column
importance into error-minimizing k-quant encoders
(diffusion_rs_common/src/core/quantized/mod.rs:110 ``quantize_imatrix``,
``k_quants.rs:846 from_float_imatrix``). The TPU build refines in the
CANONICAL layout instead, which makes one algorithm cover every format:
alternating weighted least squares per scale group — fit (scale, bias) in
closed form under the importance weights, reassign codes to the refit grid
(or nearest codebook entry), repeat. See :func:`refine_with_imatrix`.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from .bnb import quantize_nf4
from .gguf_quants import ENCODERS, gguf_to_canonical
from .qtensor import QuantizedTensor, dequantize_np, pack4, unpack4_np

# The reference's CUDA-legal IsqType set (lib.rs:102-128): Q4_0, Q4_1,
# Q5_0, Q5_1, Q8_0, Q2K, Q3K, Q4K, Q5K, Q6K — all covered — plus the bnb
# codebook formats (nf4/fp4) and "q8t": the TPU-native int8 execution format
# (per-K-tile scales) that unlocks the s8 x s8 MXU path in the fused kernel
# (qtensor.quantize_q8_tile).
SUPPORTED = (
    "q4_0", "q4_1", "q5_0", "q5_1", "q8_0",
    "q2_k", "q3_k", "q4_k", "q5_k", "q6_k",
    "nf4", "fp4", "q8t",
)

# K (input features) must divide the format's block/group length; k-quants
# use 256-element super-blocks, the legacy formats 32, bnb blocksize 64.
_K_DIVISOR = {
    "q4_0": 32, "q4_1": 32, "q5_0": 32, "q5_1": 32, "q8_0": 32,
    "q2_k": 256, "q3_k": 256, "q4_k": 256, "q5_k": 256, "q6_k": 256,
    "nf4": 64, "fp4": 64, "q8t": 1,
}


def _codes_of(qt: QuantizedTensor) -> np.ndarray:
    packed = np.asarray(jax.device_get(qt.packed))
    if qt.bits == 4:
        return unpack4_np(packed, qt.split).astype(np.int32)
    return packed.astype(np.int32)


def refine_with_imatrix(
    qt: QuantizedTensor,
    w_kmajor: np.ndarray,
    importance: np.ndarray,
    iters: int = 2,
) -> QuantizedTensor:
    """Refine a quantized tensor to minimize IMPORTANCE-WEIGHTED error.

    ``importance`` is the per-input-feature (length-K) activation second
    moment from an imatrix file — exactly what the reference feeds
    ``from_float_imatrix`` (k_quants.rs:846). Minimizing
    sum_k imp[k] * (w[k,n] - deq[k,n])^2 per output column minimizes the
    matmul output error for activations with that covariance diagonal.

    Alternating refinement per scale group g of each column n:
      1. weighted least squares for (s, b):  min sum imp*(w - (q*s + b))^2
         (scale-only for bias-less / codebook formats);
      2. code reassignment against the refit grid (affine: rounded clip;
         codebook: nearest entry).
    """
    w = np.asarray(jax.device_get(w_kmajor), np.float32)
    k, n = qt.shape
    assert w.shape == (k, n), (w.shape, qt.shape)
    imp = np.asarray(importance, np.float32).reshape(k)
    imp = np.maximum(imp, 1e-12)  # keep the normal equations well-posed
    g = qt.group
    groups = k // g
    cb = None if qt.codebook is None else np.asarray(
        jax.device_get(qt.codebook), np.float32
    ).reshape(-1)

    q = _codes_of(qt).astype(np.float32).reshape(groups, g, n)
    y = w.reshape(groups, g, n)
    wt = imp.reshape(groups, g, 1)
    has_bias = qt.bias is not None
    lo, hi = (0, 15) if qt.bits == 4 else (-128, 127)

    scale = np.asarray(jax.device_get(qt.scale), np.float32).copy()
    bias = (
        np.asarray(jax.device_get(qt.bias), np.float32).copy()
        if has_bias else None
    )

    for it in range(iters):
        c = cb[q.astype(np.int32)] if cb is not None else q  # grid values
        # closed-form weighted fit per (group, column)
        if has_bias:
            sw = wt.sum(axis=1)
            sq = (wt * c).sum(axis=1)
            sy = (wt * y).sum(axis=1)
            sqq = (wt * c * c).sum(axis=1)
            sqy = (wt * c * y).sum(axis=1)
            denom = sw * sqq - sq * sq
            ok = np.abs(denom) > 1e-20
            s_new = np.where(ok, (sw * sqy - sq * sy) / np.where(ok, denom, 1.0), scale)
            b_new = np.where(ok, (sy - s_new * sq) / sw, bias)
            scale, bias = s_new.astype(np.float32), b_new.astype(np.float32)
        else:
            sqq = (wt * c * c).sum(axis=1)
            sqy = (wt * c * y).sum(axis=1)
            ok = sqq > 1e-20
            scale = np.where(ok, sqy / np.where(ok, sqq, 1.0), scale).astype(
                np.float32
            )
        if it == iters - 1:
            break
        # reassign codes against the refit grid
        s_b = scale.reshape(groups, 1, n)
        b_b = bias.reshape(groups, 1, n) if has_bias else 0.0
        if cb is not None:
            safe = np.where(np.abs(s_b) > 1e-20, s_b, 1.0)
            ratio = (y - b_b) / safe  # target codebook value
            # nearest of 16 entries, chunked over columns to bound memory
            out = np.empty_like(q)
            step = max(1, (1 << 22) // max(1, groups * g))
            for j0 in range(0, n, step):
                d = np.abs(ratio[..., j0:j0 + step, None] - cb[None, None, None, :])
                out[..., j0:j0 + step] = np.argmin(d, axis=-1).astype(np.float32)
            q = out
        else:
            safe = np.where(np.abs(s_b) > 1e-20, s_b, 1.0)
            q = np.clip(np.round((y - b_b) / safe), lo, hi).astype(np.float32)

    codes = q.reshape(k, n)
    if qt.bits == 4:
        packed = jnp.asarray(pack4(codes.astype(np.uint8), qt.split))
    else:
        packed = jnp.asarray(codes.astype(np.int8))
    return QuantizedTensor(
        packed=packed,
        scale=jnp.asarray(scale),
        bias=None if bias is None else jnp.asarray(bias),
        codebook=qt.codebook,
        kind=qt.kind,
        bits=qt.bits,
        group=qt.group,
        split=qt.split,
        shape=qt.shape,
        out_dtype=qt.out_dtype,
    )


def isq_quantize_weight(
    w_kmajor: Union[np.ndarray, jnp.ndarray],
    target: str,
    imatrix: Optional[np.ndarray] = None,
) -> QuantizedTensor:
    """Quantize a dense K-major [K, N] weight to ``target``.

    ``imatrix``: optional length-K importance vector (activation second
    moments); when given, the result is refined to minimize the
    importance-weighted error (reference: quantize_imatrix,
    quantized/mod.rs:110)."""
    if target not in SUPPORTED:
        raise ValueError(f"ISQ target {target!r} not in {SUPPORTED}")
    w = np.asarray(jax.device_get(w_kmajor), np.float32)
    k, n = w.shape
    w_torch = np.ascontiguousarray(w.T)  # [out, in] for the encoders
    if target == "nf4":
        qt = quantize_nf4(w_torch, blocksize=64)
    elif target == "fp4":
        from .bnb import quantize_fp4

        qt = quantize_fp4(w_torch, blocksize=64)
    elif target == "q8t":
        from .qtensor import quantize_q8_tile

        qt = quantize_q8_tile(w)
    else:
        raw = ENCODERS[target](w_torch)
        qt = gguf_to_canonical(target, raw, (n, k))
    if imatrix is not None:
        qt = refine_with_imatrix(qt, w, imatrix)
    return qt


def _imatrix_lookup(imatrix, names, layer: Optional[int], k: int):
    """Find an importance vector for a param path. Keys are dotted canonical
    paths; stacked blocks use ``prefix.{layer}.rest`` (e.g.
    ``double.3.img_attn.q``). A ``.weight`` suffix is tolerated (llama.cpp
    imatrix names carry it). Returns None when absent or length-mismatched."""
    if not imatrix:
        return None
    dotted = ".".join(names)
    cands = [dotted, dotted + ".weight"]
    if layer is not None:
        per_layer = ".".join(names[:1] + [str(layer)] + names[1:])
        cands = [per_layer, per_layer + ".weight"] + cands
    for c in cands:
        v = imatrix.get(c)
        if v is not None and np.asarray(v).size == k:
            return np.asarray(v, np.float32)
    return None


def isq_tree(params, target: str, min_features: Optional[int] = None,
             imatrix=None):
    """Quantize every dense Linear in a param pytree whose weight is at least
    ``min_features`` on both dims (embedders/norms stay dense, mirroring the
    reference's per-linear ISQ over QuantizedModelLayer aggregates).
    ``min_features`` defaults to 512 (``DIFFUSION_RS_TPU_ISQ_MIN`` env
    override, read at load time — not inside any jit graph).

    ``imatrix``: optional dict of importance vectors (io/imatrix.py
    ``load_imatrix``) keyed by dotted param path — matched linears get
    error-minimizing weighted quantization (reference: quantize_imatrix)."""
    import os

    from ..ops.linear import Linear  # deferred: ops imports quant

    if min_features is None:
        min_features = int(os.environ.get("DIFFUSION_RS_TPU_ISQ_MIN", "512"))
    divisor = _K_DIVISOR.get(target, 256)

    def quantize_dense(w, names, k, b):
        if w.ndim == 2:
            imp = _imatrix_lookup(imatrix, names, None, k)
            return Linear(
                w=isq_quantize_weight(w, target, imatrix=imp), b=b
            )
        # stacked [L, K, N]: quantize per layer then restack planes
        qts = [
            isq_quantize_weight(
                w[i], target,
                imatrix=_imatrix_lookup(imatrix, names, i, k),
            )
            for i in range(w.shape[0])
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
        return Linear(w=stacked, b=b)

    def visit(path, node):
        if not isinstance(node, Linear):
            return node
        names = [
            str(getattr(p, "key", getattr(p, "name", getattr(p, "idx", ""))))
            for p in path
        ]
        names = [x for x in names if x and x != "w"]
        if isinstance(node.w, jax.Array) and node.w.ndim >= 2:
            k, n = node.w.shape[-2], node.w.shape[-1]
            if k >= min_features and n >= min_features and k % divisor == 0:
                return quantize_dense(node.w, names, k, node.b)
        elif isinstance(node.w, QuantizedTensor) and node.w.kind != target:
            # Pre-quantized checkpoint + explicit ISQ target: REQUANTIZE
            # (dequantize on host, re-encode). The reference only ISQs dense
            # weights; this extension is what gives a q4-bnb checkpoint the
            # TPU-native q8t (s8 x s8 MXU) execution format at load time —
            # one extra int8 rounding (~0.1% rel) on top of the source
            # format's own error.
            qt = node.w
            k, n = qt.shape[-2], qt.shape[-1]
            if k >= min_features and n >= min_features and k % divisor == 0:
                return quantize_dense(dequantize_np(qt), names, k, node.b)
        return node

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, Linear)
    )
