"""Load-time graph optimizations on FLUX param pytrees.

``fuse_flux_qkv``: fuses the per-block q/k/v projections (and the single
blocks' parallel proj_mlp) into one wide matmul each. The reference issues
them as separate `QuantMethod::forward` calls (models/flux/model.rs:394-432,
641-648); on TPU one [K, 3H(+M)] matmul keeps the MXU busy longer per weight
fetch and removes two (three) kernel dispatches per block. Exact layout
transform — outputs are bit-identical columns of the fused result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linear import Linear
from ..quant.qtensor import QuantizedTensor, concat_n


def _fuse_linears(lins) -> Linear:
    ws = [l.w for l in lins]
    if all(isinstance(w, QuantizedTensor) for w in ws):
        w = concat_n(ws)
    elif all(isinstance(w, jax.Array) for w in ws):
        w = jnp.concatenate(ws, axis=-1)
    else:
        raise ValueError("cannot fuse mixed dense/quantized linears")
    if any(l.lora is not None for l in lins):
        # concatenating would drop the runtime low-rank terms silently
        raise ValueError("cannot fuse linears carrying runtime LoRA terms")
    bs = [l.b for l in lins]
    if all(b is not None for b in bs):
        b = jnp.concatenate(bs, axis=-1)
    elif all(b is None for b in bs):
        b = None
    else:
        raise ValueError("cannot fuse linears with mixed bias presence")
    return Linear(w=w, b=b)


def fuse_t5(params: dict) -> dict:
    """Fuse the T5 encoder projections that share an input: per block,
    self-attention q|k|v -> ``qkv`` and the gated FF's wi_0|wi_1 -> ``wi01``
    (models/t5.py detects the fused keys at trace time). Text encode runs at
    M = seq*batch (<= 512), where the quantized kernel's rate is limited by
    per-call work (kernel_bench r5: 35.8 vs 147.7 TFLOP/s at M=512 for
    1x- vs 4x-wide calls) — one wide call per group recovers most of it.
    Exact layout transform: outputs are bit-identical columns of the fused
    result. Reference issues them separately (models/t5/mod.rs:300-327)."""
    params = dict(params)
    blocks = dict(params["blocks"])
    attn = dict(blocks["attn"])
    if "q" in attn and "qkv" not in attn:
        attn["qkv"] = _fuse_linears([attn.pop("q"), attn.pop("k"),
                                     attn.pop("v")])
        blocks["attn"] = attn
    ff = dict(blocks["ff"])
    if "wi_0" in ff and "wi01" not in ff:
        ff["wi01"] = _fuse_linears([ff.pop("wi_0"), ff.pop("wi_1")])
        blocks["ff"] = ff
    params["blocks"] = blocks
    return params


def _head_halfsplit_perm(n_heads: int, head_dim: int):
    """Per-head column permutation 2i -> i, 2i+1 -> i + D/2 (interleaved
    RoPE pairs -> half-split/NeoX pairs). ``out[j] = old[perm[j]]``."""
    import numpy as np

    base = np.empty(head_dim, np.int64)
    base[: head_dim // 2] = np.arange(0, head_dim, 2)
    base[head_dim // 2:] = np.arange(1, head_dim, 2)
    return np.concatenate(
        [h * head_dim + base for h in range(n_heads)]
    )


def _permute_cols(lin: Linear, perm, lo: int, hi: int, width: int) -> Linear:
    """Permute output columns [lo, hi) of a (possibly fused/quantized/stacked)
    Linear by ``perm`` (indices relative to ``lo``); other columns keep."""
    import numpy as np

    n = width
    full = np.arange(n, dtype=np.int64)
    full[lo:hi] = lo + np.asarray(perm)
    w = lin.w
    if isinstance(w, QuantizedTensor):
        from ..quant.qtensor import permute_n

        w = permute_n(w, full)
    else:
        w = w[..., full]
    b = None if lin.b is None else lin.b[..., full]
    lora = lin.lora
    if lora is not None:
        a, bl = lora
        lora = (a, bl[..., full])
    return Linear(w=w, b=b, lora=lora)


def rope_halfsplit_permute(params: dict, cfg) -> dict:
    """Re-lay the q/k projection COLUMNS (and QK-norm scales) of every block
    into the half-split RoPE convention: per head, pair element 2i moves to
    i and 2i+1 to i + D/2.

    Attention is invariant under any fixed permutation applied to BOTH q and
    k head dims (q·k unchanged; RMS-norm denominators are permutation-
    invariant; V untouched), so outputs are mathematically identical — but
    the RoPE pair partner now sits a fixed D/2-lane rotation away, which is
    what lets the flash kernel rotate q/k tiles in VMEM with two full-width
    multiplies (SURVEY §7.4 "fused 3-axis RoPE"; the reference's equivalent
    is a separate CUDA kernel, fused_rope.cu:75-213). Run AFTER ISQ / LoRA /
    qkv fusion; models/flux.py switches to half-split application when
    cfg.rope_fused is set."""
    import numpy as np

    heads = cfg.num_attention_heads
    d = cfg.hidden_size // heads
    h_total = cfg.hidden_size
    perm = _head_halfsplit_perm(heads, d)
    base = perm[:d]  # within-head permutation for norm scales

    def norm_perm(scale):
        return scale[..., np.asarray(base)]

    def do_attn(attn: dict) -> dict:
        attn = dict(attn)
        if "qkv" in attn:  # fused q|k|v columns
            w = attn["qkv"]
            n = 3 * h_total
            w = _permute_cols(w, perm, 0, h_total, n)
            w = _permute_cols(w, perm, h_total, 2 * h_total, n)
            attn["qkv"] = w
        else:
            attn["q"] = _permute_cols(attn["q"], perm, 0, h_total, h_total)
            attn["k"] = _permute_cols(attn["k"], perm, 0, h_total, h_total)
        attn["q_norm"] = norm_perm(attn["q_norm"])
        attn["k_norm"] = norm_perm(attn["k_norm"])
        return attn

    params = dict(params)
    double = dict(params["double"])
    double["img_attn"] = do_attn(double["img_attn"])
    double["txt_attn"] = do_attn(double["txt_attn"])
    params["double"] = double

    single = dict(params["single"])
    if "qkv_mlp" in single:
        w = single["qkv_mlp"]
        n = w.b.shape[-1] if w.b is not None else (
            w.w.n if isinstance(w.w, QuantizedTensor) else w.w.shape[-1]
        )
        w = _permute_cols(w, perm, 0, h_total, n)
        w = _permute_cols(w, perm, h_total, 2 * h_total, n)
        single["qkv_mlp"] = w
    else:
        single["q"] = _permute_cols(single["q"], perm, 0, h_total, h_total)
        single["k"] = _permute_cols(single["k"], perm, 0, h_total, h_total)
    single["q_norm"] = norm_perm(single["q_norm"])
    single["k_norm"] = norm_perm(single["k_norm"])
    params["single"] = single
    return params


def fuse_flux_qkv(params: dict, streams=("img", "txt", "single")) -> dict:
    """Returns a new param tree with fused projections:

    * double blocks: img_attn/txt_attn get ``qkv`` (q|k|v) replacing q,k,v;
    * single blocks: ``qkv_mlp`` (q|k|v|proj_mlp) replacing all four.

    ``streams`` selects which of ("img", "txt", "single") to fuse — the win
    is per-call-size dependent: the double blocks' TXT stream runs its
    projections at M = 512·batch where the quantized kernel is far below its
    rate at production M (kernel_bench r5: 9.7 GFLOP/call shapes run ~3x
    slower than 29+ GFLOP/call shapes at the same M), so fusing the three
    txt projections into one call recovers most of that penalty, while the
    img/single fusions measured slower e2e (BENCH.md r3/r4).

    models/flux.py detects the fused keys at trace time.
    """
    params = dict(params)

    def fuse_attn(attn: dict) -> dict:
        if "qkv" in attn or "q" not in attn:
            return attn
        attn = dict(attn)
        attn["qkv"] = _fuse_linears([attn.pop("q"), attn.pop("k"), attn.pop("v")])
        return attn

    double = dict(params["double"])
    if "img" in streams:
        double["img_attn"] = fuse_attn(double["img_attn"])
    if "txt" in streams:
        double["txt_attn"] = fuse_attn(double["txt_attn"])
    params["double"] = double

    if "single" in streams:
        single = dict(params["single"])
        if "qkv_mlp" not in single and "q" in single:
            single["qkv_mlp"] = _fuse_linears(
                [single.pop("q"), single.pop("k"), single.pop("v"),
                 single.pop("proj_mlp")]
            )
        params["single"] = single
    return params
