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


def fuse_flux_qkv(params: dict) -> dict:
    """Returns a new param tree with fused projections:

    * double blocks: img_attn/txt_attn get ``qkv`` (q|k|v) replacing q,k,v;
    * single blocks: ``qkv_mlp`` (q|k|v|proj_mlp) replacing all four.

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
    double["img_attn"] = fuse_attn(double["img_attn"])
    double["txt_attn"] = fuse_attn(double["txt_attn"])
    params["double"] = double

    single = dict(params["single"])
    if "qkv_mlp" not in single and "q" in single:
        single["qkv_mlp"] = _fuse_linears(
            [single.pop("q"), single.pop("k"), single.pop("v"),
             single.pop("proj_mlp")]
        )
    params["single"] = single
    return params
