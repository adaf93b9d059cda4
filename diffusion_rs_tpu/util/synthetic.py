"""Synthetic weight factories for benchmarks (random weights, real shapes).

Quantized planes are filled from ONE shared 64 MB host pool (key-derived
offsets, tiled to size) and uploaded once — per-element RNG (numpy or XLA
threefry) costs minutes for a 12B-param model on the 1-vCPU bench host;
the values only need to be non-constant and non-dedupable. Dense leaves
still use jax.random on the default device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.bnb import NF4_CODEBOOK
from ..quant.qtensor import QuantizedTensor, choose_split
from ..ops.linear import Linear


_POOL_N = 1 << 26  # 64 MB
_pool = None


def _pool_u8(shape, key) -> np.ndarray:
    """Random-ish u8 array built from ONE shared 64 MB pool.

    Full-size synthetic checkpoints are multiple GB of quantized planes;
    generating unique random bytes for each (numpy PCG or XLA threefry) costs
    minutes of host CPU per model. Values only need to be non-constant and
    non-dedupable for benches/tests, so each tensor is the pool repeated
    from a key-derived offset — memcpy speed, distinct bytes per tensor.
    """
    global _pool
    if _pool is None:
        # doubled so any offset can be read as one contiguous 64MB window
        base = np.random.default_rng(0x5EED).integers(
            0, 256, size=_POOL_N, dtype=np.uint8
        )
        _pool = np.concatenate([base, base])
    n = int(np.prod(shape))
    off = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) % _POOL_N
    reps = -(-n // _POOL_N)
    window = _pool[off:off + _POOL_N]  # view, no copy
    out = np.tile(window, reps)[:n] if reps > 1 else window[:n].copy()
    return out.reshape(shape)


def random_qtensor(
    key, k: int, n: int, kind: str = "nf4", group: int = 64,
    stack: Optional[int] = None, out_dtype: str = "bfloat16",
) -> QuantizedTensor:
    split = choose_split(k)
    lead = () if stack is None else (stack,)
    if kind == "q8t":
        # TPU-native int8 execution format: unpacked s8 plane, one scale per
        # (K-tile, column) with group == kernel K-tile (quant/qtensor.py
        # quantize_q8_tile), which routes ops/linear through the s8 x s8 MXU
        # path of the fused kernel. Real FLUX dims are all 256-divisible;
        # tiny test configs (e.g. k = h+m = 640) halve the group until it
        # divides, mirroring no real checkpoint but keeping dequant exact.
        g = min(256, k)
        while k % g:
            g //= 2
        packed = jnp.asarray(
            _pool_u8(lead + (k, n), key).view(np.int8)
        )
        scale = jnp.full(lead + (k // g, n), 2.0 * k ** -0.5 / 127.0,
                         jnp.float32)
        return QuantizedTensor(
            packed=packed, scale=scale, bias=None, codebook=None,
            kind="q8t", bits=8, group=g, split=split, shape=(k, n),
            out_dtype=out_dtype,
        )
    packed = jnp.asarray(_pool_u8(lead + (k // 2, n), key))
    # absmax chosen so dequantized weights have ~1/sqrt(k) scale
    scale = jnp.full(lead + (k // group, n), 2.0 * k ** -0.5, jnp.float32)
    # codebook is a DATA field: stacked layers need a stacked codebook so
    # lax.scan can slice it per layer alongside packed/scale.
    cb = jnp.asarray(NF4_CODEBOOK)
    if stack is not None:
        cb = jnp.tile(cb[None], (stack, 1))
    return QuantizedTensor(
        packed=packed,
        scale=scale,
        bias=None,
        codebook=cb,
        kind=kind,
        bits=4,
        group=group,
        split=split,
        shape=(k, n),
        out_dtype=out_dtype,
    )


def init_t5_params_quantized(key, cfg, dtype=jnp.bfloat16, kind="nf4"):
    """T5 encoder params with every block linear quantized (the Q4 DDUF
    recipe quantizes text_encoder_2 alongside the transformer); ``kind`` is
    "nf4" (default) or "q8t" (the isq_t5="q8t" load path). Embedding,
    relative-position bias and norms stay dense."""
    L = cfg.num_layers
    inner = cfg.num_heads * cfg.d_kv
    keys = iter(jax.random.split(key, 16))

    def qlin(k_in, n_out):
        return Linear(
            w=random_qtensor(next(keys), k_in, n_out, kind=kind, stack=L),
            b=None,
        )

    ff = (
        {"wi_0": qlin(cfg.d_model, cfg.d_ff), "wi_1": qlin(cfg.d_model, cfg.d_ff),
         "wo": qlin(cfg.d_ff, cfg.d_model)}
        if cfg.gated_act
        else {"wi": qlin(cfg.d_model, cfg.d_ff), "wo": qlin(cfg.d_ff, cfg.d_model)}
    )
    return {
        "shared": (jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.d_model), jnp.float32
        ) * cfg.d_model ** -0.5).astype(dtype),
        "rel_bias": jax.random.normal(
            next(keys), (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32,
        ).astype(dtype),
        "blocks": {
            "attn": {
                "q": qlin(cfg.d_model, inner),
                "k": qlin(cfg.d_model, inner),
                "v": qlin(cfg.d_model, inner),
                "o": qlin(inner, cfg.d_model),
            },
            "attn_norm": jnp.ones((L, cfg.d_model), dtype),
            "ff": ff,
            "ff_norm": jnp.ones((L, cfg.d_model), dtype),
        },
        "final_norm": jnp.ones((cfg.d_model,), dtype),
    }


def init_flux_params_quantized(key, cfg, dtype=jnp.bfloat16, kind="nf4"):
    """FLUX params with every linear quantized (Q4/Q8 bench configs);
    ``kind`` is "nf4" (default) or "q8t". Norm scales stay dense; biases
    are zeros."""
    h, m = cfg.hidden_size, cfg.mlp_size
    hd = cfg.head_dim
    keys = iter(jax.random.split(key, 96))

    def qlin(k_in, n_out, stack=None):
        b = jnp.zeros((n_out,) if stack is None else (stack, n_out), dtype)
        return Linear(
            w=random_qtensor(next(keys), k_in, n_out, kind=kind, stack=stack),
            b=b,
        )

    def attn(stack):
        return {
            "q": qlin(h, h, stack),
            "k": qlin(h, h, stack),
            "v": qlin(h, h, stack),
            "proj": qlin(h, h, stack),
            "q_norm": jnp.ones((stack, hd), dtype),
            "k_norm": jnp.ones((stack, hd), dtype),
        }

    L, S = cfg.num_layers, cfg.num_single_layers
    params = {
        "img_in": qlin(cfg.in_channels, h) if cfg.in_channels % 2 == 0 and cfg.in_channels >= 64 else qlin(64, h),
        "txt_in": qlin(cfg.joint_attention_dim, h),
        "time_in": {"in": qlin(256, h), "out": qlin(h, h)},
        "vector_in": {"in": qlin(cfg.pooled_projection_dim, h), "out": qlin(h, h)},
        "double": {
            "img_mod": qlin(h, 6 * h, L),
            "txt_mod": qlin(h, 6 * h, L),
            "img_attn": attn(L),
            "txt_attn": attn(L),
            "img_mlp": {"in": qlin(h, m, L), "out": qlin(m, h, L)},
            "txt_mlp": {"in": qlin(h, m, L), "out": qlin(m, h, L)},
        },
        "single": {
            "q": qlin(h, h, S),
            "k": qlin(h, h, S),
            "v": qlin(h, h, S),
            "q_norm": jnp.ones((S, hd), dtype),
            "k_norm": jnp.ones((S, hd), dtype),
            "proj_mlp": qlin(h, m, S),
            "linear2": qlin(h + m, h, S),
            "mod": qlin(h, 3 * h, S),
        },
        "final": {
            "mod": qlin(h, 2 * h),
            "proj": qlin(h, cfg.in_channels),
        },
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = {"in": qlin(256, h), "out": qlin(h, h)}
    return params
