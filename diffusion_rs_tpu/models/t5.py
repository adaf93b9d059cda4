"""T5 encoder (T5-XXL for FLUX text conditioning), TPU-native.

Behavioral reference: diffusion_rs_core/src/models/t5/mod.rs (725 LoC):
encoder-only stack, RMS-style T5LayerNorm with f32 variance accumulation
(:94-120), gated/non-gated feed-forward (:152-191), relative-position-bucket
attention bias computed once on block 0 and reused by all blocks (:330-480),
NO 1/sqrt(d) attention scaling (T5 folds it into the weights), per-block f16
overflow clamping that only applies off-bf16 (:499-510 — a no-op on TPU bf16,
implemented for f16 parity).

TPU design: one scanned block body over stacked per-layer params (the
relative bias lives OUTSIDE the stack since only block 0 owns the embedding);
the bucket table is built with vectorized jnp ops instead of the reference's
per-(i,j) scalar loops (:346-377); attention softmax accumulates in f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops import linear, rms_norm, sdpa

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    """models/t5/mod.rs:73-92 (fields from the checkpoint config.json)."""

    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated_act: bool = True
    act: str = "gelu_new"  # "gelu_new" | "relu" | "silu"

    @staticmethod
    def from_json(d: dict) -> "T5Config":
        ff = d.get("feed_forward_proj", "relu")
        gated = ff.startswith("gated-") or d.get("is_gated_act", False)
        act = ff.removeprefix("gated-")
        act = {"gelu": "gelu_new", "gelu_new": "gelu_new", "relu": "relu",
               "silu": "silu", "gelu_pytorch_tanh": "gelu_new"}.get(act, act)
        return T5Config(
            vocab_size=d["vocab_size"],
            d_model=d["d_model"],
            d_kv=d["d_kv"],
            d_ff=d["d_ff"],
            num_layers=d["num_layers"],
            num_heads=d["num_heads"],
            relative_attention_num_buckets=d["relative_attention_num_buckets"],
            relative_attention_max_distance=d.get(
                "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=d.get("layer_norm_epsilon", 1e-6),
            gated_act=gated,
            act=act,
        )


def _act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "gelu_new":
        return jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "silu":
        return jax.nn.silu(x)
    raise ValueError(f"unknown activation {name}")


def relative_position_buckets(
    q_len: int, kv_len: int, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """Bidirectional bucket table [q_len, kv_len] int32.

    Vectorized form of the scalar double loop at t5/mod.rs:346-377:
    half the buckets for j>i (future), log-spaced beyond max_exact.
    """
    ctx = jnp.arange(q_len, dtype=jnp.int32)[:, None]
    mem = jnp.arange(kv_len, dtype=jnp.int32)[None, :]
    rel = mem - ctx  # j - i
    nb = num_buckets // 2
    base = jnp.where(rel > 0, nb, 0)
    n = jnp.abs(rel)
    max_exact = nb // 2
    is_small = n < max_exact
    log_big = (
        max_exact
        + (
            jnp.log(n.astype(jnp.float32) / max_exact)
            / jnp.log(max_distance / max_exact)
            * (nb - max_exact)
        ).astype(jnp.int32)
    )
    big = jnp.minimum(log_big, nb - 1)
    return base + jnp.where(is_small, n, big)


def position_bias(p: Params, cfg: T5Config, q_len: int, kv_len: int) -> jnp.ndarray:
    """[1, H, q_len, kv_len] additive bias from the block-0 embedding
    (t5/mod.rs:378-383)."""
    buckets = relative_position_buckets(
        q_len, kv_len, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    bias = p["rel_bias"][buckets]  # [q, kv, H]
    return bias.transpose(2, 0, 1)[None]


def t5_block(bp: Params, x: jnp.ndarray, bias: jnp.ndarray, cfg: T5Config):
    """Self-attention + FF with pre-RMSNorm residuals (t5/mod.rs:523-580)."""
    b, s, _ = x.shape
    h, dk = cfg.num_heads, cfg.d_kv

    normed = rms_norm(x, bp["attn_norm"], cfg.layer_norm_epsilon)
    def split(t):
        return t.reshape(b, s, h, dk).transpose(0, 2, 1, 3)
    if "qkv" in bp["attn"]:
        # fused q|k|v (models/optimize.fuse_t5): encode runs at M = seq*batch
        # (512 or less), where per-call work limits the quantized kernel —
        # one 3x-wide call recovers the rate (kernel_bench r5)
        qc, kc, vc = jnp.split(linear(normed, bp["attn"]["qkv"]), 3, axis=-1)
        q, k, v = split(qc), split(kc), split(vc)
    else:
        q = split(linear(normed, bp["attn"]["q"]))
        k = split(linear(normed, bp["attn"]["k"]))
        v = split(linear(normed, bp["attn"]["v"]))
    # T5 uses UNSCALED attention scores (t5/mod.rs:319 — plain q.matmul(k^T)).
    attn = sdpa(q, k, v, scale=1.0, bias=bias, impl="xla")
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * dk)
    x = x + linear(attn, bp["attn"]["o"])
    x = _clamp_f16(x)

    normed = rms_norm(x, bp["ff_norm"], cfg.layer_norm_epsilon)
    if cfg.gated_act:
        if "wi01" in bp["ff"]:
            gate, up = jnp.split(linear(normed, bp["ff"]["wi01"]), 2, axis=-1)
            gate = _act(cfg.act, gate)
        else:
            gate = _act(cfg.act, linear(normed, bp["ff"]["wi_0"]))
            up = linear(normed, bp["ff"]["wi_1"])
        ff = linear(gate * up, bp["ff"]["wo"])
    else:
        ff = linear(_act(cfg.act, linear(normed, bp["ff"]["wi"])), bp["ff"]["wo"])
    x = x + ff
    return _clamp_f16(x)


def _clamp_f16(x: jnp.ndarray) -> jnp.ndarray:
    """f16 overflow guard (t5/mod.rs:499-510) — only for float16, where the
    dynamic range actually overflows; bf16/f32 pass through untouched."""
    if x.dtype == jnp.float16:
        lim = 64504.0  # f16::MAX - 1000
        return jnp.clip(x, -lim, lim)
    return x


def t5_encode(
    params: Params, cfg: T5Config, input_ids: jnp.ndarray,
    mask_pads: bool = False,
) -> jnp.ndarray:
    """T5EncoderModel::forward (t5/mod.rs:633-656): embed -> blocks -> final
    RMSNorm.

    ``mask_pads=False`` matches the reference bug-for-bug (pads attend
    fully); ``mask_pads=True`` masks pad keys (id 0) out of attention like
    upstream diffusers — matters for dev's 512-token context
    (DIFFUSION_RS_TPU_T5_MASK_PADS=1 enables it pipeline-wide)."""
    x = params["shared"][input_ids]
    s = x.shape[1]
    bias = position_bias(params, cfg, s, s).astype(jnp.float32)
    if mask_pads:
        key_is_pad = (input_ids == 0)[:, None, None, :]  # [B,1,1,S]
        bias = bias + jnp.where(key_is_pad, -1e9, 0.0).astype(jnp.float32)

    def body(carry, bp):
        return t5_block(bp, carry, bias, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return rms_norm(x, params["final_norm"], cfg.layer_norm_epsilon)


# ---------------------------------------------------------------------------
# Random init (tests)
# ---------------------------------------------------------------------------


def init_t5_params(key, cfg: T5Config, dtype=jnp.float32) -> Params:
    from ..ops import Linear

    ks = iter(jax.random.split(key, 16))
    L = cfg.num_layers
    inner = cfg.num_heads * cfg.d_kv

    def lin(k_in, n_out):
        return Linear(
            w=(jax.random.normal(next(ks), (L, k_in, n_out), jnp.float32)
               * (k_in ** -0.5)).astype(dtype),
            b=None,
        )

    ff = (
        {"wi_0": lin(cfg.d_model, cfg.d_ff), "wi_1": lin(cfg.d_model, cfg.d_ff),
         "wo": lin(cfg.d_ff, cfg.d_model)}
        if cfg.gated_act
        else {"wi": lin(cfg.d_model, cfg.d_ff), "wo": lin(cfg.d_ff, cfg.d_model)}
    )
    return {
        "shared": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.d_model), jnp.float32
        ).astype(dtype),
        "rel_bias": jax.random.normal(
            next(ks), (cfg.relative_attention_num_buckets, cfg.num_heads),
            jnp.float32,
        ).astype(dtype),
        "blocks": {
            "attn": {
                "q": lin(cfg.d_model, inner),
                "k": lin(cfg.d_model, inner),
                "v": lin(cfg.d_model, inner),
                "o": lin(inner, cfg.d_model),
            },
            "attn_norm": jnp.ones((L, cfg.d_model), dtype),
            "ff": ff,
            "ff_norm": jnp.ones((L, cfg.d_model), dtype),
        },
        "final_norm": jnp.ones((cfg.d_model,), dtype),
    }
