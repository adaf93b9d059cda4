"""CLIP-L text encoder (FLUX pooled conditioning), TPU-native.

Behavioral reference: diffusion_rs_core/src/models/clip/text.rs (318 LoC):
token+position embeddings, quick-gelu MLP, pre-LayerNorm blocks, causal
additive mask, f32 attention, and EOS pooling = hidden state at the
argmax(token_id) position (:307-317 — the EOT token has the largest id in
the CLIP vocab).

TPU notes: the reference builds the mask with a Python double loop and pools
with a per-batch host loop; here both are vectorized (mask from iota compare,
pooling via take_along_axis) so the whole encoder jits as one graph.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops import layer_norm, linear, sdpa

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    """clip/text.rs:21-30."""

    vocab_size: int = 49408
    projection_dim: int = 768
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    num_hidden_layers: int = 12
    num_attention_heads: int = 12

    @staticmethod
    def from_json(d: dict) -> "ClipTextConfig":
        return ClipTextConfig(
            vocab_size=d["vocab_size"],
            projection_dim=d.get("hidden_size", d.get("projection_dim", 768)),
            intermediate_size=d["intermediate_size"],
            max_position_embeddings=d["max_position_embeddings"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
        )

    @property
    def head_dim(self) -> int:
        return self.projection_dim // self.num_attention_heads


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702x) (clip/text.rs:14-19)."""
    return x * jax.nn.sigmoid(1.702 * x)


def causal_mask(seq_len: int) -> jnp.ndarray:
    """Additive [1, 1, S, S] mask: 0 on/below diagonal, large-negative above
    (clip/text.rs:276-296 uses f32::MIN)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    return jnp.where(j > i, jnp.float32(-3.4e38), 0.0)[None, None]


def clip_block(bp: Params, x: jnp.ndarray, mask: jnp.ndarray, cfg: ClipTextConfig):
    b, s, _ = x.shape
    h, hd = cfg.num_attention_heads, cfg.head_dim
    res = x
    y = layer_norm(x, bp["ln1"]["w"], bp["ln1"]["b"], eps=1e-5)
    def split(t):
        return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    q = split(linear(y, bp["attn"]["q"]))
    k = split(linear(y, bp["attn"]["k"]))
    v = split(linear(y, bp["attn"]["v"]))
    attn = sdpa(q, k, v, bias=mask, impl="xla")  # f32 inside (text.rs:120-146)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h * hd)
    x = res + linear(attn, bp["attn"]["out"])

    res = x
    y = layer_norm(x, bp["ln2"]["w"], bp["ln2"]["b"], eps=1e-5)
    y = linear(quick_gelu(linear(y, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])
    return res + y


def clip_encode(
    params: Params, cfg: ClipTextConfig, input_ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (hidden [B,S,D], pooled [B,D]).

    Pooled = final-LN hidden state at argmax(input_ids) (clip/text.rs:307-317).
    """
    b, s = input_ids.shape
    x = params["token_emb"][input_ids] + params["pos_emb"][:s]
    mask = causal_mask(s)

    def body(carry, bp):
        return clip_block(bp, carry, mask, cfg), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["final_ln"]["w"], params["final_ln"]["b"], eps=1e-5)
    eos_idx = jnp.argmax(input_ids, axis=-1)  # [B]
    pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
    return x, pooled


def init_clip_params(key, cfg: ClipTextConfig, dtype=jnp.float32) -> Params:
    from ..ops import Linear

    ks = iter(jax.random.split(key, 8))
    L, d = cfg.num_hidden_layers, cfg.projection_dim

    def lin(k_in, n_out):
        return Linear(
            w=(jax.random.normal(next(ks), (L, k_in, n_out), jnp.float32)
               * (k_in ** -0.5)).astype(dtype),
            b=jnp.zeros((L, n_out), dtype),
        )

    def ln():
        return {"w": jnp.ones((L, d), dtype), "b": jnp.zeros((L, d), dtype)}

    return {
        "token_emb": (jax.random.normal(next(ks), (cfg.vocab_size, d)) * 0.02).astype(dtype),
        "pos_emb": (jax.random.normal(next(ks), (cfg.max_position_embeddings, d)) * 0.02).astype(dtype),
        "blocks": {
            "ln1": ln(),
            "attn": {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "out": lin(d, d)},
            "ln2": ln(),
            "mlp": {"fc1": lin(d, cfg.intermediate_size), "fc2": lin(cfg.intermediate_size, d)},
        },
        "final_ln": {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
    }
