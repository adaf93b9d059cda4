"""Checkpoint key-mapping: VarStore -> model param pytrees.

Key names follow the diffusers checkpoint layouts the reference loads
(models/flux/model.rs VarBuilder paths, models/t5/mod.rs, models/clip/text.rs,
models/vaes/vae.rs). Per-layer trees are STACKED along a leading layer axis
so the models can lax.scan over them; QuantizedTensor leaves stack their
packed/scale/bias planes (meta fields must agree across layers — true for
uniformly-quantized checkpoints, which is what bnb/gguf produce).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import ClipTextConfig
from ..models.flux import FluxConfig
from ..models.t5 import T5Config
from ..models.vae import VAEConfig
from .varstore import VarStore


def stack_trees(trees: List):
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


# ---------------------------------------------------------------------------
# FLUX
# ---------------------------------------------------------------------------


def build_flux_params(
    store: VarStore, cfg: FluxConfig, dtype=jnp.bfloat16,
    dequantize: bool = False,
):
    """models/flux/model.rs:709-788 weight paths (diffusers FluxTransformer2D)."""
    v = store.pp("")
    lin = lambda p, bias=True: v.pp(p).linear(  # noqa: E731
        bias=bias, dtype=dtype, dequantize_to_dense=dequantize
    )

    def mlp_embedder(p):
        return {"in": lin(f"{p}.linear_1"), "out": lin(f"{p}.linear_2")}

    def attn(p, ctx: bool):
        if not ctx:
            return {
                "q": lin(f"{p}.to_q"),
                "k": lin(f"{p}.to_k"),
                "v": lin(f"{p}.to_v"),
                "proj": lin(f"{p}.to_out.0"),
                "q_norm": v.get(f"{p}.norm_q.weight", dtype),
                "k_norm": v.get(f"{p}.norm_k.weight", dtype),
            }
        return {
            "q": lin(f"{p}.add_q_proj"),
            "k": lin(f"{p}.add_k_proj"),
            "v": lin(f"{p}.add_v_proj"),
            "proj": lin(f"{p}.to_add_out"),
            "q_norm": v.get(f"{p}.norm_added_q.weight", dtype),
            "k_norm": v.get(f"{p}.norm_added_k.weight", dtype),
        }

    doubles = []
    for i in range(cfg.num_layers):
        p = f"transformer_blocks.{i}"
        doubles.append({
            "img_mod": lin(f"{p}.norm1.linear"),
            "txt_mod": lin(f"{p}.norm1_context.linear"),
            "img_attn": attn(f"{p}.attn", ctx=False),
            "txt_attn": attn(f"{p}.attn", ctx=True),
            "img_mlp": {"in": lin(f"{p}.ff.net.0.proj"), "out": lin(f"{p}.ff.net.2")},
            "txt_mlp": {"in": lin(f"{p}.ff_context.net.0.proj"),
                        "out": lin(f"{p}.ff_context.net.2")},
        })
    singles = []
    for i in range(cfg.num_single_layers):
        p = f"single_transformer_blocks.{i}"
        singles.append({
            "q": lin(f"{p}.attn.to_q"),
            "k": lin(f"{p}.attn.to_k"),
            "v": lin(f"{p}.attn.to_v"),
            "q_norm": v.get(f"{p}.attn.norm_q.weight", dtype),
            "k_norm": v.get(f"{p}.attn.norm_k.weight", dtype),
            "proj_mlp": lin(f"{p}.proj_mlp"),
            "linear2": lin(f"{p}.proj_out"),
            "mod": lin(f"{p}.norm.linear"),
        })

    params = {
        "img_in": lin("x_embedder"),
        "txt_in": lin("context_embedder"),
        "time_in": mlp_embedder("time_text_embed.timestep_embedder"),
        "vector_in": mlp_embedder("time_text_embed.text_embedder"),
        "double": stack_trees(doubles),
        "single": stack_trees(singles),
        "final": {
            "mod": lin("norm_out.linear"),
            "proj": lin("proj_out"),
        },
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = mlp_embedder("time_text_embed.guidance_embedder")
    return params


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------


def build_t5_params(store: VarStore, cfg: T5Config, dtype=jnp.bfloat16,
                    dequantize: bool = False):
    """models/t5/mod.rs:633-647: shared embedding resolution + encoder stack."""
    v = store.pp("")
    if "shared.weight" in store:
        shared = v.get("shared.weight", dtype)
    elif "encoder.embed_tokens.weight" in store:
        shared = v.get("encoder.embed_tokens.weight", dtype)
    else:
        shared = v.get("decoder.embed_tokens.weight", dtype)

    lin = lambda p: v.pp(p).linear(  # noqa: E731
        bias=False, dtype=dtype, dequantize_to_dense=dequantize
    )
    blocks = []
    for i in range(cfg.num_layers):
        p = f"encoder.block.{i}.layer"
        ff_p = f"{p}.1.DenseReluDense"
        ff = (
            {"wi_0": lin(f"{ff_p}.wi_0"), "wi_1": lin(f"{ff_p}.wi_1"),
             "wo": lin(f"{ff_p}.wo")}
            if cfg.gated_act
            else {"wi": lin(f"{ff_p}.wi"), "wo": lin(f"{ff_p}.wo")}
        )
        blocks.append({
            "attn": {k: lin(f"{p}.0.SelfAttention.{k}") for k in "qkvo"},
            "attn_norm": v.get(f"{p}.0.layer_norm.weight", dtype),
            "ff": ff,
            "ff_norm": v.get(f"{p}.1.layer_norm.weight", dtype),
        })
    return {
        "shared": shared,
        "rel_bias": v.get(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight",
            jnp.float32,
        ),
        "blocks": stack_trees(blocks),
        "final_norm": v.get("encoder.final_layer_norm.weight", dtype),
    }


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


def build_clip_params(store: VarStore, cfg: ClipTextConfig, dtype=jnp.bfloat16):
    """models/clip/text.rs paths (transformers CLIPTextModel layout)."""
    v = store.pp("text_model")

    def ln(p):
        return {"w": v.get(f"{p}.weight", dtype), "b": v.get(f"{p}.bias", dtype)}

    lin = lambda p: v.pp(p).linear(bias=True, dtype=dtype)  # noqa: E731
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        blocks.append({
            "ln1": ln(f"{p}.layer_norm1"),
            "attn": {
                "q": lin(f"{p}.self_attn.q_proj"),
                "k": lin(f"{p}.self_attn.k_proj"),
                "v": lin(f"{p}.self_attn.v_proj"),
                "out": lin(f"{p}.self_attn.out_proj"),
            },
            "ln2": ln(f"{p}.layer_norm2"),
            "mlp": {"fc1": lin(f"{p}.mlp.fc1"), "fc2": lin(f"{p}.mlp.fc2")},
        })
    return {
        "token_emb": v.get("embeddings.token_embedding.weight", dtype),
        "pos_emb": v.get("embeddings.position_embedding.weight", dtype),
        "blocks": stack_trees(blocks),
        "final_ln": ln("final_layer_norm"),
    }


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def build_vae_params(store: VarStore, cfg: VAEConfig, dtype=jnp.bfloat16):
    """models/vaes/vae.rs paths (diffusers AutoencoderKL layout)."""
    v = store.pp("")

    def gn(p):
        return {"w": v.get(f"{p}.weight", dtype), "b": v.get(f"{p}.bias", dtype)}

    def conv(p):
        return v.pp(p).conv2d(dtype)

    def resnet(p):
        return {
            "norm1": gn(f"{p}.norm1"),
            "conv1": conv(f"{p}.conv1"),
            "norm2": gn(f"{p}.norm2"),
            "conv2": conv(f"{p}.conv2"),
            "shortcut": conv(f"{p}.conv_shortcut")
            if f"{p}.conv_shortcut.weight" in store else None,
        }

    def mid(p):
        attn = None
        if cfg.mid_block_add_attention:
            a = f"{p}.attentions.0"
            attn = {
                "norm": gn(f"{a}.group_norm"),
                "q": v.pp(f"{a}.to_q").conv2d_as_linear(dtype),
                "k": v.pp(f"{a}.to_k").conv2d_as_linear(dtype),
                "v": v.pp(f"{a}.to_v").conv2d_as_linear(dtype),
                "out": v.pp(f"{a}.to_out.0").conv2d_as_linear(dtype),
            }
        return {
            "res1": resnet(f"{p}.resnets.0"),
            "attn": attn,
            "res2": resnet(f"{p}.resnets.1"),
        }

    n_levels = len(cfg.block_out_channels)
    down = []
    for i in range(n_levels):
        p = f"encoder.down_blocks.{i}"
        down.append({
            "resnets": [resnet(f"{p}.resnets.{j}") for j in range(cfg.layers_per_block)],
            "downsample": conv(f"{p}.downsamplers.0.conv")
            if i != n_levels - 1 else None,
        })
    up = []
    for i in range(n_levels):
        p = f"decoder.up_blocks.{i}"
        up.append({
            "resnets": [resnet(f"{p}.resnets.{j}") for j in range(cfg.layers_per_block + 1)],
            "upsample": conv(f"{p}.upsamplers.0.conv")
            if i != n_levels - 1 else None,
        })
    return {
        "encoder": {
            "conv_in": conv("encoder.conv_in"),
            "down": down,
            "mid": mid("encoder.mid_block"),
            "norm_out": gn("encoder.conv_norm_out"),
            "conv_out": conv("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": conv("decoder.conv_in"),
            "mid": mid("decoder.mid_block"),
            "up": up,
            "norm_out": gn("decoder.conv_norm_out"),
            "conv_out": conv("decoder.conv_out"),
        },
        "quant_conv": conv("quant_conv") if "quant_conv.weight" in store else None,
        "post_quant_conv": conv("post_quant_conv")
        if "post_quant_conv.weight" in store else None,
    }
