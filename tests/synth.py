"""Synthetic tiny FLUX checkpoint factory for end-to-end tests.

Writes a diffusers-layout FluxPipeline directory (model_index.json,
scheduler, CLIP + T5 encoders, tokenizers, transformer, VAE) with random
weights in the exact file/tensor naming the loaders expect — the same layout
the reference consumes from HF hub / DDUF (pipelines/flux/mod.rs:33-43).
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path

import numpy as np

from diffusion_rs_tpu.io.safetensors import save_safetensors
from diffusion_rs_tpu.quant.bnb import quantize_4bit_bnb_layout

# tiny dims
CLIP_HIDDEN = 32
CLIP_LAYERS = 2
CLIP_HEADS = 2
CLIP_VOCAB = 256
T5_DMODEL = 64
T5_DFF = 96
T5_LAYERS = 2
T5_HEADS = 2
T5_DKV = 32
T5_VOCAB = 128
FLUX_HEADS = 2
FLUX_HEAD_DIM = 16
FLUX_HIDDEN = FLUX_HEADS * FLUX_HEAD_DIM
FLUX_LAYERS = 2
FLUX_SINGLE_LAYERS = 2
VAE_CH = (8, 8, 8, 8)


def _rng(seed):
    return np.random.default_rng(seed)


def _lin(rng, n_out, n_in, scale=None):
    scale = scale or (n_in ** -0.5)
    return (rng.standard_normal((n_out, n_in)) * scale).astype(np.float32)


def clip_tensors(rng) -> dict:
    d, L = CLIP_HIDDEN, CLIP_LAYERS
    t = {
        "text_model.embeddings.token_embedding.weight": (rng.standard_normal((CLIP_VOCAB, d)) * 0.02).astype(np.float32),
        "text_model.embeddings.position_embedding.weight": (rng.standard_normal((77, d)) * 0.02).astype(np.float32),
        "text_model.final_layer_norm.weight": np.ones(d, np.float32),
        "text_model.final_layer_norm.bias": np.zeros(d, np.float32),
    }
    for i in range(L):
        p = f"text_model.encoder.layers.{i}"
        for stub, (o, n) in {
            "self_attn.q_proj": (d, d), "self_attn.k_proj": (d, d),
            "self_attn.v_proj": (d, d), "self_attn.out_proj": (d, d),
            "mlp.fc1": (4 * d, d), "mlp.fc2": (d, 4 * d),
        }.items():
            t[f"{p}.{stub}.weight"] = _lin(rng, o, n)
            t[f"{p}.{stub}.bias"] = np.zeros(o, np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            t[f"{p}.{ln}.weight"] = np.ones(d, np.float32)
            t[f"{p}.{ln}.bias"] = np.zeros(d, np.float32)
    return t


def t5_tensors(rng) -> dict:
    d, ff, L = T5_DMODEL, T5_DFF, T5_LAYERS
    inner = T5_HEADS * T5_DKV
    t = {
        "shared.weight": (rng.standard_normal((T5_VOCAB, d)) * 0.5).astype(np.float32),
        "encoder.final_layer_norm.weight": np.ones(d, np.float32),
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight":
            (rng.standard_normal((32, T5_HEADS)) * 0.1).astype(np.float32),
    }
    for i in range(L):
        p = f"encoder.block.{i}.layer"
        for k in "qkv":
            t[f"{p}.0.SelfAttention.{k}.weight"] = _lin(rng, inner, d)
        t[f"{p}.0.SelfAttention.o.weight"] = _lin(rng, d, inner)
        t[f"{p}.0.layer_norm.weight"] = np.ones(d, np.float32)
        t[f"{p}.1.DenseReluDense.wi_0.weight"] = _lin(rng, ff, d)
        t[f"{p}.1.DenseReluDense.wi_1.weight"] = _lin(rng, ff, d)
        t[f"{p}.1.DenseReluDense.wo.weight"] = _lin(rng, d, ff)
        t[f"{p}.1.layer_norm.weight"] = np.ones(d, np.float32)
    return t


def flux_linear_shapes(guidance: bool = False) -> dict:
    h, m = FLUX_HIDDEN, FLUX_HIDDEN * 4
    shapes = {
        "x_embedder": (h, 64),
        "context_embedder": (h, T5_DMODEL),
        "time_text_embed.timestep_embedder.linear_1": (h, 256),
        "time_text_embed.timestep_embedder.linear_2": (h, h),
        "time_text_embed.text_embedder.linear_1": (h, CLIP_HIDDEN),
        "time_text_embed.text_embedder.linear_2": (h, h),
        "norm_out.linear": (2 * h, h),
        "proj_out": (64, h),
    }
    if guidance:
        shapes["time_text_embed.guidance_embedder.linear_1"] = (h, 256)
        shapes["time_text_embed.guidance_embedder.linear_2"] = (h, h)
    for i in range(FLUX_LAYERS):
        p = f"transformer_blocks.{i}"
        shapes.update({
            f"{p}.norm1.linear": (6 * h, h),
            f"{p}.norm1_context.linear": (6 * h, h),
            f"{p}.attn.to_q": (h, h), f"{p}.attn.to_k": (h, h),
            f"{p}.attn.to_v": (h, h), f"{p}.attn.to_out.0": (h, h),
            f"{p}.attn.add_q_proj": (h, h), f"{p}.attn.add_k_proj": (h, h),
            f"{p}.attn.add_v_proj": (h, h), f"{p}.attn.to_add_out": (h, h),
            f"{p}.ff.net.0.proj": (m, h), f"{p}.ff.net.2": (h, m),
            f"{p}.ff_context.net.0.proj": (m, h), f"{p}.ff_context.net.2": (h, m),
        })
    for i in range(FLUX_SINGLE_LAYERS):
        p = f"single_transformer_blocks.{i}"
        shapes.update({
            f"{p}.attn.to_q": (h, h), f"{p}.attn.to_k": (h, h),
            f"{p}.attn.to_v": (h, h),
            f"{p}.proj_mlp": (m, h), f"{p}.proj_out": (h, h + m),
            f"{p}.norm.linear": (3 * h, h),
        })
    return shapes


def flux_tensors(rng, quant: str | None = None, guidance: bool = False) -> dict:
    """quant: None (f32 dense) or "nf4" (bnb 4-bit layout with quant_state)."""
    h = FLUX_HIDDEN
    t = {}
    for name, (o, n) in flux_linear_shapes(guidance).items():
        w = _lin(rng, o, n)
        if quant == "nf4" and n % 64 == 0:
            packed, absmax = quantize_4bit_bnb_layout(w, blocksize=64, kind="nf4")
            state = {
                "blocksize": 64, "shape": [o, n], "dtype": "bfloat16",
                "quant_type": "nf4",
            }
            t[f"{name}.weight"] = packed.reshape(-1, 1)
            t[f"{name}.weight.absmax"] = absmax.astype(np.float32)
            from diffusion_rs_tpu.quant.bnb import NF4_CODEBOOK

            t[f"{name}.weight.quant_map"] = NF4_CODEBOOK.copy()
            t[f"{name}.weight.quant_state.bitsandbytes__nf4"] = np.frombuffer(
                json.dumps(state).encode(), np.uint8
            ).copy()
        else:
            t[f"{name}.weight"] = w
        t[f"{name}.bias"] = np.zeros(o, np.float32)
    for i in range(FLUX_LAYERS):
        p = f"transformer_blocks.{i}.attn"
        for k in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            t[f"{p}.{k}.weight"] = np.ones(FLUX_HEAD_DIM, np.float32)
    for i in range(FLUX_SINGLE_LAYERS):
        p = f"single_transformer_blocks.{i}.attn"
        t[f"{p}.norm_q.weight"] = np.ones(FLUX_HEAD_DIM, np.float32)
        t[f"{p}.norm_k.weight"] = np.ones(FLUX_HEAD_DIM, np.float32)
    return t


def flux_gguf_tensors(rng, guidance: bool = False) -> dict:
    """Transformer weights as GGUF entries (fmt, shape, raw): linears q4_0,
    biases/norms dense f32 — a gguf-quantized transformer checkpoint."""
    from diffusion_rs_tpu.quant.gguf_quants import ENCODERS

    t = {}
    for name, (o, n) in flux_linear_shapes(guidance).items():
        w = _lin(rng, o, n)
        if n % 32 == 0:
            t[f"{name}.weight"] = ("q4_0", (o, n), ENCODERS["q4_0"](w))
        else:
            t[f"{name}.weight"] = ("f32", (o, n), w.tobytes())
        t[f"{name}.bias"] = ("f32", (o,), np.zeros(o, np.float32).tobytes())
    ones = np.ones(FLUX_HEAD_DIM, np.float32).tobytes()
    for i in range(FLUX_LAYERS):
        p = f"transformer_blocks.{i}.attn"
        for k in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            t[f"{p}.{k}.weight"] = ("f32", (FLUX_HEAD_DIM,), ones)
    for i in range(FLUX_SINGLE_LAYERS):
        p = f"single_transformer_blocks.{i}.attn"
        t[f"{p}.norm_q.weight"] = ("f32", (FLUX_HEAD_DIM,), ones)
        t[f"{p}.norm_k.weight"] = ("f32", (FLUX_HEAD_DIM,), ones)
    return t


def vae_tensors(rng) -> dict:
    t = {}

    def conv(p, cout, cin, k):
        t[f"{p}.weight"] = (rng.standard_normal((cout, cin, k, k)) * 0.05).astype(np.float32)
        t[f"{p}.bias"] = np.zeros(cout, np.float32)

    def gn(p, c):
        t[f"{p}.weight"] = np.ones(c, np.float32)
        t[f"{p}.bias"] = np.zeros(c, np.float32)

    def resnet(p, cin, cout):
        gn(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin, 3)
        gn(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, 1)

    def mid(p, c):
        resnet(f"{p}.resnets.0", c, c)
        resnet(f"{p}.resnets.1", c, c)
        gn(f"{p}.attentions.0.group_norm", c)
        for k in ("to_q", "to_k", "to_v", "to_out.0"):
            t[f"{p}.attentions.0.{k}.weight"] = _lin(rng, c, c)
            t[f"{p}.attentions.0.{k}.bias"] = np.zeros(c, np.float32)

    boc = VAE_CH
    lpb = 1
    conv("encoder.conv_in", boc[0], 3, 3)
    c = boc[0]
    for i, cout in enumerate(boc):
        for j in range(lpb):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", c, cout)
            c = cout
        if i != len(boc) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c, 3)
    mid("encoder.mid_block", c)
    gn("encoder.conv_norm_out", c)
    conv("encoder.conv_out", 32, c, 3)  # 2 * latent(16)
    conv("decoder.conv_in", boc[-1], 16, 3)
    mid("decoder.mid_block", boc[-1])
    c = boc[-1]
    for i, cout in enumerate(reversed(boc)):
        for j in range(lpb + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", c, cout)
            c = cout
        if i != len(boc) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c, 3)
    gn("decoder.conv_norm_out", boc[0])
    conv("decoder.conv_out", 3, boc[0], 3)
    return t


def make_t5_tokenizer_json() -> str:
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ["a", "photo", "of", "cat", "dog", "the", "<unk>", "</s>"]
    vocab = {w: i + 2 for i, w in enumerate(words)}
    vocab["<pad>"] = 0
    vocab["<extra>"] = 1
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    return tok.to_str()


def make_clip_vocab_merges():
    chars = [chr(c) for c in range(32, 127)]
    vocab = {c: i for i, c in enumerate(chars)}
    vocab["</w>"] = len(vocab)
    merges = "#version: 0.2\n"
    return json.dumps(vocab), merges


def write_checkpoint(
    root: Path, seed: int = 0, quant: str | None = None,
    guidance: bool = False, dynamic_shifting: bool = False,
) -> Path:
    """guidance/dynamic_shifting=True produces a dev-style checkpoint
    (guidance embedder + dynamic mu shift), else schnell-style."""
    root = Path(root)
    rng = _rng(seed)
    (root / "scheduler").mkdir(parents=True, exist_ok=True)
    for d in ("text_encoder", "text_encoder_2", "tokenizer", "tokenizer_2",
              "transformer", "vae"):
        (root / d).mkdir(exist_ok=True)

    (root / "model_index.json").write_text(json.dumps({"_class_name": "FluxPipeline"}))
    (root / "scheduler/scheduler_config.json").write_text(json.dumps({
        "_class_name": "FlowMatchEulerDiscreteScheduler",
        "base_image_seq_len": 256, "base_shift": 0.5,
        "max_image_seq_len": 4096, "max_shift": 1.15,
        "shift": 1.0, "use_dynamic_shifting": dynamic_shifting,
    }))
    (root / "text_encoder/config.json").write_text(json.dumps({
        "vocab_size": CLIP_VOCAB, "hidden_size": CLIP_HIDDEN,
        "intermediate_size": 4 * CLIP_HIDDEN, "max_position_embeddings": 77,
        "num_hidden_layers": CLIP_LAYERS, "num_attention_heads": CLIP_HEADS,
        "hidden_act": "quick_gelu",
    }))
    save_safetensors(str(root / "text_encoder/model.safetensors"), clip_tensors(rng))
    (root / "text_encoder_2/config.json").write_text(json.dumps({
        "vocab_size": T5_VOCAB, "d_model": T5_DMODEL, "d_kv": T5_DKV,
        "d_ff": T5_DFF, "num_layers": T5_LAYERS, "num_heads": T5_HEADS,
        "relative_attention_num_buckets": 32,
        "relative_attention_max_distance": 128,
        "layer_norm_epsilon": 1e-6, "feed_forward_proj": "gated-gelu",
    }))
    save_safetensors(str(root / "text_encoder_2/model.safetensors"), t5_tensors(rng))
    vocab, merges = make_clip_vocab_merges()
    (root / "tokenizer/vocab.json").write_text(vocab)
    (root / "tokenizer/merges.txt").write_text(merges)
    (root / "tokenizer_2/tokenizer.json").write_text(make_t5_tokenizer_json())
    (root / "transformer/config.json").write_text(json.dumps({
        "in_channels": 64, "pooled_projection_dim": CLIP_HIDDEN,
        "joint_attention_dim": T5_DMODEL,
        "num_attention_heads": FLUX_HEADS,
        "attention_head_dim": FLUX_HEAD_DIM,
        "axes_dims_rope": [4, 6, 6],
        "num_layers": FLUX_LAYERS, "num_single_layers": FLUX_SINGLE_LAYERS,
        "guidance_embeds": guidance,
    }))
    if quant == "gguf_q4_0":
        from diffusion_rs_tpu.io.gguf import write_gguf

        write_gguf(
            str(root / "transformer/diffusion_pytorch_model.gguf"),
            flux_gguf_tensors(rng, guidance=guidance),
            metadata={"general.name": "flux-tiny-q4_0"},
        )
    else:
        save_safetensors(
            str(root / "transformer/diffusion_pytorch_model.safetensors"),
            flux_tensors(rng, quant=quant, guidance=guidance),
        )
    (root / "vae/config.json").write_text(json.dumps({
        "_class_name": "AutoencoderKL",
        "in_channels": 3, "out_channels": 3,
        "block_out_channels": list(VAE_CH), "layers_per_block": 1,
        "latent_channels": 16, "norm_num_groups": 4,
        "scaling_factor": 0.3611, "shift_factor": 0.1159,
        "mid_block_add_attention": True,
        "use_quant_conv": False, "use_post_quant_conv": False,
        "down_block_types": ["DownEncoderBlock2D"] * 4,
        "up_block_types": ["UpDecoderBlock2D"] * 4,
    }))
    save_safetensors(str(root / "vae/diffusion_pytorch_model.safetensors"), vae_tensors(rng))
    return root


def write_dduf(checkpoint_dir: Path, dduf_path: Path) -> Path:
    """Zip the checkpoint with STORED entries (DDUF requires store)."""
    with zipfile.ZipFile(dduf_path, "w", compression=zipfile.ZIP_STORED) as zf:
        for p in sorted(Path(checkpoint_dir).rglob("*")):
            if p.is_file():
                zf.write(p, str(p.relative_to(checkpoint_dir)))
    return dduf_path
