"""Generate authoritative T5 / CLIP checkpoint key inventories.

The FLUX text encoders are plain ``transformers`` models
(T5EncoderModel google/t5-v1_1-xxl, CLIPTextModel openai/clip-vit-large
-patch14 — the classes the reference's checkpoints were saved from, per
models/t5/mod.rs:633-656 and models/clip/text.rs). Instantiating those
classes at the published configs on the meta device yields the exact
state-dict key/shape inventory a real checkpoint carries — no hub access
needed. Output: tests/key_inventories/{t5_xxl,clip_l}.json.

Run: python tools/gen_key_inventory.py
"""

import json
import pathlib

import torch
from transformers import CLIPTextConfig, CLIPTextModel, T5Config, T5EncoderModel

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "key_inventories"


def state_shapes(model) -> dict:
    return {k: list(v.shape) for k, v in model.state_dict().items()}


def gen_t5_xxl() -> dict:
    cfg = T5Config(
        vocab_size=32128,
        d_model=4096,
        d_kv=64,
        d_ff=10240,
        num_layers=24,
        num_heads=64,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        is_encoder_decoder=False,
        dense_act_fn="gelu_new",
        is_gated_act=True,
    )
    with torch.device("meta"):
        model = T5EncoderModel(cfg)
    shapes = state_shapes(model)
    # safetensors forbids shared tensors: real checkpoints keep shared.weight
    # and drop the tied encoder.embed_tokens.weight alias.
    shapes.pop("encoder.embed_tokens.weight", None)
    return shapes


def gen_clip_l() -> dict:
    cfg = CLIPTextConfig(
        vocab_size=49408,
        hidden_size=768,
        intermediate_size=3072,
        num_hidden_layers=12,
        num_attention_heads=12,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        projection_dim=768,
    )
    with torch.device("meta"):
        model = CLIPTextModel(cfg)
    return state_shapes(model)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, gen in (("t5_xxl", gen_t5_xxl), ("clip_l", gen_clip_l)):
        shapes = gen()
        path = OUT / f"{name}.json"
        path.write_text(json.dumps(shapes, indent=1, sort_keys=True) + "\n")
        print(f"{path}: {len(shapes)} tensors")


if __name__ == "__main__":
    main()
