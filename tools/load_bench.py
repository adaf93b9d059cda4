"""Full-size load benchmark: real ``Pipeline.load`` on a full-size FLUX
checkpoint (VERDICT r2 next #2).

Generates a SYNTHETIC full-size FLUX.1-dev checkpoint whose tensor
key/shape sets are exactly the authoritative inventories (io/audit.py —
the same inventories the key-coverage tests pin against transformers
state dicts and known parameter totals), sharded like real repos, then
measures ``Pipeline.load`` wall time with and without the native IO
engine (DIFFUSION_RS_TPU_NO_NATIVE=1).

The reference's loader is itself a perf feature (one OS thread per
safetensors file, varbuilder_loading.rs:62-94; mmap zero-copy) — this is
the comparable measurement for the TPU build's loading stack.

Measurements run on the CPU backend (JAX_PLATFORMS=cpu): through the axon
tunnel the TPU H2D (~0.19 GB/s) would swamp the loader; on a real host the
upload overlaps per-component. The number reported is the host loading
stack: mmap + span reads + dtype/transpose + tree assembly.

Usage:
  python tools/load_bench.py [--dir /tmp/drs_fullsize] [--regen]
  python tools/load_bench.py --measure <dir>      # child mode, prints JSON
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

SHARD_BYTES = 2 << 30  # ~2 GB shards, like real multi-shard repos


def _value_pool():
    import numpy as np

    try:
        from ml_dtypes import bfloat16
    except ImportError:  # pragma: no cover
        bfloat16 = np.float16
    n = 1 << 24  # 16M values; tiled per-tensor at memcpy speed
    vals = np.random.default_rng(0x5EED).standard_normal(n, dtype=np.float32)
    vals *= 0.02
    return np.concatenate([vals, vals]).astype(bfloat16)


def _write_component(dirpath: pathlib.Path, base: str, inv: dict, pool):
    """Write inventory tensors as sharded bf16 safetensors (pool-filled
    weights, zero biases/ones norms — load perf only cares about bytes)."""
    import numpy as np

    from diffusion_rs_tpu.io.safetensors import save_safetensors

    half = len(pool) // 2
    shard, shard_bytes, shards = {}, 0, []
    items = list(inv.items())
    for idx, (key, shape) in enumerate(items):
        n = int(np.prod(shape))
        if len(shape) >= 2:
            off = (idx * 2654435761) % half
            if n <= half:
                arr = pool[off:off + n].reshape(shape)
            else:
                arr = np.resize(pool[:half], n).reshape(shape)
        elif key.endswith(".bias"):
            arr = np.zeros(shape, pool.dtype)
        else:
            arr = np.ones(shape, pool.dtype)
        shard[key] = arr
        shard_bytes += n * 2
        if shard_bytes >= SHARD_BYTES or idx == len(items) - 1:
            shards.append(dict(shard))
            shard, shard_bytes = {}, 0
    stem = dirpath / base
    if len(shards) == 1:
        save_safetensors(f"{stem}.safetensors", shards[0])
    else:
        for i, s in enumerate(shards):
            save_safetensors(
                f"{stem}-{i + 1:05d}-of-{len(shards):05d}.safetensors", s
            )
    return len(shards)


def generate(root: pathlib.Path):
    from diffusion_rs_tpu.io.audit import (
        expected_clip_keys, expected_flux_keys, expected_t5_keys,
        expected_vae_keys,
    )
    from diffusion_rs_tpu.models.clip import ClipTextConfig
    from diffusion_rs_tpu.models.flux import FluxConfig
    from diffusion_rs_tpu.models.t5 import T5Config
    from diffusion_rs_tpu.models.vae import VAEConfig
    from synth import make_clip_vocab_merges, make_t5_tokenizer_json

    root.mkdir(parents=True, exist_ok=True)
    for d in ("scheduler", "text_encoder", "text_encoder_2", "tokenizer",
              "tokenizer_2", "transformer", "vae"):
        (root / d).mkdir(exist_ok=True)
    (root / "model_index.json").write_text(
        json.dumps({"_class_name": "FluxPipeline"})
    )
    (root / "scheduler/scheduler_config.json").write_text(json.dumps({
        "_class_name": "FlowMatchEulerDiscreteScheduler",
        "base_image_seq_len": 256, "base_shift": 0.5,
        "max_image_seq_len": 4096, "max_shift": 1.15,
        "shift": 3.0, "use_dynamic_shifting": True,
    }))
    (root / "text_encoder/config.json").write_text(json.dumps({
        "vocab_size": 49408, "hidden_size": 768, "intermediate_size": 3072,
        "max_position_embeddings": 77, "num_hidden_layers": 12,
        "num_attention_heads": 12, "hidden_act": "quick_gelu",
    }))
    (root / "text_encoder_2/config.json").write_text(json.dumps({
        "vocab_size": 32128, "d_model": 4096, "d_kv": 64, "d_ff": 10240,
        "num_layers": 24, "num_heads": 64,
        "relative_attention_num_buckets": 32,
        "relative_attention_max_distance": 128,
        "layer_norm_epsilon": 1e-6, "feed_forward_proj": "gated-gelu",
    }))
    (root / "transformer/config.json").write_text(json.dumps({
        "in_channels": 64, "pooled_projection_dim": 768,
        "joint_attention_dim": 4096, "num_attention_heads": 24,
        "attention_head_dim": 128, "axes_dims_rope": [16, 56, 56],
        "num_layers": 19, "num_single_layers": 38, "guidance_embeds": True,
    }))
    (root / "vae/config.json").write_text(json.dumps({
        "_class_name": "AutoencoderKL", "in_channels": 3, "out_channels": 3,
        "block_out_channels": [128, 256, 512, 512], "layers_per_block": 2,
        "latent_channels": 16, "norm_num_groups": 32,
        "scaling_factor": 0.3611, "shift_factor": 0.1159,
        "mid_block_add_attention": True,
        "use_quant_conv": False, "use_post_quant_conv": False,
    }))
    vocab, merges = make_clip_vocab_merges()
    (root / "tokenizer/vocab.json").write_text(vocab)
    (root / "tokenizer/merges.txt").write_text(merges)
    (root / "tokenizer_2/tokenizer.json").write_text(make_t5_tokenizer_json())

    pool = _value_pool()
    t0 = time.perf_counter()
    n = _write_component(root / "text_encoder", "model",
                         expected_clip_keys(ClipTextConfig()), pool)
    print(f"  clip: {n} shard(s)")
    n = _write_component(root / "text_encoder_2", "model",
                         expected_t5_keys(T5Config()), pool)
    print(f"  t5-xxl: {n} shard(s)")
    n = _write_component(root / "vae", "diffusion_pytorch_model",
                         expected_vae_keys(VAEConfig()), pool)
    print(f"  vae: {n} shard(s)")
    n = _write_component(root / "transformer", "diffusion_pytorch_model",
                         expected_flux_keys(FluxConfig()), pool)
    print(f"  flux-dev: {n} shard(s)")
    total = sum(p.stat().st_size for p in root.rglob("*.safetensors"))
    print(f"  generated {total / 2**30:.1f} GiB in "
          f"{time.perf_counter() - t0:.0f}s -> {root}")


def measure(root: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from diffusion_rs_tpu import ModelSource, Pipeline

    t0 = time.perf_counter()
    pipe = Pipeline(ModelSource.from_model_id(root), silent=True)
    t = time.perf_counter() - t0
    n_params = sum(
        getattr(x, "size", 0) for x in jax.tree.leaves(
            (pipe._inner.flux_params, pipe._inner.t5_params,
             pipe._inner.clip_params, pipe._inner.vae_params)
        )
    )
    print(json.dumps({
        "load_s": round(t, 2), "params": int(n_params),
        "native": not os.environ.get("DIFFUSION_RS_TPU_NO_NATIVE"),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/drs_fullsize")
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--measure", metavar="DIR")
    args = ap.parse_args()
    if args.measure:
        measure(args.measure)
        return
    root = pathlib.Path(args.dir)
    if args.regen or not (root / "model_index.json").exists():
        print("generating full-size checkpoint…")
        generate(root)
    for no_native in (False, True):
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("DIFFUSION_RS_TPU_NO_NATIVE", None)
        if no_native:
            env["DIFFUSION_RS_TPU_NO_NATIVE"] = "1"
        # drop page cache effects between runs? No root drop; run twice and
        # report the warm number (page-cache-warm is the realistic repeat).
        label = "numpy-mmap" if no_native else "native-engine"
        out = subprocess.run(
            [sys.executable, __file__, "--measure", str(root)],
            env=env, capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
        print(f"{label}: {line or out.stderr[-400:]}")


if __name__ == "__main__":
    main()
