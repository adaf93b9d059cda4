#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

North-star config (BASELINE.md): FLUX.1 1024x1024, 28 steps, Q4 weights,
batch 1. The default mode ("image") measures the WHOLE image: T5-XXL(24
blocks, nf4) + CLIP-L encode, the 28-step MMDiT denoise scan (19 double + 38
single blocks, hidden 3072, nf4 fused Pallas dequant-matmul, flash SDPA over
the 4608-token joint sequence), and the VAE decode — through the same
FluxPipeline stage graphs the user-facing API runs (pipelines/flux_pipeline.py),
fed synthetic full-size weights. Per-denoise-step p50 is derived by also
timing a 4-step image at the same resolution: step = (t28 - t4)/24, and the
encode+decode overhead = t4 - 4*step.

``--mode step`` keeps the round-1 transformer-step-only metric.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
baseline is the round-1 driver-recorded number (BENCH_r01.json: 0.0538
img/s/chip — a step-only figure; the image metric additionally pays
encoders+VAE, so parity there means the whole image costs no more than r1's
bare transformer loop).

Usage: python bench.py [--mode image|step] [--small] [--preset ...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

R1_BASELINE_IMG_PER_S = 0.0538  # BENCH_r01.json (step-derived, 28 steps)

# Round-1 measured p50 step latencies per BASELINE config (BENCH.md r1) —
# preset runs report vs_baseline as the step-time speedup vs these.
R1_STEP_MS = {
    "schnell-256": 134.0,
    "dev-720x1280": 687.0,
    "schnell-1024-b8": 5630.0,
    "dev-2048": 3760.0,
}

# BASELINE.md targets: 1 schnell q4 256^2x4; 2 dev q4 720x1280x50;
# 3 dev bf16 1024^2x28 (>16GB HBM single-chip — streamed); 4 schnell q4
# batch-8 1024^2; 5 dev q4 2048^2 (16k-token attention).
# Exec-format defaults are the measured-best per config (BENCH.md r3):
# q8t wins at batch-1 (1.4-1.6x) but LOSES at batch-8 (weights amortized 8x,
# activation-quantize cost scales with M — measured 6.10 vs 5.63 s/step) and
# exceeds single-chip HBM for the 2048^2 whole-image path (12 GB weights +
# 16k-token activations + decode; step-only q8t measured 2748 ms = 1.37x,
# viable on a tp-sharded mesh where weights split across chips).
PRESETS = {
    "schnell-256": dict(res=256, batch=1, impl="q8t", guidance=False, txt=256, steps=4),
    "dev-720x1280": dict(res=(720, 1280), batch=1, impl="q8t", guidance=True, txt=512, steps=50),
    "dev-1024-bf16": dict(res=1024, batch=1, impl="dense", guidance=True, txt=512, steps=28),
    "schnell-1024-b8": dict(res=1024, batch=8, impl="q4", guidance=False,
                            txt=256, steps=4, offload_encoders=True),
    "dev-2048": dict(res=2048, batch=1, impl="q4", guidance=True, txt=512,
                     steps=28, offload_encoders=True),
}


def _maybe_rope_fused(params, cfg):
    """Mirror the loader's (opt-in) RoPE half-split re-layout
    (pipelines/loader.py): the bench constructs params directly, so it
    applies the same transform when DIFFUSION_RS_TPU_FUSED_ROPE=1 — used to
    measure the alternate attention layouts (BENCH.md r3: all measured
    slower than the interleaved baseline on v5e)."""
    import dataclasses
    import os

    if os.environ.get("DIFFUSION_RS_TPU_FUSED_ROPE", "0") != "1":
        return params, cfg
    from diffusion_rs_tpu.models.optimize import rope_halfsplit_permute

    try:
        params = rope_halfsplit_permute(params, cfg)
        cfg = dataclasses.replace(cfg, rope_fused=True)
    except (ValueError, KeyError, TypeError):
        pass
    return params, cfg


def _setup_jax():
    import jax
    import os
    import pathlib

    # A sitecustomize may pin the platform list (e.g. the axon TPU relay);
    # honor an explicit JAX_PLATFORMS=cpu request (CPU-mesh smoke runs) by
    # counter-updating after import, like tests/conftest.py does.
    env_plat = os.environ.get("JAX_PLATFORMS", "")
    if env_plat and "axon" not in env_plat:
        jax.config.update("jax_platforms", env_plat)

    # Persistent compilation cache: the big scan graph + Mosaic kernels take
    # minutes through the remote-compile path on first build; cache across
    # processes so driver bench runs hit warm artifacts.
    from diffusion_rs_tpu.util.compile_cache import enable_compile_cache

    enable_compile_cache(str(pathlib.Path(__file__).parent / ".jax_cache"))
    return jax


class _WordTokenizer:
    """Deterministic stand-in tokenizer for synthetic-weight benches (the
    timed path is identical; only the id values differ from a real BPE)."""

    class _Enc:
        def __init__(self, ids):
            self.ids = ids

    def __init__(self, vocab_size: int):
        self.vocab = vocab_size

    def encode_batch(self, prompts):
        return [
            self._Enc([(hash(w) % (self.vocab - 2)) + 1 for w in p.split()])
            for p in prompts
        ]


def _parse_mesh(spec):
    """'dp=2,sp=2,tp=2' -> Mesh (parallel.make_mesh over local devices)."""
    if not spec:
        return None
    from diffusion_rs_tpu.parallel import make_mesh

    axes = {}
    for part in spec.split(","):
        k, v = part.split("=")
        axes[k.strip()] = int(v)
    import jax as _jax

    dp, sp = axes.get("dp", 1), axes.get("sp", 1)
    tp = axes.get("tp")
    devs = _jax.devices()
    if tp is not None and dp * sp * tp < len(devs):
        devs = devs[: dp * sp * tp]  # explicit sizes may use a subset
    return make_mesh(dp=dp, sp=sp, tp=tp, devices=devs)


def bench_image(args, preset) -> int:
    """Whole-image latency (encode + denoise + decode) through FluxPipeline."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from diffusion_rs_tpu.models.clip import ClipTextConfig, init_clip_params
    from diffusion_rs_tpu.models.flux import FluxConfig, init_flux_params
    from diffusion_rs_tpu.models.t5 import T5Config, init_t5_params
    from diffusion_rs_tpu.models.vae import VAEConfig, init_vae_params
    from diffusion_rs_tpu.pipelines.api import DiffusionGenerationParams
    from diffusion_rs_tpu.pipelines.flux_pipeline import FluxPipeline
    from diffusion_rs_tpu.pipelines.scheduler import SchedulerConfig
    from diffusion_rs_tpu.util.synthetic import (
        init_flux_params_quantized,
        init_t5_params_quantized,
    )

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)

    if args.small:
        flux_cfg = FluxConfig(
            in_channels=64, pooled_projection_dim=64, joint_attention_dim=64,
            num_attention_heads=4, num_layers=2, num_single_layers=4,
            guidance_embeds=True, hidden_size=128, axes_dim=(8, 12, 12),
        )
        t5_cfg = T5Config(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                          num_layers=2, num_heads=4)
        clip_cfg = ClipTextConfig(vocab_size=512, projection_dim=64,
                                  intermediate_size=128, num_hidden_layers=2,
                                  num_attention_heads=4)
        vae_cfg = VAEConfig(block_out_channels=(32, 32), norm_num_groups=8,
                            latent_channels=16)
        res, steps = (128, 128), args.steps_image or 4
        flux_params = init_flux_params(ks[0], flux_cfg, dtype)
        t5_params = init_t5_params(ks[1], t5_cfg, dtype)
    else:
        guidance = preset["guidance"] if preset else True
        flux_cfg = FluxConfig(guidance_embeds=guidance)  # FLUX.1 dims
        t5_cfg = T5Config()    # T5-XXL
        clip_cfg = ClipTextConfig()  # CLIP-L
        vae_cfg = VAEConfig()
        res = preset["res"] if preset else args.res
        steps = args.steps_image or (preset["steps"] if preset else 28)
        offload_enc = bool(preset and preset.get("offload_encoders"))
        import contextlib

        # big-batch config: encoders live in host RAM and swap in around the
        # encode stage, freeing HBM for the batch-8 denoise + decode
        enc_ctx = (
            jax.default_device(jax.devices("cpu")[0])
            if offload_enc else contextlib.nullcontext()
        )
        impl_sel = args.impl
        if impl_sel in ("q4", "q8t"):
            # q8t: FLUX runs the s8xs8 MXU exec format (the load path reached
            # by `--isq q8t`, incl. requantization of q4 checkpoints — the
            # reference's CUDA analogue is mul_mat_vec_via_q8_1, requantizing
            # q4 blocks to q8_1 at quantized/cuda.rs:227). T5 stays nf4: its
            # one encode per image is off the hot path and nf4 halves its HBM
            # so FLUX-q8t (~12 GB) + T5 still fit one 16 GB chip.
            flux_params = init_flux_params_quantized(
                ks[0], flux_cfg, dtype,
                kind="q8t" if impl_sel == "q8t" else "nf4",
            )
            with enc_ctx:
                t5_params = init_t5_params_quantized(
                    ks[1], t5_cfg, dtype,
                    kind="q8t" if args.t5_impl == "q8t" else "nf4",
                )
        else:
            flux_params = init_flux_params(ks[0], flux_cfg, dtype)
            with enc_ctx:
                t5_params = init_t5_params(ks[1], t5_cfg, dtype)
    if isinstance(res, int):
        res = (res, res)
    flux_params, flux_cfg = _maybe_rope_fused(flux_params, flux_cfg)
    b = preset["batch"] if preset else args.batch
    impl = args.impl if not args.small else "dense-small"
    if getattr(args, "t5_impl", "q4") == "q8t":
        impl += "+t5q8t"

    offload = None
    if not args.small and preset and preset.get("offload_encoders"):
        from diffusion_rs_tpu.parallel.offload import HostOffload

        offload = HostOffload(only=("t5", "clip"))
        with jax.default_device(jax.devices("cpu")[0]):
            clip_params = init_clip_params(ks[2], clip_cfg, dtype)
    else:
        clip_params = init_clip_params(ks[2], clip_cfg, dtype)
    vae_params = init_vae_params(ks[3], vae_cfg, dtype)

    mesh = _parse_mesh(getattr(args, "mesh", None))
    if mesh is not None:
        from diffusion_rs_tpu.parallel import replicate_params, shard_params

        flux_params = shard_params(flux_params, mesh)
        t5_params = shard_params(t5_params, mesh)
        clip_params = replicate_params(clip_params, mesh)
        vae_params = replicate_params(vae_params, mesh)
    pipe = FluxPipeline(
        flux_params=flux_params, flux_cfg=flux_cfg,
        t5_params=t5_params, t5_cfg=t5_cfg,
        clip_params=clip_params, clip_cfg=clip_cfg,
        vae_params=vae_params, vae_cfg=vae_cfg,
        scheduler=SchedulerConfig(use_dynamic_shifting=flux_cfg.guidance_embeds),
        t5_tokenizer=_WordTokenizer(t5_cfg.vocab_size),
        clip_tokenizer=_WordTokenizer(clip_cfg.vocab_size),
        dtype=dtype, offload=offload, silent=True, mesh=mesh,
    )
    prompts = [f"a photo of test subject {i}" for i in range(b)]

    def timed_image(num_steps: int, iters: int):
        gp = DiffusionGenerationParams(
            height=res[0], width=res[1], num_steps=num_steps,
            guidance_scale=3.5, seed=7,
        )
        try:
            pipe.forward_arrays(prompts, gp)  # compile + warmup
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e) or "ResourceExhausted" in str(e):
                return None
            raise
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            pipe.forward_arrays(prompts, gp)
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    few = max(1, min(4, steps // 2))
    t_full = timed_image(steps, args.iters)
    if t_full is None:
        print(json.dumps({
            "metric": f"FLUX.1 {res[0]}x{res[1]} {impl} whole image: exceeds "
                      "single-chip HBM (needs mesh/offload)",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
        }))
        return 0
    t_few = timed_image(few, args.iters) if few < steps else None
    step_s = None
    if t_few is not None and t_few < t_full:
        step_s = (t_full - t_few) / (steps - few)
        overhead_s = max(0.0, t_few - few * step_s)
        detail = (f"p50 step {step_s*1e3:.1f} ms, "
                  f"encode+decode {overhead_s*1e3:.0f} ms")
    else:
        # t_few >= t_full happens on noisy/contended hosts with --iters 1;
        # a negative derived step time is meaningless — report the whole-
        # image figure only.
        detail = "single-timing"
    images_per_sec_chip = b / t_full

    # vs_baseline: north star compares whole-image img/s to the r1 recorded
    # number; presets compare derived step time to their r1 BENCH.md row.
    if args.small:
        vs = 1.0
    elif args.preset is None:
        vs = images_per_sec_chip / R1_BASELINE_IMG_PER_S
    elif step_s and R1_STEP_MS.get(args.preset):
        vs = R1_STEP_MS[args.preset] / (step_s * 1e3)
    else:
        vs = 1.0

    variant = "-dev" if flux_cfg.guidance_embeds else "-schnell"
    print(json.dumps({
        "metric": f"FLUX.1{variant} {res[0]}x{res[1]} {impl} WHOLE-IMAGE "
                  f"images/sec/chip ({steps} steps + T5/CLIP encode + VAE "
                  f"decode, image {t_full:.2f} s, {detail}, batch {b})",
        "value": round(images_per_sec_chip, 5),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 4),
    }))
    return 0


def bench_serve(args, preset) -> int:
    """Serving throughput: N queued prompts through FluxServer's continuous
    batching vs the same prompts sequentially — the server's win is batching
    lanes at different denoise steps into shared forwards.

    ``--impl`` selects the transformer exec format (q8t / q4=nf4 / dense);
    every 4th request is an img2img lane (random init image, strength 0.6)
    so the row exercises the mixed t2i/i2i continuous-batching path
    (VERDICT r3 next #7). North-star serving row:
    ``python bench.py --mode serve --res 1024 --impl q8t``."""
    jax = _setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from diffusion_rs_tpu.models.clip import ClipTextConfig, init_clip_params
    from diffusion_rs_tpu.models.flux import FluxConfig, init_flux_params
    from diffusion_rs_tpu.models.t5 import T5Config, init_t5_params
    from diffusion_rs_tpu.models.vae import VAEConfig, init_vae_params
    from diffusion_rs_tpu.pipelines.api import DiffusionGenerationParams
    from diffusion_rs_tpu.pipelines.flux_pipeline import FluxPipeline
    from diffusion_rs_tpu.pipelines.scheduler import SchedulerConfig
    from diffusion_rs_tpu.serving import FluxServer
    from diffusion_rs_tpu.util.synthetic import (
        init_flux_params_quantized,
        init_t5_params_quantized,
    )

    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    if args.small:
        flux_cfg = FluxConfig(
            in_channels=64, pooled_projection_dim=64, joint_attention_dim=64,
            num_attention_heads=4, num_layers=2, num_single_layers=4,
            guidance_embeds=False, hidden_size=128, axes_dim=(8, 12, 12),
        )
        t5_cfg = T5Config(vocab_size=512, d_model=64, d_kv=16, d_ff=128,
                          num_layers=2, num_heads=4)
        clip_cfg = ClipTextConfig(vocab_size=512, projection_dim=64,
                                  intermediate_size=128, num_hidden_layers=2,
                                  num_attention_heads=4)
        vae_cfg = VAEConfig(block_out_channels=(32, 32), norm_num_groups=8,
                            latent_channels=16)
        res, steps, n_req = 128, 2, 6
        flux_params = init_flux_params(ks[0], flux_cfg, dtype)
        t5_params = init_t5_params(ks[1], t5_cfg, dtype)
    else:
        flux_cfg = FluxConfig(guidance_embeds=False)  # schnell-style serving
        t5_cfg, clip_cfg, vae_cfg = T5Config(), ClipTextConfig(), VAEConfig()
        res, steps, n_req = args.res, 4, 8
        if args.impl == "dense":
            flux_params = init_flux_params(ks[0], flux_cfg, dtype)
        else:
            kind = "q8t" if args.impl == "q8t" else "nf4"
            flux_params = init_flux_params_quantized(
                ks[0], flux_cfg, dtype, kind=kind)
        t5_params = init_t5_params_quantized(ks[1], t5_cfg, dtype)
    flux_params, flux_cfg = _maybe_rope_fused(flux_params, flux_cfg)
    clip_params = init_clip_params(ks[2], clip_cfg, dtype)
    vae_params = init_vae_params(ks[3], vae_cfg, dtype)
    pipe = FluxPipeline(
        flux_params=flux_params, flux_cfg=flux_cfg,
        t5_params=t5_params, t5_cfg=t5_cfg,
        clip_params=clip_params, clip_cfg=clip_cfg,
        vae_params=vae_params, vae_cfg=vae_cfg,
        scheduler=SchedulerConfig(use_dynamic_shifting=False),
        t5_tokenizer=_WordTokenizer(t5_cfg.vocab_size),
        clip_tokenizer=_WordTokenizer(clip_cfg.vocab_size),
        dtype=dtype, silent=True,
    )
    gp = DiffusionGenerationParams(
        height=res, width=res, num_steps=steps, guidance_scale=0.0, seed=1)

    if getattr(args, "serve_workload", "mixed") == "lru":
        # Prompt-LRU benefit row (VERDICT r4 next #6): the bursty-gallery
        # workload the cache targets — n_req requests over 2 unique prompts.
        # Baseline is the SAME server with the cache disabled, so the row
        # isolates the encode-skip win from the batching win.
        lru_prompts = [f"popular prompt {i % 2}" for i in range(n_req)]

        def run_lru(cache_size: int):
            server = FluxServer(
                pipe, max_batch=args.batch if args.batch > 1 else 4,
                encode_cache=cache_size)
            try:
                [f.result() for f in
                 [server.submit(p, gp) for p in lru_prompts]]  # warm
                h0 = server.stats()["encode_cache_hits"]
                t0 = time.perf_counter()
                [f.result() for f in
                 [server.submit(p, gp) for p in lru_prompts]]
                dt = time.perf_counter() - t0
                hits = server.stats()["encode_cache_hits"] - h0
            finally:
                server.shutdown()
            return dt, hits

        t_off, _ = run_lru(0)
        t_on, hits = run_lru(32)
        print(json.dumps({
            "metric": f"FLUX.1-schnell {res}x{res} {args.impl} serving with "
                      f"prompt-LRU ({n_req} requests over 2 unique prompts, "
                      f"{hits}/{n_req} encode hits; cache-off "
                      f"{n_req/t_off:.3f} img/s)",
            "value": round(n_req / t_on, 4),
            "unit": "images/sec/chip",
            "vs_baseline": round(t_off / t_on, 4),
        }))
        return 0

    prompts = [f"subject number {i}" for i in range(n_req)]
    # Mixed-lane workload: every 4th request is img2img (random init image,
    # strength 0.6 -> truncated per-lane schedule) so the bench exercises
    # t2i and i2i lanes continuous-batching together.
    init_img = np.asarray(
        jax.random.randint(jax.random.PRNGKey(7), (res, res, 3), 0, 256),
        np.uint8)
    is_i2i = [i % 4 == 3 for i in range(n_req)]

    def _seq_one(p, i2i):
        if i2i:
            pipe.forward_arrays([p], gp, init_image=init_img, strength=0.6)
        else:
            pipe.forward_arrays([p], gp)

    def _submit_one(p, i2i):
        if i2i:
            return server.submit(p, gp, init_image=init_img, strength=0.6)
        return server.submit(p, gp)

    # warm every sequential compile first, then time warm runs — otherwise
    # seq_s would include minutes of jit compilation and wildly overstate
    # the serving speedup
    _seq_one(prompts[0], False)
    if any(is_i2i):
        _seq_one(prompts[0], True)
    t0 = time.perf_counter()
    for p, i2i in zip(prompts, is_i2i):
        _seq_one(p, i2i)
    seq_s = time.perf_counter() - t0
    # encode_cache off: the warm pass reuses the timed pass's prompts, so
    # the cache would let the server skip encodes the sequential baseline
    # pays — the row must measure the BATCHING win only, not caching
    server = FluxServer(pipe, max_batch=args.batch if args.batch > 1 else 4,
                        encode_cache=0)
    try:
        # warm the batched-step graphs
        [f.result() for f in
         [_submit_one(p, i2i) for p, i2i in zip(prompts, is_i2i)]]
        t0 = time.perf_counter()
        futs = [_submit_one(p, i2i) for p, i2i in zip(prompts, is_i2i)]
        [f.result() for f in futs]
        srv_s = time.perf_counter() - t0
        occ = server.stats()["occupancy"]
    finally:
        server.shutdown()
    n_i2i = sum(is_i2i)
    print(json.dumps({
        "metric": f"FLUX.1-schnell {res}x{res} {args.impl} serving throughput "
                  f"({n_req} requests, {n_i2i} img2img lanes, {steps} steps, "
                  f"max_batch {server.max_batch}, occupancy {occ:.0%}; "
                  f"sequential {n_req/seq_s:.3f} img/s)",
        "value": round(n_req / srv_s, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(seq_s / srv_s, 4),
    }))
    return 0


def bench_step(args, preset) -> int:
    """Round-1 metric: transformer denoise step only (synthetic weights)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    from diffusion_rs_tpu.models.flux import (
        FluxConfig,
        compute_pe,
        flux_forward,
        init_flux_params,
    )
    from diffusion_rs_tpu.pipelines.sampling import make_img_ids, make_txt_ids
    from diffusion_rs_tpu.util.synthetic import init_flux_params_quantized

    if args.small:
        cfg = FluxConfig(
            in_channels=64, pooled_projection_dim=64, joint_attention_dim=64,
            num_attention_heads=4, num_layers=2, num_single_layers=4,
            guidance_embeds=True, hidden_size=128, axes_dim=(8, 12, 12),
        )
        res, txt_len = (256, 256), 64
    else:
        guidance = preset["guidance"] if preset else True
        cfg = FluxConfig(guidance_embeds=guidance)  # FLUX.1 dims
        res = preset["res"] if preset else args.res
        txt_len = preset["txt"] if preset else 512
    if isinstance(res, int):
        res = (res, res)

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    stream_weights = args.preset == "dev-1024-bf16"
    if stream_weights:
        args.impl = "bf16-streamed"
        # 24GB bf16 > single-chip HBM: host-resident weights, per-block
        # streaming. One random block tree is reused for every layer (same
        # bytes transferred/computed; skips 24GB of host RNG).
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            one = init_flux_params(key, FluxConfig(
                guidance_embeds=cfg.guidance_embeds,
                num_layers=1, num_single_layers=1,
            ), dtype)
        params = None
        stream_parts = one
    elif args.impl in ("q4", "q8t") and not args.small:
        params = init_flux_params_quantized(
            key, cfg, dtype, kind="q8t" if args.impl == "q8t" else "nf4"
        )
    else:
        params = init_flux_params(key, cfg, dtype)
    import os

    fuse_env = os.environ.get("DIFFUSION_RS_TPU_FUSE", "")
    if params is not None and fuse_env and fuse_env != "0":
        import dataclasses as _dc

        from diffusion_rs_tpu.models.optimize import fuse_flux_qkv

        streams = (
            ("img", "txt", "single") if fuse_env in ("1", "all")
            else tuple(s.strip() for s in fuse_env.split(",") if s.strip())
        )
        if "grouped" in streams:
            streams = tuple(dict.fromkeys(streams + ("img", "txt")))
            cfg = _dc.replace(cfg, grouped_qmm=True)
        params = fuse_flux_qkv(params, streams)
    if params is not None:
        params, cfg = _maybe_rope_fused(params, cfg)
    elif stream_weights:
        stream_parts, cfg = _maybe_rope_fused(stream_parts, cfg)

    b = preset["batch"] if preset else args.batch
    h2, w2 = (res[0] + 15) // 16, (res[1] + 15) // 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    img = jax.random.normal(ks[0], (b, h2 * w2, cfg.in_channels), dtype)
    txt = jax.random.normal(ks[1], (b, txt_len, cfg.joint_attention_dim), dtype)
    y = jax.random.normal(ks[2], (b, cfg.pooled_projection_dim), dtype)
    pe = compute_pe(cfg, make_txt_ids(b, txt_len), make_img_ids(b, h2, w2))
    t = jnp.full((b,), 0.7, jnp.float32)
    guidance = jnp.full((b,), 3.5, jnp.float32)

    if stream_weights:
        from diffusion_rs_tpu.models.flux_streaming import StreamedFlux

        import numpy as _np
        import ml_dtypes as _mld

        one = stream_parts
        host_rng = _np.random.default_rng(0)
        # One shared random pool; every leaf is a view at a random offset.
        # Distinct buffers + distinct bytes per layer (so nothing can be
        # deduped/cached), ~zero RNG cost. Bit pattern keeps bf16 tiny
        # (~1e-9) so 57 layers don't overflow; timing is value-independent.
        pool_elems = 80_000_000
        pool = host_rng.integers(0, 1 << 16, size=pool_elems, dtype=_np.uint16)
        pool = (pool & _np.uint16(0x07FF)) | _np.uint16(0x3000)
        pool = pool.view(_mld.bfloat16)

        def rand_like(a):
            n = int(_np.prod(a.shape[1:])) if a.ndim > 1 else a.size
            off = int(host_rng.integers(0, pool_elems - n))
            return pool[off : off + n].reshape(a.shape[1:])

        def host_block(tree):
            return jax.tree.map(rand_like, tree)

        dbls = [host_block(one["double"]) for _ in range(cfg.num_layers)]
        sgls = [host_block(one["single"]) for _ in range(cfg.num_single_layers)]
        pre = {
            k: one[k]
            for k in ("img_in", "txt_in", "time_in", "vector_in", "guidance_in")
            if k in one
        }
        sf = StreamedFlux.from_block_trees(
            pre, one["final"], dbls, sgls, cfg,
        )
        img = img.astype(jnp.float32)

        def step(_params, img):
            return sf.step(img, txt, 0.7, 0.7 - 1.0 / 28.0, y, guidance, pe)
    else:
        @jax.jit
        def step(params, img):
            pred = flux_forward(params, cfg, img, txt, t, y, guidance, pe=pe)
            return img + pred * (-1.0 / 28.0)

    # compile + warmup
    try:
        img = step(params, img)
        img.block_until_ready()
    except Exception as e:
        if "RESOURCE_EXHAUSTED" in str(e) or "ResourceExhausted" in str(e):
            # e.g. dev-1024-bf16: 24GB of bf16 weights need a v5e-8 mesh or
            # host offload — out of scope for a single-chip bench run.
            print(json.dumps({
                "metric": f"FLUX.1 {res[0]}x{res[1]} {args.impl}: exceeds single-chip HBM (needs mesh/offload)",
                "value": 0.0,
                "unit": "images/sec/chip",
                "vs_baseline": 0.0,
            }))
            return 0
        raise
    from diffusion_rs_tpu.util.tracing import maybe_profile

    times = []
    # DIFFUSION_RS_TPU_TRACE_DIR=... captures a jax.profiler trace of the
    # timed steps (summarize with tools/profile_summary.py).
    with maybe_profile("denoise-step"):
        for _ in range(args.steps):
            t0 = time.perf_counter()
            img = step(params, img)
            img.block_until_ready()
            times.append(time.perf_counter() - t0)
    p50 = statistics.median(times)
    images_per_sec_chip = b / (28.0 * p50)
    r1 = R1_STEP_MS.get(args.preset)
    vs = (r1 / (p50 * 1e3)) if (r1 and not args.small) else 1.0

    overlap = ""
    if stream_weights:
        # Streaming overlap-efficiency report (VERDICT r2 next #9): measured
        # H2D bandwidth, compute-only step, and predicted/actual ratio —
        # labeled with THIS env's interconnect so a real-PCIe run is
        # directly comparable (ROADMAP streaming item).
        rep = sf.overlap_report(img, txt, y, guidance, pe, iters=2)
        overlap = (
            f"; stream overlap: h2d {rep['h2d_gbps']} GiB/s "
            f"({rep['bytes_per_step_gb']} GB/step -> {rep['h2d_s']} s), "
            f"compute {rep['compute_s']} s, streamed {rep['stream_s']} s, "
            f"overlap_efficiency {rep['overlap_efficiency']}"
        )

    print(
        json.dumps({
            "metric": f"FLUX.1{'-dev' if cfg.guidance_embeds else '-schnell'} "
            f"{res[0]}x{res[1]} {'dense-small' if args.small else args.impl} "
            "images/sec/chip "
            f"(transformer step only; 28 steps, p50 step {p50*1e3:.1f} ms, batch {b}{overlap})",
            "value": round(images_per_sec_chip, 5),
            "unit": "images/sec/chip",
            "vs_baseline": round(vs, 4),
        })
    )
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["image", "step", "serve"], default="image",
                    help="image = whole pipeline (encode+denoise+decode); "
                         "step = transformer denoise step only; "
                         "serve = continuous-batching throughput vs sequential")
    ap.add_argument("--small", action="store_true", help="CPU-sized smoke config")
    ap.add_argument("--steps", type=int, default=8, help="timed denoise steps (step mode)")
    ap.add_argument("--steps-image", type=int, default=None,
                    help="denoise steps per image (image mode; default preset)")
    ap.add_argument("--iters", type=int, default=3, help="timed images (image mode)")
    # Default exec format: the preset's recorded impl, else q8t for the
    # north-star run — the q4 checkpoint requantized to the TPU-native
    # s8xs8 int8 format at load (`--isq q8t`; reference analogue
    # mul_mat_vec_via_q8_1, quantized/cuda.rs:227). Measured 1.40x the
    # nf4 exec step (BENCH.md r3). Passing --impl explicitly overrides
    # the preset (e.g. `--preset dev-2048 --impl q8t`).
    ap.add_argument("--impl", choices=["q4", "q8t", "dense"], default=None)
    # T5 encode exec format (VERDICT r4 next #5 A/B). Default q4 (nf4):
    # T5-q8t (~4.8 GB) does NOT fit beside FLUX-q8t (~12.1 GB) on a 16 GiB
    # chip — the library's isq_t5 capacity guard makes the same call — so
    # the A/B config is FLUX-nf4 + T5-q8t (fits at ~10.8 GB).
    ap.add_argument("--t5-impl", choices=["q4", "q8t"], default="q4")
    ap.add_argument("--serve-workload", choices=["mixed", "lru"],
                    default="mixed",
                    help="serve mode: mixed t2i/i2i lanes (default) or the "
                         "repeated-prompt LRU-cache benefit row")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--preset", choices=list(PRESETS), default=None,
                    help="BASELINE.md target configs 1-5")
    ap.add_argument("--mesh", default=None,
                    help="axis sizes, e.g. 'tp=4' or 'dp=2,sp=2,tp=2' — "
                         "shards the pipeline over a device mesh (image "
                         "mode; the dev-2048 q8t config needs tp to fit)")
    args = ap.parse_args()
    preset = PRESETS.get(args.preset)
    if args.impl is None:
        args.impl = preset["impl"] if preset else "q8t"

    if args.mode == "serve":
        return bench_serve(args, preset)
    # the bf16 streamed config only has a step-mode harness
    if args.mode == "step" or args.preset == "dev-1024-bf16":
        return bench_step(args, preset)
    return bench_image(args, preset)


if __name__ == "__main__":
    sys.exit(main())
