"""Pipeline loading: model_index.json dispatch -> component assembly.

Behavioral reference: diffusion_rs_core/src/pipelines/mod.rs Pipeline::load
(:120-239) — FileLoader from the source, model_index.json `_class_name`
dispatch ("FluxPipeline"), per-component classification, device/dtype
resolution, then FluxLoader::load_from_components
(pipelines/flux/mod.rs:45-189) wiring scheduler, two text encoders, two
tokenizers, transformer and VAE.

TPU notes: `ModelDType.Auto` resolves to bf16 (the auto-dtype matmul probe of
util/auto_dtype.rs is unnecessary — every TPU generation supports bf16);
`transformer_model_id` overrides where the FLUX weights come from (the
reference's ModelIdWithTransformer, model_source.rs:65-73).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..io.builders import (
    build_clip_params,
    build_flux_params,
    build_t5_params,
    build_vae_params,
)
from ..io.source import FileLoader
from ..io.tokenizer import (
    load_clip_bpe_tokenizer,
    load_t5_tokenizer_from_bytes,
)
from ..io.varstore import VarStore
from ..models.clip import ClipTextConfig
from ..models.flux import FluxConfig
from ..models.t5 import T5Config
from ..models.vae import VAEConfig
from .api import ModelDType, ModelSource, Offloading
from .flux_pipeline import FluxPipeline
from .scheduler import SchedulerConfig

log = logging.getLogger("diffusion_rs_tpu")


# Measured per-stream fusion default (BENCH.md r5 A/B, dev 1024² q8t b1):
# EMPTY by measurement — every fusion/grouping variant lost e2e (txt 427.8,
# txt+single 455.9, grouped 447.6, grouped+single 484.8 vs 422.7 ms
# unfused) despite winning at the kernel level: XLA pipelines the separate
# projections in-graph, while fused outputs pay real split copies and the
# grouped call pays in-scan weight stacking. DIFFUSION_RS_TPU_FUSE /
# Pipeline(fuse=...) keep the exact, tested variants available for parts
# where the balance differs.
_FUSE_MEASURED_DEFAULT: tuple = ()
_FUSE_ALL = ("img", "txt", "single", "t5")


def _resolve_fuse(fuse) -> tuple:
    """Resolve the fuse selection ONCE at construction (the param-tree
    layout is traced into every jit graph). None -> env var -> measured
    default; True/'1'/'all' -> every stream; str -> comma list."""
    if fuse is None:
        env = os.environ.get("DIFFUSION_RS_TPU_FUSE", "")
        if env == "":
            return _FUSE_MEASURED_DEFAULT
        fuse = env
    if fuse in (False, "0", ""):
        return ()
    if fuse in (True, "1", "all"):
        return _FUSE_ALL
    if isinstance(fuse, str):
        return tuple(s.strip() for s in fuse.split(",") if s.strip())
    return tuple(fuse)


def _resolve_dtype(dtype: ModelDType):
    if dtype == ModelDType.Auto:
        from ..util.dtype import resolve_auto_dtype

        return resolve_auto_dtype()
    if dtype == ModelDType.BF16:
        return jnp.bfloat16
    if dtype == ModelDType.F16:
        return jnp.float16
    return jnp.float32


def _component_store(
    loader: FileLoader, prefix: str, dtype, silent: bool = False
) -> VarStore:
    """Collect a component's weights: safetensors and/or GGUF files (the
    reference's GGUF machinery is unreachable from its model factory —
    SURVEY §2.3; here *.gguf under a component dir loads first-class, with
    k-quant tensors staying quantized end-to-end)."""
    from ..util.progress import progress

    store = VarStore(default_dtype=dtype)
    files = [
        n for n in loader.list_files()
        if n.startswith(prefix + "/") and n.endswith((".safetensors", ".gguf"))
    ]
    if not files:
        raise FileNotFoundError(f"no safetensors/gguf under {prefix}/")
    for name in progress(files, desc=f"load {prefix}", silent=silent):
        if name.endswith(".safetensors"):
            store.add_safetensors(loader.safetensors(name))
        else:
            from ..io.gguf import GgufFile

            if loader._root is None:
                raise ValueError("GGUF components require a directory source")
            store.add_gguf(GgufFile(str(loader._root / name)))
    return store


def load_pipeline(
    source: ModelSource,
    silent: bool = False,
    token: Optional[str] = None,
    revision: Optional[str] = None,
    offloading: Optional[Offloading] = None,
    dtype: ModelDType = ModelDType.Auto,
    isq: Optional[str] = None,
    isq_t5: Optional[str] = None,
    fuse=None,
    imatrix: Optional[str] = None,
    lora: Union[str, Sequence[str], None] = None,
    lora_scale: Union[float, Sequence[float]] = 1.0,
    mesh=None,
    t5_mask_pads: Optional[bool] = None,
    step_progress: Optional[bool] = None,
    compile_cache: Optional[str] = None,
) -> FluxPipeline:
    from ..util.compile_cache import enable_compile_cache

    # before any jit: the persistent cache only serves compilations that
    # happen after it is configured
    enable_compile_cache(compile_cache)
    loader = FileLoader(
        model_id=source.model_id,
        dduf_file=source.dduf_file,
        token=token,
        revision=revision,
        silent=silent,
    )
    index = json.loads(loader.read_bytes("model_index.json"))
    class_name = index.get("_class_name")
    if class_name != "FluxPipeline":
        raise ValueError(f"unsupported pipeline class {class_name!r}")
    dt = _resolve_dtype(dtype)

    if not silent:
        log.info("loading FluxPipeline (dtype=%s)", jnp.dtype(dt).name)

    # Offloading::Full keeps weights in host RAM (pipelines/mod.rs:72-78);
    # build all param trees on the CPU backend so device residency is
    # managed per-component by HostOffload around each pipeline stage.
    import contextlib

    offload = None
    build_ctx = contextlib.nullcontext()
    if offloading in (Offloading.Full, Offloading.Stream):
        from ..parallel.offload import HostOffload

        if offloading is Offloading.Full:
            offload = HostOffload()
        cpus = jax.devices("cpu")
        if cpus:
            build_ctx = jax.default_device(cpus[0])

    scheduler = SchedulerConfig.from_json(
        json.loads(loader.read_bytes("scheduler/scheduler_config.json"))
    )
    clip_tokenizer = load_clip_bpe_tokenizer(
        loader.read_bytes("tokenizer/vocab.json"),
        loader.read_bytes("tokenizer/merges.txt"),
    )
    t5_tokenizer = load_t5_tokenizer_from_bytes(
        loader.read_bytes("tokenizer_2/tokenizer.json")
    )

    clip_cfg = ClipTextConfig.from_json(
        json.loads(loader.read_bytes("text_encoder/config.json"))
    )
    with build_ctx:
        clip_params = build_clip_params(
            _component_store(loader, "text_encoder", dt, silent), clip_cfg, dt
        )
    if not silent:
        log.info("loaded CLIP text encoder (%d layers)", clip_cfg.num_hidden_layers)

    t5_cfg = T5Config.from_json(
        json.loads(loader.read_bytes("text_encoder_2/config.json"))
    )
    with build_ctx:
        t5_params = build_t5_params(
            _component_store(loader, "text_encoder_2", dt, silent), t5_cfg, dt
        )
    if not silent:
        log.info("loaded T5 encoder (%d layers, d_model %d)", t5_cfg.num_layers, t5_cfg.d_model)

    vae_cfg = VAEConfig.from_json(json.loads(loader.read_bytes("vae/config.json")))
    with build_ctx:
        vae_params = build_vae_params(_component_store(loader, "vae", dt, silent), vae_cfg, dt)
    if not silent:
        log.info("loaded VAE (%s)", list(vae_cfg.block_out_channels))

    # Transformer, possibly from an override repo (quantized DDUF/model id).
    flux_loader = loader
    flux_store = None
    flux_cfg = None
    if source.transformer_model_id:
        override = source.transformer_model_id
        if override.endswith(".gguf") and os.path.isfile(override):
            # single-file GGUF transformer (city96-style, BFL tensor names):
            # no config.json — derive the config from the tensor keys/shapes.
            from ..io.builders import flux_config_from_bfl, is_bfl_naming
            from ..io.gguf import GgufFile

            flux_store = VarStore(default_dtype=dt)
            flux_store.add_gguf(GgufFile(override))
            if is_bfl_naming(flux_store):
                # base config (axes_dim etc.) from the base repo when present
                base_cfg = None
                if loader.exists("transformer/config.json"):
                    base_cfg = FluxConfig.from_json(
                        json.loads(loader.read_bytes("transformer/config.json"))
                    )
                flux_cfg = flux_config_from_bfl(flux_store, base=base_cfg)
            else:
                # diffusers-named GGUF: take the config from the base repo
                flux_cfg = FluxConfig.from_json(
                    json.loads(loader.read_bytes("transformer/config.json"))
                )
            if not silent:
                log.info("transformer from single-file GGUF %s", override)
        else:
            flux_loader = FileLoader(
                model_id=override, token=token, revision=revision, silent=silent,
            )
    if flux_cfg is None:
        flux_cfg = FluxConfig.from_json(
            json.loads(flux_loader.read_bytes("transformer/config.json"))
        )
    with build_ctx:
        flux_params = build_flux_params(
            flux_store
            if flux_store is not None
            else _component_store(flux_loader, "transformer", dt, silent),
            flux_cfg, dt,
        )
        if isq:
            from ..quant.isq import isq_tree

            imat = None
            if imatrix:
                from ..io.imatrix import load_imatrix

                imat = load_imatrix(imatrix)
            flux_params = isq_tree(flux_params, isq, imatrix=imat)
            # The reference's quantized checkpoints quantize T5 throughout
            # (models/t5/mod.rs — every linear is Arc<dyn QuantMethod>), so
            # ISQ covers it too: a dense bf16 T5-XXL (~9.5 GB) would
            # otherwise cancel the HBM savings the q4 capacity configs
            # depend on. CLIP stays dense (123M params; pooled conditioning
            # is small and quality-sensitive).
            #
            # Per-component format choice is the LIBRARY's job (the same
            # stance as the q8t exec auto-dispatch, reference analogue
            # diffusion_rs_backend/src/lib.rs:197-217): ``isq_t5`` defaults
            # to following ``isq``, EXCEPT when the combined resident
            # footprint would blow per-chip HBM — e.g. FLUX-q8t (~12.1 GB)
            # + T5-XXL-q8t (~4.8 GB) exceeds a 16 GiB v5e, while T5-nf4
            # (~2.4 GB) fits beside it. In that case T5 keeps the SMALLER
            # of (its current format, the requested target), with a
            # warning naming the override knob. Offloaded/streamed builds
            # skip the guard: encoder weights are not chip-resident there.
            t5_target = isq_t5 if isq_t5 is not None else isq
            if isq_t5 is None and offloading is None:
                from ..util.capacity import (
                    estimate_isq_tree_bytes,
                    per_chip_hbm_bytes,
                    tree_device_bytes,
                )
                from ..util.tracing import warn_once

                tp = mesh.shape.get("tp", 1) if mesh is not None else 1
                budget = int(0.92 * per_chip_hbm_bytes())  # 8% headroom
                flux_b = tree_device_bytes(flux_params) // max(1, tp)
                t5_now = tree_device_bytes(t5_params) // max(1, tp)
                t5_isq = estimate_isq_tree_bytes(t5_params, isq) // max(1, tp)
                if flux_b + t5_isq > budget and t5_now < t5_isq:
                    warn_once(
                        "isq-t5-capacity",
                        f"isq='{isq}' would put T5 at ~{t5_isq / 1e9:.1f} GB "
                        f"beside {flux_b / 1e9:.1f} GB transformer weights — "
                        f"over the {budget / 1e9:.1f} GB per-chip budget; "
                        "keeping T5 in its current (smaller) format. Pass "
                        "isq_t5= to force, or shard with a tp mesh.",
                    )
                    t5_target = None
            if t5_target:
                t5_params = isq_tree(t5_params, t5_target, imatrix=imat)
            if not silent:
                log.info(
                    "applied ISQ (%s%s) to transformer%s linears "
                    "(pre-quantized weights are requantized via host "
                    "dequantize when their format differs)", isq,
                    ", imatrix-weighted" if imat else "",
                    f" + T5 ({t5_target})" if t5_target else " (T5 kept)",
                )
        if lora:
            # after ISQ: quantized bases get the runtime low-rank term, so
            # LoRA quality does not pass through the quantizer. A list of
            # files applies in order (dense deltas sum; quantized runtime
            # terms stack by rank concatenation).
            from ..io.lora import apply_flux_lora

            loras = [lora] if isinstance(lora, str) else list(lora)
            scales = (
                [lora_scale] * len(loras)
                if isinstance(lora_scale, (int, float)) else list(lora_scale)
            )
            if len(scales) != len(loras):
                raise ValueError(
                    f"{len(loras)} LoRA files but {len(scales)} scales"
                )
            for lf, sc in zip(loras, scales):
                flux_params = apply_flux_lora(
                    flux_params, flux_cfg, lf, scale=sc, dtype=dt
                )
                if not silent:
                    log.info("applied LoRA %s (scale %.2f)", lf, sc)
        # qkv fusion is per-stream (DIFFUSION_RS_TPU_FUSE = "1"/"all", or a
        # comma list of img,txt,single). img/single fusion measured slower
        # e2e on v5e (XLA pipelines the separate wide projections; BENCH.md
        # r3/r4) and stays opt-in; the double blocks' TXT stream runs at
        # M = 512·batch where per-call work is the kernel's limiter
        # (kernel_bench r5), so "txt" is the measured-win subset.
        streams = _resolve_fuse(fuse)
        if "grouped" in streams:
            # grouped img+txt double-block calls need both streams' qkv
            # fused, and have no GSPMD partitioning rule yet — single-chip
            # (and offload/streaming) path only.
            if mesh is not None:
                from ..util.tracing import warn_once

                warn_once(
                    "grouped-mesh",
                    "fuse='grouped' has no mesh partitioning rule; "
                    "running the per-stream calls instead",
                )
                streams = tuple(s for s in streams if s != "grouped")
            else:
                streams = tuple(dict.fromkeys(streams + ("img", "txt")))
        if streams:
            from ..models.optimize import fuse_flux_qkv, fuse_t5

            try:
                flux_params = fuse_flux_qkv(flux_params, streams)
            except ValueError as e:
                if not silent:
                    log.info("qkv fusion skipped: %s", e)
            if "t5" in streams:
                try:
                    t5_params = fuse_t5(t5_params)
                except ValueError as e:
                    if not silent:
                        log.info("t5 fusion skipped: %s", e)
            if "grouped" in streams:
                import dataclasses as _dc

                flux_cfg = _dc.replace(flux_cfg, grouped_qmm=True)
        # RoPE half-split re-layout (AFTER isq/lora/fuse — it permutes the
        # final q/k columns): enables the fused-RoPE / seq-major flash
        # kernels (SURVEY §7.4; flash_pallas). Mathematically exact
        # (attention is invariant to a shared q/k head-dim permutation).
        # OPT-IN (DIFFUSION_RS_TPU_FUSED_ROPE=1): measured on v5e, every
        # variant (half-split XLA rope 625.5 ms, in-kernel rotation 628.7,
        # seq-major 631.9) loses to the interleaved baseline (615.4 ms
        # north-star step, run noise ±0.2 ms) — XLA already fuses the rope
        # and head transposes into producers, and the step is 86.6% Pallas
        # custom-call time (BENCH.md r3). Kept for other topologies.
        if os.environ.get("DIFFUSION_RS_TPU_FUSED_ROPE", "0") == "1":
            import dataclasses as _dc

            from ..models.optimize import rope_halfsplit_permute

            try:
                flux_params = rope_halfsplit_permute(flux_params, flux_cfg)
                flux_cfg = _dc.replace(flux_cfg, rope_fused=True)
            except (ValueError, KeyError, TypeError) as e:
                if not silent:
                    log.info("rope half-split re-layout skipped: %s", e)
    if not silent:
        log.info(
            "loaded FLUX transformer (%d double + %d single blocks, guidance=%s)",
            flux_cfg.num_layers, flux_cfg.num_single_layers, flux_cfg.guidance_embeds,
        )

    streamed = None
    if offloading is Offloading.Stream:
        from ..models.flux_streaming import StreamedFlux

        streamed = StreamedFlux(flux_params, flux_cfg)
        flux_params = None  # host copies live inside StreamedFlux
        if not silent:
            log.info("transformer weights host-resident (per-block streaming)")

    if mesh is not None:
        if streamed is not None:
            raise ValueError("mesh and Offloading.Stream are mutually exclusive")
        from ..parallel import replicate_params, shard_params

        # FLUX + T5 get tensor-parallel shards; CLIP/VAE are small -> replicate.
        flux_params = shard_params(flux_params, mesh)
        t5_params = shard_params(t5_params, mesh)
        clip_params = replicate_params(clip_params, mesh)
        vae_params = replicate_params(vae_params, mesh)
        if not silent:
            log.info("sharded over mesh %s", dict(mesh.shape))

    return FluxPipeline(
        mesh=mesh,
        streamed=streamed,
        flux_params=flux_params,
        flux_cfg=flux_cfg,
        t5_params=t5_params,
        t5_cfg=t5_cfg,
        clip_params=clip_params,
        clip_cfg=clip_cfg,
        vae_params=vae_params,
        vae_cfg=vae_cfg,
        scheduler=scheduler,
        t5_tokenizer=t5_tokenizer,
        clip_tokenizer=clip_tokenizer,
        dtype=dt,
        offload=offload,
        silent=silent,
        t5_mask_pads=t5_mask_pads,
        step_progress=step_progress,
    )
