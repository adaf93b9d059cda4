"""Public API surface, mirroring the reference's Python bindings.

Reference: diffusion_rs_py/src/lib.rs:24-155 — ``Pipeline(source, silent,
token, revision, offloading, dtype)`` and ``forward(prompts, params) ->
list[bytes]`` (PNG-encoded images), with ``ModelSource.ModelId / DdufFile``
and ``DiffusionGenerationParams {height, width, num_steps, guidance_scale}``.
"""

from __future__ import annotations

import enum
import io as _io
from dataclasses import dataclass
from typing import Optional, Sequence, Union


class Offloading(enum.Enum):
    """Memory-capacity scaling mode (pipelines/mod.rs:72-78).

    ``Full`` mirrors the reference: whole components swap between host and
    device around their use. ``Stream`` is the TPU-native extension: the
    transformer's weights stay in host RAM and each block is DMA'd one block
    ahead of compute (double-buffered), so models larger than one chip's HBM
    (e.g. FLUX bf16, 24 GB) still run single-chip
    (models/flux_streaming.py).
    """

    Full = "full"
    Stream = "stream"


class ModelDType(enum.Enum):
    """util/auto_dtype.rs:12-24. ``Auto`` resolves to bf16 on TPU."""

    Auto = "auto"
    BF16 = "bf16"
    F16 = "f16"
    F32 = "f32"


@dataclass(frozen=True)
class ModelSource:
    """Where model files come from (model_source.rs:18-85)."""

    model_id: Optional[str] = None  # HF hub id or local directory
    transformer_model_id: Optional[str] = None  # quantized transformer override
    dduf_file: Optional[str] = None  # path to a .dduf zip

    @staticmethod
    def from_model_id(model_id: str, transformer_model_id: str | None = None) -> "ModelSource":
        return ModelSource(model_id=model_id, transformer_model_id=transformer_model_id)

    @staticmethod
    def dduf(path: str) -> "ModelSource":
        return ModelSource(dduf_file=path)


@dataclass
class DiffusionGenerationParams:
    """pipelines/mod.rs DiffusionGenerationParams (defaults match py/src/lib.rs:49-58)."""

    height: int = 720
    width: int = 1280
    num_steps: int = 50
    guidance_scale: float = 3.5
    seed: Optional[int] = None  # reference noise is unseeded (flux/sampling.rs:13);
    #                             we expose an explicit PRNG seed instead.
    max_sequence_length: Optional[int] = None  # T5 context pad length; default
    #                             is the variant's (512 dev / 256 schnell —
    #                             flux/mod.rs:243-253 keys this on the model,
    #                             we additionally honor an explicit override
    #                             like upstream diffusers' max_sequence_length)


class Pipeline:
    """Load a diffusion pipeline and generate images.

    ``forward`` returns a list of PNG-encoded ``bytes`` per prompt, exactly
    like the reference pyo3 binding (py/src/lib.rs:126-155). Use
    ``forward_images`` for PIL images.
    """

    def __init__(
        self,
        source: ModelSource,
        silent: bool = False,
        token: Optional[str] = None,
        revision: Optional[str] = None,
        offloading: Optional[Offloading] = None,
        dtype: ModelDType = ModelDType.Auto,
        isq: Optional[str] = None,
        isq_t5: Optional[str] = None,
        imatrix: Optional[str] = None,
        lora: Union[str, Sequence[str], None] = None,
        lora_scale: Union[float, Sequence[float]] = 1.0,
        mesh=None,
        t5_mask_pads: Optional[bool] = None,
        step_progress: Optional[bool] = None,
        compile_cache: Optional[str] = None,
        fuse: Union[bool, str, Sequence[str], None] = None,
    ):
        """``isq``: in-situ-quantize dense transformer linears at load
        ("q4_0" | "q8_0" | "q4_k" | "q6_k" | "nf4") — IsqType equivalent
        (diffusion_rs_backend/src/lib.rs:88-149). ``imatrix``: path to a
        llama.cpp-format importance-matrix file; with ``isq`` set, matched
        linears get importance-weighted (error-minimizing) quantization
        (quantize_imatrix equivalent, quantized/mod.rs:110).

        ``isq_t5``: per-component override for the T5 encoder's format.
        Default (None) follows ``isq`` with a capacity guard: if the
        combined resident footprint would exceed per-chip HBM (e.g.
        FLUX-q8t + T5-XXL-q8t on a 16 GiB v5e), T5 keeps its smaller
        current format and a warning names this knob. Pass a format to
        force it (e.g. isq_t5="q8t").

        ``lora``: path to a FLUX LoRA safetensors file (diffusers-PEFT,
        kohya-suffix, or sd-scripts BFL naming), or a LIST of paths applied
        in order; dense linears get the delta fused, quantized linears get
        a runtime low-rank term. ``lora_scale`` multiplies the trained
        alpha/r (scalar, or one per file).

        ``mesh``: a jax.sharding.Mesh (see parallel.make_mesh) — weights are
        placed tensor-parallel over its "tp" axis, prompts are batched
        data-parallel over "dp", and packed image tokens shard over "sp"
        (sequence parallelism — joint attention runs the ring kernel so the
        16k-token 2048² sequence never materializes on one chip). The
        reference is single-device (SURVEY.md §2.8); this is the TPU
        scale-out path.

        ``t5_mask_pads`` / ``step_progress``: behavior toggles resolved ONCE
        at construction (``DIFFUSION_RS_TPU_T5_MASK_PADS`` /
        ``DIFFUSION_RS_TPU_PROGRESS`` env vars are the defaults). They are
        frozen because jit traces them as constants — toggling env after
        construction would silently keep the cached graph; the pipeline
        exposes them read-only instead.

        ``compile_cache``: directory for JAX's persistent XLA compilation
        cache (``DIFFUSION_RS_TPU_COMPILE_CACHE`` env var is the default) —
        a restarted serving process or the next CLI run reuses compiled
        stage artifacts instead of paying the 20-40 s/stage cold compile
        (util/compile_cache.py).

        ``fuse``: which shared-input projection groups to fuse into one
        wide quantized matmul each — any subset of
        ``("img", "txt", "single", "t5")`` (list or comma string), or
        True/"all". None follows ``DIFFUSION_RS_TPU_FUSE``, else the
        measured per-stream default (loader._FUSE_MEASURED_DEFAULT).
        Exact layout transform: outputs are bit-identical. Resolved once
        at construction (jit traces the param-tree layout)."""
        from .loader import load_pipeline  # deferred: heavy imports

        self._inner = load_pipeline(
            source,
            silent=silent,
            token=token,
            revision=revision,
            offloading=offloading,
            dtype=dtype,
            isq=isq,
            isq_t5=isq_t5,
            imatrix=imatrix,
            lora=lora,
            lora_scale=lora_scale,
            mesh=mesh,
            t5_mask_pads=t5_mask_pads,
            step_progress=step_progress,
            compile_cache=compile_cache,
            fuse=fuse,
        )

    def forward(
        self, prompts: Sequence[str], params: DiffusionGenerationParams
    ) -> list[bytes]:
        images = self._inner.forward(list(prompts), params)
        out = []
        for img in images:
            buf = _io.BytesIO()
            img.save(buf, format="PNG")
            out.append(buf.getvalue())
        return out

    def forward_images(self, prompts: Sequence[str], params: DiffusionGenerationParams):
        return self._inner.forward(list(prompts), params)

    def forward_latents(
        self, prompts: Sequence[str], params: DiffusionGenerationParams
    ):
        """Post-denoise packed latents [B, S, 64] as f32 (no VAE decode) —
        diffusers' ``output_type="latent"``. The mid-pipeline observation
        point: u8 image bands hide small numeric regressions that are
        visible at f32 here."""
        return self._inner.forward_arrays(
            list(prompts), params, output_type="latent"
        )

    def img2img(
        self,
        prompts: Sequence[str],
        params: DiffusionGenerationParams,
        image,
        strength: float = 0.6,
    ) -> list[bytes]:
        """Image-to-image: start the flow-match schedule from a VAE-encoded
        init image (PIL / u8 array, or a list of them — one per prompt)
        instead of pure noise; ``strength`` in (0, 1] is the fraction of the
        schedule run (1.0 degenerates to text-to-image). Returns PNG bytes.
        The reference has no img2img path; semantics follow upstream
        diffusers' FluxImg2ImgPipeline."""
        images = self._inner.img2img(list(prompts), params, image, strength)
        out = []
        for img in images:
            buf = _io.BytesIO()
            img.save(buf, format="PNG")
            out.append(buf.getvalue())
        return out

    def img2img_images(
        self,
        prompts: Sequence[str],
        params: DiffusionGenerationParams,
        image,
        strength: float = 0.6,
    ):
        return self._inner.img2img(list(prompts), params, image, strength)

    def inpaint(
        self,
        prompts: Sequence[str],
        params: DiffusionGenerationParams,
        image,
        mask,
        strength: float = 1.0,
    ) -> list[bytes]:
        """Repaint the white region of ``mask`` guided by the prompt;
        unmasked pixels are pinned to the init image (renoised per step —
        diffusers FluxInpaintPipeline construction). Returns PNG bytes."""
        images = self._inner.inpaint(list(prompts), params, image, mask, strength)
        out = []
        for img in images:
            buf = _io.BytesIO()
            img.save(buf, format="PNG")
            out.append(buf.getvalue())
        return out

    def inpaint_images(
        self,
        prompts: Sequence[str],
        params: DiffusionGenerationParams,
        image,
        mask,
        strength: float = 1.0,
    ):
        return self._inner.inpaint(list(prompts), params, image, mask, strength)
