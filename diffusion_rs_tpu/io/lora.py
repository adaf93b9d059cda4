"""FLUX LoRA loading and application (diffusers-format safetensors).

The reference has no LoRA support; semantics follow diffusers' PEFT fusion:
``delta_W = (alpha / r) * lora_B @ lora_A`` with torch ``[out, in]`` factor
layouts (lora_A ``[r, in]``, lora_B ``[out, r]``). Accepted key shapes:

* ``transformer.<base>.lora_A.weight`` / ``.lora_B.weight`` (diffusers PEFT)
* ``<base>.lora_down.weight`` / ``.lora_up.weight`` (classic kohya suffixes
  on diffusers key bodies), with optional ``transformer.`` /
  ``diffusion_model.`` prefixes and optional per-pair ``.alpha`` scalars.

Application:
* dense base weights — the delta is FUSED: ``w[l] += scale * A.T @ B.T``
  (f32 math, cast back), zero runtime cost;
* quantized base weights — fusing would need requantization, so the factors
  attach to the Linear as a runtime low-rank term ``y += (x @ a) @ bl``
  (ops/linear.py); per-layer factors are stacked (rank-padded) so the
  scan-over-blocks model sees one leading layer axis like every other leaf.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.linear import Linear
from ..quant.qtensor import QuantizedTensor
from .safetensors import SafeTensors

log = logging.getLogger("diffusion_rs_tpu")

_PREFIXES = ("transformer.", "diffusion_model.", "")
_A_SUFFIXES = (".lora_A.weight", ".lora_down.weight")
_B_SUFFIXES = (".lora_B.weight", ".lora_up.weight")


def read_lora_file(path: str) -> Dict[str, dict]:
    """Parse a LoRA safetensors file into {base_key: {A, B, alpha}}."""
    st = SafeTensors.from_file(path)
    pairs: Dict[str, dict] = {}

    def strip_prefix(k: str) -> str:
        for p in _PREFIXES:
            if p and k.startswith(p):
                return k[len(p):]
        return k

    for name in st.keys():
        k = strip_prefix(name)
        for suf in _A_SUFFIXES:
            if k.endswith(suf):
                pairs.setdefault(k[: -len(suf)], {})["A"] = st.numpy(name)
        for suf in _B_SUFFIXES:
            if k.endswith(suf):
                pairs.setdefault(k[: -len(suf)], {})["B"] = st.numpy(name)
        if k.endswith(".alpha"):
            pairs.setdefault(k[: -len(".alpha")], {})["alpha"] = float(
                st.numpy(name).reshape(())
            )
    bad = [k for k, v in pairs.items() if "A" not in v or "B" not in v]
    for k in bad:
        del pairs[k]
    if bad:
        log.warning("LoRA %s: %d keys missing an A/B partner: %s...",
                    path, len(bad), bad[:3])
    return pairs


# diffusers FluxTransformer2D base key -> path inside our param tree
# (mirrors io/builders.py build_flux_params).
_DOUBLE_MAP = {
    "norm1.linear": ("img_mod",),
    "norm1_context.linear": ("txt_mod",),
    "attn.to_q": ("img_attn", "q"),
    "attn.to_k": ("img_attn", "k"),
    "attn.to_v": ("img_attn", "v"),
    "attn.to_out.0": ("img_attn", "proj"),
    "attn.add_q_proj": ("txt_attn", "q"),
    "attn.add_k_proj": ("txt_attn", "k"),
    "attn.add_v_proj": ("txt_attn", "v"),
    "attn.to_add_out": ("txt_attn", "proj"),
    "ff.net.0.proj": ("img_mlp", "in"),
    "ff.net.2": ("img_mlp", "out"),
    "ff_context.net.0.proj": ("txt_mlp", "in"),
    "ff_context.net.2": ("txt_mlp", "out"),
}
_SINGLE_MAP = {
    "attn.to_q": ("q",),
    "attn.to_k": ("k",),
    "attn.to_v": ("v",),
    "proj_mlp": ("proj_mlp",),
    "proj_out": ("linear2",),
    "norm.linear": ("mod",),
}
_TOP_MAP = {
    "x_embedder": ("img_in",),
    "context_embedder": ("txt_in",),
    "time_text_embed.timestep_embedder.linear_1": ("time_in", "in"),
    "time_text_embed.timestep_embedder.linear_2": ("time_in", "out"),
    "time_text_embed.text_embedder.linear_1": ("vector_in", "in"),
    "time_text_embed.text_embedder.linear_2": ("vector_in", "out"),
    "time_text_embed.guidance_embedder.linear_1": ("guidance_in", "in"),
    "time_text_embed.guidance_embedder.linear_2": ("guidance_in", "out"),
    "norm_out.linear": ("final", "mod"),
    "proj_out": ("final", "proj"),
}


def _classify(base: str) -> Optional[Tuple[str, Optional[int], tuple]]:
    """base key -> (section, layer index, tree path) or None."""
    if base.startswith("transformer_blocks."):
        rest = base[len("transformer_blocks."):]
        idx, _, tail = rest.partition(".")
        path = _DOUBLE_MAP.get(tail)
        return ("double", int(idx), path) if path else None
    if base.startswith("single_transformer_blocks."):
        rest = base[len("single_transformer_blocks."):]
        idx, _, tail = rest.partition(".")
        path = _SINGLE_MAP.get(tail)
        return ("single", int(idx), path) if path else None
    path = _TOP_MAP.get(base)
    return ("top", None, path) if path else None


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _fuse_dense(w: jnp.ndarray, layer: Optional[int], A, B, s: float):
    """w ([L, K, N] or [K, N]) += s * A.T @ B.T (f32, cast back)."""
    delta = (A.astype(np.float32).T @ B.astype(np.float32).T) * s
    if layer is None:
        return (w.astype(jnp.float32) + delta).astype(w.dtype)
    return w.at[layer].set(
        (w[layer].astype(jnp.float32) + delta).astype(w.dtype)
    )


def apply_flux_lora(params, cfg, path: str, scale: float = 1.0,
                    dtype=jnp.bfloat16):
    """Apply a LoRA file to a FLUX param tree IN PLACE (returns the tree).

    ``scale`` multiplies the per-pair alpha/r weighting (diffusers
    ``lora_scale``). Unmatched keys raise with a sample list — silent
    partial application would quietly change outputs.
    """
    pairs = read_lora_file(path)
    if not pairs:
        raise ValueError(f"{path}: no LoRA A/B pairs found")
    # Files often bundle text-encoder adapters alongside the transformer
    # factors (civitai-style); our encoders follow the reference and take no
    # adapters — skip those groups loudly rather than refusing the file.
    te_prefixes = ("text_encoder.", "text_encoder_2.", "te1.", "te2.",
                   "lora_te1_", "lora_te2_", "lora_te_")
    te_keys = [k for k in pairs if k.startswith(te_prefixes)]
    for k in te_keys:
        del pairs[k]
    if te_keys:
        log.warning(
            "LoRA %s: skipping %d text-encoder adapter groups (encoders "
            "take no adapters here)", path, len(te_keys),
        )
    if not pairs:
        raise ValueError(
            f"{path}: only text-encoder adapters present; nothing to apply"
        )
    unmatched = []
    # target tree path -> {layer: (A, B, s)}
    grouped: Dict[tuple, dict] = {}
    n_layers = {"double": cfg.num_layers, "single": cfg.num_single_layers}
    for base, pair in pairs.items():
        cls = _classify(base)
        if cls is None:
            unmatched.append(base)
            continue
        section, layer, tree_path = cls
        if section == "top" and tree_path[0] == "guidance_in" and not cfg.guidance_embeds:
            continue  # schnell: LoRA trained on dev carries unused factors
        A, B = pair["A"], pair["B"]
        r = A.shape[0]
        s = scale * (pair.get("alpha", r) / r)
        key = (section, tree_path)
        grouped.setdefault(key, {})[layer] = (A, B, s)
    if unmatched:
        raise ValueError(
            f"{path}: {len(unmatched)} LoRA keys do not match the FLUX "
            f"transformer key map, e.g. {sorted(unmatched)[:5]} — only "
            "diffusers-format FLUX LoRAs are supported"
        )

    n_applied = 0
    for (section, tree_path), per_layer in grouped.items():
        parent_path = ("double",) if section == "double" else (
            ("single",) if section == "single" else ())
        lin = _get(params, parent_path + tree_path)
        assert isinstance(lin, Linear), (section, tree_path)
        if isinstance(lin.w, QuantizedTensor):
            # runtime low-rank term; scale folded into bl
            k, n = lin.w.shape[-2], lin.w.shape[-1]
            if section == "top":
                (A, B, s) = per_layer[None]
                a = jnp.asarray(A.T, dtype)
                bl = jnp.asarray(B.T * s, dtype)
            else:
                L = n_layers[section]
                rmax = max(A.shape[0] for (A, _, _) in per_layer.values())
                a_np = np.zeros((L, k, rmax), np.float32)
                b_np = np.zeros((L, rmax, n), np.float32)
                for layer, (A, B, s) in per_layer.items():
                    r = A.shape[0]
                    a_np[layer, :, :r] = A.T
                    b_np[layer, :r, :] = B.T * s
                a, bl = jnp.asarray(a_np, dtype), jnp.asarray(b_np, dtype)
            lin.lora = (a, bl)
        else:
            if section == "top":
                (A, B, s) = per_layer[None]
                lin.w = _fuse_dense(lin.w, None, A, B, s)
            else:
                for layer, (A, B, s) in per_layer.items():
                    lin.w = _fuse_dense(lin.w, layer, A, B, s)
        n_applied += len(per_layer)
    log.info("LoRA %s: applied %d factor pairs to %d linears",
             path, n_applied, len(grouped))
    return params
