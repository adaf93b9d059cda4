"""FLUX LoRA loading and application (diffusers-format safetensors).

The reference has no LoRA support; semantics follow diffusers' PEFT fusion:
``delta_W = (alpha / r) * lora_B @ lora_A`` with torch ``[out, in]`` factor
layouts (lora_A ``[r, in]``, lora_B ``[out, r]``). Accepted key shapes:

* ``transformer.<base>.lora_A.weight`` / ``.lora_B.weight`` (diffusers PEFT)
* ``<base>.lora_down.weight`` / ``.lora_up.weight`` (classic kohya suffixes
  on diffusers key bodies), with optional ``transformer.`` /
  ``diffusion_model.`` prefixes and optional per-pair ``.alpha`` scalars;
* ``lora_unet_double_blocks_N_img_attn_qkv`` etc. — sd-scripts/kohya FLUX
  LoRAs in BFL underscore naming; factors on the BFL fused projections are
  split per part (rank-preserving B row slices). Trees loaded from BFL
  checkpoints (fused qkv/qkv_mlp layouts) are handled by column-placing
  each part's factors into the fused output range.

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


def _kohya_bfl_to_diffusers(pairs: Dict[str, dict], cfg) -> Dict[str, dict]:
    """Translate ``lora_unet_*`` bases (BFL underscore naming — sd-scripts /
    kohya FLUX LoRAs) into diffusers bases, splitting factors that target the
    BFL fused projections (double qkv; single linear1 = q|k|v|mlp columns).
    Splitting B by rows keeps the rank, so alpha/r scaling is unchanged."""
    import re

    h, mlp = cfg.hidden_size, cfg.mlp_size
    out: Dict[str, dict] = {}

    for base, pair in pairs.items():
        if not base.startswith("lora_unet_"):
            out[base] = pair
            continue
        body = base[len("lora_unet_"):]
        A, B = pair["A"], pair["B"]

        def put(newbase, Bpart, pair=pair, A=A):
            d = {"A": A, "B": Bpart}
            if "alpha" in pair:
                d["alpha"] = pair["alpha"]
            out[newbase] = d

        m = re.match(
            r"double_blocks_(\d+)_(img|txt)_"
            r"(attn_qkv|attn_proj|mlp_0|mlp_2|mod_lin)$", body)
        if m:
            i, st, kind = int(m.group(1)), m.group(2), m.group(3)
            p = f"transformer_blocks.{i}"
            if kind == "attn_qkv":
                names = (
                    [f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v"]
                    if st == "img" else
                    [f"{p}.attn.add_q_proj", f"{p}.attn.add_k_proj",
                     f"{p}.attn.add_v_proj"])
                for j, nm in enumerate(names):
                    put(nm, B[j * h:(j + 1) * h])
            elif kind == "attn_proj":
                put(f"{p}.attn.to_out.0" if st == "img"
                    else f"{p}.attn.to_add_out", B)
            elif kind == "mlp_0":
                put(f"{p}.ff.net.0.proj" if st == "img"
                    else f"{p}.ff_context.net.0.proj", B)
            elif kind == "mlp_2":
                put(f"{p}.ff.net.2" if st == "img"
                    else f"{p}.ff_context.net.2", B)
            else:  # mod_lin
                put(f"{p}.norm1.linear" if st == "img"
                    else f"{p}.norm1_context.linear", B)
            continue
        m = re.match(r"single_blocks_(\d+)_(linear1|linear2|modulation_lin)$",
                     body)
        if m:
            i, kind = int(m.group(1)), m.group(2)
            p = f"single_transformer_blocks.{i}"
            if kind == "linear1":
                put(f"{p}.attn.to_q", B[0:h])
                put(f"{p}.attn.to_k", B[h:2 * h])
                put(f"{p}.attn.to_v", B[2 * h:3 * h])
                put(f"{p}.proj_mlp", B[3 * h:3 * h + mlp])
            elif kind == "linear2":
                put(f"{p}.proj_out", B)
            else:
                put(f"{p}.norm.linear", B)
            continue
        if body == "final_layer_linear":
            put("proj_out", B)
            continue
        if body == "final_layer_adaLN_modulation_1":
            # BFL emits (shift, scale); the canonical tree is diffusers
            # (scale, shift) — swap the B halves like the weight loader does
            put("norm_out.linear", np.concatenate([B[h:2 * h], B[0:h]]))
            continue
        simple = {
            "img_in": "x_embedder",
            "txt_in": "context_embedder",
            "time_in_in_layer": "time_text_embed.timestep_embedder.linear_1",
            "time_in_out_layer": "time_text_embed.timestep_embedder.linear_2",
            "vector_in_in_layer": "time_text_embed.text_embedder.linear_1",
            "vector_in_out_layer": "time_text_embed.text_embedder.linear_2",
            "guidance_in_in_layer": "time_text_embed.guidance_embedder.linear_1",
            "guidance_in_out_layer": "time_text_embed.guidance_embedder.linear_2",
        }
        if body in simple:
            put(simple[body], B)
            continue
        out[base] = pair  # unmatched: surfaces in the error path
    return out


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


# Per-part column offsets inside BFL fused projections (units of h; mlp-width
# part marked "mlp").
_QKV_OFF = {"q": 0, "k": 1, "v": 2}


def _resolve_target(params, section, tree_path, cfg):
    """Find the Linear for a diffusers-style target, following BFL fused
    layouts: trees built from BFL checkpoints carry ``qkv`` (double attn) and
    ``qkv_mlp`` (single blocks) instead of separate q/k/v/proj_mlp — a
    per-part target then maps to a COLUMN RANGE of the fused linear.

    Returns (lin, col_off, n_part); col_off is None for whole-linear targets.
    """
    h = cfg.hidden_size
    parent_path = (section,) if section in ("double", "single") else ()
    node = _get(params, parent_path)
    if section == "single":
        last = tree_path[0]
        if last in node:
            return node[last], None, None
        if last in _QKV_OFF and "qkv_mlp" in node:
            return node["qkv_mlp"], _QKV_OFF[last] * h, h
        if last == "proj_mlp" and "qkv_mlp" in node:
            return node["qkv_mlp"], 3 * h, cfg.mlp_size
        raise KeyError(tree_path)
    for p in tree_path[:-1]:
        node = node[p]
    last = tree_path[-1]
    if last in node:
        return node[last], None, None
    if last in _QKV_OFF and "qkv" in node:
        return node["qkv"], _QKV_OFF[last] * h, h
    raise KeyError(tree_path)


def _merge_lora(existing, a, bl):
    """Stack a new runtime low-rank term onto an existing one (multiple
    LoRA files): ranks concatenate — y += (x@[a1|a2])@[[bl1],[bl2]]."""
    if existing is None:
        return (a, bl)
    a0, bl0 = existing
    return (
        jnp.concatenate([a0, a], axis=-1),
        jnp.concatenate([bl0, bl], axis=-2),
    )


def _fuse_dense(w: jnp.ndarray, layer: Optional[int], A, B, s: float,
                col_off: Optional[int] = None):
    """w ([L, K, N] or [K, N]) += s * A.T @ B.T (f32, cast back), optionally
    into the column range [col_off, col_off + B.shape[0])."""
    delta = (A.astype(np.float32).T @ B.astype(np.float32).T) * s
    cols = (
        slice(None) if col_off is None
        else slice(col_off, col_off + B.shape[0])
    )
    if layer is None:
        return w.at[:, cols].set(
            (w[:, cols].astype(jnp.float32) + delta).astype(w.dtype)
        )
    return w.at[layer, :, cols].set(
        (w[layer, :, cols].astype(jnp.float32) + delta).astype(w.dtype)
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
    pairs = _kohya_bfl_to_diffusers(pairs, cfg)
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

    # Resolve every target to its physical Linear first: on BFL fused trees
    # several per-part targets (q/k/v[, proj_mlp]) land on ONE fused linear
    # and must merge into a single runtime term / set of column fusions.
    physical: Dict[int, dict] = {}
    for (section, tree_path), per_layer in grouped.items():
        lin, col_off, _ = _resolve_target(params, section, tree_path, cfg)
        assert isinstance(lin, Linear), (section, tree_path)
        rec = physical.setdefault(
            id(lin), {"lin": lin, "section": section, "entries": []})
        for layer, (A, B, s) in per_layer.items():
            rec["entries"].append((layer, A, B, s, col_off))

    n_applied = 0
    for rec in physical.values():
        lin, section = rec["lin"], rec["section"]
        n_applied += len(rec["entries"])
        if isinstance(lin.w, QuantizedTensor):
            # runtime low-rank term; scale folded into bl, B column-placed
            # into the fused output range when col_off is set
            k, n = lin.w.shape[-2], lin.w.shape[-1]

            def b_full(A, B, s, off):
                bf = np.zeros((A.shape[0], n), np.float32)
                cols = slice(0, n) if off is None else slice(off, off + B.shape[0])
                bf[:, cols] = B.T * s
                return bf

            if section == "top":
                a = np.concatenate(
                    [A.T for (_, A, _, _, _) in rec["entries"]], axis=1)
                bl = np.concatenate(
                    [b_full(A, B, s, off) for (_, A, B, s, off) in rec["entries"]],
                    axis=0)
                lin.lora = _merge_lora(lin.lora, jnp.asarray(a, dtype),
                                       jnp.asarray(bl, dtype))
            else:
                L = n_layers[section]
                by_layer: Dict[int, list] = {}
                for (layer, A, B, s, off) in rec["entries"]:
                    by_layer.setdefault(layer, []).append((A, B, s, off))
                rmax = max(
                    sum(A.shape[0] for (A, _, _, _) in parts)
                    for parts in by_layer.values())
                a_np = np.zeros((L, k, rmax), np.float32)
                b_np = np.zeros((L, rmax, n), np.float32)
                for layer, parts in by_layer.items():
                    r0 = 0
                    for (A, B, s, off) in parts:
                        r = A.shape[0]
                        a_np[layer, :, r0:r0 + r] = A.T
                        b_np[layer, r0:r0 + r] = b_full(A, B, s, off)
                        r0 += r
                lin.lora = _merge_lora(lin.lora, jnp.asarray(a_np, dtype),
                                       jnp.asarray(b_np, dtype))
        else:
            for (layer, A, B, s, off) in rec["entries"]:
                lin.w = _fuse_dense(
                    lin.w, None if section == "top" else layer, A, B, s, off)
    log.info("LoRA %s: applied %d factor pairs to %d linears",
             path, n_applied, len(physical))
    return params
