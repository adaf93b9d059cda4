"""FLUX.1 MMDiT, TPU-native.

Behavioral reference: diffusion_rs_core/src/models/flux/model.rs (929 LoC) —
double-stream blocks (separate img/txt QKV+MLP, joint attention over the
concatenated sequence, 6-way AdaLN "Modulation2"), single-stream blocks
(fused attn+MLP, 3-way "Modulation1"), timestep/guidance/CLIP-vector MLP
embedders, 3-axis RoPE (axes 16/56/56, theta 10000), AdaLN final layer.

TPU design decisions (vs the reference's eager per-block Vec loop):

* **Functional pytrees + lax.scan over stacked blocks** — 19 double and 38
  single blocks become TWO compiled block bodies instead of 57 inlined ones
  (compile time and instruction-cache-friendly), with weights (dense bf16 or
  ``QuantizedTensor``) scanned as carried constants.
* **RoPE tables are inputs** — the reference recomputes the position
  embedding every denoise step (model.rs:807-810); here `rope_tables` is
  computed once per generation and threaded through the sampling scan.
* **Attention numerics**: the reference upcasts q/k/v to f32 for SDPA
  (model.rs:40-50). On TPU the flash kernel keeps the matmuls bf16 on the
  MXU with f32 softmax/accumulator state — the part of the f32 contract
  that matters numerically.
* Parameter-free LayerNorms (model.rs:33-38 passes ones/zeros) are plain
  ``layer_norm(x)`` calls with no weights.

Weight names in the param pytree mirror the checkpoint's diffusers naming so
the loader is a direct prefix walk (io/builders.py build_flux_params; BFL
single-file GGUF names map through _build_flux_params_bfl).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import (
    Linear,
    apply_rope,
    layer_norm,
    linear,
    linear_grouped,
    rms_norm,
    rope_tables,
    sdpa,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    """models/flux/model.rs:21-31 + constants :16-19."""

    in_channels: int = 64
    pooled_projection_dim: int = 768
    joint_attention_dim: int = 4096
    num_attention_heads: int = 24
    num_layers: int = 19
    num_single_layers: int = 38
    guidance_embeds: bool = True
    hidden_size: int = 3072
    mlp_ratio: float = 4.0
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    # True after models/optimize.rope_halfsplit_permute re-laid the q/k
    # projection columns: blocks then run seq-major attention with RoPE
    # fused into the flash kernel (SURVEY §7.4). Never read from config.json
    # — set by the loader.
    rope_fused: bool = False
    # Grouped img+txt projection calls in double blocks (one kernel launch
    # per projection pair — BENCH.md r5). Set by the loader (fuse token
    # "grouped"); requires fused qkv in both streams. Never from config.json.
    grouped_qmm: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def mlp_size(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @staticmethod
    def from_json(d: dict) -> "FluxConfig":
        """The reference hardcodes HIDDEN_SIZE=3072 / axes [16,56,56]
        (model.rs:16-19); we honor the diffusers config fields
        ``attention_head_dim`` / ``axes_dims_rope`` when present so non-3072
        variants (and tiny test configs) load too."""
        heads = d["num_attention_heads"]
        head_dim = d.get("attention_head_dim", 128)
        axes = tuple(d.get("axes_dims_rope", (16, 56, 56)))
        return FluxConfig(
            in_channels=d["in_channels"],
            pooled_projection_dim=d["pooled_projection_dim"],
            joint_attention_dim=d["joint_attention_dim"],
            num_attention_heads=heads,
            num_layers=d["num_layers"],
            num_single_layers=d["num_single_layers"],
            guidance_embeds=d["guidance_embeds"],
            hidden_size=heads * head_dim,
            # diffusers FluxTransformer2DModel has no mlp_ratio field (4.0 is
            # hardcoded there like the reference's MLP_RATIO, model.rs:17),
            # but honor it when present so a variant checkpoint fails loudly
            # at config level instead of via downstream shape errors
            # (VERDICT r3 weak #4).
            mlp_ratio=float(d.get("mlp_ratio", 4.0)),
            axes_dim=axes,
        )


def timestep_embedding(t: jnp.ndarray, dim: int, dtype) -> jnp.ndarray:
    """Sinusoidal embedding, t scaled by 1000 (model.rs:105-122): f32 math,
    layout [cos | sin]."""
    half = dim // 2
    t = t.astype(jnp.float32) * 1000.0
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-jnp.log(10000.0) / half)
    )
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1).astype(dtype)


def _mlp_embedder(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(jax.nn.silu(linear(x, p["in"])), p["out"])


def _modulation(lin: Linear, vec: jnp.ndarray, n: int):
    """AdaLN: silu(vec) -> linear -> n chunks of [B, 1, H]
    (model.rs:243-295)."""
    y = linear(jax.nn.silu(vec), lin)[:, None, :]
    return jnp.split(y, n, axis=-1)


def _scale_shift(x, shift, scale):
    return x * (scale + 1.0) + shift


def _qkv(p: Params, x: jnp.ndarray, n_heads: int, proj=None):
    """Project + split heads + QK-RMSNorm (model.rs:394-432). Supports the
    fused ``qkv`` layout produced by models/optimize.py; ``proj`` supplies a
    precomputed fused q|k|v projection (the grouped-call path)."""
    b, s, _ = x.shape
    def split(t):
        return t.reshape(b, s, n_heads, -1).transpose(0, 2, 1, 3)
    if proj is None and "qkv" in p:
        proj = linear(x, p["qkv"])
    if proj is not None:
        qc, kc, vc = jnp.split(proj, 3, axis=-1)
        q, k, v = split(qc), split(kc), split(vc)
    else:
        q = split(linear(x, p["q"]))
        k = split(linear(x, p["k"]))
        v = split(linear(x, p["v"]))
    q = rms_norm(q, p["q_norm"])
    k = rms_norm(k, p["k_norm"])
    return q, k, v


def _joint_attention(q, k, v, cos, sin):
    """RoPE + SDPA + head merge (model.rs:97-103). The merge happens INSIDE
    the flash kernel (out_seqmajor — each head's block is written straight
    into its column slice of [B, S, H*D]), so no transpose follows
    attention; see ops.attention.sdpa_merged."""
    from ..ops.attention import sdpa_merged

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    return sdpa_merged(q, k, v)


def _qkv_sm(p: Params, x: jnp.ndarray, n_heads: int, proj=None):
    """Seq-major _qkv: project + per-head QK-RMSNorm WITHOUT the head-split
    transpose — q/k/v stay [B, S, H*D] (the layout the fused flash kernel
    consumes directly; see flash_pallas._flash_rope_kernel). ``proj``
    supplies a precomputed fused projection (the grouped-call path)."""
    b, s, _ = x.shape

    def norm(t, scale):
        t4 = t.reshape(b, s, n_heads, -1)     # free reshape, no transpose
        return rms_norm(t4, scale).reshape(b, s, -1)

    if proj is None and "qkv" in p:
        proj = linear(x, p["qkv"])
    if proj is not None:
        qc, kc, vc = jnp.split(proj, 3, axis=-1)
    else:
        qc = linear(x, p["q"])
        kc = linear(x, p["k"])
        vc = linear(x, p["v"])
    return norm(qc, p["q_norm"]), norm(kc, p["k_norm"]), vc


def _joint_attention_sm(q, k, v, ce, se, head_dim: int):
    """Joint attention in the half-split RoPE convention: q/k/v [B, S, H*D]
    (the natural projection output layout), ce/se the expanded tables
    (ops/rope.py expand_rope_tables). Requires params permuted by
    models/optimize.rope_halfsplit_permute.

    Layouts (DIFFUSION_RS_TPU_ATTN_LAYOUT, trace-time):
    * ``bhsd`` (default) — half-split rope + head-split transpose + the
      classic [B,H,S,D] flash kernel. Measured FASTEST on v5e: XLA fuses the
      transposes into producers, the kernel's per-(b,h) blocks are
      contiguous DMA, and half-split rope is contiguous-slice math (vs the
      interleaved path's pair shuffles).
    * ``seqmajor`` — no transposes; kernel slices each head's columns from
      [B, S, H*D]. Measured slower (strided block DMA; BENCH.md r3).
    * ``inkernel`` — rope fused into the kernel. Measured slower (f32 table
      streaming per kv tile; BENCH.md r3).
    """
    import os

    from ..ops.attention import _flash_mode

    layout = os.environ.get("DIFFUSION_RS_TPU_ATTN_LAYOUT", "bhsd")
    mode = _flash_mode()
    if mode and head_dim % 128 == 0 and layout in ("seqmajor", "inkernel"):
        from ..ops.flash_pallas import flash_attention_fused

        try:
            return flash_attention_fused(
                q, k, v, ce, se, head_dim=head_dim,
                interpret=(mode == "interpret"),
            )
        except NotImplementedError:
            pass
    # bhsd (or CPU / odd head dims): half-split rope + standard sdpa.
    from ..ops.rope import apply_rope_halfsplit

    b, s, n = q.shape
    h = n // head_dim
    cos = ce[..., : head_dim // 2]
    sin = se[..., head_dim // 2:]

    def split(t):
        return t.reshape(b, s, h, head_dim).transpose(0, 2, 1, 3)

    qr = apply_rope_halfsplit(split(q), cos, sin)
    kr = apply_rope_halfsplit(split(k), cos, sin)
    x = sdpa(qr, kr, split(v))
    return x.transpose(0, 2, 1, 3).reshape(b, s, n)


def double_block(
    p: Params, img, txt, vec, cos, sin, cfg: FluxConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DoubleStreamBlock::forward (model.rs:523-565). txt tokens lead in the
    joint sequence (model.rs:540-542)."""
    i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = _modulation(
        p["img_mod"], vec, 6
    )
    t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = _modulation(
        p["txt_mod"], vec, 6
    )

    img_mod = _scale_shift(layer_norm(img), i_shift1, i_scale1)
    txt_mod = _scale_shift(layer_norm(txt), t_shift1, t_scale1)
    heads = cfg.num_attention_heads
    # Grouped-call path (cfg.grouped_qmm, BENCH.md r5): the txt stream's
    # projections run at M = 512·batch where a standalone quantized call is
    # per-call-work-limited (~24% of the img stream's rate), so each
    # img/txt projection pair runs as ONE grouped kernel launch — the txt
    # m-tiles ride the img call's grid (ops/linear.linear_grouped). Exact:
    # per-group math is identical. Requires fused qkv in both streams.
    grouped = (
        cfg.grouped_qmm
        and "qkv" in p["img_attn"] and "qkv" in p["txt_attn"]
    )
    if grouped:
        i_proj, t_proj = linear_grouped(
            [img_mod, txt_mod],
            [p["img_attn"]["qkv"], p["txt_attn"]["qkv"]],
        )
    else:
        i_proj = t_proj = None
    if cfg.rope_fused:
        # seq-major path: (cos, sin) carry the EXPANDED (ce, se) tables
        iq, ik, iv = _qkv_sm(p["img_attn"], img_mod, heads, proj=i_proj)
        tq, tk, tv = _qkv_sm(p["txt_attn"], txt_mod, heads, proj=t_proj)
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        attn = _joint_attention_sm(q, k, v, cos, sin, cfg.head_dim)
    else:
        iq, ik, iv = _qkv(p["img_attn"], img_mod, heads, proj=i_proj)
        tq, tk, tv = _qkv(p["txt_attn"], txt_mod, heads, proj=t_proj)
        q = jnp.concatenate([tq, iq], axis=2)
        k = jnp.concatenate([tk, ik], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
        attn = _joint_attention(q, k, v, cos, sin)
    txt_len = txt.shape[1]
    txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

    if grouped:
        i_p, t_p = linear_grouped(
            [img_attn, txt_attn],
            [p["img_attn"]["proj"], p["txt_attn"]["proj"]],
        )
        img = img + i_gate1 * i_p
        txt = txt + t_gate1 * t_p
        img_mlp_in = _scale_shift(layer_norm(img), i_shift2, i_scale2)
        txt_mlp_in = _scale_shift(layer_norm(txt), t_shift2, t_scale2)
        i_h, t_h = linear_grouped(
            [img_mlp_in, txt_mlp_in],
            [p["img_mlp"]["in"], p["txt_mlp"]["in"]],
        )
        img_mlp, txt_mlp = linear_grouped(
            [jax.nn.gelu(i_h, approximate=True),
             jax.nn.gelu(t_h, approximate=True)],
            [p["img_mlp"]["out"], p["txt_mlp"]["out"]],
        )
        img = img + i_gate2 * img_mlp
        txt = txt + t_gate2 * txt_mlp
        return img, txt

    img = img + i_gate1 * linear(img_attn, p["img_attn"]["proj"])
    img_mlp_in = _scale_shift(layer_norm(img), i_shift2, i_scale2)
    img_mlp = linear(
        jax.nn.gelu(linear(img_mlp_in, p["img_mlp"]["in"]), approximate=True),
        p["img_mlp"]["out"],
    )
    img = img + i_gate2 * img_mlp

    txt = txt + t_gate1 * linear(txt_attn, p["txt_attn"]["proj"])
    txt_mlp_in = _scale_shift(layer_norm(txt), t_shift2, t_scale2)
    txt_mlp = linear(
        jax.nn.gelu(linear(txt_mlp_in, p["txt_mlp"]["in"]), approximate=True),
        p["txt_mlp"]["out"],
    )
    txt = txt + t_gate2 * txt_mlp
    return img, txt


def single_block(p: Params, x, vec, cos, sin, cfg: FluxConfig) -> jnp.ndarray:
    """SingleStreamBlock::forward (model.rs:641-663): shared pre-norm feeds
    both attention and the parallel MLP; outputs concat into one projection."""
    shift, scale, gate = _modulation(p["mod"], vec, 3)
    x_mod = _scale_shift(layer_norm(x), shift, scale)
    h = cfg.hidden_size
    heads = cfg.num_attention_heads
    if cfg.rope_fused:
        # seq-major path: (cos, sin) carry the EXPANDED (ce, se) tables
        b, s, _ = x_mod.shape

        def norm_sm(t, scale_):
            return rms_norm(t.reshape(b, s, heads, -1), scale_).reshape(b, s, -1)

        if "qkv_mlp" in p:
            fused = linear(x_mod, p["qkv_mlp"])
            q = norm_sm(fused[..., 0:h], p["q_norm"])
            k = norm_sm(fused[..., h:2 * h], p["k_norm"])
            v = fused[..., 2 * h:3 * h]
            mlp_raw = fused[..., 3 * h:]
        else:
            q, k, v = _qkv_sm(p, x_mod, heads)
            mlp_raw = linear(x_mod, p["proj_mlp"])
        attn = _joint_attention_sm(q, k, v, cos, sin, cfg.head_dim)
    else:
        if "qkv_mlp" in p:
            # fused q|k|v|proj_mlp projection (models/optimize.py)
            fused = linear(x_mod, p["qkv_mlp"])
            b, s, _ = x_mod.shape

            def split_heads(t):
                return t.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)

            q = rms_norm(split_heads(fused[..., 0:h]), p["q_norm"])
            k = rms_norm(split_heads(fused[..., h:2 * h]), p["k_norm"])
            v = split_heads(fused[..., 2 * h:3 * h])
            mlp_raw = fused[..., 3 * h:]
        else:
            q, k, v = _qkv(p, x_mod, heads)
            mlp_raw = linear(x_mod, p["proj_mlp"])
        attn = _joint_attention(q, k, v, cos, sin)
    mlp = jax.nn.gelu(mlp_raw, approximate=True)
    out = linear(jnp.concatenate([attn, mlp], axis=-1), p["linear2"])
    return x + gate * out


def final_layer(p: Params, x, vec) -> jnp.ndarray:
    """LastLayer (model.rs:694-706): AdaLN-final then patch projection.
    NOTE chunk order is (scale, shift) here, unlike the blocks."""
    y = linear(jax.nn.silu(vec), p["mod"])
    scale, shift = jnp.split(y[:, None, :], 2, axis=-1)
    x = layer_norm(x) * (scale + 1.0) + shift
    return linear(x, p["proj"])


def compute_pe(
    cfg: FluxConfig, txt_ids: jnp.ndarray, img_ids: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Position-embedding tables for the joint sequence — computed once per
    generation (the reference redoes this every step, model.rs:807-810)."""
    ids = jnp.concatenate([txt_ids, img_ids], axis=1)
    return rope_tables(ids, cfg.axes_dim, cfg.theta)


def conditioning_vector(
    params: Params,
    cfg: FluxConfig,
    t: jnp.ndarray,
    y: jnp.ndarray,
    guidance: Optional[jnp.ndarray],
    dtype,
) -> jnp.ndarray:
    """vec = time_in(t) [+ guidance_in(g)] + vector_in(y) (model.rs:813-821)."""
    vec = _mlp_embedder(params["time_in"], timestep_embedding(t, 256, dtype))
    if cfg.guidance_embeds:
        if guidance is None:
            raise ValueError("guidance_embeds model requires a guidance value")
        vec = vec + _mlp_embedder(
            params["guidance_in"], timestep_embedding(guidance, 256, dtype)
        )
    return vec + _mlp_embedder(params["vector_in"], y)


def flux_forward(
    params: Params,
    cfg: FluxConfig,
    img: jnp.ndarray,          # [B, S_img, in_channels] packed 2x2 patches
    txt: jnp.ndarray,          # [B, S_txt, joint_attention_dim]
    t: jnp.ndarray,            # [B]
    y: jnp.ndarray,            # [B, pooled_projection_dim]
    guidance: Optional[jnp.ndarray] = None,  # [B]
    txt_ids: Optional[jnp.ndarray] = None,
    img_ids: Optional[jnp.ndarray] = None,
    pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    use_scan: bool = True,
) -> jnp.ndarray:
    """Full MMDiT forward (model.rs:790-833). Pass ``pe`` (from
    :func:`compute_pe`) to skip recomputing RoPE tables each step."""
    dtype = img.dtype
    if pe is None:
        pe = compute_pe(cfg, txt_ids, img_ids)
    cos, sin = pe
    if cfg.rope_fused:
        # expand ONCE outside the block scan (see expand_rope_tables); the
        # blocks receive (ce, se) through the same (cos, sin) slots.
        from ..ops.rope import expand_rope_tables

        cos, sin = expand_rope_tables(cos, sin)

    txt_h = linear(txt, params["txt_in"])
    img_h = linear(img, params["img_in"])
    vec = conditioning_vector(params, cfg, t, y, guidance, dtype)
    txt_len = txt_h.shape[1]

    if use_scan:
        def dbody(carry, bp):
            i, tx = carry
            i, tx = double_block(bp, i, tx, vec, cos, sin, cfg)
            return (i, tx), None

        (img_h, txt_h), _ = jax.lax.scan(dbody, (img_h, txt_h), params["double"])
        x = jnp.concatenate([txt_h, img_h], axis=1)

        def sbody(carry, bp):
            return single_block(bp, carry, vec, cos, sin, cfg), None

        x, _ = jax.lax.scan(sbody, x, params["single"])
    else:
        for i in range(cfg.num_layers):
            bp = jax.tree.map(lambda a: a[i], params["double"])
            img_h, txt_h = double_block(bp, img_h, txt_h, vec, cos, sin, cfg)
        x = jnp.concatenate([txt_h, img_h], axis=1)
        for i in range(cfg.num_single_layers):
            bp = jax.tree.map(lambda a: a[i], params["single"])
            x = single_block(bp, x, vec, cos, sin, cfg)

    img_out = x[:, txt_len:]
    return final_layer(params["final"], img_out, vec)


# ---------------------------------------------------------------------------
# Random init (tests / synthetic benches; real weights come from io/)
# ---------------------------------------------------------------------------


def _rand_linear(key, k, n, bias=True, dtype=jnp.bfloat16, stack=None):
    k1, k2 = jax.random.split(key)
    shp = (k, n) if stack is None else (stack, k, n)
    w = (jax.random.normal(k1, shp, jnp.float32) * (k ** -0.5)).astype(dtype)
    b = None
    if bias:
        bshp = (n,) if stack is None else (stack, n)
        b = jnp.zeros(bshp, dtype)
    return Linear(w=w, b=b)


def init_flux_params(
    key, cfg: FluxConfig, dtype=jnp.bfloat16
) -> Params:
    """Random bf16 parameters with the exact pytree schema the loader
    produces. Double/single block leaves carry a leading stacked layer dim."""
    h, m, hd = cfg.hidden_size, cfg.mlp_size, cfg.head_dim
    keys = iter(jax.random.split(key, 64))

    def attn(stack, prefix_bias=True):
        return {
            "q": _rand_linear(next(keys), h, h, True, dtype, stack),
            "k": _rand_linear(next(keys), h, h, True, dtype, stack),
            "v": _rand_linear(next(keys), h, h, True, dtype, stack),
            "proj": _rand_linear(next(keys), h, h, True, dtype, stack),
            "q_norm": jnp.ones((stack, hd), dtype),
            "k_norm": jnp.ones((stack, hd), dtype),
        }

    L, S = cfg.num_layers, cfg.num_single_layers
    params: Params = {
        "img_in": _rand_linear(next(keys), cfg.in_channels, h, True, dtype),
        "txt_in": _rand_linear(next(keys), cfg.joint_attention_dim, h, True, dtype),
        "time_in": {
            "in": _rand_linear(next(keys), 256, h, True, dtype),
            "out": _rand_linear(next(keys), h, h, True, dtype),
        },
        "vector_in": {
            "in": _rand_linear(next(keys), cfg.pooled_projection_dim, h, True, dtype),
            "out": _rand_linear(next(keys), h, h, True, dtype),
        },
        "double": {
            "img_mod": _rand_linear(next(keys), h, 6 * h, True, dtype, L),
            "txt_mod": _rand_linear(next(keys), h, 6 * h, True, dtype, L),
            "img_attn": attn(L),
            "txt_attn": attn(L),
            "img_mlp": {
                "in": _rand_linear(next(keys), h, m, True, dtype, L),
                "out": _rand_linear(next(keys), m, h, True, dtype, L),
            },
            "txt_mlp": {
                "in": _rand_linear(next(keys), h, m, True, dtype, L),
                "out": _rand_linear(next(keys), m, h, True, dtype, L),
            },
        },
        "single": {
            "q": _rand_linear(next(keys), h, h, True, dtype, S),
            "k": _rand_linear(next(keys), h, h, True, dtype, S),
            "v": _rand_linear(next(keys), h, h, True, dtype, S),
            "q_norm": jnp.ones((S, hd), dtype),
            "k_norm": jnp.ones((S, hd), dtype),
            "proj_mlp": _rand_linear(next(keys), h, m, True, dtype, S),
            "linear2": _rand_linear(next(keys), h + m, h, True, dtype, S),
            "mod": _rand_linear(next(keys), h, 3 * h, True, dtype, S),
        },
        "final": {
            "mod": _rand_linear(next(keys), h, 2 * h, True, dtype),
            "proj": _rand_linear(next(keys), h, cfg.in_channels, True, dtype),
        },
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = {
            "in": _rand_linear(next(keys), 256, h, True, dtype),
            "out": _rand_linear(next(keys), h, h, True, dtype),
        }
    return params
