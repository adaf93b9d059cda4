"""Scaled dot-product attention.

The reference runs FLUX attention in f32 regardless of model dtype
(models/flux/model.rs:40-50) and dispatches to a fused Metal SDPA kernel when
available, else naive matmul-softmax-matmul (diffusion_rs_backend/src/ops.rs).

TPU design: one entry point ``sdpa`` with two lowerings —

* ``flash``: Pallas blockwise flash-attention (ops/flash_pallas.py) — bf16
  QK^T on the MXU with f32 running softmax accumulation. This matches the
  reference's f32-softmax numerics where it matters (the reduction) while
  keeping the matmuls in bf16 for MXU throughput.
* ``xla``: plain einsum-softmax-einsum in f32, used on CPU (tests) and as the
  numerics reference for the kernel's parity tests (tolerance 5e-4, the
  budget the reference uses for its Metal SDPA, nn/tests/sdpa.rs:32-37).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


def sdpa_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    softcap: Optional[float] = None,
) -> jnp.ndarray:
    """Reference-semantics attention, f32 throughout.

    q, k, v: [B, H, S, D] (any float dtype; upcast like model.rs:43-47).
    bias: additive [B|1, H|1, Sq, Sk] (T5 relative-position bias / CLIP
    causal mask). ``softcap``: tanh score capping, the reference's
    `softcapping` parameter (backend/src/ops.rs:247-262 applies
    tanh(s/cap)*cap when cap != 1). Returns q.dtype.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bhsd,bhtd->bhst", qf, kf) * jnp.float32(scale)
    if softcap is not None and softcap != 1.0:
        scores = jnp.tanh(scores / softcap) * softcap
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", probs, vf)
    return out.astype(q.dtype)


def _flash_mode() -> Optional[str]:
    """None (XLA path), "flash" (Pallas kernel), or "interpret" (Pallas in
    interpreter mode — lets CPU-mesh tests drive the kernel + its GSPMD/ring
    rules without hardware). DIFFUSION_RS_TPU_FLASH=interpret|force overrides
    the backend auto-pick; DIFFUSION_RS_TPU_NO_FLASH disables."""
    return _flash_mode_for(jax.default_backend())


@functools.lru_cache(None)
def _flash_mode_for(backend: str) -> Optional[str]:
    """Cache keyed on the ACTIVE backend: one process can trace under the
    TPU backend and then run a forced-CPU mesh dryrun (conftest /
    __graft_entry__ pattern) — a backend-blind cache would leak the "flash"
    pick into the CPU trace, whose custom_partitioning wrapper has no
    autodiff rule."""
    if os.environ.get("DIFFUSION_RS_TPU_NO_FLASH"):
        return None
    forced = os.environ.get("DIFFUSION_RS_TPU_FLASH", "").lower()
    if forced == "interpret":
        return "interpret"
    if forced in ("1", "on", "force"):
        return "flash"
    return "flash" if backend not in ("cpu",) else None


# Env-knob tests clear the pick cache through the public name.
_flash_mode.cache_clear = _flash_mode_for.cache_clear  # type: ignore[attr-defined]


@functools.lru_cache(None)
def _s8_default() -> bool:
    """Whether the flash kernel quantizes QK^T to s8 x s8 (per-row q scales,
    per-tile mean-centered k scale — ops/flash_pallas.py). The default is
    the measured-best setting per BENCH.md round 4 (adopt-or-reject A/B on
    the q8t north-star step); DIFFUSION_RS_TPU_ATTN_S8=0/1 overrides."""
    env = os.environ.get("DIFFUSION_RS_TPU_ATTN_S8", "").lower()
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "force", "true"):
        return True
    return _S8_MEASURED_DEFAULT


# Set from the round-4 on-chip A/B (BENCH.md r4): kernel-level the s8 QK^T is
# ~parity (K=head_dim=128 is pipeline-latency-bound, so int8's 2x MXU peak
# doesn't bite), and the _quantize_k prepass adds step time — the bf16 kernel
# stays the default; s8 remains available (DIFFUSION_RS_TPU_ATTN_S8=1) for
# shapes where QK^T is MAC-bound (longer head dims / kv lengths).
_S8_MEASURED_DEFAULT = False


@functools.lru_cache(None)
def _s8_pv_default() -> bool:
    """Whether the flash kernel runs P.V as s8 x s8 (in-kernel p quantize at
    the exact [0,1] range, mean-centered int8 v from an XLA prepass —
    ops/flash_pallas.py). Unlike QK^T, the P.V contraction runs over
    block_k, so the int8 MXU rate applies. Default is the measured
    adopt-or-reject verdict (BENCH.md r4); DIFFUSION_RS_TPU_ATTN_S8PV=0/1
    overrides."""
    env = os.environ.get("DIFFUSION_RS_TPU_ATTN_S8PV", "").lower()
    if env in ("0", "off", "false"):
        return False
    if env in ("1", "on", "force", "true"):
        return True
    return _S8PV_MEASURED_DEFAULT


# Set from the round-5 on-chip A/B (BENCH.md r5): kernel-level s8_pv runs
# 63-65 vs bf16's 78 TFLOP/s and the north-star step regresses 437 -> 474 ms
# (+8.5%). The int8 MXU rate never bites: P.V's output dim is N = head_dim
# = 128 (one MXU tile wide), and the in-kernel f32->int8 quantize pass +
# int32 plumbing cost more than the halved v DMA saves — folding the x127
# scale into the exp argument (zero-cost quantize multiply) measured the
# same 63.3, pinning the cost on the cast/int8 data path, not the quantize
# arithmetic. REJECTED as default; stays available (accuracy-hardened with
# the per-block p scale) for parts with wider MXU int8 tiles.
_S8PV_MEASURED_DEFAULT = False


@functools.lru_cache(None)
def _merged_default() -> bool:
    """Whether sdpa_merged uses the kernel's seq-major output write
    (out_seqmajor) instead of bhsd + transpose. DIFFUSION_RS_TPU_ATTN_MERGED=0
    restores the round-3 transpose path (A/B ablation knob)."""
    env = os.environ.get("DIFFUSION_RS_TPU_ATTN_MERGED", "").lower()
    return env not in ("0", "off", "false")


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    softcap: Optional[float] = None,
    impl: Optional[str] = None,
    s8: Optional[bool] = None,
    s8_pv: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching SDPA. ``impl`` in {None (auto), "flash", "interpret",
    "xla"}; ``s8`` (None = env default) quantizes QK^T to int8 in-kernel;
    ``s8_pv`` (None = env default) runs P.V as s8 x s8."""
    if impl is None:
        mode = _flash_mode()
        impl = mode if (mode and bias is None and softcap is None) else "xla"
    if impl in ("flash", "interpret"):
        from .flash_pallas import flash_attention

        if s8 is None:
            s8 = _s8_default()
        if s8_pv is None:
            s8_pv = _s8_pv_default()
        try:
            return flash_attention(
                q, k, v, scale=scale, interpret=(impl == "interpret"), s8=s8,
                s8_pv=s8_pv,
            )
        except NotImplementedError:
            pass
    return sdpa_xla(q, k, v, scale=scale, bias=bias, softcap=softcap)


def sdpa_merged(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    s8: Optional[bool] = None,
    s8_pv: Optional[bool] = None,
) -> jnp.ndarray:
    """SDPA returning the head-MERGED layout: [B, H, S, D] -> [B, S, H*D].

    On the flash path the kernel writes each head's output block straight
    into its column slice of [B, S, H*D] (out_seqmajor), removing the
    transpose+reshape that followed attention in every FLUX block — profiled
    at 15.1% of the q8t step as "data formatting" (BENCH.md r3). The XLA
    fallback keeps the explicit transpose (CPU tests / bias paths).
    """
    if impl is None:
        impl = _flash_mode() or "xla"
    if impl in ("flash", "interpret"):
        from .flash_pallas import flash_attention

        if s8 is None:
            s8 = _s8_default()
        if s8_pv is None:
            s8_pv = _s8_pv_default()
        if _merged_default():
            try:
                return flash_attention(
                    q, k, v, scale=scale, interpret=(impl == "interpret"),
                    s8=s8, out_seqmajor=True, s8_pv=s8_pv,
                )
            except NotImplementedError:
                pass
        x = sdpa(q, k, v, scale=scale, impl=impl, s8=s8, s8_pv=s8_pv)
    else:
        x = sdpa_xla(q, k, v, scale=scale)
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
