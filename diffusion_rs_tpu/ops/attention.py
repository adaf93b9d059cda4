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


@functools.lru_cache(None)
def _flash_mode() -> Optional[str]:
    """None (XLA path), "flash" (Pallas kernel), or "interpret" (Pallas in
    interpreter mode — lets CPU-mesh tests drive the kernel + its GSPMD/ring
    rules without hardware). DIFFUSION_RS_TPU_FLASH=interpret|force overrides
    the backend auto-pick; DIFFUSION_RS_TPU_NO_FLASH disables."""
    if os.environ.get("DIFFUSION_RS_TPU_NO_FLASH"):
        return None
    forced = os.environ.get("DIFFUSION_RS_TPU_FLASH", "").lower()
    if forced == "interpret":
        return "interpret"
    if forced in ("1", "on", "force"):
        return "flash"
    return "flash" if jax.default_backend() not in ("cpu",) else None


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    softcap: Optional[float] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Dispatching SDPA. ``impl`` in {None (auto), "flash", "interpret",
    "xla"}."""
    if impl is None:
        mode = _flash_mode()
        impl = mode if (mode and bias is None and softcap is None) else "xla"
    if impl in ("flash", "interpret"):
        from .flash_pallas import flash_attention

        try:
            return flash_attention(
                q, k, v, scale=scale, interpret=(impl == "interpret")
            )
        except NotImplementedError:
            pass
    return sdpa_xla(q, k, v, scale=scale, bias=bias, softcap=softcap)
