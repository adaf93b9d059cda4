"""Auto-dtype resolution.

The reference probes a 2x2 matmul per candidate dtype per device with
BF16 -> F16 -> F32 fallback and CUDA compute-capability gates
(diffusion_rs_core/src/util/auto_dtype.rs:12-161). Every TPU generation
supports bf16 natively on the MXU, so Auto == bf16 there; the probe is kept
for CPU/odd backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_auto_dtype() -> jnp.dtype:
    if jax.default_backend() in ("tpu", "axon"):
        return jnp.dtype(jnp.bfloat16)
    for dt in (jnp.bfloat16, jnp.float16, jnp.float32):
        try:
            a = jnp.ones((2, 2), dt)
            _ = jax.device_get(a @ a)
            return jnp.dtype(dt)
        except Exception:
            continue
    return jnp.dtype(jnp.float32)
