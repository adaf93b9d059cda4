"""Linear layer over dense or quantized weights.

The TPU equivalent of the reference's ``QuantMethod`` trait
(diffusion_rs_backend/src/lib.rs:152-189): one call site
(:func:`linear`) serves UnquantLinear, BnbLinear and GgufMatMul alike.
Instead of a trait object, the weight *pytree leaf type* selects the path:

* ``jax.Array``  -> dense matmul (cuBLASLt equivalent: plain XLA dot, which
  fuses the bias add into the matmul epilogue on TPU);
* ``QuantizedTensor`` -> fused Pallas dequant-matmul (weights stay packed in
  HBM), or an XLA dequantize+dot fallback on CPU / unsupported tilings.

``forward_autocast`` semantics (lib.rs:161-169: cast activation to the
quantized act type and back) collapse here: activations stay bf16, the MXU
accumulates in f32, and dequantization happens in f32 inside the kernel.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor, dequantize
from .qmatmul_pallas import quantized_matmul, supports


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("w", "b", "lora"),
    meta_fields=(),
)
@dataclasses.dataclass
class Linear:
    """Weight ``[K, N]`` (K-major — input features first) + optional bias.

    ``lora``: optional low-rank adapter ``(a [.., K, r], bl [.., r, N])``
    applied at runtime as ``y += (x @ a) @ bl`` (the LoRA scale alpha/r is
    folded into ``bl`` at load time). Used for quantized base weights,
    where fusing the delta would require requantization; dense weights get
    LoRA deltas fused directly (io/lora.py)."""

    w: Union[jax.Array, QuantizedTensor]
    b: Optional[jax.Array] = None
    lora: Optional[tuple] = None

    @property
    def in_features(self) -> int:
        return self.w.shape[-2] if isinstance(self.w, jax.Array) else self.w.k

    @property
    def out_features(self) -> int:
        return self.w.shape[-1] if isinstance(self.w, jax.Array) else self.w.n


@functools.lru_cache(None)
def _qmm_mode():
    """None (XLA dequant+dot), "flash" (Pallas kernel) or "interpret" (Pallas
    interpreter — CPU-mesh tests). DIFFUSION_RS_TPU_QMM=interpret|force
    overrides the backend auto-pick; DIFFUSION_RS_TPU_NO_QMM disables."""
    if os.environ.get("DIFFUSION_RS_TPU_NO_QMM"):
        return None
    forced = os.environ.get("DIFFUSION_RS_TPU_QMM", "").lower()
    if forced == "interpret":
        return "interpret"
    if forced in ("1", "on", "force"):
        return "flash"
    return "flash" if jax.default_backend() not in ("cpu",) else None


def linear(x: jnp.ndarray, lin: Linear) -> jnp.ndarray:
    """``y = x @ w + b`` with automatic quantized dispatch. x: [..., K]."""
    w = lin.w
    if isinstance(w, QuantizedTensor):
        mode = _qmm_mode()
        if mode and supports(w):
            y = quantized_matmul(x, w, interpret=(mode == "interpret"))
        else:
            wd = dequantize(w, x.dtype)
            y = jnp.matmul(x, wd, preferred_element_type=jnp.float32).astype(
                x.dtype
            )
    else:
        y = jnp.matmul(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if lin.lora is not None:
        a, bl = lin.lora
        y = y + jnp.matmul(
            jnp.matmul(x, a.astype(x.dtype)),
            bl.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if lin.b is not None:
        y = y + lin.b
    return y


def linear_grouped(xs, lins):
    """``[linear(x_g, lin_g) for g]`` through ONE kernel launch when every
    group's weight is a same-format QuantizedTensor (grouped Pallas call —
    each m-tile selects its group's weight plane; see
    qmatmul_pallas.quantized_matmul_grouped). FLUX double blocks run their
    txt-stream projections at M = 512·batch, where a standalone call reaches
    ~24% of the img stream's rate (BENCH.md r5) — grouping rides the txt
    rows on the img call's grid. Falls back to per-group :func:`linear`
    whenever the grouped kernel doesn't apply (dense weights, LoRA terms,
    format mismatch, CPU backend)."""
    mode = _qmm_mode()
    ws = [l.w for l in lins]
    if (
        mode is None
        or not all(isinstance(w, QuantizedTensor) for w in ws)
        or any(l.lora is not None for l in lins)
    ):
        return [linear(x, l) for x, l in zip(xs, lins)]
    from .qmatmul_pallas import quantized_matmul_grouped

    ys = quantized_matmul_grouped(xs, ws, interpret=(mode == "interpret"))
    return [y if l.b is None else y + l.b for y, l in zip(ys, lins)]


def make_linear(
    w, b=None, transpose: bool = False, dtype=jnp.bfloat16
) -> Linear:
    """Build a Linear from a host array. ``transpose=True`` accepts torch's
    ``[out, in]`` layout and stores K-major."""
    import numpy as np

    if isinstance(w, QuantizedTensor):
        return Linear(w=w, b=None if b is None else jnp.asarray(b, dtype))
    w = np.asarray(w)
    if transpose:
        w = np.ascontiguousarray(w.T)
    return Linear(
        w=jnp.asarray(w, dtype),
        b=None if b is None else jnp.asarray(b, dtype),
    )
