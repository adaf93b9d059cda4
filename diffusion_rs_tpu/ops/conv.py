"""Convolution helpers (VAE path).

The reference lowers conv through im2col CUDA kernels / cuDNN
(cuda_kernels/conv.cu, core/cuda_backend). On TPU, XLA's conv emitter tiles
convs onto the MXU directly — the only design decision left to us is layout:
NHWC activations + HWIO filters are the native TPU layouts (channels on the
lane dim), so the whole VAE runs channels-last and converts at the pipeline
boundary only.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("w", "b"),
    meta_fields=(),
)
@dataclass
class Conv:
    """Filter HWIO + optional bias."""

    w: jax.Array
    b: Optional[jax.Array] = None


def conv2d(
    x: jnp.ndarray,
    conv: Conv,
    stride: int = 1,
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
) -> jnp.ndarray:
    """NHWC conv. ``padding`` is ((top, bottom), (left, right))."""
    y = jax.lax.conv_general_dilated(
        x,
        conv.w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if conv.b is not None:
        y = y + conv.b.astype(x.dtype)
    return y


def make_conv(w_torch, b=None, dtype=jnp.bfloat16) -> Conv:
    """torch OIHW -> HWIO."""
    import numpy as np

    w = np.asarray(w_torch)
    if w.ndim != 4:
        raise ValueError(f"expected 4-D conv filter, got {w.shape}")
    w = np.ascontiguousarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    return Conv(
        w=jnp.asarray(w, dtype),
        b=None if b is None else jnp.asarray(np.asarray(b), dtype),
    )


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC nearest-neighbour 2x (vae.rs:218-229 upsample_nearest2d)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
