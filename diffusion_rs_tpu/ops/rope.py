"""FLUX 3-axis rotary position embedding.

Reference semantics (models/flux/model.rs:66-103, 124-157): per axis ``a``
with dim ``d_a`` (FLUX: axes_dim = [16, 56, 56], theta = 10000),

    inv_freq_i = theta^(-2i/d_a),  i = 0..d_a/2
    freqs      = pos * inv_freq
    rotation   = [[cos, -sin], [sin, cos]] applied to interleaved pairs
                 (x_2i, x_2i+1) of the head dim.

The per-axis (cos, sin) tables are concatenated along the frequency axis to
cover the full head_dim/2. The reference recomputes this every denoise step
(model.rs:807-810); here it is computed ONCE per generation and passed into
the scanned step (SURVEY.md §7 "hoist out of the scan").

We return dense (cos, sin) f32 arrays of shape [B, n, head_dim/2] rather than
the reference's stacked 2x2 rotation tensor — two broadcast multiplies on TPU
beat materializing the rotation matrix.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def rope_tables(
    ids: jnp.ndarray, axes_dim: Sequence[int], theta: int = 10000
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (cos, sin) tables for multi-axis position ids.

    ids: [B, n, n_axes] (float or int) — FLUX uses axis 0 = const 0,
    axis 1 = latent row, axis 2 = latent column (pipelines/flux/sampling.rs:35-46).
    Returns cos, sin: [B, n, sum(axes_dim)/2] float32.
    """
    ids = ids.astype(jnp.float32)
    coss, sins = [], []
    for ax, dim in enumerate(axes_dim):
        half = dim // 2
        exponent = jnp.arange(half, dtype=jnp.float32) * (2.0 / dim)
        inv_freq = jnp.power(jnp.float32(theta), -exponent)  # [half]
        freqs = ids[..., ax:ax + 1] * inv_freq  # [B, n, half]
        coss.append(jnp.cos(freqs))
        sins.append(jnp.sin(freqs))
    return jnp.concatenate(coss, axis=-1), jnp.concatenate(sins, axis=-1)


def apply_rope_halfsplit(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, seq_axis: int = 2
) -> jnp.ndarray:
    """Rotate HALF-SPLIT pairs (i, i + D/2) of the last dim.

    Mathematically identical to :func:`apply_rope` on inputs whose head dim
    was permuted 2i -> i, 2i+1 -> i + D/2 (models/optimize.py
    rope_halfsplit_permute applies that permutation to the q/k projection
    COLUMNS at load, which leaves q·k — and hence attention — unchanged).
    The half-split form is what the fused flash kernel implements: the pair
    partner sits a fixed 64-lane rotation away instead of in the adjacent
    lane, so the rotation vectorizes as two full-width multiplies
    (flash_pallas.py). x: [B, H, S, D] (``seq_axis=2``, the default) or
    [B, S, H, D] (``seq_axis=1``); cos/sin: [B, S, D/2]."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2:]
    if seq_axis == 2:
        c, sn = cos[:, None], sin[:, None]        # broadcast over H at axis 1
    else:
        c, sn = cos[:, :, None], sin[:, :, None]  # broadcast over H at axis 2
    out = jnp.concatenate([c * x1 - sn * x2, sn * x1 + c * x2], axis=-1)
    return out.astype(x.dtype)


def expand_rope_tables(
    cos: jnp.ndarray, sin: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) [B, S, D/2] -> full-width (ce, se) [B, S, D] f32 for the
    fused flash kernel: rotated = ce*x + se*halfroll(x) where
    halfroll swaps the two D/2 halves, ce = [cos | cos], se = [-sin | sin]."""
    ce = jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32)
    se = jnp.concatenate([-sin, sin], axis=-1).astype(jnp.float32)
    return ce, se


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate interleaved pairs of the last dim.

    x: [B, H, S, D]; cos/sin: [B, S, D/2] (broadcast over heads).
    out_2i   = cos*x_2i - sin*x_2i+1
    out_2i+1 = sin*x_2i + cos*x_2i+1
    Computed in f32 (the reference's attention path is f32 end-to-end,
    model.rs:40-50); cast back to x.dtype.
    """
    b, h, s, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, s, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[:, None, :, :]
    sn = sin[:, None, :, :]
    o0 = c * x0 - sn * x1
    o1 = sn * x0 + c * x1
    out = jnp.stack([o0, o1], axis=-1).reshape(b, h, s, d)
    return out.astype(x.dtype)
