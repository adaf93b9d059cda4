"""Canonical quantized-tensor representation for the TPU runtime.

Design
------
The reference keeps every source quantization format (bitsandbytes nf4/fp4/int8,
GGUF Q2K..Q8_0) in its original byte layout and dequantizes on the fly
(diffusion_rs_backend/src/bitsandbytes/mod.rs:285-312,
 diffusion_rs_common/src/core/quantized/k_quants.rs). That is the right call for
CPU/CUDA where the kernels are hand-written per format — but on TPU we want ONE
family of Pallas dequant-matmul kernels, fed by a layout chosen for the MXU/VPU:

* weights are stored K-major, ``[K, N]`` (input-features x output-features) so
  ``y = x @ w`` tiles directly onto the MXU with no transpose;
* 4-bit formats are nibble-packed **split-block** style: for each SPLIT-long run
  of k-indices, the low nibbles of ``packed[kb : kb + SPLIT//2, :]`` hold
  elements ``kb .. kb+SPLIT//2`` and the high nibbles hold
  ``kb+SPLIT//2 .. kb+SPLIT``.  A kernel whose K-tile equals SPLIT unpacks a
  tile with two vector ops and one concat — no sub-lane interleaving;
* per-group scale/bias are dense ``[K//group, N]`` arrays (f32), so applying
  them is a broadcast, not a gather;
* codebook formats (nf4/fp4) carry their 16-entry table; affine formats fold
  everything into ``w = q * scale + bias`` (e.g. GGUF Q4_0's ``(q-8)*d``
  becomes ``scale=d, bias=-8d``; Q4K's ``d*sc*q - dmin*m`` becomes
  ``scale=d*sc, bias=-dmin*m``).

Every source format is repacked into this layout ONCE at load time; after that
the runtime only ever sees `QuantizedTensor`.  This is the moral equivalent of
the reference's ``QMatMul``/``BnbLinear`` split collapsing into a single
``QuantMethod`` (diffusion_rs_backend/src/lib.rs:152-189).

Carriers:
* ``bits==4``:  packed uint8 ``[K//2, N]`` (two k-elements per byte, see above)
* ``bits==8``:  int8 ``[K, N]`` (covers GGUF Q8_0, bnb int8, and the 5/6-bit
  k-quants after widening)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Largest split-block we use; kernels use a K-tile equal to the per-tensor
# split, which is min(SPLIT_MAX, K) (all model dims divide 256 or are <=256).
SPLIT_MAX = 256


def choose_split(k: int) -> int:
    for s in (SPLIT_MAX, 128, 64, 32, 16, 8, 4, 2):
        if k % s == 0:
            return s
    return k


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("packed", "scale", "bias", "codebook"),
    meta_fields=("kind", "bits", "group", "split", "shape", "out_dtype"),
)
@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """A quantized 2-D weight ``[K, N]`` in the canonical TPU layout."""

    packed: jax.Array  # u8 [K//2, N] (4-bit) or i8 [K, N] (8-bit). May carry
    #                    leading stack dims [L, ...] when blocks are scanned.
    scale: jax.Array  # f32 [K//group, N]
    bias: Optional[jax.Array]  # f32 [K//group, N] or None (=> 0)
    codebook: Optional[jax.Array]  # f32 [16] for nf4/fp4, else None
    kind: str  # source format tag, e.g. "nf4", "q4_0", "q8_0", "int8"
    bits: int  # 4 or 8
    group: int  # scale group size along K (K for whole-column, bnb int8)
    split: int  # nibble split-block length along K (4-bit only)
    shape: tuple  # logical (K, N)
    out_dtype: str  # dtype the dequantized weight should be produced in

    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def n(self) -> int:
        return self.shape[1]

    def nbytes(self) -> int:
        tot = self.packed.size * self.packed.dtype.itemsize
        tot += self.scale.size * self.scale.dtype.itemsize
        if self.bias is not None:
            tot += self.bias.size * self.bias.dtype.itemsize
        if self.codebook is not None:
            tot += self.codebook.size * self.codebook.dtype.itemsize
        return tot


# ---------------------------------------------------------------------------
# Packing helpers (numpy, load-time only)
# ---------------------------------------------------------------------------


def pack4(q: np.ndarray, split: int) -> np.ndarray:
    """Nibble-pack uint4 values ``q [K, N]`` into ``[K//2, N]`` split-block layout."""
    k, n = q.shape
    if split % 2 != 0 or k % split != 0:
        raise ValueError(f"K={k} not divisible by even split={split}")
    q = q.reshape(k // split, split, n)
    lo = q[:, : split // 2, :]
    hi = q[:, split // 2 :, :]
    packed = (lo.astype(np.uint8) & 0xF) | ((hi.astype(np.uint8) & 0xF) << 4)
    return packed.reshape(k // 2, n)


def unpack4_np(packed: np.ndarray, split: int) -> np.ndarray:
    """Inverse of :func:`pack4` (numpy, for tests)."""
    k2, n = packed.shape
    k = k2 * 2
    p = packed.reshape(k // split, split // 2, n)
    lo = p & 0xF
    hi = p >> 4
    return np.concatenate([lo, hi], axis=1).reshape(k, n)


def unpack4_jnp(packed: jax.Array, split: int) -> jax.Array:
    """Unpack the canonical 4-bit layout with jnp ops (XLA fallback path)."""
    k2, n = packed.shape[-2:]
    lead = packed.shape[:-2]
    k = k2 * 2
    p = packed.reshape(lead + (k // split, split // 2, n))
    lo = p & 0xF
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=-2).reshape(lead + (k, n))


# ---------------------------------------------------------------------------
# Dequantize (XLA reference path; the Pallas kernels fuse the same math)
# ---------------------------------------------------------------------------


def dequantize(qt: QuantizedTensor, dtype=None) -> jax.Array:
    """Materialize the full weight ``[K, N]``.

    Mirrors the semantics of the reference's ``QuantMethod::dequantize_w``
    (diffusion_rs_backend/src/lib.rs:171) for every canonicalized format.
    Supports leading stack dims on the data arrays (scanned blocks).
    """
    dtype = dtype or qt.out_dtype
    k, n = qt.shape[-2], qt.shape[-1]
    if qt.bits == 4:
        q = unpack4_jnp(qt.packed, qt.split)
    else:
        q = qt.packed
    lead = q.shape[:-2]
    if qt.codebook is not None:
        w = qt.codebook[q.astype(jnp.int32)]
    else:
        w = q.astype(jnp.float32)
    groups = k // qt.group
    w = w.reshape(lead + (groups, qt.group, n))
    scale = qt.scale.reshape(lead + (groups, 1, n))
    w = w * scale
    if qt.bias is not None:
        w = w + qt.bias.reshape(lead + (groups, 1, n))
    return w.reshape(lead + (k, n)).astype(dtype)


def dequantize_np(qt: QuantizedTensor) -> "np.ndarray":
    """Host-side (numpy, f32) :func:`dequantize` — identical math, used by
    load-time transforms (ISQ requantization) so nothing round-trips through
    the accelerator. Supports leading stack dims like the jnp version."""
    import numpy as np

    k, n = qt.shape[-2], qt.shape[-1]
    packed = np.asarray(jax.device_get(qt.packed))
    lead = packed.shape[:-2]
    if qt.bits == 4:
        q = unpack4_np(packed.reshape(-1, n), qt.split).reshape(lead + (k, n))
    else:
        q = packed
    if qt.codebook is not None:
        cb = np.asarray(jax.device_get(qt.codebook), np.float32)
        if cb.ndim == 2:  # stacked codebook [L, 16]
            w = np.stack([cb[i][q[i].astype(np.int64)] for i in range(len(cb))])
        else:
            w = cb[q.astype(np.int64)]
    else:
        w = q.astype(np.float32)
    groups = k // qt.group
    w = w.reshape(lead + (groups, qt.group, n))
    scale = np.asarray(jax.device_get(qt.scale), np.float32)
    w = w * scale.reshape(lead + (groups, 1, n))
    if qt.bias is not None:
        bias = np.asarray(jax.device_get(qt.bias), np.float32)
        w = w + bias.reshape(lead + (groups, 1, n))
    return w.reshape(lead + (k, n)).astype(np.float32)


def slice_n(qt: "QuantizedTensor", start: int, end: int) -> "QuantizedTensor":
    """Slice a canonical tensor along the OUT-feature (N) axis — exact, every
    plane is column-independent (inverse of :func:`concat_n`; used e.g. to
    reorder BFL fused projections into the diffusers layout)."""
    return QuantizedTensor(
        packed=qt.packed[..., start:end],
        scale=qt.scale[..., start:end],
        bias=None if qt.bias is None else qt.bias[..., start:end],
        codebook=qt.codebook,
        kind=qt.kind,
        bits=qt.bits,
        group=qt.group,
        split=qt.split,
        shape=qt.shape[:-1] + (end - start,),
        out_dtype=qt.out_dtype,
    )


def permute_n(qt: "QuantizedTensor", idx) -> "QuantizedTensor":
    """Reorder a canonical tensor's OUT-feature (N) columns by ``idx`` —
    exact (every plane is column-independent), like :func:`slice_n`. Used by
    the RoPE half-split weight permutation (models/optimize.py)."""
    import numpy as np

    idx = np.asarray(idx)
    return QuantizedTensor(
        packed=qt.packed[..., idx],
        scale=qt.scale[..., idx],
        bias=None if qt.bias is None else qt.bias[..., idx],
        codebook=qt.codebook,
        kind=qt.kind,
        bits=qt.bits,
        group=qt.group,
        split=qt.split,
        shape=qt.shape,
        out_dtype=qt.out_dtype,
    )


def concat_n(tensors) -> "QuantizedTensor":
    """Concatenate canonical tensors along the OUT-feature (N) axis.

    Exact: every plane (packed/scale/bias) is column-independent in the
    canonical layout, so fusing linears (e.g. q|k|v -> qkv) is a pure layout
    transform. All meta fields must agree.
    """
    first = tensors[0]
    for t in tensors[1:]:
        if (t.kind, t.bits, t.group, t.split, t.k, t.out_dtype) != (
            first.kind, first.bits, first.group, first.split, first.k,
            first.out_dtype,
        ):
            raise ValueError("concat_n requires identical quantization meta")
    packed = jnp.concatenate([t.packed for t in tensors], axis=-1)
    scale = jnp.concatenate([t.scale for t in tensors], axis=-1)
    bias = (
        jnp.concatenate([t.bias for t in tensors], axis=-1)
        if first.bias is not None else None
    )
    n_total = sum(t.n for t in tensors)
    return QuantizedTensor(
        packed=packed,
        scale=scale,
        bias=bias,
        codebook=first.codebook,
        kind=first.kind,
        bits=first.bits,
        group=first.group,
        split=first.split,
        shape=(first.k, n_total),
        out_dtype=first.out_dtype,
    )


# ---------------------------------------------------------------------------
# Simple quantizers (numpy; used by tests, ISQ, and random-weight benches)
# ---------------------------------------------------------------------------


def quantize_q4_0(w: np.ndarray) -> QuantizedTensor:
    """GGUF Q4_0-equivalent: 32-wide groups, symmetric 4-bit.

    Reference math: k_quants.rs BlockQ4_0::from_float — d = absmax/-8,
    q = clamp(round(w/d + 8.5 - 0.5)...) ; we use round-to-nearest of w/d + 8.
    """
    k, n = w.shape
    g = 32
    wf = w.astype(np.float32).reshape(k // g, g, n)
    absmax_idx = np.abs(wf).argmax(axis=1, keepdims=True)
    maxval = np.take_along_axis(wf, absmax_idx, axis=1)  # signed value at absmax
    d = maxval / -8.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.clip(np.floor(wf * inv_d + 8.5), 0, 15).astype(np.uint8)
    q = q.reshape(k, n)
    split = choose_split(k)
    return QuantizedTensor(
        packed=jnp.asarray(pack4(q, split)),
        scale=jnp.asarray(d.reshape(k // g, n).astype(np.float32)),
        bias=jnp.asarray((d.reshape(k // g, n) * -8.0).astype(np.float32)),
        codebook=None,
        kind="q4_0",
        bits=4,
        group=g,
        split=split,
        shape=(k, n),
        out_dtype="bfloat16",
    )


def quantize_q8_tile(w: np.ndarray, tile: int = SPLIT_MAX) -> QuantizedTensor:
    """TPU-native int8 execution format ("q8t"): symmetric int8 with ONE
    scale per (K-tile, column) — the scale group equals the kernel's K-tile,
    which is what lets the fused kernel run the contraction on the MXU's
    int8 path (s8 x s8 -> i32) with a single rescale per tile (GGUF's 32-wide
    groups cross tile boundaries and would force shallow 32-deep dots).
    Quality sits between q8_0 (g32) and whole-column int8."""
    k, n = w.shape
    g = min(tile, k)
    if k % g:
        raise ValueError(f"K={k} not divisible by tile={g}")
    wf = w.astype(np.float32).reshape(k // g, g, n)
    amax = np.abs(wf).max(axis=1, keepdims=True)
    d = amax / 127.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.clip(np.round(wf * inv_d), -127, 127).astype(np.int8)
    return QuantizedTensor(
        packed=jnp.asarray(q.reshape(k, n)),
        scale=jnp.asarray(d.reshape(k // g, n).astype(np.float32)),
        bias=None,
        codebook=None,
        kind="q8t",
        bits=8,
        group=g,
        split=choose_split(k),
        shape=(k, n),
        out_dtype="bfloat16",
    )


def quantize_q8_0(w: np.ndarray) -> QuantizedTensor:
    """GGUF Q8_0-equivalent: 32-wide groups, symmetric int8."""
    k, n = w.shape
    g = 32
    wf = w.astype(np.float32).reshape(k // g, g, n)
    amax = np.abs(wf).max(axis=1, keepdims=True)
    d = amax / 127.0
    inv_d = np.where(d != 0.0, 1.0 / np.where(d == 0.0, 1.0, d), 0.0)
    q = np.clip(np.round(wf * inv_d), -128, 127).astype(np.int8)
    return QuantizedTensor(
        packed=jnp.asarray(q.reshape(k, n)),
        scale=jnp.asarray(d.reshape(k // g, n).astype(np.float32)),
        bias=None,
        codebook=None,
        kind="q8_0",
        bits=8,
        group=g,
        split=choose_split(k),
        shape=(k, n),
        out_dtype="bfloat16",
    )
