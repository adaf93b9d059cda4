"""bitsandbytes nf4 / fp4 / int8 support.

Semantics follow the reference's CUDA kernel (the authoritative path,
diffusion_rs_backend/kernels/bitsandbytes/dequant.cu:95-160) and quant-state
parsing (diffusion_rs_backend/src/bitsandbytes/mod.rs:96-262):

* 4-bit: byte ``i`` holds element ``2i`` in the HIGH nibble and ``2i+1`` in the
  LOW nibble; element ``e`` uses ``absmax[e // blocksize]``; the absmax itself
  may be "nested" (double) quantized: u8 codes into a 256-entry codebook with
  its own blockwise absmax, plus a global offset.
* int8: ``w[row, col] = q[row, col] * SCB[row] / 127`` (per-output-row scales,
  diffusion_rs_backend/src/bitsandbytes/op.rs:545-757).

Note: the reference's *CPU* nf4/fp4 fallback indexes absmax differently
(op.rs:190 ``absmax[block_idx / (blocksize/2)]`` while stepping ``blocksize``
bytes); that disagrees with its own CUDA kernel and with upstream
bitsandbytes. We implement the CUDA/bitsandbytes semantics.

Everything here is load-time host code (numpy) that repacks into the canonical
:class:`~diffusion_rs_tpu.quant.qtensor.QuantizedTensor` layout.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .qtensor import QuantizedTensor, choose_split, pack4

# 16-entry codebooks, indexed by the 4-bit code.
# Values match the reference trees at diffusion_rs_backend/src/bitsandbytes/op.rs:29-128
# (generated originally by bitsandbytes' test_normal_map_tree).
NF4_CODEBOOK = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)

_FP4_MAG = np.array(
    [0.0, 0.0052083333, 0.6666667, 1.0, 0.33333334, 0.5, 0.16666667, 0.25],
    dtype=np.float32,
)
# Bit 3 is the sign bit (op.rs:97).
FP4_CODEBOOK = np.concatenate([_FP4_MAG, -_FP4_MAG]).astype(np.float32)

CODEBOOKS = {"nf4": NF4_CODEBOOK, "fp4": FP4_CODEBOOK}


def unpack_bnb_nibbles(data: np.ndarray, n: int) -> np.ndarray:
    """u8 bytes -> flat u4 codes, element 2i = high nibble (dequant.cu:148-152)."""
    data = data.reshape(-1)
    out = np.empty(data.size * 2, dtype=np.uint8)
    out[0::2] = data >> 4
    out[1::2] = data & 0xF
    return out[:n]


def dequantize_blockwise_8bit(
    codes: np.ndarray, code: np.ndarray, absmax: np.ndarray, blocksize: int
) -> np.ndarray:
    """General 8-bit blockwise dequant: ``code[q[i]] * absmax[i//blocksize]``.

    Used for the nested (double-quantized) absmax
    (bitsandbytes/mod.rs:224-239 with quant_ty=Int8 recursion).
    """
    codes = codes.reshape(-1)
    vals = code.astype(np.float32)[codes]
    idx = np.arange(codes.size) // blocksize
    return vals * absmax.astype(np.float32)[idx]


def resolve_absmax(
    absmax: np.ndarray,
    nested_absmax: np.ndarray | None = None,
    nested_code: np.ndarray | None = None,
    nested_blocksize: int | None = None,
    offset: float | None = None,
) -> np.ndarray:
    """Resolve a possibly double-quantized absmax to plain f32.

    Mirrors BnbLinear::dequantize_4bit's nested branch
    (bitsandbytes/mod.rs:228-239): absmax = dequant_8bit(absmax) + offset.
    """
    if nested_absmax is None:
        return absmax.astype(np.float32)
    out = dequantize_blockwise_8bit(
        absmax.astype(np.uint8), nested_code, nested_absmax, nested_blocksize
    )
    return out + np.float32(offset)


def bnb4bit_to_canonical(
    weight_bytes: np.ndarray,
    absmax: np.ndarray,
    shape: tuple,
    blocksize: int,
    kind: str,
    out_dtype: str = "bfloat16",
) -> QuantizedTensor:
    """Repack a bnb 4-bit tensor (torch layout ``[out, in]`` row-major) into the
    canonical K-major split-block layout.

    ``absmax`` must already be resolved (see :func:`resolve_absmax`).
    """
    n_out, k_in = shape  # torch linear weight is [out_features, in_features]
    total = n_out * k_in
    q = unpack_bnb_nibbles(weight_bytes, total)  # flat, row-major [out, in]
    if k_in % blocksize != 0:
        # bnb blocks are over the flat buffer; when rows don't align with
        # blocks we cannot use a dense [K//g, N] scale — fall back to
        # materializing per-element scales is wasteful, so instead we require
        # alignment (all FLUX/T5/CLIP shapes satisfy this).
        raise ValueError(f"in_features {k_in} not divisible by blocksize {blocksize}")
    scale = absmax.astype(np.float32).reshape(n_out, k_in // blocksize)
    split = choose_split(k_in)
    # K-major canonical layout; one-pass native repack when available.
    packed = None
    try:
        from ..io.native import bnb_repack4, transpose_2d

        packed = bnb_repack4(weight_bytes, n_out, k_in, split)
        scaleT = transpose_2d(scale)
    except ImportError:  # pragma: no cover
        pass
    if packed is None:
        q = q.reshape(n_out, k_in)
        qT = np.ascontiguousarray(q.T)  # [K, N]
        scaleT = np.ascontiguousarray(scale.T)  # [K//g, N]
        packed = pack4(qT, split)
    return QuantizedTensor(
        packed=jnp.asarray(packed),
        scale=jnp.asarray(scaleT),
        bias=None,
        codebook=jnp.asarray(CODEBOOKS[kind]),
        kind=kind,
        bits=4,
        group=blocksize,
        split=split,
        shape=(k_in, n_out),
        out_dtype=out_dtype,
    )


def bnb_int8_to_canonical(
    weight_i8: np.ndarray, scb: np.ndarray, out_dtype: str = "bfloat16"
) -> QuantizedTensor:
    """bnb int8: w = q * SCB[row]/127 (op.rs:545-757). Per-output-row scale
    becomes a whole-column (group == K) scale in the K-major layout."""
    n_out, k_in = weight_i8.shape
    qT = np.ascontiguousarray(weight_i8.T)  # [K, N]
    scale = (scb.astype(np.float32) / 127.0).reshape(1, n_out)
    return QuantizedTensor(
        packed=jnp.asarray(qT),
        scale=jnp.asarray(scale),
        bias=None,
        codebook=None,
        kind="int8",
        bits=8,
        group=k_in,
        split=choose_split(k_in),
        shape=(k_in, n_out),
        out_dtype=out_dtype,
    )


# ---------------------------------------------------------------------------
# Quantizers (tests / ISQ / random-weight benches)
# ---------------------------------------------------------------------------


def quantize_4bit_bnb_layout(
    w: np.ndarray, blocksize: int = 64, kind: str = "nf4"
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize a torch-layout ``[out, in]`` weight into bnb's byte layout.

    Returns (packed_bytes, absmax). Codes are nearest-codebook-entry of
    w/absmax, matching bitsandbytes' quantize_4bit.
    """
    cb = CODEBOOKS[kind]
    flat = w.astype(np.float32).reshape(-1)
    pad = (-flat.size) % blocksize
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    safe = np.where(absmax == 0, 1.0, absmax)
    normed = blocks / safe[:, None]
    codes = np.abs(normed[..., None] - cb[None, None, :]).argmin(axis=-1)
    codes = codes.reshape(-1).astype(np.uint8)[: w.size]
    if codes.size % 2:
        codes = np.concatenate([codes, np.zeros(1, np.uint8)])
    packed = (codes[0::2] << 4) | codes[1::2]
    return packed, absmax[: (w.size + blocksize - 1) // blocksize]


def quantize_nf4(w: np.ndarray, blocksize: int = 64) -> QuantizedTensor:
    """Quantize ``[out, in]`` weight directly to a canonical nf4 tensor."""
    packed, absmax = quantize_4bit_bnb_layout(w, blocksize, "nf4")
    return bnb4bit_to_canonical(packed, absmax, w.shape, blocksize, "nf4")


def quantize_fp4(w: np.ndarray, blocksize: int = 64) -> QuantizedTensor:
    """Quantize ``[out, in]`` weight directly to a canonical fp4 tensor
    (bnb fp4 e2m1 codebook, op.rs:69-128)."""
    packed, absmax = quantize_4bit_bnb_layout(w, blocksize, "fp4")
    return bnb4bit_to_canonical(packed, absmax, w.shape, blocksize, "fp4")
