"""Legacy (pre-GGUF) GGML container reader.

Reference behavior: diffusion_rs_common/src/core/quantized/ggml_file.rs —
the old llama.cpp single-file format: a magic ("ggml" unversioned, "ggmf" or
"ggjt" + u32 version), llama hyperparameters, an inline vocab, then raw
tensor records (n_dims, name_len, dtype, dims innermost-first, name bytes,
data — 32-byte aligned for ggjt) until EOF.

Tensors are exposed with the same `GgufTensorInfo` view API as the GGUF
reader so quant/gguf_quants.py canonicalizes both identically.
"""

from __future__ import annotations

import mmap
import struct
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from .gguf import GGML_TYPES, GgufTensorInfo

MAGIC_GGML = 0x67676D6C  # unversioned
MAGIC_GGMF = 0x67676D66  # versioned (v1)
MAGIC_GGJT = 0x67676A74  # versioned (v1-3), 32-byte aligned tensor data


@dataclass(frozen=True)
class GgmlHParams:
    """Llama hyperparameters baked into the container (ggml_file.rs)."""

    n_vocab: int
    n_embd: int
    n_mult: int
    n_head: int
    n_layer: int
    n_rot: int
    ftype: int


class GgmlFile:
    """Read-only mmap view over a legacy .ggml/.ggmf/.ggjt file."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._mmap = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        buf = self._mmap
        pos = 0

        def read(fmt: str):
            nonlocal pos
            vals = struct.unpack_from("<" + fmt, buf, pos)
            pos += struct.calcsize("<" + fmt)
            return vals if len(vals) > 1 else vals[0]

        magic = read("I")
        if magic not in (MAGIC_GGML, MAGIC_GGMF, MAGIC_GGJT):
            raise ValueError(f"not a legacy GGML file: magic {magic:#x}")
        self.magic = magic
        self.version = 0 if magic == MAGIC_GGML else read("I")
        if magic == MAGIC_GGMF and self.version != 1:
            raise ValueError(f"unsupported ggmf version {self.version}")
        if magic == MAGIC_GGJT and self.version not in (1, 2, 3):
            raise ValueError(f"unsupported ggjt version {self.version}")

        self.hparams = GgmlHParams(*read("7I"))
        # vocab: (len, bytes[, score]) x n_vocab; unversioned has no scores
        scored = magic != MAGIC_GGML
        vocab: List[Tuple[bytes, float]] = []
        for _ in range(self.hparams.n_vocab):
            n = read("I")
            tok = bytes(memoryview(buf)[pos:pos + n])
            pos += n
            score = read("f") if scored else 0.0
            vocab.append((tok, score))
        self.vocab = vocab

        # tensor records until EOF
        self.tensors: Dict[str, GgufTensorInfo] = {}
        total = len(buf)
        while pos < total:
            n_dims = read("I")
            name_len = read("I")
            ggml_ty = read("I")
            dims = [read("I") for _ in range(n_dims)]
            name = bytes(memoryview(buf)[pos:pos + name_len]).decode(
                "utf-8", errors="replace"
            )
            pos += name_len
            if magic == MAGIC_GGJT:
                pos = (pos + 31) // 32 * 32
            if ggml_ty not in GGML_TYPES:
                raise ValueError(f"unsupported ggml dtype {ggml_ty} for {name}")
            fmt, be, bb = GGML_TYPES[ggml_ty]
            shape = tuple(reversed(dims))  # innermost-first -> torch order
            n_elems = int(np.prod(shape)) if shape else 1
            if n_elems % be != 0:
                raise ValueError(f"{name}: {n_elems} elems not /{be} blocks")
            nbytes = n_elems // be * bb
            self.tensors[name] = GgufTensorInfo(name, shape, fmt, pos, nbytes)
            pos += nbytes

    def __contains__(self, name):
        return name in self.tensors

    def keys(self):
        return self.tensors.keys()

    def raw(self, name: str) -> np.ndarray:
        ti = self.tensors[name]
        return np.frombuffer(
            memoryview(self._mmap)[ti.start:ti.start + ti.nbytes], np.uint8
        )

    def numpy(self, name: str) -> np.ndarray:
        """Dense tensors only — quantized ones canonicalize via
        quant/gguf_quants.gguf_to_canonical on raw()."""
        ti = self.tensors[name]
        import ml_dtypes

        dense = {
            "f32": np.float32, "f16": np.float16, "f64": np.float64,
            "i8": np.int8, "i16": np.int16, "i32": np.int32, "i64": np.int64,
            "bf16": ml_dtypes.bfloat16,
        }
        if ti.fmt not in dense:
            raise ValueError(f"{name} is quantized ({ti.fmt}); use raw()")
        return self.raw(name).view(dense[ti.fmt]).reshape(ti.shape)


def write_ggml(
    path: str,
    tensors: Dict[str, tuple],
    hparams: GgmlHParams | None = None,
    vocab: List[Tuple[bytes, float]] | None = None,
    magic: int = MAGIC_GGJT,
    version: int = 3,
):
    """Minimal legacy-GGML writer (tests / format round-trips).
    ``tensors`` maps name -> (fmt, shape, raw_bytes)."""
    name_to_tid = {v[0]: k for k, v in GGML_TYPES.items()}
    vocab = vocab or []
    hparams = hparams or GgmlHParams(len(vocab), 0, 0, 0, 0, 0, 0)
    parts = [struct.pack("<I", magic)]
    if magic != MAGIC_GGML:
        parts.append(struct.pack("<I", version))
    parts.append(struct.pack("<7I", *(
        getattr(hparams, f) for f in
        ("n_vocab", "n_embd", "n_mult", "n_head", "n_layer", "n_rot", "ftype")
    )))
    for tok, score in vocab:
        parts.append(struct.pack("<I", len(tok)))
        parts.append(tok)
        if magic != MAGIC_GGML:
            parts.append(struct.pack("<f", score))
    pos = sum(len(p) for p in parts)
    for name, (fmt, shape, raw) in tensors.items():
        nb = name.encode("utf-8")
        dims = list(reversed(shape))
        parts.append(struct.pack("<III", len(dims), len(nb), name_to_tid[fmt]))
        parts.append(struct.pack(f"<{len(dims)}I", *dims))
        parts.append(nb)
        pos += 12 + 4 * len(dims) + len(nb)
        if magic == MAGIC_GGJT:
            pad = (pos + 31) // 32 * 32 - pos
            parts.append(b"\0" * pad)
            pos += pad
        raw = bytes(raw)
        parts.append(raw)
        pos += len(raw)
    with open(path, "wb") as f:
        f.write(b"".join(parts))
