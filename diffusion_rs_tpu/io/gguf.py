"""GGUF file reader (v1-v3).

Reference behavior: diffusion_rs_common/src/core/quantized/gguf_file.rs —
magic/version header, typed KV metadata, tensor infos (name, dims,
ggml dtype, offset), data section aligned to `general.alignment` (default
32). Tensors are exposed as raw-byte views plus (format, shape) so the
quant layer (quant/gguf_quants.py) can canonicalize them.
"""

from __future__ import annotations

import mmap
import struct
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian

# ggml_type id -> (name, block_elems, block_bytes); dense types map directly.
GGML_TYPES: Dict[int, Tuple[str, int, int]] = {
    0: ("f32", 1, 4),
    1: ("f16", 1, 2),
    2: ("q4_0", 32, 18),
    3: ("q4_1", 32, 20),
    6: ("q5_0", 32, 22),
    7: ("q5_1", 32, 24),
    8: ("q8_0", 32, 34),
    9: ("q8_1", 32, 36),
    10: ("q2_k", 256, 84),
    11: ("q3_k", 256, 110),
    12: ("q4_k", 256, 144),
    13: ("q5_k", 256, 176),
    14: ("q6_k", 256, 210),
    15: ("q8_k", 256, 292),
    24: ("i8", 1, 1),
    25: ("i16", 1, 2),
    26: ("i32", 1, 4),
    27: ("i64", 1, 8),
    28: ("f64", 1, 8),
    30: ("bf16", 1, 2),
}

_KV_READERS = {}


@dataclass(frozen=True)
class GgufTensorInfo:
    name: str
    shape: tuple  # logical row-major (torch order: [out, in] for matrices)
    fmt: str
    start: int
    nbytes: int


class _Reader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.buf, self.pos)
        self.pos += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def read_string(self, version: int) -> str:
        n = self.read("Q" if version >= 2 else "I")
        s = bytes(memoryview(self.buf)[self.pos : self.pos + n])
        self.pos += n
        return s.decode("utf-8", errors="replace")

    def read_value(self, ty: int, version: int) -> Any:
        simple = {
            0: "B", 1: "b", 2: "H", 3: "h", 4: "I", 5: "i", 6: "f",
            7: "?", 10: "Q", 11: "q", 12: "d",
        }
        if ty in simple:
            return self.read(simple[ty])
        if ty == 8:  # string
            return self.read_string(version)
        if ty == 9:  # array
            elem_ty = self.read("I")
            n = self.read("Q" if version >= 2 else "I")
            return [self.read_value(elem_ty, version) for _ in range(n)]
        raise ValueError(f"unknown gguf kv type {ty}")


class GgufFile:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            self._mmap = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        r = _Reader(self._mmap)
        magic = r.read("I")
        if magic != GGUF_MAGIC:
            raise ValueError(f"not a GGUF file: magic {magic:#x}")
        self.version = r.read("I")
        if self.version not in (1, 2, 3):
            raise ValueError(f"unsupported GGUF version {self.version}")
        cnt_fmt = "Q" if self.version >= 2 else "I"
        n_tensors = r.read(cnt_fmt)
        n_kv = r.read(cnt_fmt)
        self.metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = r.read_string(self.version)
            ty = r.read("I")
            self.metadata[key] = r.read_value(ty, self.version)
        infos = []
        for _ in range(n_tensors):
            name = r.read_string(self.version)
            n_dims = r.read("I")
            dims = [r.read(cnt_fmt) for _ in range(n_dims)]
            ggml_ty = r.read("I")
            offset = r.read("Q" if self.version >= 2 else "I")
            if ggml_ty not in GGML_TYPES:
                raise ValueError(f"unsupported ggml dtype {ggml_ty} for {name}")
            fmt, be, bb = GGML_TYPES[ggml_ty]
            # GGUF dims are innermost-first; logical torch order reverses.
            shape = tuple(reversed(dims))
            n_elems = int(np.prod(shape)) if shape else 1
            nbytes = n_elems // be * bb
            infos.append((name, shape, fmt, offset, nbytes))
        align = int(self.metadata.get("general.alignment", 32))
        data_start = (r.pos + align - 1) // align * align
        self.tensors: Dict[str, GgufTensorInfo] = {
            name: GgufTensorInfo(name, shape, fmt, data_start + off, nbytes)
            for (name, shape, fmt, off, nbytes) in infos
        }

    def __contains__(self, name):
        return name in self.tensors

    def keys(self):
        return self.tensors.keys()

    def raw(self, name: str) -> np.ndarray:
        ti = self.tensors[name]
        return np.frombuffer(
            memoryview(self._mmap)[ti.start : ti.start + ti.nbytes], np.uint8
        )

    def numpy(self, name: str) -> np.ndarray:
        """Dense tensors only — dequantize quantized ones via quant/gguf_quants."""
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


def write_gguf(path: str, tensors: Dict[str, tuple], metadata: Dict[str, Any] = None):
    """Minimal GGUF v3 writer (gguf_file.rs:491 equivalent) for tests/ISQ
    export. ``tensors`` maps name -> (fmt, shape, raw_bytes)."""
    name_to_tid = {v[0]: k for k, v in GGML_TYPES.items()}
    metadata = metadata or {}
    out = bytearray()
    out += struct.pack("<IIQQ", GGUF_MAGIC, 3, len(tensors), len(metadata))
    for k, v in metadata.items():
        kb = k.encode()
        out += struct.pack("<Q", len(kb)) + kb
        if isinstance(v, bool):
            out += struct.pack("<I?", 7, v)
        elif isinstance(v, int):
            out += struct.pack("<Iq", 11, v)
        elif isinstance(v, float):
            out += struct.pack("<Id", 12, v)
        elif isinstance(v, str):
            vb = v.encode()
            out += struct.pack("<IQ", 8, len(vb)) + vb
        else:
            raise ValueError(f"unsupported metadata type {type(v)}")
    offset = 0
    align = 32
    blobs = []
    for name, (fmt, shape, raw) in tensors.items():
        nb = name.encode()
        out += struct.pack("<Q", len(nb)) + nb
        dims = list(reversed(shape))
        out += struct.pack("<I", len(dims))
        for d in dims:
            out += struct.pack("<Q", d)
        out += struct.pack("<IQ", name_to_tid[fmt], offset)
        raw = bytes(raw)
        blobs.append(raw)
        offset += (len(raw) + align - 1) // align * align
    pad = (-len(out)) % align
    out += b"\x00" * pad
    for raw in blobs:
        out += raw
        out += b"\x00" * ((-len(raw)) % align)
    with open(path, "wb") as f:
        f.write(out)
