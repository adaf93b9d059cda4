"""Zero-copy safetensors reader.

The reference mmaps safetensors files and hands out byte-slice views
(diffusion_rs_common/src/core/safetensors.rs MmapedSafetensors /
BytesSafetensors with yoke). Python equivalent: one ``mmap`` per file,
numpy views into it (no copies until a tensor is actually materialized on
device), including views at an offset inside a DDUF archive member.
"""

from __future__ import annotations

import json
import mmap
import struct
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

try:  # bundled with jax
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
    _F8_E4M3 = np.dtype(ml_dtypes.float8_e4m3fn)
except Exception:  # pragma: no cover
    _BF16 = None
    _F8_E4M3 = None

_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": _BF16,
    "F8_E4M3": _F8_E4M3,
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "U16": np.dtype(np.uint16),
    "U32": np.dtype(np.uint32),
    "U64": np.dtype(np.uint64),
    "BOOL": np.dtype(np.bool_),
}


@dataclass(frozen=True)
class TensorInfo:
    name: str
    dtype: str
    shape: tuple
    start: int  # absolute offset into the buffer
    end: int

    @property
    def nbytes(self) -> int:
        return self.end - self.start


class SafeTensors:
    """Parsed view over one safetensors blob (file or in-archive slice)."""

    def __init__(self, buf, base_offset: int = 0, length: Optional[int] = None):
        self._buf = buf
        header_len = struct.unpack_from("<Q", buf, base_offset)[0]
        header = bytes(
            memoryview(buf)[base_offset + 8 : base_offset + 8 + header_len]
        )
        meta = json.loads(header)
        meta.pop("__metadata__", None)
        data_start = base_offset + 8 + header_len
        self.tensors: Dict[str, TensorInfo] = {}
        for name, info in meta.items():
            s, e = info["data_offsets"]
            self.tensors[name] = TensorInfo(
                name=name,
                dtype=info["dtype"],
                shape=tuple(info["shape"]),
                start=data_start + s,
                end=data_start + e,
            )

    @classmethod
    def from_file(cls, path: str) -> "SafeTensors":
        with open(path, "rb") as f:
            buf = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        return cls(buf)

    def keys(self):
        return self.tensors.keys()

    def __contains__(self, name: str) -> bool:
        return name in self.tensors

    def numpy(self, name: str) -> np.ndarray:
        """A zero-copy numpy view (read-only) of the stored bytes."""
        ti = self.tensors[name]
        dt = _DTYPES[ti.dtype]
        if dt is None:
            raise ValueError(f"dtype {ti.dtype} requires ml_dtypes")
        arr = np.frombuffer(
            memoryview(self._buf)[ti.start : ti.end], dtype=dt
        )
        return arr.reshape(ti.shape)

    def info(self, name: str) -> TensorInfo:
        return self.tensors[name]


_DTYPE_NAMES = {v: k for k, v in _DTYPES.items() if v is not None}


def save_safetensors(path: str, tensors: Dict[str, np.ndarray]):
    """Minimal safetensors writer (core/safetensors.rs save equivalent)."""
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        raw = arr.tobytes()
        header[name] = {
            "dtype": _DTYPE_NAMES[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        blobs.append(raw)
        offset += len(raw)
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        for raw in blobs:
            f.write(raw)
