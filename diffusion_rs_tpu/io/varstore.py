"""VarStore: the loader-side weight registry.

The TPU equivalent of the reference's VarBuilder
(diffusion_rs_common/src/varbuilder.rs — hierarchical prefix paths over a
flat name->tensor map, dtype cast at ``get``) plus the quantized-linear
factory (diffusion_rs_backend/src/lib.rs:191-266 — sniff checkpoint markers
and build Bnb/Unquant linears).

Entries stay as lazy host-side views (numpy over mmaps) until ``get`` /
``linear`` materializes them — jnp.asarray is the single host->device copy
point, the moral equivalent of the reference's `load_name` upload
(varbuilder_loading.rs:36-38).
"""

from __future__ import annotations

import json
from typing import Dict, Union

import numpy as np
import jax.numpy as jnp

from ..ops.linear import Linear
from ..ops.conv import Conv
from ..quant.bnb import (
    bnb4bit_to_canonical,
    bnb_int8_to_canonical,
    resolve_absmax,
)
from ..quant.gguf_quants import gguf_to_canonical
from ..quant.qtensor import QuantizedTensor, dequantize
from .safetensors import SafeTensors
from .gguf import GgufFile


class GgufEntry:
    __slots__ = ("fmt", "shape", "raw")

    def __init__(self, fmt, shape, raw):
        self.fmt, self.shape, self.raw = fmt, shape, raw


Entry = Union[np.ndarray, GgufEntry]


class VarStore:
    def __init__(self, default_dtype=jnp.bfloat16):
        self._entries: Dict[str, object] = {}  # name -> provider () -> Entry
        self.default_dtype = default_dtype

    # -- population ---------------------------------------------------------

    def add_safetensors(self, st: SafeTensors, prefix: str = ""):
        for name in st.keys():
            self._entries[prefix + name] = (lambda s, n: lambda: s.numpy(n))(st, name)

    def add_gguf(self, gf: GgufFile, prefix: str = ""):
        dense = {"f32", "f16", "f64", "i8", "i16", "i32", "i64", "bf16"}
        for name, ti in gf.tensors.items():
            if ti.fmt in dense:
                self._entries[prefix + name] = (
                    lambda g, n: lambda: g.numpy(n)
                )(gf, name)
            else:
                self._entries[prefix + name] = (
                    lambda g, t: lambda: GgufEntry(t.fmt, t.shape, g.raw(t.name))
                )(gf, ti)

    def add_array(self, name: str, arr: np.ndarray):
        self._entries[name] = lambda: arr

    # -- access -------------------------------------------------------------

    def keys(self):
        return self._entries.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._entries

    def pp(self, prefix: str) -> "VarStoreView":
        return VarStoreView(self, prefix)

    def raw_entry(self, name: str) -> Entry:
        return self._entries[name]()

    def get(self, name: str, dtype=None) -> jnp.ndarray:
        e = self.raw_entry(name)
        if isinstance(e, GgufEntry):
            raise ValueError(f"{name} is GGUF-quantized; use linear()/qtensor()")
        dt = dtype or self.default_dtype
        return jnp.asarray(np.asarray(e), dt)

    def get_np(self, name: str) -> np.ndarray:
        e = self.raw_entry(name)
        if isinstance(e, GgufEntry):
            raise ValueError(f"{name} is GGUF-quantized")
        return np.asarray(e)


class VarStoreView:
    """Prefix view (VarBuilder::pp equivalent)."""

    def __init__(self, store: VarStore, prefix: str):
        self._store = store
        self._prefix = prefix.rstrip(".")

    def _abs(self, name: str) -> str:
        if not self._prefix:
            return name
        return f"{self._prefix}.{name}" if name else self._prefix

    def pp(self, prefix: str) -> "VarStoreView":
        return VarStoreView(self._store, self._abs(prefix))

    def __contains__(self, name: str) -> bool:
        return self._abs(name) in self._store

    def get(self, name: str, dtype=None) -> jnp.ndarray:
        return self._store.get(self._abs(name), dtype)

    def get_np(self, name: str) -> np.ndarray:
        return self._store.get_np(self._abs(name))

    @property
    def default_dtype(self):
        return self._store.default_dtype

    # -- assembled modules ---------------------------------------------------

    def linear(
        self,
        bias: bool = True,
        dtype=None,
        dequantize_to_dense: bool = False,
    ) -> Linear:
        """Build a Linear at this prefix, sniffing quantization markers the
        way the reference factory does (lib.rs:197-217):

        * ``weight.absmax``        -> bnb 4-bit (nf4/fp4, maybe nested absmax)
        * ``SCB``                  -> bnb int8 (per-row scales)
        * GGUF-quantized ``weight``-> canonical k-quant tensor
        * otherwise                -> dense (torch [out, in] -> K-major)
        """
        dt = dtype or self._store.default_dtype
        out_dtype = str(jnp.dtype(dt))
        store, p = self._store, self._abs("")

        def entry(n):
            return store.raw_entry(f"{p}.{n}")

        def has(n):
            return f"{p}.{n}" in store

        w: Union[jnp.ndarray, QuantizedTensor]
        if has("weight.absmax"):
            w = self._bnb_4bit(out_dtype)
        elif has("SCB"):
            w = bnb_int8_to_canonical(
                np.asarray(entry("weight")), np.asarray(entry("SCB")), out_dtype
            )
        else:
            e = entry("weight")
            if isinstance(e, GgufEntry):
                w = gguf_to_canonical(e.fmt, e.raw, e.shape, out_dtype)
            else:
                e = np.asarray(e)
                if e.ndim != 2:
                    raise ValueError(f"linear weight {p} has shape {e.shape}")
                w = jnp.asarray(np.ascontiguousarray(e.T), dt)
        if dequantize_to_dense and isinstance(w, QuantizedTensor):
            w = dequantize(w, dt)
        b = None
        if bias and has("bias"):
            b = self.get("bias", dt)
        return Linear(w=w, b=b)

    def _bnb_4bit(self, out_dtype: str) -> QuantizedTensor:
        """Parse bnb 4-bit companions (bitsandbytes/mod.rs:137-222)."""
        w = self.pp("weight")
        kind = None
        for k in ("nf4", "fp4"):
            if f"quant_state.bitsandbytes__{k}" in w:
                kind = k
                break
        if kind is None:
            raise ValueError(
                f"{self._prefix}: weight.absmax present but no quant_state"
            )
        state = json.loads(
            bytes(w.get_np(f"quant_state.bitsandbytes__{kind}"))
        )
        absmax = w.get_np("absmax")
        if "nested_absmax" in w:
            absmax = resolve_absmax(
                absmax,
                w.get_np("nested_absmax"),
                w.get_np("nested_quant_map"),
                int(state["nested_blocksize"]),
                float(state["nested_offset"]),
            )
        else:
            absmax = absmax.astype(np.float32)
        # quant_map carries the codebook; bnb4bit_to_canonical installs the
        # canonical table for the kind, which must match.
        return bnb4bit_to_canonical(
            self.get_np("weight"),
            absmax,
            tuple(state["shape"]),
            int(state["blocksize"]),
            kind,
            out_dtype,
        )

    def conv2d(self, dtype=None) -> Conv:
        dt = dtype or self._store.default_dtype
        w = self.get_np("weight")
        b = self.get_np("bias") if "bias" in self else None
        from ..ops.conv import make_conv

        return make_conv(w, b, dt)

    def conv2d_as_linear(self, dtype=None) -> Linear:
        """1x1 conv stored as [out, in, 1, 1] -> Linear (VAE attention uses
        1x1-conv QKV, vae.rs:46-82)."""
        dt = dtype or self._store.default_dtype
        w = self.get_np("weight")
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        b = self.get("bias", dt) if "bias" in self else None
        return Linear(w=jnp.asarray(np.ascontiguousarray(w.T), dt), b=b)
