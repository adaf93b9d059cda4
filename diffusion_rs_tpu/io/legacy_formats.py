"""Legacy tensor container support: npy/npz and PyTorch pickle.

Reference parity: diffusion_rs_common/src/core/npy.rs (npy/npz read+write)
and core/pickle.rs (.pt/.pth reader). numpy IS the npy format owner, and
torch-cpu is in-environment for pickle checkpoints, so these are thin,
behavior-matched adapters that normalize everything to numpy host arrays
(the VarStore ingests those directly).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def read_npy(path: str) -> np.ndarray:
    return np.load(path, allow_pickle=False)


def read_npz(path: str) -> Dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def write_npy(path: str, arr: np.ndarray) -> None:
    np.save(path, arr, allow_pickle=False)


def write_npz(path: str, tensors: Dict[str, np.ndarray]) -> None:
    np.savez(path, **tensors)


def read_pytorch(path: str) -> Dict[str, np.ndarray]:
    """Read a .pt/.pth checkpoint (pickle.rs equivalent, including legacy
    zip-container files). Returns name -> numpy array; non-tensor entries
    are skipped; nested state dicts are flattened with dot-joined keys."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    out: Dict[str, np.ndarray] = {}

    def walk(prefix: str, val):
        if isinstance(val, torch.Tensor):
            t = val.detach()
            if t.dtype == torch.bfloat16:
                a = t.to(torch.float32).numpy()
                import ml_dtypes

                out[prefix] = a.astype(ml_dtypes.bfloat16)
            else:
                out[prefix] = t.numpy()
        elif isinstance(val, dict):
            for k, v in val.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)

    walk("", obj)
    return out


def add_pytorch_to_store(store, path: str, prefix: str = ""):
    """Load a .pt/.pth into a VarStore (varbuilder_loading equivalent for
    pickle checkpoints)."""
    for name, arr in read_pytorch(path).items():
        store.add_array(prefix + name, arr)
