"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.8: one CUDA/Metal
ordinal picked at load, no collectives anywhere). The TPU build scales with
a jax.sharding.Mesh instead: axes

* ``dp`` — data parallel over the prompt batch (throughput configs),
* ``tp`` — tensor parallel over attention heads / MLP width (latency +
  capacity configs; collectives ride ICI),

with GSPMD/pjit inserting the collectives. Context parallelism over image
tokens (2048² configs) composes on top of tp in later rounds.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = 1,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        raise ValueError(f"dp({dp}) * tp({tp}) != n_devices({len(devices)})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp."""
    return NamedSharding(mesh, P("dp"))
