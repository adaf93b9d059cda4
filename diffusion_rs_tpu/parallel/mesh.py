"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.8: one CUDA/Metal
ordinal picked at load, no collectives anywhere). The TPU build scales with
a jax.sharding.Mesh instead: axes

* ``dp`` — data parallel over the prompt batch (throughput configs),
* ``tp`` — tensor parallel over attention heads / MLP width (latency +
  capacity configs; collectives ride ICI),

* ``sp`` — sequence/context parallel over the packed image tokens (2048²
  configs): the pipeline shards the token axis and joint attention runs as
  ring attention (ops/partitioned.py) over the axis,

with GSPMD/pjit inserting the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int = 1,
    tp: Optional[int] = None,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh axes (dp, sp, tp): data parallel over batch, sequence/context
    parallel over image tokens (high-res configs), tensor parallel over
    heads/MLP. sp=1 collapses to the common (dp, tp) layout."""
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // (dp * sp)
    if dp * sp * tp != len(devices):
        raise ValueError(
            f"dp({dp}) * sp({sp}) * tp({tp}) != n_devices({len(devices)})"
        )
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def sequence_sharding(mesh: Mesh) -> NamedSharding:
    """Shard [batch, seq, ...] activations: batch over dp, tokens over sp.
    The reference has no sequence scaling at all (SURVEY §2.8); under GSPMD
    the joint-attention QK^T all-gathers K/V across sp automatically."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp."""
    return NamedSharding(mesh, P("dp"))
