"""Tensor-parallel sharding rules (GSPMD).

Replaces — not translates — the reference's single-device design
(SURVEY.md §2.8): Megatron-style column/row parallel linears over the "tp"
mesh axis, data parallel batch over "dp", XLA inserting the all-reduces.

Rules are name-based over the param pytree paths:

* column-parallel (shard OUT features): q/k/v projections, MLP up/gate
  projections — activations come out head-sharded, attention runs fully
  sharded per device;
* row-parallel (shard IN features): attention output projections, MLP down
  projections — XLA emits one psum per block, riding ICI;
* everything else (norms, modulation, embeddings) is replicated.

QuantizedTensor leaves shard their packed/scale/bias planes along the same
feature axis (the canonical [K, N] layout keeps N innermost, so
column-parallel quantized weights shard the lane dim — the layout the fused
kernel wants on each shard).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# out-feature (column) parallel linears
COL_KEYS = frozenset(
    {"q", "k", "v", "qkv", "qkv_mlp", "in", "fc1", "proj_mlp", "wi",
     "wi_0", "wi_1"}
)
# in-feature (row) parallel linears
ROW_KEYS = frozenset({"proj", "out", "o", "linear2", "fc2", "wo"})


def _path_names(path) -> list:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        elif hasattr(k, "idx"):
            names.append(str(k.idx))
    return names


def _spec_for(path, leaf, tp_axis: str) -> P:
    names = _path_names(path)
    if "vae" in names:  # VAE stays replicated (tiny, conv-bound)
        return P()
    # Identify the linear's role from the nearest recognizable name.
    role = None
    for n in reversed(names):
        if n in ("w", "b", "packed", "scale", "bias", "codebook"):
            continue
        if n in COL_KEYS:
            role = "col"
        elif n in ROW_KEYS:
            role = "row"
        break
    if role is None:
        return P()
    field = names[-1]
    nd = leaf.ndim
    if field == "codebook" or nd == 0:
        return P()
    if role == "col":
        # shard the last (out-feature / lane) dim: w [.., K, N], b [.., N],
        # packed/scale/bias [.., K', N]
        return P(*([None] * (nd - 1) + [tp_axis]))
    # row-parallel: shard the K (second-to-last) dim of 2-D+ dense weights
    # (XLA partitions the dot contraction and inserts the psum); biases and
    # 1-D leaves stay replicated (added after the psum). Quantized planes
    # stay replicated: the Pallas qmm partitioning rule keeps K whole
    # (ops/partitioned.py), so K-sharding them would force an all-gather
    # per step.
    if field in ("packed", "scale", "bias"):
        return P()
    if field == "b" or nd < 2:
        return P()
    return P(*([None] * (nd - 2) + [tp_axis, None]))


def shard_params(params: Any, mesh: Mesh, tp_axis: str = "tp") -> Any:
    """Place a param pytree onto the mesh with tensor-parallel shardings."""
    specs = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, tp_axis)),
        params,
    )
    return jax.device_put(params, specs)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(
        params, jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    )
