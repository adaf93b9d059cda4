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
feature axis: column-parallel along N (the lane dim the fused kernel wants),
row-parallel along K — each chip holds a K-slice of every plane (quantized
bytes ÷ tp) and the kernel's GSPMD rule psums the partial products
(ops/partitioned.py). A K-shard must keep whole split blocks and scale
groups; tensors that can't split that way stay replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.qtensor import QuantizedTensor

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


def _role_of(names) -> str | None:
    role = None
    for n in reversed(names):
        if n in ("w", "b", "packed", "scale", "bias", "codebook"):
            continue
        if n in COL_KEYS:
            role = "col"
        elif n in ROW_KEYS:
            role = "row"
        break
    return role


def _qt_row_shardable(qt: QuantizedTensor, tp_size: int) -> bool:
    """A K-shard must keep whole split blocks, whole scale groups, and a
    K-tile the kernel can grid over (ops/partitioned.py _local_k_ok)."""
    from ..ops.partitioned import _local_k_ok

    k = qt.shape[-2]
    return k % tp_size == 0 and _local_k_ok(
        k // tp_size, qt.bits, qt.group, qt.split
    )


def _spec_for(path, leaf, tp_axis: str, tp_size: int) -> P:
    names = _path_names(path)
    if "vae" in names:  # VAE stays replicated (tiny, conv-bound)
        return P()
    role = _role_of(names)
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
    # row-parallel: shard the K (second-to-last) dim of 2-D+ weights — dense
    # w (XLA partitions the dot and inserts the psum) AND quantized planes
    # (the Pallas qmm rule runs per-K-shard partials + psum). The linear's
    # additive bias b and 1-D leaves stay replicated (added after the psum).
    if field == "b" or nd < 2:
        return P()
    return P(*([None] * (nd - 2) + [tp_axis, None]))


def shard_params(params: Any, mesh: Mesh, tp_axis: str = "tp") -> Any:
    """Place a param pytree onto the mesh with tensor-parallel shardings."""
    tp_size = mesh.shape.get(tp_axis, 1)

    def spec(path, leaf):
        if isinstance(leaf, QuantizedTensor):
            names = _path_names(path)
            row = _role_of(names) == "row" and "vae" not in names
            if row and not _qt_row_shardable(leaf, tp_size):
                # can't cut K cleanly -> replicate every plane
                return jax.tree.map(
                    lambda _: NamedSharding(mesh, P()), leaf
                )
            return QuantizedTensor(
                packed=NamedSharding(
                    mesh, _spec_for(path + (jax.tree_util.GetAttrKey("packed"),), leaf.packed, tp_axis, tp_size)
                ),
                scale=NamedSharding(
                    mesh, _spec_for(path + (jax.tree_util.GetAttrKey("scale"),), leaf.scale, tp_axis, tp_size)
                ),
                bias=None if leaf.bias is None else NamedSharding(
                    mesh, _spec_for(path + (jax.tree_util.GetAttrKey("bias"),), leaf.bias, tp_axis, tp_size)
                ),
                codebook=None if leaf.codebook is None else NamedSharding(mesh, P()),
                kind=leaf.kind, bits=leaf.bits, group=leaf.group,
                split=leaf.split, shape=leaf.shape, out_dtype=leaf.out_dtype,
            )
        return NamedSharding(mesh, _spec_for(path, leaf, tp_axis, tp_size))

    specs = jax.tree_util.tree_map_with_path(
        spec, params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )
    return jax.device_put(params, specs)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(
        params, jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    )
