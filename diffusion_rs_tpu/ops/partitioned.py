"""GSPMD partitioning rules for the Pallas kernels.

pallas_call has no SPMD partitioning rule, so under a mesh XLA would
replicate the whole computation per device. These wrappers register
`custom_partitioning` rules:

* flash attention: batch/head dims shard freely (tp shards heads after the
  column-parallel qkv projections); sequence/head_dim sharding is forced
  replicated (ring attention over sp is the planned upgrade, ROADMAP #2);
* quantized matmul: token dim (dp/sp-flattened) and out-feature dim (tp,
  matching the column-parallel weight shards) shard freely; the contraction
  dim K must be replicated.

With these rules the multichip pipeline keeps the fast kernels instead of
falling back to the XLA paths.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _spec_of(sharding):
    return getattr(sharding, "spec", P())


@functools.lru_cache(None)
def make_partitioned_flash(scale: float, block_q: int, block_k: int,
                           interpret: bool = False):
    """A flash-attention callable with a head/batch GSPMD rule."""
    from .flash_pallas import _flash_call

    @custom_partitioning
    def fa(q, k, v):
        return _flash_call(q, k, v, scale, block_q, block_k, interpret)

    def _sharding_for(mesh, q_sharding):
        spec = _spec_of(q_sharding)
        bh = tuple(spec) + (None,) * (4 - len(tuple(spec)))
        return NamedSharding(mesh, P(bh[0], bh[1], None, None))

    def infer(mesh, arg_shapes, result_shape):
        q_sh = arg_shapes[0].sharding
        return _sharding_for(mesh, q_sh)

    def partition(mesh, arg_shapes, result_shape):
        q_sh = _sharding_for(mesh, arg_shapes[0].sharding)

        def impl(q, k, v):
            return _flash_call(q, k, v, scale, block_q, block_k, interpret)

        return mesh, impl, q_sh, (q_sh, q_sh, q_sh)

    fa.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule="b h s d, b h t d, b h t d -> b h s d",
    )
    return fa


@functools.lru_cache(None)
def make_partitioned_qmm(bits, group, split, kn, out_dtype, interpret,
                         bm_cap, bn_cap, has_bias, has_cb):
    """Quantized-matmul callable with a tokens x out-features GSPMD rule.

    x [M, K] may shard M (dp/sp tokens); the weight planes shard N (tp,
    column-parallel); K stays replicated. Locally each shard runs the same
    Pallas kernel on its (M_local, N_local) tile.
    """
    from .qmatmul_pallas import _qmm_call

    def call(x, packed, scale, bias, codebook, n_local):
        return _qmm_call(
            x, packed, scale, bias, codebook,
            bits=bits, group=group, split=split, kn=(kn[0], n_local),
            out_dtype=out_dtype, interpret=interpret,
            bm_cap=bm_cap, bn_cap=bn_cap,
        )

    # signature varies with optional planes; build the exact arity
    if has_bias and has_cb:
        def raw(x, packed, scale, bias, codebook):
            return call(x, packed, scale, bias, codebook, packed.shape[-1])
        rule = "m k, p n, g n, g n, c -> m n"
    elif has_cb:
        def raw(x, packed, scale, codebook):
            return call(x, packed, scale, None, codebook, packed.shape[-1])
        rule = "m k, p n, g n, c -> m n"
    elif has_bias:
        def raw(x, packed, scale, bias):
            return call(x, packed, scale, bias, None, packed.shape[-1])
        rule = "m k, p n, g n, g n -> m n"
    else:
        def raw(x, packed, scale):
            return call(x, packed, scale, None, None, packed.shape[-1])
        rule = "m k, p n, g n -> m n"

    qmm = custom_partitioning(raw)

    def _shardings(mesh, arg_shapes):
        x_spec = tuple(_spec_of(arg_shapes[0].sharding))
        w_spec = tuple(_spec_of(arg_shapes[1].sharding))
        m_axis = x_spec[0] if len(x_spec) > 0 else None
        n_axis = w_spec[-1] if len(w_spec) >= 2 else None
        out = NamedSharding(mesh, P(m_axis, n_axis))
        arg_sh = [
            NamedSharding(mesh, P(m_axis, None)),           # x
            NamedSharding(mesh, P(None, n_axis)),           # packed
            NamedSharding(mesh, P(None, n_axis)),           # scale
        ]
        if has_bias:
            arg_sh.append(NamedSharding(mesh, P(None, n_axis)))
        if has_cb:
            arg_sh.append(NamedSharding(mesh, P(None)))
        return out, tuple(arg_sh)

    def infer(mesh, arg_shapes, result_shape):
        out, _ = _shardings(mesh, arg_shapes)
        return out

    def partition(mesh, arg_shapes, result_shape):
        out, arg_sh = _shardings(mesh, arg_shapes)
        return mesh, raw, out, arg_sh

    qmm.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return qmm
