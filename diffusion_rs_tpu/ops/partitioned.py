"""GSPMD partitioning rules for the Pallas kernels.

pallas_call has no SPMD partitioning rule, so under a mesh XLA would
replicate the whole computation per device. These wrappers register
`custom_partitioning` rules:

* flash attention: batch/head dims shard freely (tp shards heads after the
  column-parallel qkv projections); a sequence-sharded self-attention runs
  RING attention over the sp axis (k/v chunks rotate via lax.ppermute, lse
  merge — see :func:`ring_attention`); head_dim stays replicated;
* quantized matmul: token dim (dp/sp-flattened) and out-feature dim (tp,
  matching the column-parallel weight shards) shard freely; the contraction
  dim K must be replicated.

With these rules the multichip pipeline keeps the fast kernels instead of
falling back to the XLA paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _spec_of(sharding):
    return getattr(sharding, "spec", P())


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def ring_attention(q, k, v, axis_name, axis_size, scale, block_q, block_k,
                   interpret):
    """Ring attention over sequence shards (manual-SPMD body).

    q/k/v are the LOCAL shards [b, h, s_local, d] of a self-attention whose
    sequence axis is sharded over ``axis_name``. Each step attends local q
    against the currently-held k/v chunk with the flash kernel (returning
    per-row log-sum-exp), merges into the running output with the standard
    lse rescaling, then rotates k/v one hop around the ring
    (``lax.ppermute`` — lowered to ICI collective-permute on TPU, so each
    chunk transfer overlaps the next chunk's compute via XLA's async pairs).
    Memory per chip stays O(s_local); no all-gather materializes the 16k-token
    joint sequence (SURVEY §5 long-context plan; the reference holds the
    whole sequence on one device, models/flux/model.rs:540-546).
    """
    from .flash_pallas import _flash_call

    s_loc = q.shape[2]
    bq = min(block_q, _round_up(s_loc, 128))
    bk = min(block_k, _round_up(s_loc, 128))
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    o, lse = _flash_call(q, k, v, scale, bq, bk, interpret, save_lse=True)
    o = o.astype(jnp.float32)

    def step(carry, _):
        o, lse, k, v = carry
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        o_i, lse_i = _flash_call(q, k, v, scale, bq, bk, interpret,
                                 save_lse=True)
        lse_new = jnp.logaddexp(lse, lse_i)
        o = (o * jnp.exp(lse - lse_new)[..., None]
             + o_i.astype(jnp.float32) * jnp.exp(lse_i - lse_new)[..., None])
        return (o, lse_new, k, v), None

    (o, _, _, _), _ = jax.lax.scan(
        step, (o, lse, k, v), None, length=axis_size - 1
    )
    return o.astype(q.dtype)


@functools.lru_cache(None)
def make_partitioned_flash(scale: float, block_q: int, block_k: int,
                           interpret: bool = False):
    """Flash attention with a GSPMD rule: batch/head dims shard freely; a
    sequence-sharded q (sp axis) runs RING attention with k/v kept sharded
    (self-attention only: q and kv seq lengths must match and divide the
    axis). Anything else falls back to seq-replicated per-shard kernels."""
    from .flash_pallas import _flash_call

    @custom_partitioning
    def fa(q, k, v):
        return _flash_call(q, k, v, scale, block_q, block_k, interpret)

    def _q_spec(arg_shapes):
        spec = tuple(_spec_of(arg_shapes[0].sharding))
        return spec + (None,) * (4 - len(spec))

    def infer(mesh, arg_shapes, result_shape):
        b_ax, h_ax, s_ax, _ = _q_spec(arg_shapes)
        return NamedSharding(mesh, P(b_ax, h_ax, s_ax, None))

    def partition(mesh, arg_shapes, result_shape):
        b_ax, h_ax, s_ax, _ = _q_spec(arg_shapes)
        sq = arg_shapes[0].shape[2]
        skv = arg_shapes[1].shape[2]
        ring_ok = (
            s_ax is not None
            and not isinstance(s_ax, tuple)
            and sq == skv
            and sq % mesh.shape[s_ax] == 0
        )
        if ring_ok:
            n = mesh.shape[s_ax]
            sh = NamedSharding(mesh, P(b_ax, h_ax, s_ax, None))

            def impl(q, k, v):
                return ring_attention(
                    q, k, v, s_ax, n, scale, block_q, block_k, interpret
                )

            return mesh, impl, sh, (sh, sh, sh)

        sh = NamedSharding(mesh, P(b_ax, h_ax, None, None))

        def impl(q, k, v):
            return _flash_call(q, k, v, scale, block_q, block_k, interpret)

        return mesh, impl, sh, (sh, sh, sh)

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
