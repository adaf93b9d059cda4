"""Fused dequantize-matmul Pallas kernel.

The reference dequantizes the ENTIRE weight and then runs a dense matmul on
every forward (diffusion_rs_backend/src/bitsandbytes/mod.rs:285-312 — weights
are never cached dequantized), i.e. it pays full-precision HBM traffic per
call. This kernel keeps weights quantized in HBM and dequantizes K×N tiles in
VMEM right before they hit the MXU — the BASELINE north-star design
("fused Pallas dequant-matmuls so weights stay quantized in HBM").

Layout contract (see quant/qtensor.py): weights are canonical K-major
``[K, N]``; 4-bit carriers are nibble-packed split-block style so a K-tile
equal to the split unpacks with two shifts and ONE sublane concat (no
interleave); scale/bias are dense ``[K/group, N]`` f32 planes; nf4/fp4 carry
a 16-entry codebook, decoded in-kernel by a 4-level select tree (the same
values as the reference's literal trees, bitsandbytes/op.rs:29-128).

Grid: (m_tiles, n_tiles, k_tiles), k innermost ("arbitrary") with an f32 VMEM
accumulator; x·w runs in x.dtype (bf16) on the MXU with f32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.qtensor import QuantizedTensor, dequantize


def _codebook_select(q: jnp.ndarray, cb, val_dtype=jnp.float32) -> jnp.ndarray:
    """Decode 4-bit codes via a binary select tree (15 VPU selects).

    ``cb`` is a length-16 f32 SMEM ref (scalar reads); gathers lower poorly
    on TPU so we select on the code bits instead. With ``val_dtype=bfloat16``
    the selected values are 16-bit, packing 2x lanes per vreg (opt-in
    fast16 path; see quantized_matmul fast-decode note).
    """
    # Masks must share the value registers' sublane layout: (8,128) i32 for
    # f32 selects, (16,128) i16 for 16-bit selects (Mosaic can't relayout an
    # i32-born i1 vector onto 16-bit lanes).
    q = q.astype(jnp.int16 if jnp.dtype(val_dtype).itemsize == 2 else jnp.int32)
    b0 = (q & 1) != 0
    b1 = (q & 2) != 0
    b2 = (q & 4) != 0
    b3 = (q & 8) != 0
    vals = [cb[i].astype(val_dtype) for i in range(16)]
    lvl0 = [jnp.where(b0, vals[2 * i + 1], vals[2 * i]) for i in range(8)]
    lvl1 = [jnp.where(b1, lvl0[2 * i + 1], lvl0[2 * i]) for i in range(4)]
    lvl2 = [jnp.where(b2, lvl1[2 * i + 1], lvl1[2 * i]) for i in range(2)]
    return jnp.where(b3, lvl2[1], lvl2[0])


def _dequant_tile(packed, scale, bias, codebook, *, bits, group, bk,
                  bn, out_dtype, fast16=False):
    """Dequantize one [bk, bn] weight tile in VMEM.

    ``scale``/``bias`` are the rows of the dense [K/group, bn] planes covering
    this k-tile (shape [max(1, bk//group), bn]).

    Default math is f32 with a cast at the end (bit-exact vs the XLA
    ``dequantize``+matmul path). ``fast16`` decodes in ``out_dtype`` (bf16)
    instead: 16-bit values pack 2x lanes per vreg, halving the VPU select/mul
    instruction count. Only used when ``out_dtype`` is 16-bit; the extra
    rounding (codebook entries + products rounded to bf16) is ~2^-9 relative
    — noise against the 4-bit quantization error itself. Perf-neutral on
    v5e at FLUX shapes (the VPU is not the limiter there), hence opt-in.
    """
    if bits == 4:
        # Widen to i32 before bit ops — Mosaic has no i8 shift lowering.
        p = packed.astype(jnp.int32)
        lo = p & 0xF
        hi = (p >> 4) & 0xF
        q = jnp.concatenate([lo, hi], axis=0)  # [bk, bn] split-block order
    else:
        q = packed.astype(jnp.int32)
    fast16 = fast16 and jnp.dtype(out_dtype).itemsize == 2
    vdt = jnp.dtype(out_dtype) if fast16 else jnp.float32
    off = None
    if codebook is not None:
        w = _codebook_select(q, codebook, vdt)
    else:
        w = q.astype(vdt)  # |q| <= 127: exact in bf16
        if fast16 and bias is not None:
            # centered form (q + bias/scale) * scale: for symmetric affine
            # formats (q4_0: bias = -8*scale) the offset is an exact small
            # integer, so the sum is exact in bf16 — avoids the q*s + (-8s)
            # cancellation that doubles relative error in 16-bit math.
            # Computed on the small [rows, bn] plane in f32 (one divide).
            # Groups with scale == 0 but bias != 0 (k-quant formats where
            # bias = -dmin*m is independent of scale) keep the plain bias
            # add so they still dequantize to bias, matching the f32 path.
            off = jnp.where(
                scale == 0.0, 0.0, bias / jnp.where(scale == 0.0, 1.0, scale)
            ).astype(vdt)
            bias = jnp.where(scale == 0.0, bias, 0.0)
    scale = scale.astype(vdt)
    if bias is not None:
        bias = bias.astype(vdt)
    # Broadcast per-group scale/bias along K: [bk, bn] -> [groups, g, bn]
    # (split of the sublane dim; lane dim untouched).
    if group < bk:
        groups = bk // group
        w = w.reshape(groups, group, bn)
        if off is not None:
            w = w + off[:, None, :]
        w = w * scale[:, None, :]
        if bias is not None:
            w = w + bias[:, None, :]
        w = w.reshape(bk, bn)
    else:
        if off is not None:
            w = w + off
        w = w * scale
        if bias is not None:
            w = w + bias
    return w.astype(out_dtype)


def _qmm_kernel(
    x_ref, packed_ref, scale_ref, bias_ref, cb_ref, o_ref, acc_ref,
    *, bits, group, bk, bn, has_bias, has_cb, s8_act=False, fast16=False
):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if s8_act:
        # s8 x s8 MXU path ("q8t" format: ONE weight scale per K-tile
        # column). Activations are symmetric-int8-quantized per row per
        # K-tile in VMEM; the integer dot runs at the MXU's int8 rate and
        # one [bm,1]x[1,bn] rescale folds both scales into the f32 acc.
        # NOTE: hoisting this quantize out to XLA was measured SLOWER
        # (92 vs 150 TFLOP/s): at the full-N default tile there is only one
        # n-tile so the in-VMEM quantize already runs once, while the
        # hoisted version costs extra HBM passes over x (reduce-max + cast
        # cannot fuse into the preceding custom-call's output).
        x = x_ref[...].astype(jnp.float32)
        ax = jnp.max(jnp.abs(x), axis=1, keepdims=True)  # [bm, 1]
        sx = jnp.where(ax == 0.0, 1.0, ax / 127.0)
        xq = jnp.round(x / sx).astype(jnp.int8)
        prod = jax.lax.dot(
            xq, packed_ref[...], preferred_element_type=jnp.int32
        )
        acc_ref[...] += prod.astype(jnp.float32) * (sx * scale_ref[0][0][None, :])
    else:
        codebook = cb_ref if has_cb else None
        # scale/bias arrive pre-tiled as [k_tiles, rows_per_tile, bn] blocks.
        w = _dequant_tile(
            packed_ref[...],
            scale_ref[0],
            bias_ref[0] if has_bias else None,
            codebook,
            bits=bits,
            group=group,
            bk=bk,
            bn=bn,
            out_dtype=x_ref.dtype,
            fast16=fast16,
        )
        acc_ref[...] += jax.lax.dot(
            x_ref[...], w, preferred_element_type=jnp.float32
        )

    @pl.when(ki == nk - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_scale_plane(plane, k_tiles: int, group: int, bk: int, n: int):
    """[K/group, N] -> [k_tiles, rows_per_tile, N] so each k-tile's rows form
    one clean Pallas block (Mosaic can't prove alignment of a dynamic sublane
    slice, so we pre-tile instead)."""
    if group < bk:
        return plane.reshape(k_tiles, bk // group, n)
    ratio = group // bk
    return jnp.repeat(plane, ratio, axis=0)[:k_tiles].reshape(k_tiles, 1, n)


def _scale_block_spec(rows: int, bn: int):
    return pl.BlockSpec((1, rows, bn), lambda mi, ni, ki: (ki, 0, ni))


def _pick_bm(m: int, bm_cap: int) -> int:
    """Pad-aware m-tile choice. The legacy ``min(bm_cap, round_up(m, 16))``
    rounded the padded M up to a multiple of bm_cap, wasting whole MXU rows
    on production shapes: the north star's img calls pad 4096 -> 4608
    (12.5% dead compute) and the 720x1280 preset's pad 3600 -> 4608 (28%).
    Instead pick the m-tile count first, then the smallest 16-aligned bm
    covering m in that many tiles: minimal padded m_p, ties broken toward
    fewer tiles (each m-tile refetches the full weight plane once per
    (n, k) tile pass). Examples: 3600 -> bm 1200 (3 tiles, zero pad),
    4096 -> bm 1024 (4 tiles, zero pad), 4608 -> bm 1536 (unchanged)."""
    up16 = _round_up(m, 16)
    if up16 <= bm_cap:
        return up16
    tiles_lo = -(-m // bm_cap)
    best = None
    for tiles in range(tiles_lo, tiles_lo + 8):
        bm_ = _round_up(-(-m // tiles), 16)
        if bm_ > bm_cap or bm_ < 256:
            continue
        key = (bm_ * tiles, tiles)  # (padded m_p, weight refetches)
        if best is None or key < best[0]:
            best = (key, bm_)
    return best[1] if best else min(bm_cap, up16)


def _plan_tiles(m: int, k: int, n: int, bits: int, group: int, split: int,
                has_bias: bool, bm_cap: int, bn_cap: int,
                out_itemsize: int = 2):
    """Pick (bm, bn, bk) within the VMEM budget, or None if no tile fits.

    bk = split for 4-bit: measured on v5e, growing bk to 512 via the
    multi-unit decode (supported by _dequant_tile) does not improve on the
    ~100 TFLOP/s plateau (86% of the dense-XLA speed of light at FLUX
    shapes) and trips Mosaic VMEM limits at some tile combos.

    The 12 MB budget is deliberately conservative: larger budgets (tested up
    to 64 MB with full-M tiles) fail Mosaic compilation and showed no speedup
    below the failure threshold. Shrinking floors at bm 256 / bn 128; an
    adversarial K/group combination that still exceeds the budget there
    returns None so the caller can take the XLA dequant path instead of
    surfacing a raw Mosaic compile error (VERDICT r3 weak #6).
    """
    bk = split if bits == 4 else min(256, k)
    bn = min(bn_cap, n)
    while n % bn != 0:
        bn //= 2
    VMEM_BUDGET = 12 * 1024 * 1024

    def vmem_use(bm_, bn_):
        return (
            2 * bm_ * bk * 2          # x blocks (pipelined)
            + bm_ * bn_ * 4           # f32 accumulator
            # output block: sized by the caller's out dtype — an f32 out
            # (e.g. parity probes) doubles this term, and pretending it is
            # bf16 produced a scoped-vmem compile OOM at full-size tiles
            # (caught by tools/smoke_tpu.py on-chip, r4)
            + bm_ * bn_ * out_itemsize
            + 2 * (bk // 2 if bits == 4 else bk) * bn_  # packed blocks
            + (k // group) * bn_ * 4 * (2 if has_bias else 1)
        )

    def max_bm(bn_):
        """Largest 16-aligned bm within the VMEM budget at this bn (vmem_use
        is affine increasing in bm, so solve the per-row byte cost once)."""
        fixed = vmem_use(0, bn_)
        if fixed >= VMEM_BUDGET:
            return 0
        per_row = (vmem_use(16, bn_) - fixed) // 16
        return ((VMEM_BUDGET - fixed) // per_row) // 16 * 16

    # Shrink bn first if even the floor-bm tile busts the budget, then pick
    # a pad-aware bm inside the feasible range (the budget cap is applied
    # BEFORE the pad optimization — shrinking afterwards would re-introduce
    # padding, e.g. 4096 picks bm 512 / zero pad at bn 3072, not 384 / 3%).
    while bn > 128 and max_bm(bn) < 256:
        bn //= 2
    cap = min(bm_cap, max_bm(bn))
    if cap < 256 and cap < _round_up(m, 16):
        return None
    bm = _pick_bm(m, cap)
    if vmem_use(bm, bn) > VMEM_BUDGET:
        return None
    return bm, bn, bk


@functools.lru_cache(None)
def _s8_m_crossover() -> int:
    """Largest M (flattened token count) for which the q8t s8 x s8 path is
    selected; beyond it the bf16 dequant path wins (see quantized_matmul).
    Measured on v5e (BENCH.md r4). Env override for other parts/topologies."""
    import os

    # NB: unset env must mean "no override". `.get(key, "0") or default`
    # returned the TRUTHY string "0" when unset -> crossover 0 -> the s8
    # path was never selected (r4 smoke caught the silent ~25% q8t
    # regression; test_q8t_s8_crossover_default pins this).
    env = os.environ.get("DIFFUSION_RS_TPU_Q8T_S8_MAX_M")
    return int(env) if env else _S8_M_CROSSOVER_DEFAULT


# r4 on-chip M-sweep (BENCH.md r4): s8 wins at every measured M, so the
# default never routes q8t off the int8 path. Kept as a knob because the
# balance is part-specific (VPU:MXU ratio) — see quantized_matmul.
_S8_M_CROSSOVER_DEFAULT = 1 << 30


def supports(qt: QuantizedTensor, n_pad_ok: bool = True) -> bool:
    """Static check that the canonical tensor fits this kernel's tiling."""
    k, n = qt.shape
    if qt.bits == 4 and qt.split % 2 != 0:
        return False
    bk = qt.split if qt.bits == 4 else min(256, k)
    if k % bk != 0 or bk % 8 != 0:
        return False
    if qt.group <= bk:
        if bk % qt.group != 0:
            return False
    elif qt.group % bk != 0:
        return False
    if n % 128 != 0:
        return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group", "split", "kn", "out_dtype", "interpret",
                     "bm_cap", "bn_cap", "s8_act", "fast16"),
)
def _qmm_call(x, packed, scale, bias, codebook, *, bits, group, split, kn,
              out_dtype, interpret, bm_cap, bn_cap, s8_act=False,
              fast16=False):
    k, n = kn
    m = x.shape[0]
    plan = _plan_tiles(m, k, n, bits, group, split, bias is not None,
                       bm_cap, bn_cap, jnp.dtype(out_dtype).itemsize)
    if plan is None:
        # callers pre-check via supports()/_plan_tiles; surface a clear
        # error instead of a raw Mosaic VMEM failure if one slips through
        raise NotImplementedError(
            f"qmm tile plan exceeds VMEM budget for K={k} N={n} "
            f"group={group} (use the XLA dequant fallback)"
        )
    bm, bn, bk = plan
    m_p = _round_up(m, bm)
    if m_p != m:
        x = jnp.pad(x, ((0, m_p - m), (0, 0)))

    grid = (m_p // bm, n // bn, k // bk)
    has_bias = bias is not None
    has_cb = codebook is not None

    k_tiles = k // bk
    rows = max(1, bk // group)
    scale_t = _tile_scale_plane(scale, k_tiles, group, bk, n)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki)),
        pl.BlockSpec(
            ((bk // 2) if bits == 4 else bk, bn), lambda mi, ni, ki: (ki, ni)
        ),
        _scale_block_spec(rows, bn),
    ]
    args = [x, packed, scale_t]
    if has_bias:
        in_specs.append(_scale_block_spec(rows, bn))
        args.append(_tile_scale_plane(bias, k_tiles, group, bk, n))
    if has_cb:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(codebook)

    def kernel(x_ref, packed_ref, scale_ref, *rest):
        idx = 0
        bias_ref = rest[idx] if has_bias else None
        idx += int(has_bias)
        cb_ref = rest[idx] if has_cb else None
        idx += int(has_cb)
        o_ref = rest[idx]
        acc_ref = rest[idx + 1]
        _qmm_kernel(
            x_ref, packed_ref, scale_ref, bias_ref, cb_ref, o_ref, acc_ref,
            bits=bits, group=group, bk=bk, bn=bn,
            has_bias=has_bias, has_cb=has_cb, s8_act=s8_act, fast16=fast16,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m_p, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * k * n,
            bytes_accessed=packed.size * packed.dtype.itemsize
            + x.size * x.dtype.itemsize + m_p * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if m_p != m:
        out = out[:m]
    return out


def quantized_matmul(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    out_dtype=None,
    interpret: bool = False,
    bm_cap: int = 1536,
    # bn 1024 measured +7% on the wide single-block MLP linears (N=21504:
    # halves the x-block refetch count) and neutral at square FLUX shapes.
    # None = per-format default (q8t gets full-N tiles, see below).
    bn_cap: Optional[int] = None,
) -> jnp.ndarray:
    """``x [..., K] @ deq(qt) [K, N] -> [..., N]`` with weights staying packed
    in HBM. Falls back to XLA dequant+matmul for shapes the kernel tiling
    doesn't cover (small N, ragged K)."""
    from ..util.tracing import warn_once

    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    k, n = qt.shape
    x2 = x.reshape(-1, k)
    if not supports(qt):
        warn_once(
            f"qmm-xla-{qt.kind}-{k}x{n}",
            f"quantized_matmul: {qt.kind} [{k}x{n}] (group {qt.group}) does "
            "not fit the fused-kernel tiling; falling back to XLA "
            "dequantize+matmul (weights dequantized in HBM each call)",
        )
        w = dequantize(qt, x.dtype)
        return jnp.matmul(x2, w, preferred_element_type=jnp.float32).astype(
            out_dtype
        ).reshape(*lead, n)
    # Route through the custom_partitioning wrapper: token-dim (dp/sp) and
    # out-feature (tp, column-parallel) sharded inputs run per-shard.
    from .partitioned import make_partitioned_qmm

    # "q8t" (per-K-tile scales) runs the s8 x s8 MXU path: the scale group
    # equals the kernel K-tile so one rescale per tile is exact. Dispatch is
    # per SHAPE at trace time (VERDICT r3 next #3): the r4 M-sweep on v5e
    # measured the s8 path FASTER at every M (116/140/156/166 TFLOP/s vs the
    # bf16-dequant path's 108/133/147/155 at M 4.6k/9.2k/18k/37k, BENCH.md
    # r4) — there is no kernel-level crossover, so the default never
    # switches; DIFFUSION_RS_TPU_Q8T_S8_MAX_M remains the per-shape override
    # for other parts. The r3 batch-8 e2e regression is a q8t-vs-nf4
    # CAPACITY effect (2x packed bytes + 8x activations on one chip), owned
    # by util/capacity.py + the bench preset defaults, not by this kernel.
    q8t_ok = (
        qt.kind == "q8t" and qt.bits == 8 and qt.bias is None
        and qt.codebook is None and qt.group == min(256, k)
    )
    s8_act = q8t_ok and x2.shape[0] <= _s8_m_crossover()
    if bn_cap is None:
        # Per-format N-tile defaults (v5e, tools/kernel_bench.py round 3):
        # the s8 path streams 1-byte packed tiles and pays one rescale per
        # K-tile, so full-N tiles (fewer x-block refetches across the ni
        # grid axis) win big: 132 -> 150 TFLOP/s at square FLUX shapes,
        # 232 -> 265 at the MLP in/out pair. The 4-bit formats LOSE at
        # full-N (102 -> 91: per-packed-tile decode cost scales with bn and
        # the VMEM clamp shrinks bm), so they keep bn 1024.
        bn_cap = 3072 if s8_act else 1024
    # Opt-in 16-bit in-VMEM decode (2x VPU lanes for the select tree / scale
    # math). Measured on v5e at FLUX shapes it is perf-neutral — the kernel
    # sits at ~86% of the dense-XLA speed of light and the VPU decode is NOT
    # the limiter — while adding ~2^-9 relative rounding, so the default
    # stays the f32 decode (bit-exact vs the XLA dequantize+matmul path).
    # May help on parts with narrower VPUs; enable to experiment.
    import os

    fast16 = (
        jnp.dtype(x.dtype).itemsize == 2
        and bool(os.environ.get("DIFFUSION_RS_TPU_QMM_FAST16"))
    )
    if _plan_tiles(x2.shape[0], k, n, qt.bits, qt.group, qt.split,
                   qt.bias is not None, bm_cap, bn_cap,
                   jnp.dtype(out_dtype).itemsize) is None:
        warn_once(
            f"qmm-vmem-{qt.kind}-{k}x{n}",
            f"quantized_matmul: no {qt.kind} [{k}x{n}] (group {qt.group}) "
            "tile plan fits the kernel VMEM budget; falling back to XLA "
            "dequantize+matmul",
        )
        w = dequantize(qt, x.dtype)
        return jnp.matmul(x2, w, preferred_element_type=jnp.float32).astype(
            out_dtype
        ).reshape(*lead, n)
    qmm = make_partitioned_qmm(
        qt.bits, qt.group, qt.split, (k, n), jnp.dtype(out_dtype),
        interpret, bm_cap, bn_cap,
        qt.bias is not None, qt.codebook is not None, s8_act, fast16,
    )
    args = [x2, qt.packed, qt.scale]
    if qt.bias is not None:
        args.append(qt.bias)
    if qt.codebook is not None:
        args.append(qt.codebook)
    out = qmm(*args)
    return out.reshape(*lead, n)


# ---------------------------------------------------------------------------
# Grouped quantized matmul: several (x_g, w_g) pairs of the SAME [K, N]
# quantized format through ONE kernel launch, with each m-tile selecting its
# group's weight plane by grid index (megablocks-style static grouping).
#
# Why (BENCH.md r5): FLUX double blocks project the txt stream at
# M = 512·batch, where a standalone call runs at ~24% of the rate of the
# img stream's M = 4096 call (35.8 vs 149.9 TFLOP/s at production tiles) —
# per-call work is the limiter, not M itself. Grouping the txt and img
# projections into one launch rides the txt rows on the img call's grid:
# same weight traffic (both streams already plan bm = 512 m-tiles), one
# dispatch, full-rate throughout. The reference has no analogue (its
# streams run as separate QuantMethod::forward calls, model.rs:523-565).
# ---------------------------------------------------------------------------


def _qmm_grouped_kernel(
    x_ref, packed_ref, scale_ref, bias_ref, cb_ref, o_ref, acc_ref,
    *, bits, group, bk, bn, has_bias, has_cb, s8_act=False, fast16=False
):
    """Same math as _qmm_kernel; packed/scale/bias blocks carry a leading
    group axis of size 1 (selected by the m-tile's group in the index map)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if s8_act:
        x = x_ref[...].astype(jnp.float32)
        ax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        sx = jnp.where(ax == 0.0, 1.0, ax / 127.0)
        xq = jnp.round(x / sx).astype(jnp.int8)
        prod = jax.lax.dot(
            xq, packed_ref[0], preferred_element_type=jnp.int32
        )
        acc_ref[...] += prod.astype(jnp.float32) * (
            sx * scale_ref[0, 0, 0][None, :]
        )
    else:
        w = _dequant_tile(
            packed_ref[0],
            scale_ref[0, 0],
            bias_ref[0, 0] if has_bias else None,
            cb_ref if has_cb else None,
            bits=bits,
            group=group,
            bk=bk,
            bn=bn,
            out_dtype=x_ref.dtype,
            fast16=fast16,
        )
        acc_ref[...] += jax.lax.dot(
            x_ref[...], w, preferred_element_type=jnp.float32
        )

    @pl.when(ki == nk - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("ms", "bits", "group", "split", "kn", "out_dtype",
                     "interpret", "bm_cap", "bn_cap", "s8_act", "fast16",
                     "has_bias", "has_cb"),
)
def _qmm_grouped_call(x_cat, packed_s, scale_s, bias_s, codebook, *, ms,
                      bits, group, split, kn, out_dtype, interpret, bm_cap,
                      bn_cap, s8_act, fast16, has_bias, has_cb):
    """x_cat: groups' [m_g_padded, K] rows concatenated (each m_g pre-padded
    to a bm multiple by the caller); packed_s/scale_s/bias_s: the groups'
    planes stacked on a leading axis, scale/bias pre-tiled per k-tile."""
    k, n = kn
    plan = _plan_tiles(max(ms), k, n, bits, group, split, has_bias,
                       bm_cap, bn_cap, jnp.dtype(out_dtype).itemsize)
    bm, bn, bk = plan
    tiles = [_round_up(m, bm) // bm for m in ms]
    bounds = []
    acc = 0
    for t in tiles[:-1]:
        acc += t
        bounds.append(acc)

    def gid(mi):
        g = jnp.int32(0)
        for b in bounds:
            g = g + (mi >= b).astype(jnp.int32)
        return g

    grid = (sum(tiles), n // bn, k // bk)
    k_tiles = k // bk
    rows = max(1, bk // group)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda mi, ni, ki: (mi, ki)),
        pl.BlockSpec(
            (1, (bk // 2) if bits == 4 else bk, bn),
            lambda mi, ni, ki: (gid(mi), ki, ni),
        ),
        pl.BlockSpec(
            (1, 1, rows, bn), lambda mi, ni, ki: (gid(mi), ki, 0, ni)
        ),
    ]
    args = [x_cat, packed_s, scale_s]
    if has_bias:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rows, bn), lambda mi, ni, ki: (gid(mi), ki, 0, ni)
            )
        )
        args.append(bias_s)
    if has_cb:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(codebook)

    def kernel(x_ref, packed_ref, scale_ref, *rest):
        idx = 0
        bias_ref = rest[idx] if has_bias else None
        idx += int(has_bias)
        cb_ref = rest[idx] if has_cb else None
        idx += int(has_cb)
        o_ref = rest[idx]
        acc_ref = rest[idx + 1]
        _qmm_grouped_kernel(
            x_ref, packed_ref, scale_ref, bias_ref, cb_ref, o_ref, acc_ref,
            bits=bits, group=group, bk=bk, bn=bn,
            has_bias=has_bias, has_cb=has_cb, s8_act=s8_act, fast16=fast16,
        )

    m_tot = x_cat.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m_tot, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_tot * k * n,
            bytes_accessed=packed_s.size * packed_s.dtype.itemsize
            + x_cat.size * x_cat.dtype.itemsize + m_tot * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out


def grouped_plan(ms, qt: QuantizedTensor, out_itemsize: int = 2,
                 bm_cap: int = 1536, bn_cap: Optional[int] = None):
    """The (bm, bn, bk) plan a grouped call over these group sizes would
    use, or None when the kernel tiling can't cover the format."""
    if not supports(qt):
        return None
    k, n = qt.shape
    if bn_cap is None:
        bn_cap = 3072 if qt.kind == "q8t" else 1024
    return _plan_tiles(max(ms), k, n, qt.bits, qt.group, qt.split,
                       qt.bias is not None, bm_cap, bn_cap, out_itemsize)


def quantized_matmul_grouped(
    xs,
    qts,
    out_dtype=None,
    interpret: bool = False,
    bm_cap: int = 1536,
    bn_cap: Optional[int] = None,
):
    """Grouped ``[x_g @ deq(qt_g) for g]`` in one kernel launch. All groups
    must share [K, N], format kind/bits/group/split and bias/codebook
    presence; falls back to per-group quantized_matmul otherwise."""
    assert len(xs) == len(qts) and len(xs) >= 2
    k, n = qts[0].shape
    q0 = qts[0]
    same = all(
        qt.shape == (k, n) and qt.kind == q0.kind and qt.bits == q0.bits
        and qt.group == q0.group and qt.split == q0.split
        and (qt.bias is None) == (q0.bias is None)
        and (qt.codebook is None) == (q0.codebook is None)
        for qt in qts
    )
    out_dtype = out_dtype or xs[0].dtype
    leads = [x.shape[:-1] for x in xs]
    x2s = [x.reshape(-1, k) for x in xs]
    ms = tuple(x2.shape[0] for x2 in x2s)
    plan = grouped_plan(ms, q0, jnp.dtype(out_dtype).itemsize, bm_cap,
                        bn_cap) if same else None
    if plan is None:
        return [
            quantized_matmul(x, qt, out_dtype, interpret, bm_cap, bn_cap)
            for x, qt in zip(xs, qts)
        ]
    bm, bn, bk = plan
    if bn_cap is None:
        bn_cap = 3072 if q0.kind == "q8t" else 1024
    s8_act = (
        q0.kind == "q8t" and q0.bits == 8 and q0.bias is None
        and q0.codebook is None and q0.group == min(256, k)
        and max(ms) <= _s8_m_crossover()
    )
    k_tiles = k // bk
    padded = [
        jnp.pad(x2, ((0, _round_up(m, bm) - m), (0, 0)))
        for x2, m in zip(x2s, ms)
    ]
    x_cat = jnp.concatenate(padded, axis=0)
    packed_s = jnp.stack([qt.packed for qt in qts])
    scale_s = jnp.stack([
        _tile_scale_plane(qt.scale, k_tiles, q0.group, bk, n) for qt in qts
    ])
    bias_s = (
        jnp.stack([
            _tile_scale_plane(qt.bias, k_tiles, q0.group, bk, n)
            for qt in qts
        ])
        if q0.bias is not None else None
    )
    out = _qmm_grouped_call(
        x_cat, packed_s, scale_s, bias_s, q0.codebook, ms=ms,
        bits=q0.bits, group=q0.group, split=q0.split, kn=(k, n),
        out_dtype=jnp.dtype(out_dtype), interpret=interpret,
        bm_cap=bm_cap, bn_cap=bn_cap, s8_act=s8_act,
        fast16=False, has_bias=q0.bias is not None,
        has_cb=q0.codebook is not None,
    )
    outs = []
    off = 0
    for m, lead in zip(ms, leads):
        mp = _round_up(m, bm)
        outs.append(out[off:off + m].reshape(*lead, n))
        off += mp
    return outs
