"""Blockwise flash attention for TPU (Pallas).

Replaces the reference's fused Metal SDPA kernels
(diffusion_rs_common/src/metal_kernels/mod.rs:1757-2057 call_sdpa_*) and its
naive f32 matmul-softmax-matmul fallback (diffusion_rs_backend/src/ops.rs:247-262)
with a single online-softmax kernel shaped for the MXU:

* QK^T and P·V run in the input dtype (bf16) on the MXU with
  ``preferred_element_type=f32``;
* the softmax running max/denominator and the output accumulator are f32
  VMEM scratch — the same f32-reduction contract as the reference's
  "attention is always f32" rule (models/flux/model.rs:40-50), paid only
  where it matters;
* grid = (batch, heads, q_tiles, kv_tiles) with the kv axis innermost and
  marked "arbitrary" so Mosaic pipelines the q/k/v block DMAs.

FLUX joint attention is full-bidirectional (no mask), so the kernel only
needs a kv-length mask for ragged sequence lengths (e.g. 720x1280 -> 3600
image + 512 text tokens). Padded q rows are sliced off by the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e at FLUX scale (B1 H24 S4608 D128): 50 TFLOP/s vs 25 at 256².
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1536
_NEG_INF = -1e30
_LOG127 = 4.844187086458591  # ln(127): folds the int8 scale into the exp

# Perf-DIAGNOSIS ablations (WRONG RESULTS — never set in production):
#   noexp  — replace the softmax exp with a multiply (isolates the VPU
#            transcendental cost from the MXU matmuls)
#   nomax  — fixed softmax max, no running-max/rescale (isolates the
#            max/alpha bookkeeping cost; still numerically a softmax if
#            logits stay < ~80)
# Read at trace time; used by tools/kernel_bench.py flash only.
import os as _os

_ABLATE = _os.environ.get("DIFFUSION_RS_TPU_FLASH_ABLATE", "")


def _flash_kernel(
    q_ref, k_ref, v_ref, sk_ref, sv_ref, vm_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch, qq_scratch=None, sq_scratch=None,
    *, scale: float, kv_len: int, block_k: int, s8: bool = False,
    s8_pv: bool = False, seq_out: bool = False
):
    kv_i = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]  # [bq, d]
    k = k_ref[0, 0]  # [bk, d]
    if s8:
        # s8 x s8 QK^T on the MXU (2x the bf16 MXU rate on v5e — the same
        # int8 precedent as the q8t matmul format, ops/qmatmul_pallas.py).
        # k arrives ALREADY int8 from the XLA prepass (_quantize_k): centered
        # by the global per-(b,h) k mean — softmax_j(q_i . k_j) is exactly
        # invariant under k_j -> k_j - km, so centering costs nothing and
        # removes the common-mode component from the int8 grid (the
        # SageAttention "smooth k" observation, arXiv:2410.02367) — with ONE
        # scalar scale per kv tile (sk_ref, SMEM). Keeping the quantize out
        # of the kernel matters: an in-kernel per-tile quantize re-ran per
        # q-tile and its VPU cost made the kernel SLOWER than bf16 (70 vs 81
        # TFLOP/s measured); the prepass also halves the k DMA stream.
        # q is quantized in-kernel, once per q tile (amortized over the kv
        # axis), with per-row scales that broadcast along s rows for free.
        @pl.when(kv_i == 0)
        def _quantize_q():
            qf = q.astype(jnp.float32)
            aq = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)  # [bq, 1]
            sq = jnp.where(aq == 0.0, 1.0, aq / 127.0)
            qq_scratch[...] = jnp.round(qf / sq).astype(jnp.int8)
            sq_scratch[...] = jnp.broadcast_to(sq, sq_scratch.shape)

        s_i = jax.lax.dot_general(
            qq_scratch[...], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # sk is the WHOLE [b, h, n_tiles] scale array in SMEM (tiny), indexed
        # by grid position — per-block SMEM slices trip Mosaic's block-shape
        # divisibility rules.
        sk = sk_ref[pl.program_id(0), pl.program_id(1), kv_i]
        s = s_i.astype(jnp.float32) * (
            sq_scratch[...][:, :1] * (sk * scale)
        )
    else:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bk] f32

    # Mask ragged kv tail (static shapes; only the last tile pays the select).
    if kv_len % block_k != 0:
        col = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    if _ABLATE == "nomax":
        # fixed max: no running max, no rescale (diagnosis only)
        p = jnp.exp(s - 30.0)
        alpha = None
        m_next = None
        beta = None
        l_prev = l_scratch[...]
    else:
        m_prev = m_scratch[...]  # [bq, 128] lane-replicated
        l_prev = l_scratch[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_next = jnp.maximum(m_prev, m_cur)  # broadcast -> [bq, 128]
        alpha = jnp.exp(m_prev - m_next)  # [bq, 128]
        # s8_pv references p to THIS block's row max (p in (0, 1] with max
        # exactly 1 per block) so the int8 grid keeps ~7 bits of relative
        # precision in EVERY kv block, however far the block sits below the
        # running max; the block's true weight beta = exp(m_cur - m_next)
        # is folded back as a per-row f32 scalar into pv and l alike.
        # Without this, a block 5.5+ logits below the running max quantizes
        # to all-zeros and its diffuse mass is silently renormalized away
        # (the ADVICE r4 finding). Same [bq, bk] exp count either way.
        # s8_pv folds the x127 quantize scale INTO the exp argument:
        # exp(s - (m_cur - log 127)) == 127 * exp(s - m_cur), so the int8
        # grid value comes straight out of the exp with NO extra [bq, bk]
        # multiply pass (the quantize then costs only the +0.5 round bias
        # and the int8 cast — and the bf16 path pays a cast on p too).
        ref_pt = (m_cur - _LOG127) if s8_pv else m_next[:, :1]
        if _ABLATE == "noexp":
            p = (s - ref_pt) * 0.001  # multiply instead of exp
        else:
            p = jnp.exp(s - ref_pt)  # [bq, bk]; in [0, 127] when s8_pv
        beta = jnp.exp(m_cur - m_next[:, :1]) if s8_pv else None  # [bq, 1]

    v = v_ref[0, 0]  # [bk, d] (int8 when s8_pv)
    if s8_pv:
        # s8 x s8 P.V: unlike QK^T (K = head_dim = 128, pipeline-latency
        # bound — BENCH.md r4), P.V contracts over the kv tile (block_k),
        # so the systolic pipeline is full and the int8 MXU rate can bite.
        # p = exp(s - m_cur) is exactly in [0, 1], so a FIXED 127 scale
        # quantizes it with no max pass; v arrives int8 from the XLA
        # prepass (_quantize_v: per-(b,h) mean-centered — exact, the mean
        # is added back at finalize since softmax weights sum to 1 — with
        # one scalar scale per kv tile, halving the v DMA stream).
        # p >= 0, so adding 0.5 and truncating == round-half-up — cheaper on
        # the VPU than round-half-even. p already carries the x127 scale
        # (folded into the exp argument above), so the quantize is just the
        # round bias + the int8 cast — the bf16 path pays a cast on p too.
        if beta is None:  # nomax diagnosis path: p is unscaled there
            pq = (p * 127.0 + 0.5).astype(jnp.int8)
        else:
            pq = (p + 0.5).astype(jnp.int8)
        pv_i = jax.lax.dot_general(
            pq, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sv = sv_ref[pl.program_id(0), pl.program_id(1), kv_i]
        sv_s = sv * (1.0 / 127.0) if beta is None else beta * (sv / 127.0)
        pv = pv_i.astype(jnp.float32) * sv_s
        # l accumulates the SAME quantized weights (x the same beta) the
        # accumulator saw: sum(pq)*beta/127 instead of sum(p) keeps o an
        # exact convex combination of v rows (quantization error cancels in
        # o's scale instead of biasing it). The reduction runs in int32 (VPU
        # int adds, no f32 convert pass over the tile); only the [bq,1]
        # result converts.
        l_q = jnp.sum(pq, axis=-1, keepdims=True,
                      dtype=jnp.int32).astype(jnp.float32) * (1.0 / 127.0)
        l_contrib = l_q if beta is None else l_q * beta
    else:
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_contrib = jnp.sum(p, axis=-1, keepdims=True)

    if alpha is None:
        l_scratch[...] = l_prev + l_contrib
    else:
        l_scratch[...] = l_prev * alpha + l_contrib
        m_scratch[...] = m_next
    if alpha is None:
        acc_scratch[...] = acc_scratch[...] + pv
    else:
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    @pl.when(kv_i == n_kv - 1)
    def _finalize():
        l = l_scratch[...][:, :1]
        # Padded q rows can have l == 0; keep them finite (sliced off later).
        l_safe = jnp.where(l == 0.0, 1.0, l)
        of = acc_scratch[...] * pl.reciprocal(l_safe, approx=False)
        if s8_pv:
            # add back the per-(b,h) v mean removed by _quantize_v — exact,
            # since the softmax weights sum to 1 (and o is an exact convex
            # combination of v rows under the quantized-l normalization)
            of = of + vm_ref[0, 0, 0][None, :]
        o = of.astype(o_ref.dtype)
        if seq_out:
            # output block is a per-head column slice of [B, S, H*D] — the
            # head-merge transpose after attention disappears (VERDICT r3
            # next #2: write the output seq-major, keep inputs [B,H,S,D]).
            o_ref[0] = o
        else:
            o_ref[0, 0] = o
        if lse_ref is not None:
            # log-sum-exp per q row (lane-replicated, [bq, 128]) — the
            # residual ring attention needs to merge per-chunk outputs.
            lse_ref[0, 0] = m_scratch[...] + jnp.log(l_safe)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quantize_k(k, block_k: int):
    """XLA prepass for the s8 kernel: center k by its global per-(b,h) mean
    (exact — softmax over kv is invariant to any constant shift of all k
    rows) and symmetric-int8 quantize with ONE scalar scale per kv tile.
    Returns kq [b,h,skv_p,d] int8 (tile-padded with zeros) and
    sk [b,h,n_tiles] f32. XLA fuses this into ~2 passes over k; the kernel
    then streams HALF the k bytes and does no quantize work per tile."""
    b, h, skv, d = k.shape
    kf = k.astype(jnp.float32)
    kc = kf - jnp.mean(kf, axis=2, keepdims=True)
    skv_p = _round_up(skv, block_k)
    if skv_p != skv:
        kc = jnp.pad(kc, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    n_t = skv_p // block_k
    kt = kc.reshape(b, h, n_t, block_k, d)
    ak = jnp.max(jnp.abs(kt), axis=(3, 4))  # [b, h, n_t]
    sk = jnp.where(ak == 0.0, 1.0, ak / 127.0)
    kq = jnp.round(kt / sk[..., None, None]).astype(jnp.int8)
    return kq.reshape(b, h, skv_p, d), sk


def _quantize_v(v, block_k: int):
    """XLA prepass for the s8 P.V path: center v by its global per-(b,h)
    channel mean (exact — the softmax weights sum to 1, so the mean is added
    back to the output at finalize; the same smoothing observation as k, it
    removes the common-mode component from the int8 grid) and
    symmetric-int8 quantize with ONE scalar scale per kv tile. Returns
    vq [b,h,skv_p,d] int8 (tile-padded with zeros), sv [b,h,n_tiles] f32,
    and the removed mean vm [b,h,d] f32. The kernel streams HALF the v
    bytes."""
    b, h, skv, d = v.shape
    vf = v.astype(jnp.float32)
    vm = jnp.mean(vf, axis=2)  # [b, h, d]
    vc = vf - vm[:, :, None, :]
    skv_p = _round_up(skv, block_k)
    if skv_p != skv:
        vc = jnp.pad(vc, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    n_t = skv_p // block_k
    vt = vc.reshape(b, h, n_t, block_k, d)
    av = jnp.max(jnp.abs(vt), axis=(3, 4))  # [b, h, n_t]
    sv = jnp.where(av == 0.0, 1.0, av / 127.0)
    vq = jnp.round(vt / sv[..., None, None]).astype(jnp.int8)
    return vq.reshape(b, h, skv_p, d), sv, vm


def s8pv_dropped_mass(q, k, scale: Optional[float] = None,
                      block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    """Offline diagnostic for the s8_pv path (pure XLA, no kernel): the
    fraction of true softmax mass truncated to zero by the in-kernel
    per-block int8 p quantization — keys whose weight relative to their OWN
    kv block's row max is below the int8 round-up threshold (0.5/127).

    The per-block reference point means a whole block sitting far below the
    running max contributes at full 7-bit precision (its mass is NOT
    dropped); what remains is the within-block tail of the sharpest blocks.
    Used by the adversarial parity test (tests/test_ops.py) and available to
    tools/validate_real.py for real-checkpoint audits before trusting the
    s8_pv default on a new model family."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bhsd,bhtd->bhst", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * jnp.float32(scale)
    skv = s.shape[-1]
    skv_p = _round_up(skv, block_k)
    if skv_p != skv:
        s = jnp.pad(s, ((0, 0), (0, 0), (0, 0), (0, skv_p - skv)),
                    constant_values=_NEG_INF)
    st = s.reshape(*s.shape[:-1], skv_p // block_k, block_k)
    p_rel = jnp.exp(st - jnp.max(st, axis=-1, keepdims=True))
    mass = jax.nn.softmax(s, axis=-1).reshape(st.shape)
    dropped = jnp.sum(jnp.where(p_rel < 0.5 / 127.0, mass, 0.0),
                      axis=(-1, -2))
    return dropped  # [b, h, sq] fraction in [0, 1]


def _mk_kernel(save_lse: bool, **kw):
    """Adapt _flash_kernel's full signature to the actual pallas arg list
    (sk input only when s8; sv/vm inputs only when s8_pv; lse output only
    when save_lse)."""
    s8, s8_pv = kw["s8"], kw["s8_pv"]

    def k_(*refs):
        refs = list(refs)
        q, k, v = refs[:3]
        rest = refs[3:]
        sk = rest.pop(0) if s8 else None
        sv = rest.pop(0) if s8_pv else None
        vm = rest.pop(0) if s8_pv else None
        o = rest.pop(0)
        lse = rest.pop(0) if save_lse else None
        _flash_kernel(q, k, v, sk, sv, vm, o, lse, *rest, **kw)

    return k_


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret", "save_lse",
                     "s8", "seq_out", "s8_pv"),
)
def _flash_call(q, k, v, scale, block_q, block_k, interpret, save_lse=False,
                s8=False, seq_out=False, s8_pv=False):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_k)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    sk = None
    if s8:
        k, sk = _quantize_k(k, block_k)  # handles its own kv padding
    elif skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    sv = vm = None
    if s8_pv:
        v, sv, vm = _quantize_v(v, block_k)  # handles its own kv padding
    elif skv_p != skv:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))

    if seq_out and save_lse:
        raise NotImplementedError("seq_out + save_lse unused (ring is bhsd)")
    grid = (b, h, sq_p // block_q, skv_p // block_k)
    kw = dict(scale=scale, kv_len=skv, block_k=block_k, s8=s8, s8_pv=s8_pv,
              seq_out=seq_out)
    if seq_out:
        o_spec = pl.BlockSpec(
            (1, block_q, d), lambda b_, h_, qi, ki: (b_, qi, h_)
        )
        o_shape = jax.ShapeDtypeStruct((b, sq_p, h * d), q.dtype)
    else:
        o_spec = pl.BlockSpec(
            (1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)
        )
        o_shape = jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype)
    kernel = _mk_kernel(save_lse, **kw)
    if save_lse:
        out_specs = [
            o_spec,
            pl.BlockSpec((1, 1, block_q, 128), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        ]
        out_shape = [
            o_shape,
            jax.ShapeDtypeStruct((b, h, sq_p, 128), jnp.float32),
        ]
    else:
        out_specs = o_spec
        out_shape = o_shape
    scratch_shapes = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    if s8:
        scratch_shapes += [
            pltpu.VMEM((block_q, d), jnp.int8),     # qq
            pltpu.VMEM((block_q, 128), jnp.float32),  # sq (lane-replicated)
        ]
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
        pl.BlockSpec((1, 1, block_k, d), lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
    ]
    args = [q, k, v]
    if s8:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(sk)
    if s8_pv:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(sv)
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, d), lambda b_, h_, qi, ki: (b_, h_, 0, 0)
        ))
        args.append(vm[:, :, None, :])
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d,
            bytes_accessed=q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize  # int8 when s8: half the stream
            + v.size * v.dtype.itemsize  # int8 when s8_pv
            + b * h * sq_p * d * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
        interpret=interpret,
    )(*args)
    if save_lse:
        out, lse = outs
        if sq_p != sq:
            out, lse = out[:, :, :sq, :], lse[:, :, :sq, :]
        return out, lse[..., 0]  # lanes are replicated
    out = outs
    if sq_p != sq:
        out = out[:, :sq, :] if seq_out else out[:, :, :sq, :]
    return out




def _flash_rope_kernel(
    q_ref, k_ref, v_ref, ceq_ref, seq_ref, cek_ref, sek_ref,
    o_ref, m_scratch, l_scratch, acc_scratch, qrot_scratch,
    *, scale: float, kv_len: int, block_k: int, d: int
):
    """Seq-major flash attention with FUSED half-split RoPE (SURVEY §7.4).

    Differences from _flash_kernel:
    * q/k/v arrive in their natural post-projection layout [B, S, H*D] — the
      BlockSpec index map slices each head's D columns, so the [B,H,S,D]
      head-split transposes (and their HBM round-trips) disappear;
    * q and k tiles are rotated IN VMEM: rot(x) = ce*x + se*roll(x, D/2)
      (the half-split RoPE form — see ops/rope.py apply_rope_halfsplit and
      the load-time column permutation in models/optimize.py). q is rotated
      once per q tile (kv_i == 0) into scratch; k per kv tile. The separate
      XLA rope over q/k (one extra HBM round-trip of each) disappears.
    Reference equivalent: fused_rope.cu:75-213 applied inside attention at
    models/flux/model.rs:97-103.
    """
    kv_i = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)
        qf = q_ref[0].astype(jnp.float32)  # [bq, d]
        qr = ceq_ref[0] * qf + seq_ref[0] * pltpu.roll(qf, d // 2, axis=1)
        qrot_scratch[...] = qr.astype(qrot_scratch.dtype)

    kf = k_ref[0].astype(jnp.float32)  # [bk, d]
    kr = (cek_ref[0] * kf + sek_ref[0] * pltpu.roll(kf, d // 2, axis=1)
          ).astype(k_ref.dtype)
    s = jax.lax.dot_general(
        qrot_scratch[...], kr, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, bk] f32

    if kv_len % block_k != 0:
        col = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    v = v_ref[0]  # [bk, d]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    @pl.when(kv_i == n_kv - 1)
    def _finalize():
        l = l_scratch[...][:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] * pl.reciprocal(
            l_safe, approx=False
        )).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("head_dim", "scale", "block_q", "block_k", "interpret"),
)
def _flash_rope_call(q, k, v, ce_q, se_q, ce_k, se_k, head_dim, scale,
                     block_q, block_k, interpret):
    """q/k/v: [B, S, H*D] seq-major; ce/se: [B, S, D] f32 expanded tables
    (ops/rope.py expand_rope_tables). Output [B, Sq, H*D]."""
    b, sq, n = q.shape
    skv = k.shape[1]
    d = head_dim
    h = n // d
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_k)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
        ce_q = jnp.pad(ce_q, ((0, 0), (0, sq_p - sq), (0, 0)))
        se_q = jnp.pad(se_q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))
        ce_k = jnp.pad(ce_k, ((0, 0), (0, skv_p - skv), (0, 0)))
        se_k = jnp.pad(se_k, ((0, 0), (0, skv_p - skv), (0, 0)))

    grid = (b, h, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_rope_kernel, scale=scale, kv_len=skv, block_k=block_k, d=d
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, h_, qi, ki: (b_, qi, h_)),
            pl.BlockSpec((1, block_k, d), lambda b_, h_, qi, ki: (b_, ki, h_)),
            pl.BlockSpec((1, block_k, d), lambda b_, h_, qi, ki: (b_, ki, h_)),
            pl.BlockSpec((1, block_q, d), lambda b_, h_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((1, block_q, d), lambda b_, h_, qi, ki: (b_, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, h_, qi, ki: (b_, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b_, h_, qi, ki: (b_, ki, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b_, h_, qi, ki: (b_, qi, h_)
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, n), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + b * sq_p * n * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
        interpret=interpret,
    )(q, k, v, ce_q, se_q, ce_k, se_k)
    return out[:, :sq, :] if sq_p != sq else out


def _flash_sm_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
    *, scale: float, kv_len: int, block_k: int
):
    """Seq-major flash attention (no in-kernel rope): q/k/v blocks are
    per-head column slices of [B, S, H*D] — the head-split/merge transposes
    disappear; rope is applied OUTSIDE in half-split form where XLA fuses it
    into the projection epilogue. Measured on-chip: streaming the f32 rope
    tables per kv tile (the _flash_rope_kernel variant) costs more HBM
    bandwidth than the fused rotation saves (BENCH.md round 3), so this is
    the production kernel; the full-fusion variant stays opt-in."""
    kv_i = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(kv_i == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    if kv_len % block_k != 0:
        col = kv_i * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_scratch[...] = m_next
    l_scratch[...] = l_next

    v = v_ref[0]
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    @pl.when(kv_i == n_kv - 1)
    def _finalize():
        l = l_scratch[...][:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[...] * pl.reciprocal(
            l_safe, approx=False
        )).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("head_dim", "scale", "block_q", "block_k", "interpret"),
)
def _flash_sm_call(q, k, v, head_dim, scale, block_q, block_k, interpret):
    """Seq-major [B, S, H*D] flash attention call (rope already applied)."""
    b, sq, n = q.shape
    skv = k.shape[1]
    d = head_dim
    h = n // d
    sq_p = _round_up(sq, block_q)
    skv_p = _round_up(skv, block_k)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0)))
    if skv_p != skv:
        k = jnp.pad(k, ((0, 0), (0, skv_p - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_p - skv), (0, 0)))

    grid = (b, h, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_sm_kernel, scale=scale, kv_len=skv, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, h_, qi, ki: (b_, qi, h_)),
            pl.BlockSpec((1, block_k, d), lambda b_, h_, qi, ki: (b_, ki, h_)),
            pl.BlockSpec((1, block_k, d), lambda b_, h_, qi, ki: (b_, ki, h_)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b_, h_, qi, ki: (b_, qi, h_)
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, n), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + b * sq_p * n * q.dtype.itemsize,
            transcendentals=b * h * sq_p * skv_p,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :sq, :] if sq_p != sq else out


def flash_attention_fused(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    ce: jnp.ndarray,
    se: jnp.ndarray,
    head_dim: int,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    rope_in_kernel: Optional[bool] = None,
) -> jnp.ndarray:
    """Seq-major self-attention with fused RoPE: q/k/v [B, S, H*D] (the
    natural projection output layout), expanded tables ce/se [B, S, D]
    (expand_rope_tables). Requires head_dim to be a lane multiple (128) —
    callers fall back to the unfused path otherwise.

    ``rope_in_kernel``: rotate q/k tiles inside the kernel; default (False /
    DIFFUSION_RS_TPU_ATTN_LAYOUT=inkernel) rotates outside, where XLA fuses
    the half-split rotation into the projection epilogue — the in-kernel
    variant re-streams the f32 tables per kv tile and measured SLOWER
    (BENCH.md r3); kept for future-hardware re-evaluation."""
    if head_dim % 128 != 0:
        raise NotImplementedError("fused-RoPE kernel needs head_dim % 128 == 0")
    if q.shape[-1] % head_dim != 0:
        raise NotImplementedError("q last dim must be a head_dim multiple")
    if scale is None:
        scale = 1.0 / (head_dim ** 0.5)
    block_q = min(block_q, _round_up(q.shape[1], 128))
    block_k = min(block_k, _round_up(k.shape[1], 128))
    import os

    from .partitioned import make_partitioned_flash_rope

    if rope_in_kernel is None:
        rope_in_kernel = (
            os.environ.get("DIFFUSION_RS_TPU_ATTN_LAYOUT") == "inkernel"
        )
    fa = make_partitioned_flash_rope(
        head_dim, float(scale), block_q, block_k, interpret, rope_in_kernel
    )
    return fa(q, k, v, ce, se)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
    s8: bool = False,
    out_seqmajor: bool = False,
    s8_pv: bool = False,
) -> jnp.ndarray:
    """q, k, v: [B, H, S, D] -> [B, H, Sq, D] (or [B, Sq, H*D] with
    ``out_seqmajor`` — the kernel writes each head's output block straight
    into its column slice, so the head-merge transpose before the o-proj
    disappears).

    ``s8`` runs QK^T as s8 x s8 on the MXU (per-row q scales, per-tile
    smoothed k scale — see _flash_kernel); softmax state and P.V stay
    f32/bf16. Exactness: ~1e-3 relative on outputs at FLUX magnitudes
    (tests/test_ops.py parity band), vs 2x MXU rate on the QK^T half.

    ``s8_pv`` runs P.V as s8 x s8: p is exactly in [0, 1] (fixed 127 scale,
    quantized in-kernel with matching l normalization), v is int8 from an
    XLA prepass (per-(b,h) mean-centered — exact, added back at finalize —
    with one scale per kv tile). Independent of ``s8``; unlike QK^T this
    contraction runs over block_k, so the int8 MXU rate applies where the
    kernel is MAC-bound.

    Any head_dim is accepted: D is zero-padded up to the next lane multiple
    (128) before the kernel — exact for attention (zero Q/K columns add 0 to
    QK^T; extra V columns are sliced off). The reference's Metal SDPA covers
    head dims 32-256 (diffusion_rs_backend/src/ops.rs:65-118); this covers
    all of them (64-dim heads pay 2x lanes, still faster than the XLA path).
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / (d ** 0.5)  # scale from the TRUE head dim, pre-pad
    d_p = _round_up(d, 128)
    if d_p != d:
        if out_seqmajor:
            # padded D columns would interleave into the merged [B,S,H*D]
            # output; callers with odd head dims use the bhsd layout.
            raise NotImplementedError("out_seqmajor needs head_dim % 128 == 0")
        pad = ((0, 0), (0, 0), (0, 0), (0, d_p - d))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    block_q = min(block_q, _round_up(q.shape[2], 128))
    block_k = min(block_k, _round_up(k.shape[2], 128))
    # Route through the custom_partitioning wrapper so batch/head-sharded
    # inputs under a mesh run the kernel per-shard instead of being
    # replicated by GSPMD (ops/partitioned.py). Without a mesh this is the
    # plain kernel call.
    from .partitioned import make_partitioned_flash

    fa = make_partitioned_flash(float(scale), block_q, block_k, interpret,
                                s8, out_seqmajor, s8_pv)
    out = fa(q, k, v)
    return out[..., :d] if d_p != d else out
