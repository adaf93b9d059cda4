#!/usr/bin/env python
"""Kernel microbenchmarks on the live TPU: fused dequant-matmul (qmm) and
flash attention, with tile-size sweeps. In-graph repeats amortize dispatch.

Usage:
  python tools/kernel_bench.py qmm   [--m 4608] [--k 3072] [--n 3072] [--kind nf4]
  python tools/kernel_bench.py sweep [--m 4608] [--k 3072] [--n 3072]
  python tools/kernel_bench.py flash [--b 1] [--h 24] [--s 4608] [--d 128]
"""

from __future__ import annotations

import argparse
import pathlib
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _timeit(fn, *args, iters=20, warmup=3):
    """fn must return a SCALAR (reduce inside the jit): through the axon
    HTTP relay, block_until_ready() on a device array can return before
    execution finishes (async dispatch), silently measuring dispatch instead
    of compute — float() forces the D2H of 4 bytes, which cannot complete
    before the computation does."""
    for _ in range(warmup):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def bench_qmm(args):
    import jax
    import jax.numpy as jnp

    from diffusion_rs_tpu.quant import bnb
    from diffusion_rs_tpu.quant.qtensor import (
        quantize_q4_0,
        quantize_q8_0,
        quantize_q8_tile,
    )
    from diffusion_rs_tpu.ops.qmatmul_pallas import _qmm_call

    rng = np.random.default_rng(0)
    m, k, n = args.m, args.k, args.n
    w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    if args.kind == "nf4":
        qt = bnb.quantize_nf4(np.ascontiguousarray(w.T), blocksize=64)
    elif args.kind == "q4_0":
        qt = quantize_q4_0(w)
    elif args.kind == "q8t":
        qt = quantize_q8_tile(w)  # s8 x s8 MXU path (VERDICT r2 next #6)
    else:
        qt = quantize_q8_0(w)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    planes = [jnp.asarray(qt.packed), jnp.asarray(qt.scale)]
    if qt.bias is not None:
        planes.append(jnp.asarray(qt.bias))
    if qt.codebook is not None:
        planes.append(jnp.asarray(qt.codebook))

    flops = 2.0 * m * k * n

    # Rectangular shapes (K != N) chain a [K,N] / [N,K] weight pair so the
    # composition maps [M,K] -> [M,K]; reported TFLOP/s averages both.
    if k != n:
        w2 = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        if args.kind == "nf4":
            qt2 = bnb.quantize_nf4(np.ascontiguousarray(w2.T), blocksize=64)
        elif args.kind == "q4_0":
            qt2 = quantize_q4_0(w2)
        elif args.kind == "q8t":
            qt2 = quantize_q8_tile(w2)
        else:
            qt2 = quantize_q8_0(w2)
        planes2 = [jnp.asarray(qt2.packed), jnp.asarray(qt2.scale)]
        if qt2.bias is not None:
            planes2.append(jnp.asarray(qt2.bias))
        if qt2.codebook is not None:
            planes2.append(jnp.asarray(qt2.codebook))
        flops = 2.0 * 2.0 * m * k * n  # forward + back-projection per rep
    else:
        qt2, planes2 = None, None

    def run(bm_cap, bn_cap, reps=100):
        bias_i = 2 if qt.bias is not None else None
        cb_i = -1 if qt.codebook is not None else None
        import os

        fast16 = bool(os.environ.get("DIFFUSION_RS_TPU_QMM_FAST16"))

        def one(y, q, pl_, bm_cap_, bn_cap_):
            return _qmm_call(
                y, pl_[0], pl_[1],
                pl_[bias_i] if bias_i is not None else None,
                pl_[cb_i] if cb_i is not None else None,
                bits=q.bits, group=q.group, split=q.split,
                kn=q.shape, out_dtype=jnp.dtype(jnp.bfloat16),
                interpret=False, bm_cap=bm_cap_, bn_cap=bn_cap_,
                s8_act=(args.kind == "q8t" and args.s8 != "off"),
                fast16=fast16,
            )

        @jax.jit
        def f(x, *pl_):
            y = x
            p1 = pl_[:len(planes)]
            p2 = pl_[len(planes):]
            for _ in range(reps):  # chained: defeats CSE, amortizes dispatch
                y = one(y, qt, p1, bm_cap, bn_cap)
                if qt2 is not None:
                    y = one(y, qt2, p2, bm_cap, bn_cap)
            return y.sum()

        extra = planes2 if planes2 is not None else []
        t = _timeit(f, x, *planes, *extra, iters=5) / reps
        return flops / t / 1e12

    if args.cmd == "sweep":
        for bm_cap in (768, 1536, 2304, 4608):
            for bn_cap in (256, 512, 1024):
                try:
                    tf = run(bm_cap, bn_cap)
                    print(f"{args.kind} M{m} K{k} N{n} bm{bm_cap} bn{bn_cap}: {tf:.1f} TFLOP/s")
                except Exception as e:
                    print(f"bm{bm_cap} bn{bn_cap}: FAIL {str(e)[:80]}")
    else:
        tf = run(args.bm, args.bn)
        print(f"{args.kind} M{m} K{k} N{n} bm{args.bm} bn{args.bn}: {tf:.1f} TFLOP/s")


def bench_qmm_grouped(args):
    """Grouped (img M=--m + txt M=--m2) vs two separate calls, K=N square
    production shape (the double-block q/k/v/proj pattern, BENCH.md r5)."""
    import jax
    import jax.numpy as jnp

    from diffusion_rs_tpu.quant.qtensor import quantize_q8_tile
    from diffusion_rs_tpu.ops.qmatmul_pallas import (
        quantized_matmul,
        quantized_matmul_grouped,
    )

    rng = np.random.default_rng(0)
    m1, m2, k, n = args.m, args.m2, args.k, args.n
    qts = [
        quantize_q8_tile((rng.standard_normal((k, n)) * 0.02).astype(np.float32))
        for _ in range(2)
    ]
    x1 = jnp.asarray(rng.standard_normal((m1, k)), jnp.bfloat16)
    x2 = jnp.asarray(rng.standard_normal((m2, k)), jnp.bfloat16)
    flops = 2.0 * (m1 + m2) * k * n

    # numerics first: grouped must equal the separate calls bit-for-bit
    g = quantized_matmul_grouped([x1, x2], qts)
    s = [quantized_matmul(x1, qts[0]), quantized_matmul(x2, qts[1])]
    for a, b in zip(g, s):
        d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        assert d == 0.0, f"grouped mismatch {d}"

    reps = 50

    @jax.jit
    def fused(x1, x2):
        y1, y2 = x1, x2
        for _ in range(reps):
            y1, y2 = quantized_matmul_grouped([y1, y2], qts)
        return y1.sum() + y2.sum()

    @jax.jit
    def separate(x1, x2):
        y1, y2 = x1, x2
        for _ in range(reps):
            y1 = quantized_matmul(y1, qts[0])
            y2 = quantized_matmul(y2, qts[1])
        return y1.sum() + y2.sum()

    tg = _timeit(fused, x1, x2, iters=5) / reps
    ts = _timeit(separate, x1, x2, iters=5) / reps
    print(f"qmmg q8t M{m1}+{m2} K{k} N{n}: grouped {flops/tg/1e12:.1f} "
          f"TFLOP/s ({tg*1e6:.0f} us) vs separate {flops/ts/1e12:.1f} "
          f"({ts*1e6:.0f} us) — {ts/tg:.2f}x")


def bench_flash_rope(args):
    """Fused-RoPE seq-major kernel (SURVEY §7.4) vs its unfused equivalent:
    the unfused number must add the XLA rope + transposes to be comparable —
    this benches JUST the kernels; end-to-end deltas come from bench.py."""
    import jax
    import jax.numpy as jnp

    from diffusion_rs_tpu.ops.flash_pallas import _flash_rope_call

    rng = np.random.default_rng(0)
    b, h, s, d = args.b, args.h, args.s, args.d
    q = jnp.asarray(rng.standard_normal((b, s, h * d)), jnp.bfloat16)
    ce = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    se = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    flops = 4.0 * b * h * s * s * d
    reps = 20

    @jax.jit
    def f(q, ce, se):
        y = q
        for _ in range(reps):
            y = _flash_rope_call(y, y, y, ce, se, ce, se, d,
                                 float(d ** -0.5), args.bq, args.bk, False)
        return y.sum()

    t = _timeit(f, q, ce, se, iters=5) / reps
    print(f"flashrope B{b} H{h} S{s} D{d} bq{args.bq} bk{args.bk}: "
          f"{flops/t/1e12:.1f} TFLOP/s")


def bench_flash(args):
    import jax.numpy as jnp
    import jax

    from diffusion_rs_tpu.ops.flash_pallas import _flash_call

    rng = np.random.default_rng(0)
    b, h, s, d = args.b, args.h, args.s, args.d
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
    flops = 4.0 * b * h * s * s * d

    reps = 20
    s8 = bool(getattr(args, "attn_s8", False))
    s8_pv = bool(getattr(args, "s8pv", False))

    @jax.jit
    def f(q):
        y = q
        for _ in range(reps):  # chained: q := attn(q) defeats CSE
            y = _flash_call(y, y, y, float(d ** -0.5), args.bq, args.bk,
                            False, s8=s8, s8_pv=s8_pv)
        return y.sum()

    t = _timeit(f, q, iters=5) / reps
    tag = ("+s8qk" if s8 else "") + ("+s8pv" if s8_pv else "")
    print(f"flash{tag} B{b} H{h} S{s} D{d} bq{args.bq} bk{args.bk}: "
          f"{flops/t/1e12:.1f} TFLOP/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["qmm", "qmmg", "sweep", "flash",
                                    "flashrope"])
    ap.add_argument("--m2", type=int, default=512,
                    help="qmmg: second group's M (txt stream; --m is img)")
    ap.add_argument("--m", type=int, default=4608)
    ap.add_argument("--k", type=int, default=3072)
    ap.add_argument("--n", type=int, default=3072)
    ap.add_argument("--kind", choices=["nf4", "q4_0", "q8_0", "q8t"], default="nf4")
    ap.add_argument("--s8", choices=["auto", "off"], default="auto",
                    help="q8t: force the bf16 dequant path with off "
                         "(M-crossover measurement)")
    ap.add_argument("--bm", type=int, default=1536)
    ap.add_argument("--bn", type=int, default=512)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--h", type=int, default=24)
    ap.add_argument("--s", type=int, default=4608)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--bq", type=int, default=512)
    ap.add_argument("--bk", type=int, default=1536)
    ap.add_argument("--attn-s8", action="store_true",
                    help="flash: s8 x s8 QK^T (BENCH.md r4 A/B)")
    ap.add_argument("--s8pv", action="store_true",
                    help="flash: s8 x s8 P.V (in-kernel p quantize, "
                         "mean-centered int8 v prepass)")
    args = ap.parse_args()
    if args.cmd == "flash":
        bench_flash(args)
    elif args.cmd == "flashrope":
        bench_flash_rope(args)
    elif args.cmd == "qmmg":
        bench_qmm_grouped(args)
    else:
        bench_qmm(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
