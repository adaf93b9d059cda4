#!/usr/bin/env python
"""One-command TPU kernel re-certification (VERDICT r3 next #8).

Compiles and runs the Pallas kernel matrix on the live chip, checks
numerics against the XLA references, and compares throughput against the
BENCH.md recorded rates. Run on any bench host after a kernel change:

    python tools/smoke_tpu.py            # full matrix, ~2-4 min warm cache
    python tools/smoke_tpu.py --quick    # numerics only (no perf gates)

Exit 0 = every kernel compiled, matched numerics, and hit >= (1 - slack)
of its recorded TFLOP/s (default slack 15% — chip-day variance measured
<2%, so a miss means a real regression).

All Pallas-kernel CI is interpret-mode (no Mosaic); this is the tool that
closes the gap on real hardware in one command.
"""

from __future__ import annotations

import argparse
import pathlib
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# BENCH.md recorded rates (v5e, tools/kernel_bench.py methodology).
REFERENCE_TFLOPS = {
    "qmm-nf4-4608x3072x3072": 102.0,
    "qmm-q8t-4608x3072x3072": 150.0,
    "qmm-q8t-mlp-4608x3072x12288": 255.0,
    "flash-bf16-1x24x4608x128": 76.0,
    "flash-s8-1x24x4608x128": 72.0,  # r4: ~parity with bf16 (K=128 bound)
    # r5: REJECTED as default (the in-kernel p quantize + int8 plumbing
    # cost more than the int8 MXU saves at N=d=128); opt-in path still
    # gated so a regression in it is caught
    "flash-s8pv-1x24x4608x128": 63.0,
}


def _timeit(fn, *args, iters=10, warmup=3):
    # scalar D2H forces completion through the axon HTTP relay
    for _ in range(warmup):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


class Result:
    def __init__(self):
        self.rows = []
        self.ok = True

    def add(self, name, passed, detail):
        self.rows.append((name, passed, detail))
        self.ok &= passed
        print(f"  {'PASS' if passed else 'FAIL'} {name}: {detail}")


def smoke_qmm(res: Result, kind: str, m: int, k: int, n: int, quick: bool,
              slack: float):
    import jax
    import jax.numpy as jnp

    from diffusion_rs_tpu.ops.qmatmul_pallas import quantized_matmul
    from diffusion_rs_tpu.quant import bnb
    from diffusion_rs_tpu.quant.qtensor import dequantize, quantize_q8_tile

    name = f"qmm-{kind}-{m}x{k}x{n}"
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
    qt = (bnb.quantize_nf4(np.ascontiguousarray(w.T), blocksize=64)
          if kind == "nf4" else quantize_q8_tile(w))
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)

    # numerics vs the XLA dequant reference. All comparisons reduce ON
    # DEVICE to scalars: large-array D2H can race the axon relay and fetch
    # garbage (the r4 false-FAIL), and a nan rel would wash out as
    # nan > tol == False — check finiteness explicitly first.
    got = quantized_matmul(x, qt, out_dtype=jnp.float32)
    want = jnp.matmul(x, dequantize(qt, jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    if not bool(jnp.isfinite(got).all()):
        res.add(name, False, "kernel output has non-finite values")
        return
    denom = float(jnp.abs(want).sum()) or 1.0
    rel = float(jnp.abs(got - want).sum()) / denom
    # q8t runs s8 x s8: per-row int8 ACTIVATION quantization adds ~7e-3 rel
    # at standard-normal K=3072 — inside the reference's 0.02 quantized
    # matmul budget (core/tests/quantized_tests.rs:40-46, same budget as
    # tests/test_ops.py); nf4 decodes weights exactly vs the bf16 reference.
    tol = 2e-2 if kind.startswith("q8t") else 1e-6

    if rel > tol:
        res.add(name, False, f"numerics rel err {rel:.2e} > {tol}")
        return
    if quick:
        res.add(name, True, f"numerics rel err {rel:.2e}")
        return

    # Perf methodology must match how the LIBRARY runs: weight planes are
    # jit ARGUMENTS (model params are pytree args in the pipeline), never
    # closed-over constants — closure constants measured 24% slower on-chip
    # (r4). reps=100 amortizes the axon-relay dispatch (~6 ms/invocation);
    # reps=50 under-reported by ~25%.
    reps = 100

    if k != n:  # chain with a back-projection so shapes compose
        w2 = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        qt2 = (bnb.quantize_nf4(np.ascontiguousarray(w2.T), blocksize=64)
               if kind == "nf4" else quantize_q8_tile(w2))

        @jax.jit
        def f(x, qt, qt2):
            y = x
            for _ in range(reps):
                y = quantized_matmul(quantized_matmul(y, qt), qt2)
            return y.sum()

        flops = 2.0 * 2.0 * m * k * n
        t = _timeit(f, x, qt, qt2, iters=5) / reps
    else:

        @jax.jit
        def f(x, qt):
            y = x
            for _ in range(reps):
                y = quantized_matmul(y, qt)
            return y.sum()

        flops = 2.0 * m * k * n
        t = _timeit(f, x, qt, iters=5) / reps
    tf = flops / t / 1e12
    ref = REFERENCE_TFLOPS.get(name)
    passed = ref is None or tf >= ref * (1 - slack)
    res.add(name, passed,
            f"{tf:.1f} TFLOP/s (ref {ref}, floor {ref * (1 - slack):.0f})"
            if ref else f"{tf:.1f} TFLOP/s (no reference)")


def smoke_flash(res: Result, s8: bool, b: int, h: int, s: int, d: int,
                quick: bool, slack: float, lse: bool = False,
                s8_pv: bool = False):
    import jax
    import jax.numpy as jnp

    from diffusion_rs_tpu.ops.attention import sdpa_xla
    from diffusion_rs_tpu.ops.flash_pallas import _flash_call, flash_attention

    kind = "s8pv" if s8_pv else ("s8" if s8 else "bf16")
    name = f"flash-{kind}-{b}x{h}x{s}x{d}" + ("-lse" if lse else "")
    rng = np.random.default_rng(1)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.3, jnp.bfloat16)
        for _ in range(3)
    )
    if lse:
        out, lse_v = _flash_call(q, k, v, float(d) ** -0.5, 512, 1536, False,
                                 save_lse=True, s8=s8)
        # finiteness reduced ON DEVICE: a large-array D2H straight after the
        # perf loops can race the axon relay (block_until_ready returns
        # early) and fetch garbage — the r4 false "lse has non-finite" FAIL;
        # the scalar readback is the relay-safe sync (BENCH.md methodology)
        finite = bool(jnp.isfinite(lse_v).all() & jnp.isfinite(out).all())
        res.add(name, finite, "lse finite" if finite else "lse has non-finite")
        return
    # on-device reductions (relay-safe scalar readbacks — see smoke_qmm)
    got = flash_attention(q, k, v, s8=s8, s8_pv=s8_pv).astype(jnp.float32)
    want = sdpa_xla(q, k, v).astype(jnp.float32)
    if not bool(jnp.isfinite(got).all()):
        res.add(name, False, "kernel output has non-finite values")
        return
    denom = float(jnp.abs(want).sum()) or 1.0
    rel = float(jnp.abs(got - want).sum()) / denom
    # bf16 rounding; s8/s8_pv add QK^T / P.V int8 quantization (the
    # diffuse standard-normal input is the harsh case — see test_ops.py)
    tol = 2e-2 if s8_pv else (8e-3 if s8 else 3e-3)
    if rel > tol:
        res.add(name, False, f"numerics rel err {rel:.2e} > {tol}")
        return
    if quick:
        res.add(name, True, f"numerics rel err {rel:.2e}")
        return

    reps = 20

    @jax.jit
    def f(q, k, v):
        acc = jnp.zeros((), jnp.float32)
        for i in range(reps):
            o = flash_attention(q + acc.astype(q.dtype) * 0, k, v, s8=s8,
                                s8_pv=s8_pv)
            acc = acc + o.astype(jnp.float32).sum()  # serialize reps
        return acc

    t = _timeit(f, q, k, v, iters=5) / reps
    flops = 4.0 * b * h * s * s * d  # QK^T + PV
    tf = flops / t / 1e12
    ref = REFERENCE_TFLOPS.get(name)
    passed = ref is None or tf >= ref * (1 - slack)
    res.add(name, passed,
            f"{tf:.1f} TFLOP/s (ref {ref}, floor {ref * (1 - slack):.0f})"
            if ref else f"{tf:.1f} TFLOP/s (no reference)")


def smoke_tiled_decode(res: Result):
    import jax
    import jax.numpy as jnp

    from diffusion_rs_tpu.models.vae import (
        VAEConfig, init_vae_params, vae_decode_tiled,
    )

    cfg = VAEConfig(block_out_channels=(32, 32), norm_num_groups=8,
                    latent_channels=16)
    params = init_vae_params(jax.random.PRNGKey(3), cfg, jnp.bfloat16)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 24, 16), jnp.bfloat16)
    out = vae_decode_tiled(params, cfg, z, tile=16, overlap=4)
    ok = out.shape == (1, 48, 48, 3) and bool(jnp.isfinite(out).all())
    res.add("vae-tiled-decode", bool(ok), f"shape {out.shape}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="numerics only")
    ap.add_argument("--slack", type=float, default=0.15,
                    help="allowed fractional TFLOP/s shortfall vs BENCH.md")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    print(f"[smoke_tpu] backend={backend} devices={jax.devices()}")
    if backend == "cpu":
        print("[smoke_tpu] WARNING: no TPU visible — Mosaic will not lower; "
              "this run only exercises interpret-free compile on CPU and "
              "will likely fail. Run on a TPU host.")

    res = Result()
    print("[smoke_tpu] fused dequant-matmul kernels")
    smoke_qmm(res, "nf4", 4608, 3072, 3072, args.quick, args.slack)
    smoke_qmm(res, "q8t", 4608, 3072, 3072, args.quick, args.slack)
    if not args.quick:
        smoke_qmm(res, "q8t-mlp", 4608, 3072, 12288, args.quick, args.slack)
    print("[smoke_tpu] flash attention kernels")
    smoke_flash(res, False, 1, 24, 4608, 128, args.quick, args.slack)
    smoke_flash(res, True, 1, 24, 4608, 128, args.quick, args.slack)
    smoke_flash(res, False, 1, 24, 4608, 128, args.quick, args.slack,
                s8_pv=True)
    smoke_flash(res, False, 1, 24, 4608, 128, True, args.slack, lse=True)
    print("[smoke_tpu] tiled decode")
    smoke_tiled_decode(res)

    n_pass = sum(1 for _, p, _ in res.rows if p)
    print(f"[smoke_tpu] {'PASS' if res.ok else 'FAIL'} "
          f"({n_pass}/{len(res.rows)})")
    return 0 if res.ok else 1


if __name__ == "__main__":
    sys.exit(main())
