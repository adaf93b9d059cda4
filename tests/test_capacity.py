"""Static capacity accounting + q8t exec-path auto-dispatch (VERDICT r3 #3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu.quant.qtensor import quantize_q8_tile
from diffusion_rs_tpu.util.capacity import (
    check_denoise_capacity,
    estimate_denoise_activation_bytes,
    tree_device_bytes,
)


def _qtree(k=256, n=256):
    w = np.random.default_rng(0).standard_normal((k, n)).astype(np.float32)
    return {"a": quantize_q8_tile(w), "b": jnp.zeros((n,), jnp.bfloat16)}


def test_tree_device_bytes_counts_packed_residency():
    k, n = 256, 256
    t = _qtree(k, n)
    got = tree_device_bytes(t)
    want = k * n * 1 + (k // 256) * n * 4 + n * 2  # packed i8 + scale f32 + bias bf16
    assert got == want, (got, want)


def test_capacity_raises_when_weights_alone_exceed_hbm(monkeypatch):
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", "1000")  # 1 KB chip
    with pytest.raises(ValueError, match="tensor-parallel mesh"):
        check_denoise_capacity(
            _qtree(), batch=1, img_tokens=4096, txt_tokens=512, hidden=3072
        )


def test_capacity_warns_on_activation_overflow(monkeypatch):
    t = _qtree()
    w = tree_device_bytes(t)
    act = estimate_denoise_activation_bytes(1, 4096, 512, 3072)
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", str(w + act // 2))
    msg = check_denoise_capacity(
        t, batch=1, img_tokens=4096, txt_tokens=512, hidden=3072
    )
    assert msg is not None and "sp mesh" in msg


def test_capacity_tp_divides_weights(monkeypatch):
    t = _qtree()
    w = tree_device_bytes(t)
    act = estimate_denoise_activation_bytes(1, 64, 16, 64)
    # budget that fails at tp=1 but passes at tp=4
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", str(w // 2 + act + 1))
    assert check_denoise_capacity(
        t, batch=1, img_tokens=64, txt_tokens=16, hidden=64, tp=4
    ) is None
    assert check_denoise_capacity(
        t, batch=1, img_tokens=64, txt_tokens=16, hidden=64, tp=1
    ) is not None


def test_capacity_estimate_calibration():
    """Ties the estimate to the measured v5e configs (VERDICT r4 next #10)
    so drift in the fitted constant or formula is caught.

    Measured residencies (tree_device_bytes over the full-size synthetic
    trees, r5): FLUX q8t 12.090 GB, FLUX nf4 6.693 GB; default budget
    16 GiB = 17.18 GB. Two verdicts are uncontested and pinned hard:
    1024²-b1-q8t fits (the shipping north star), and the b8/2048² configs
    land in the knife-edge band where the linear model CANNOT rank them
    (their measured outcomes differ by <1% of budget: b8-nf4 image fits,
    2048²-q8t image OOMs, 2048²-q8t STEP runs) — those are routed by the
    measured preset defaults (bench.py PRESETS), not by this estimate, so
    the test pins the estimate VALUES with bands instead of inventing
    verdicts the model can't deliver."""
    hbm = 16 * 1024**3
    q8t_w = 12.090e9  # measured (r5): tree_device_bytes, FLUX-dev q8t
    # north star: 1024² b1 (4096+512 tokens) must fit beside q8t weights
    a1 = estimate_denoise_activation_bytes(1, 4096, 512, 3072)
    assert q8t_w + a1 < hbm, a1
    # bands: catch accidental constant/formula drift (the values document
    # the model: B * S * hidden * 2 bytes * 48 live planes)
    assert 1.2e9 < a1 < 1.6e9, a1
    a2 = estimate_denoise_activation_bytes(1, 16384, 512, 3072)
    assert 4.5e9 < a2 < 5.5e9, a2
    a3 = estimate_denoise_activation_bytes(8, 4096, 256, 3072)
    assert 9.5e9 < a3 < 11.5e9, a3
    # the knife-edge configs sit within ±5% of the budget either side —
    # assert they stay IN that band (if the estimate drifts far enough to
    # make them look comfortably-fitting or impossibly-large, the presets'
    # measured routing and this model have diverged and need re-calibration)
    assert 0.9 * hbm < q8t_w + a2 < 1.15 * hbm, a2
    assert 0.9 * hbm < 6.693e9 + a3 < 1.15 * hbm, a3


def test_hbm_default_fallback_warns(monkeypatch, caplog):
    """When device memory_stats are unavailable and no env override is set,
    the 16 GiB guess is LOGGED (VERDICT r4 weak #6) naming the override."""
    import logging

    from diffusion_rs_tpu.util import capacity, tracing

    monkeypatch.delenv("DIFFUSION_RS_TPU_HBM_BYTES", raising=False)

    class _Dev:
        def memory_stats(self):
            return None

    monkeypatch.setattr(capacity.jax, "devices", lambda: [_Dev()])
    tracing._warned.discard("hbm-default-fallback")  # per-process latch
    with caplog.at_level(logging.WARNING, logger=tracing.logger.name):
        assert capacity.per_chip_hbm_bytes() == 16 * 1024**3
    assert any("DIFFUSION_RS_TPU_HBM_BYTES" in r.message for r in caplog.records)
    # env override still wins, no warning needed
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", str(32 * 1024**3))
    assert capacity.per_chip_hbm_bytes() == 32 * 1024**3


def test_q8t_s8_path_auto_dispatch(monkeypatch):
    """quantized_matmul picks the s8 MXU path for small M and the bf16
    dequant path past the measured crossover — per shape, at trace time."""
    from diffusion_rs_tpu.ops import qmatmul_pallas as qp
    from diffusion_rs_tpu.ops import partitioned

    monkeypatch.setenv("DIFFUSION_RS_TPU_Q8T_S8_MAX_M", "64")
    qp._s8_m_crossover.cache_clear()
    seen = []
    real = partitioned.make_partitioned_qmm

    def spy(*args, **kw):
        # signature: (bits, group, split, kn, out_dtype, interpret, bm_cap,
        #             bn_cap, has_bias, has_cb, s8_act, fast16)
        seen.append(args[10] if len(args) > 10 else kw.get("s8_act"))
        return real(*args, **kw)

    monkeypatch.setattr(partitioned, "make_partitioned_qmm", spy)
    try:
        k, n = 256, 256
        w = np.random.default_rng(1).standard_normal((k, n)).astype(np.float32)
        qt = quantize_q8_tile(w)
        x_small = jnp.asarray(
            np.random.default_rng(2).standard_normal((16, k)), jnp.bfloat16
        )
        x_big = jnp.asarray(
            np.random.default_rng(3).standard_normal((128, k)), jnp.bfloat16
        )
        y_small = qp.quantized_matmul(x_small, qt, interpret=True)
        y_big = qp.quantized_matmul(x_big, qt, interpret=True)
        assert seen == [True, False], seen
        # both paths stay numerically close to the dense reference
        from diffusion_rs_tpu.quant.qtensor import dequantize

        wd = dequantize(qt, jnp.bfloat16)
        for x, y in ((x_small, y_small), (x_big, y_big)):
            ref = np.asarray(jnp.matmul(x, wd, preferred_element_type=jnp.float32))
            got = np.asarray(y, np.float32)
            rel = np.abs(got - ref).sum() / (np.abs(ref).sum() or 1.0)
            assert rel < 2e-2, rel  # reference quantized-matmul budget
    finally:
        qp._s8_m_crossover.cache_clear()


def test_q8t_s8_crossover_default(monkeypatch):
    """UNSET env must mean 'no override': the r4 bug returned int('0')=0
    from the `.get(key, "0") or default` idiom (a truthy "0" string), which
    silently disabled the s8 MXU path for every default q8t run (~25% step
    regression, caught by tools/smoke_tpu.py on-chip)."""
    from diffusion_rs_tpu.ops import partitioned
    from diffusion_rs_tpu.ops import qmatmul_pallas as qp

    monkeypatch.delenv("DIFFUSION_RS_TPU_Q8T_S8_MAX_M", raising=False)
    qp._s8_m_crossover.cache_clear()
    try:
        assert qp._s8_m_crossover() == qp._S8_M_CROSSOVER_DEFAULT
        # and the library selects s8 at the north-star M with NO env set
        seen = []
        real = partitioned.make_partitioned_qmm

        def spy(*args, **kw):
            seen.append(args[10] if len(args) > 10 else kw.get("s8_act"))
            return real(*args, **kw)

        monkeypatch.setattr(partitioned, "make_partitioned_qmm", spy)
        k, n = 256, 256
        w = np.random.default_rng(1).standard_normal((k, n)).astype(np.float32)
        qt = quantize_q8_tile(w)
        x = jnp.asarray(
            np.random.default_rng(2).standard_normal((4608, k)), jnp.bfloat16
        )
        qp.quantized_matmul(x, qt, interpret=True)
        assert seen == [True], seen
    finally:
        qp._s8_m_crossover.cache_clear()
