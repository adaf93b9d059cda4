"""ISQ (in-situ quantization) tests — IsqType equivalent
(diffusion_rs_backend/src/lib.rs:88-149)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu.ops import Linear, linear
from diffusion_rs_tpu.quant import isq_quantize_weight, isq_tree
from diffusion_rs_tpu.quant.qtensor import QuantizedTensor, dequantize


@pytest.mark.parametrize(
    "target",
    ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0", "q2_k", "q3_k", "q4_k", "q5_k",
     "q6_k", "nf4", "fp4", "q8t"],
)
def test_isq_roundtrip_budget(rng, target):
    """Every SUPPORTED target — the reference's full CUDA-legal IsqType set
    (lib.rs:102-128) plus nf4/fp4/q8t — round-trips within its bit-width
    budget."""
    w = (rng.standard_normal((512, 256)) * 0.03).astype(np.float32)
    qt = isq_quantize_weight(w, target)
    assert isinstance(qt, QuantizedTensor)
    assert qt.shape == (512, 256)
    w_hat = np.asarray(dequantize(qt, jnp.float32))
    err = np.abs(w - w_hat).mean()
    budget = {"q4_0": 0.006, "q4_1": 0.006, "q5_0": 0.003, "q5_1": 0.003,
              "q8_0": 0.0005, "q2_k": 0.015, "q3_k": 0.008, "q4_k": 0.006,
              "q5_k": 0.003, "q6_k": 0.001, "nf4": 0.006, "fp4": 0.01,
              "q8t": 0.0005}[target]
    assert err <= budget, (target, err)


def test_q8t_s8_kernel_matches_dequant(rng):
    """The s8 x s8 MXU path ("q8t": per-K-tile weight scales + in-kernel
    activation int8 quantization) must stay within the reference's 0.02
    quantized-matmul budget (quantized_tests.rs:40-46)."""
    from diffusion_rs_tpu.ops.qmatmul_pallas import quantized_matmul
    from diffusion_rs_tpu.quant.qtensor import quantize_q8_tile

    w = (rng.standard_normal((512, 256)) * 0.05).astype(np.float32)
    qt = quantize_q8_tile(w)
    assert qt.kind == "q8t" and qt.group == 256
    x = jnp.asarray(rng.standard_normal((64, 512)), jnp.float32)
    y = np.asarray(quantized_matmul(x, qt, interpret=True))
    ref = np.asarray(x @ dequantize(qt, jnp.float32))
    rel = np.abs(y - ref).sum() / np.abs(ref).sum()
    assert rel <= 0.02, rel


def test_isq_tree_quantizes_stacked_and_skips_small(rng):
    big = Linear(
        w=jnp.asarray(rng.standard_normal((3, 512, 512)), jnp.float32),
        b=jnp.zeros((3, 512)),
    )
    small = Linear(w=jnp.asarray(rng.standard_normal((64, 512)), jnp.float32))
    tree = {"block": {"q": big}, "emb": small}
    out = isq_tree(tree, "q8_0")
    assert isinstance(out["block"]["q"].w, QuantizedTensor)
    assert out["block"]["q"].w.packed.shape == (3, 512, 512)
    assert isinstance(out["emb"].w, jax.Array)  # too small, left dense


def test_isq_tree_requantizes_prequantized(rng):
    """A Linear already holding a QuantizedTensor (pre-quantized checkpoint)
    is REQUANTIZED when an explicit ISQ target differs from its kind —
    the path that gives a q4-bnb checkpoint the TPU-native q8t execution
    format. Dequantized values must match the source format's within the
    extra int8 rounding (~0.4% of the group absmax)."""
    from diffusion_rs_tpu.quant.bnb import quantize_nf4
    from diffusion_rs_tpu.quant.qtensor import dequantize_np

    w = (rng.standard_normal((512, 256)) * 0.03).astype(np.float32)
    qt_nf4 = quantize_nf4(np.ascontiguousarray(w.T), blocksize=64)
    w_nf4 = dequantize_np(qt_nf4)
    tree = {"q": Linear(w=qt_nf4), "small": Linear(w=qt_nf4)}
    out = isq_tree(tree, "q8t", min_features=256)
    assert out["q"].w.kind == "q8t"
    w_req = dequantize_np(out["q"].w)
    err = np.abs(w_req - w_nf4).mean()
    assert err <= 0.0005, err  # int8 rounding on top of nf4, not nf4 error
    # same-kind target is a no-op (no pointless precision loss)
    same = isq_tree(tree, "nf4", min_features=256)
    assert same["q"].w is qt_nf4


def test_isq_tree_requantizes_stacked(rng):
    from diffusion_rs_tpu.quant.bnb import quantize_nf4
    from diffusion_rs_tpu.quant.qtensor import dequantize_np

    ws = [(rng.standard_normal((512, 256)) * 0.03).astype(np.float32)
          for _ in range(2)]
    qts = [quantize_nf4(np.ascontiguousarray(w.T), blocksize=64) for w in ws]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
    out = isq_tree({"q": Linear(w=stacked)}, "q8t", min_features=256)
    got = out["q"].w
    assert got.kind == "q8t" and got.packed.shape == (2, 512, 256)
    w_all = dequantize_np(got)
    for i in range(2):
        assert np.abs(w_all[i] - dequantize_np(qts[i])).mean() <= 0.0005


def test_isq_linear_forward_close(rng):
    w = (rng.standard_normal((512, 256)) * 0.03).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    dense = Linear(w=jnp.asarray(w))
    q = Linear(w=isq_quantize_weight(w, "q4_0"))
    yd = np.asarray(linear(x, dense))
    yq = np.asarray(linear(x, q))
    rel = np.abs(yq - yd).sum() / np.abs(yd).sum()
    # Gaussian weights/activations (the reference's 0.02 budget is measured
    # on smooth ramp data, quantized_tests.rs:29-39 — covered in test_ops).
    assert rel <= 0.12, rel


@pytest.mark.parametrize("target", ["q4_0", "q8_0", "q4_k", "nf4"])
def test_imatrix_weighted_beats_unweighted(rng, target):
    """Importance-weighted ISQ must reduce the importance-weighted error on
    importance-skewed data (quantize_imatrix equivalent, k_quants.rs:846)."""
    k, n = 512, 256
    w = (rng.standard_normal((k, n)) * 0.03).astype(np.float32)
    # skewed importance: a few input features dominate the activations
    imp = np.full(k, 0.01, np.float32)
    imp[rng.choice(k, 32, replace=False)] = 10.0
    plain = np.asarray(dequantize(isq_quantize_weight(w, target), jnp.float32))
    weighted = np.asarray(
        dequantize(isq_quantize_weight(w, target, imatrix=imp), jnp.float32)
    )

    def werr(w_hat):
        return float((imp[:, None] * (w - w_hat) ** 2).sum())

    assert werr(weighted) < werr(plain), (target, werr(weighted), werr(plain))


def test_imatrix_tree_lookup(rng):
    """isq_tree matches imatrix vectors by dotted path, incl. per-layer keys
    for stacked blocks; weighted result differs from unweighted."""
    from diffusion_rs_tpu.quant.isq import isq_tree as _tree

    w = jnp.asarray(rng.standard_normal((2, 512, 512)) * 0.03, jnp.float32)
    tree = {"double": {"img_attn": {"q": Linear(w=w, b=None)}}}
    imp = np.full(512, 0.01, np.float32)
    imp[:32] = 10.0
    imat = {"double.0.img_attn.q.weight": imp}  # layer 0 only, .weight suffix
    out_w = _tree(tree, "q8_0", imatrix=imat)
    out_p = _tree(tree, "q8_0")
    s_w = np.asarray(out_w["double"]["img_attn"]["q"].w.scale)
    s_p = np.asarray(out_p["double"]["img_attn"]["q"].w.scale)
    assert not np.allclose(s_w[0], s_p[0])   # layer 0 refined
    np.testing.assert_array_equal(s_w[1], s_p[1])  # layer 1 untouched


def test_imatrix_roundtrip_feeds_isq(rng, tmp_path):
    """load_imatrix output plugs straight into isq_quantize_weight."""
    from diffusion_rs_tpu.io.imatrix import load_imatrix, save_imatrix

    imp = np.abs(rng.standard_normal(512)).astype(np.float32) + 0.1
    save_imatrix(str(tmp_path / "m.imatrix"), {"lin.weight": imp}, ncall=16)
    loaded = load_imatrix(str(tmp_path / "m.imatrix"))
    w = (rng.standard_normal((512, 256)) * 0.03).astype(np.float32)
    qt = isq_quantize_weight(w, "q4_0", imatrix=loaded["lin.weight"])
    assert np.isfinite(np.asarray(dequantize(qt, jnp.float32))).all()


def test_sdpa_softcap(rng):
    """softcapping parity: tanh(s/cap)*cap (backend/src/ops.rs:247-262)."""
    from diffusion_rs_tpu.ops import sdpa

    q = jnp.asarray(rng.standard_normal((1, 1, 8, 16)), jnp.float32)
    out = sdpa(q, q, q, softcap=5.0, impl="xla")
    s = np.einsum("bhsd,bhtd->bhst", np.asarray(q), np.asarray(q)) / 4.0
    s = np.tanh(s / 5.0) * 5.0
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhst,bhtd->bhsd", p, np.asarray(q))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
