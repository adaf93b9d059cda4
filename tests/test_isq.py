"""ISQ (in-situ quantization) tests — IsqType equivalent
(diffusion_rs_backend/src/lib.rs:88-149)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu.ops import Linear, linear
from diffusion_rs_tpu.quant import isq_quantize_weight, isq_tree
from diffusion_rs_tpu.quant.qtensor import QuantizedTensor, dequantize


@pytest.mark.parametrize("target", ["q4_0", "q8_0", "q4_k", "q6_k", "nf4"])
def test_isq_roundtrip_budget(rng, target):
    w = (rng.standard_normal((512, 256)) * 0.03).astype(np.float32)
    qt = isq_quantize_weight(w, target)
    assert isinstance(qt, QuantizedTensor)
    assert qt.shape == (512, 256)
    w_hat = np.asarray(dequantize(qt, jnp.float32))
    err = np.abs(w - w_hat).mean()
    budget = {"q4_0": 0.006, "q8_0": 0.0005, "q4_k": 0.006, "q6_k": 0.001,
              "nf4": 0.006}[target]
    assert err <= budget, (target, err)


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
