"""GSPMD partitioning rules for the Pallas kernels (ops/partitioned.py):
sharded inputs must run per-shard (no replication) and match unsharded
numerics. Kernels run in interpret mode on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffusion_rs_tpu.ops.attention import sdpa_xla
from diffusion_rs_tpu.ops.partitioned import (
    make_partitioned_flash,
    make_partitioned_qmm,
)
from diffusion_rs_tpu.parallel import make_mesh
from diffusion_rs_tpu.quant.qtensor import dequantize, quantize_q8_0
from diffusion_rs_tpu.quant import bnb


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(dp=2, tp=4)


def test_flash_head_sharded(mesh, rng):
    q = jnp.asarray(rng.standard_normal((2, 8, 256, 128)), jnp.float32)
    ref = sdpa_xla(q, q, q)
    fa = make_partitioned_flash(float(128 ** -0.5), 128, 128, True)
    qs = jax.device_put(q, NamedSharding(mesh, P("dp", "tp")))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda a: fa(a, a, a))(qs)
    assert out.sharding.spec == P("dp", "tp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_qmm_token_and_column_sharded(mesh, rng):
    w = (rng.standard_normal((512, 512)) * 0.05).astype(np.float32)
    qt = quantize_q8_0(w)
    x = jnp.asarray(rng.standard_normal((64, 512)), jnp.float32)
    ref = np.asarray(x @ dequantize(qt, jnp.float32))
    assert qt.bias is None  # q8_0 is scale-only
    qmm = make_partitioned_qmm(
        qt.bits, qt.group, qt.split, qt.shape, jnp.dtype(jnp.float32),
        True, 1536, 512, False, False,
    )
    # token-dim over dp, out-features over tp (column-parallel weights)
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    packed = jax.device_put(qt.packed, NamedSharding(mesh, P(None, "tp")))
    scale = jax.device_put(qt.scale, NamedSharding(mesh, P(None, "tp")))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(qmm)(xs, packed, scale)
    assert out.sharding.spec == P("dp", "tp")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_qmm_codebook_sharded(mesh, rng):
    w = (rng.standard_normal((512, 512)) * 0.05).astype(np.float32)
    qt = bnb.quantize_nf4(w.T, blocksize=64)  # [K=512, N=512]
    x = jnp.asarray(rng.standard_normal((32, 512)), jnp.float32)
    ref = np.asarray(x @ dequantize(qt, jnp.float32))
    qmm = make_partitioned_qmm(
        qt.bits, qt.group, qt.split, qt.shape, jnp.dtype(jnp.float32),
        True, 1536, 512, False, True,
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    packed = jax.device_put(qt.packed, NamedSharding(mesh, P(None, "tp")))
    scale = jax.device_put(qt.scale, NamedSharding(mesh, P(None, "tp")))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(qmm)(xs, packed, scale, qt.codebook)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_unsharded_passthrough(rng):
    """Without a mesh the wrappers behave exactly like the raw kernels."""
    from diffusion_rs_tpu.ops.qmatmul_pallas import quantized_matmul

    w = (rng.standard_normal((512, 256)) * 0.05).astype(np.float32)
    qt = quantize_q8_0(w)
    x = jnp.asarray(rng.standard_normal((16, 512)), jnp.float32)
    y = quantized_matmul(x, qt, interpret=True)
    ref = np.asarray(x @ dequantize(qt, jnp.float32))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
