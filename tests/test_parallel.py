"""Sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4: mesh tests
stand in for multi-chip). Checks both that shardings are as intended and
that tp/dp execution is numerically identical to single-device."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu.models.flux import (
    FluxConfig,
    flux_forward,
    init_flux_params,
)
from diffusion_rs_tpu.parallel import make_mesh, shard_params
from diffusion_rs_tpu.pipelines.sampling import make_img_ids, make_txt_ids

CFG = FluxConfig(
    in_channels=16,
    pooled_projection_dim=32,
    joint_attention_dim=24,
    num_attention_heads=4,  # divisible by tp=4
    num_layers=2,
    num_single_layers=2,
    guidance_embeds=False,
    hidden_size=64,
    axes_dim=(8, 4, 4),
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    params = init_flux_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    b = 2
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    img = jax.random.normal(ks[0], (b, 8, CFG.in_channels), jnp.float32)
    txt = jax.random.normal(ks[1], (b, 4, CFG.joint_attention_dim), jnp.float32)
    y = jax.random.normal(ks[2], (b, CFG.pooled_projection_dim), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    img_ids = make_img_ids(b, 2, 4)
    txt_ids = make_txt_ids(b, 4)
    ref = flux_forward(params, CFG, img, txt, t, y, None, txt_ids, img_ids)
    return params, (img, txt, t, y, txt_ids, img_ids), np.asarray(ref)


def test_mesh_construction():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "sp": 1, "tp": 4}
    mesh3 = make_mesh(dp=2, sp=2, tp=2)
    assert mesh3.shape == {"dp": 2, "sp": 2, "tp": 2}


def test_column_row_specs(setup):
    params, _, _ = setup
    mesh = make_mesh(dp=1, tp=8)
    sharded = shard_params(params, mesh)
    # column-parallel: q weight sharded on out features
    qw = sharded["double"]["img_attn"]["q"].w
    assert "tp" in str(qw.sharding.spec)
    assert qw.sharding.spec[-1] == "tp"
    # row-parallel: proj weight sharded on in features
    pw = sharded["double"]["img_attn"]["proj"].w
    assert pw.sharding.spec[-2] == "tp"
    assert pw.sharding.spec[-1] is None
    # norms replicated
    nw = sharded["double"]["img_attn"]["q_norm"]
    assert all(s is None for s in nw.sharding.spec)


def test_tp_matches_single_device(setup):
    params, args, ref = setup
    mesh = make_mesh(dp=1, tp=8)
    sharded = shard_params(params, mesh)
    img, txt, t, y, txt_ids, img_ids = args
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(
            lambda p, i: flux_forward(p, CFG, i, txt, t, y, None, txt_ids, img_ids)
        )(sharded, img)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_dp_tp_matches_single_device(setup):
    params, args, ref = setup
    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh)
    img, txt, t, y, txt_ids, img_ids = args
    from jax.sharding import NamedSharding, PartitionSpec as P

    img_s = jax.device_put(img, NamedSharding(mesh, P("dp")))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(
            lambda p, i: flux_forward(p, CFG, i, txt, t, y, None, txt_ids, img_ids)
        )(sharded, img_s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_sequence_parallel_matches_single_device(setup):
    """Context parallelism: image tokens sharded over sp; GSPMD inserts the
    K/V all-gathers. Numerics must match the unsharded run."""
    from diffusion_rs_tpu.parallel import sequence_sharding

    params, args, ref = setup
    mesh = make_mesh(dp=2, sp=2, tp=2)
    sharded = shard_params(params, mesh)
    img, txt, t, y, txt_ids, img_ids = args
    img_s = jax.device_put(img, sequence_sharding(mesh))
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(
            lambda p, i: flux_forward(p, CFG, i, txt, t, y, None, txt_ids, img_ids)
        )(sharded, img_s)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_quantized_params_shard(setup):
    """QuantizedTensor planes shard along the same feature axes: N for
    column-parallel, K for row-parallel (per-chip quantized bytes / tp)."""
    from diffusion_rs_tpu.quant.qtensor import quantize_q8_0
    from diffusion_rs_tpu.ops import Linear

    mesh = make_mesh(dp=1, tp=8)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128)).astype(np.float32)
    wr = rng.standard_normal((2048, 128)).astype(np.float32)
    tree = {"double": {"img_attn": {
        "q": Linear(w=quantize_q8_0(w), b=None),       # column-parallel
        "proj": Linear(w=quantize_q8_0(wr), b=None),   # row-parallel
    }}}
    sharded = shard_params(tree, mesh)
    qt = sharded["double"]["img_attn"]["q"].w
    assert qt.packed.sharding.spec[-1] == "tp"
    assert qt.scale.sharding.spec[-1] == "tp"
    # row-parallel: K sharded on every plane (2048/8=256 rows each,
    # whole 32-wide groups per shard)
    rt = sharded["double"]["img_attn"]["proj"].w
    assert rt.packed.sharding.spec[0] == "tp"
    assert rt.scale.sharding.spec[0] == "tp"
    assert rt.packed.addressable_shards[0].data.shape[0] == 2048 // 8


def test_quantized_row_parallel_unshardable_replicates():
    """A K too ragged to cut into whole groups per shard stays replicated."""
    from diffusion_rs_tpu.quant.qtensor import quantize_q8_0
    from diffusion_rs_tpu.ops import Linear

    mesh = make_mesh(dp=1, tp=8)
    w = np.random.default_rng(0).standard_normal((96, 128)).astype(np.float32)
    tree = {"single": {"linear2": Linear(w=quantize_q8_0(w), b=None)}}
    sharded = shard_params(tree, mesh)
    rt = sharded["single"]["linear2"].w
    assert all(s is None for s in rt.packed.sharding.spec)


def test_quantized_flux_tp_matches_single_device(monkeypatch):
    """FLUX forward with every eligible linear quantized (q8_0) at a hidden
    size where the fused kernel engages (forced interpret), tensor-parallel
    over 4 devices: row-parallel K-sharded planes + psum partials must match
    the unsharded quantized run."""
    from diffusion_rs_tpu.ops import Linear
    from diffusion_rs_tpu.ops.linear import _qmm_mode
    from diffusion_rs_tpu.quant.qtensor import quantize_q8_0

    monkeypatch.setenv("DIFFUSION_RS_TPU_QMM", "interpret")
    _qmm_mode.cache_clear()
    try:
        cfg = FluxConfig(
            in_channels=32, pooled_projection_dim=32, joint_attention_dim=32,
            num_attention_heads=2, num_layers=1, num_single_layers=1,
            guidance_embeds=False, hidden_size=256, axes_dim=(16, 56, 56),
        )
        params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)

        def q_leaf(lin):
            if not isinstance(lin, Linear) or not isinstance(lin.w, jax.Array):
                return lin
            w = np.asarray(lin.w, np.float32)
            if w.ndim == 2:
                if w.shape[0] % 32 or w.shape[1] % 128:
                    return lin
                return Linear(w=quantize_q8_0(w), b=lin.b)
            if w.ndim == 3 and w.shape[1] % 32 == 0 and w.shape[2] % 128 == 0:
                qts = [quantize_q8_0(w[i]) for i in range(w.shape[0])]
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
                return Linear(w=stacked, b=lin.b)
            return lin

        qparams = jax.tree.map(
            q_leaf, params, is_leaf=lambda x: isinstance(x, Linear)
        )
        b = 1
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        img = jax.random.normal(ks[0], (b, 32, cfg.in_channels), jnp.float32)
        txt = jax.random.normal(ks[1], (b, 8, cfg.joint_attention_dim), jnp.float32)
        y = jax.random.normal(ks[2], (b, cfg.pooled_projection_dim), jnp.float32)
        t = jnp.full((b,), 0.5, jnp.float32)
        img_ids, txt_ids = make_img_ids(b, 4, 8), make_txt_ids(b, 8)
        ref = flux_forward(qparams, cfg, img, txt, t, y, None, txt_ids, img_ids)

        mesh = make_mesh(dp=2, tp=4)
        sharded = shard_params(qparams, mesh)
        # the row-parallel proj (K=256) must actually be K-sharded at tp=4
        pw = sharded["double"]["img_attn"]["proj"].w
        assert pw.packed.sharding.spec[1] == "tp", pw.packed.sharding.spec
        with jax.sharding.set_mesh(mesh):
            out = jax.jit(
                lambda p, i: flux_forward(p, cfg, i, txt, t, y, None, txt_ids, img_ids)
            )(sharded, img)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )
    finally:
        _qmm_mode.cache_clear()
