"""Load-time optimization tests: fused qkv must be bit-equivalent, and the
imatrix reader round-trips."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusion_rs_tpu.models.flux import (
    FluxConfig,
    flux_forward,
    init_flux_params,
)
from diffusion_rs_tpu.models.optimize import fuse_flux_qkv
from diffusion_rs_tpu.pipelines.sampling import make_img_ids, make_txt_ids
from diffusion_rs_tpu.quant.qtensor import concat_n, dequantize, quantize_q8_0

CFG = FluxConfig(
    in_channels=16, pooled_projection_dim=32, joint_attention_dim=24,
    num_attention_heads=2, num_layers=2, num_single_layers=2,
    guidance_embeds=False, hidden_size=32, axes_dim=(4, 6, 6),
)


def test_fused_qkv_matches_unfused():
    params = init_flux_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    fused = fuse_flux_qkv(params)
    assert "qkv" in fused["double"]["img_attn"]
    assert "qkv_mlp" in fused["single"]
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    b, s_img, s_txt = 2, 8, 4
    img = jax.random.normal(ks[0], (b, s_img, CFG.in_channels), jnp.float32)
    txt = jax.random.normal(ks[1], (b, s_txt, CFG.joint_attention_dim), jnp.float32)
    y = jax.random.normal(ks[2], (b, CFG.pooled_projection_dim), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    img_ids, txt_ids = make_img_ids(b, 2, 4), make_txt_ids(b, s_txt)
    a = flux_forward(params, CFG, img, txt, t, y, None, txt_ids, img_ids)
    c = flux_forward(fused, CFG, img, txt, t, y, None, txt_ids, img_ids)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-5)


def test_fuse_streams_subset():
    """Stream-selective fusion (r5): streams=('txt',) fuses ONLY the double
    blocks' txt projections — img/single stay separate (they measured slower
    fused on v5e, BENCH.md r3/r4) — and the forward stays bit-equivalent."""
    params = init_flux_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    fused = fuse_flux_qkv(params, streams=("txt",))
    assert "qkv" in fused["double"]["txt_attn"]
    assert "qkv" not in fused["double"]["img_attn"]
    assert "qkv_mlp" not in fused["single"]
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    b, s_img, s_txt = 2, 8, 4
    img = jax.random.normal(ks[0], (b, s_img, CFG.in_channels), jnp.float32)
    txt = jax.random.normal(ks[1], (b, s_txt, CFG.joint_attention_dim), jnp.float32)
    y = jax.random.normal(ks[2], (b, CFG.pooled_projection_dim), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    img_ids, txt_ids = make_img_ids(b, 2, 4), make_txt_ids(b, s_txt)
    a = flux_forward(params, CFG, img, txt, t, y, None, txt_ids, img_ids)
    c = flux_forward(fused, CFG, img, txt, t, y, None, txt_ids, img_ids)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-5)


def test_fuse_t5_matches_unfused():
    """fuse_t5: q|k|v and gated wi_0|wi_1 fused per block — encode output
    must match the unfused path exactly (same K-reduction, same tiles)."""
    from diffusion_rs_tpu.models.optimize import fuse_t5
    from diffusion_rs_tpu.models.t5 import T5Config, init_t5_params, t5_encode

    cfg = T5Config(
        vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, layer_norm_epsilon=1e-6,
        act="gelu_new", gated_act=True,
    )
    params = init_t5_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    fused = fuse_t5(params)
    assert "qkv" in fused["blocks"]["attn"] and "q" not in fused["blocks"]["attn"]
    assert "wi01" in fused["blocks"]["ff"] and "wi_0" not in fused["blocks"]["ff"]
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 64)
    a = np.asarray(t5_encode(params, cfg, ids))
    c = np.asarray(t5_encode(fused, cfg, ids))
    np.testing.assert_allclose(c, a, rtol=2e-5, atol=2e-5)


def test_grouped_double_block_matches():
    """cfg.grouped_qmm routes the double blocks' img/txt projection pairs
    through grouped kernel launches — forward must match the ungrouped
    fused path (dense weights here exercise the linear_grouped fallback;
    the kernel path is pinned by test_ops.test_qmm_grouped_matches_separate
    and the quantized e2e A/B on chip)."""
    import dataclasses

    params = init_flux_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    fused = fuse_flux_qkv(params, streams=("img", "txt"))
    gcfg = dataclasses.replace(CFG, grouped_qmm=True)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    b, s_img, s_txt = 2, 8, 4
    img = jax.random.normal(ks[0], (b, s_img, CFG.in_channels), jnp.float32)
    txt = jax.random.normal(ks[1], (b, s_txt, CFG.joint_attention_dim), jnp.float32)
    y = jax.random.normal(ks[2], (b, CFG.pooled_projection_dim), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    img_ids, txt_ids = make_img_ids(b, 2, 4), make_txt_ids(b, s_txt)
    a = flux_forward(fused, CFG, img, txt, t, y, None, txt_ids, img_ids)
    c = flux_forward(fused, gcfg, img, txt, t, y, None, txt_ids, img_ids)
    np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=2e-5, atol=2e-5)


def test_grouped_quantized_double_block_matches(rng):
    """Same routing with QUANTIZED (q8t) weights on the interpret kernel:
    the grouped launch itself must be exact vs the per-stream calls."""
    import dataclasses
    import os

    from diffusion_rs_tpu.util.synthetic import init_flux_params_quantized

    # in_channels 64: the synthetic quantized factory floors img_in's K at
    # the nf4 blocksize (synthetic.py:170)
    qcfg = dataclasses.replace(CFG, in_channels=64)
    params = init_flux_params_quantized(
        jax.random.PRNGKey(0), qcfg, jnp.float32, kind="q8t"
    )
    fused = fuse_flux_qkv(params, streams=("img", "txt"))
    gcfg = dataclasses.replace(qcfg, grouped_qmm=True)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    b, s_img, s_txt = 1, 8, 4
    img = jax.random.normal(ks[0], (b, s_img, qcfg.in_channels), jnp.float32)
    txt = jax.random.normal(ks[1], (b, s_txt, qcfg.joint_attention_dim), jnp.float32)
    y = jax.random.normal(ks[2], (b, qcfg.pooled_projection_dim), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    img_ids, txt_ids = make_img_ids(b, 2, 4), make_txt_ids(b, s_txt)
    os.environ["DIFFUSION_RS_TPU_QMM"] = "interpret"
    import importlib

    _lin = importlib.import_module("diffusion_rs_tpu.ops.linear")
    _lin._qmm_mode.cache_clear()
    try:
        a = flux_forward(fused, qcfg, img, txt, t, y, None, txt_ids, img_ids)
        c = flux_forward(fused, gcfg, img, txt, t, y, None, txt_ids, img_ids)
    finally:
        del os.environ["DIFFUSION_RS_TPU_QMM"]
        _lin._qmm_mode.cache_clear()
    np.testing.assert_array_equal(np.asarray(c), np.asarray(a))


def test_concat_n_quantized_exact(rng):
    a = quantize_q8_0((rng.standard_normal((256, 128)) * 0.1).astype(np.float32))
    b = quantize_q8_0((rng.standard_normal((256, 64)) * 0.1).astype(np.float32))
    c = concat_n([a, b])
    assert c.shape == (256, 192)
    np.testing.assert_array_equal(
        np.asarray(dequantize(c, jnp.float32)),
        np.concatenate(
            [np.asarray(dequantize(a, jnp.float32)),
             np.asarray(dequantize(b, jnp.float32))], axis=-1,
        ),
    )


def test_imatrix_roundtrip(tmp_path, rng):
    from diffusion_rs_tpu.io.imatrix import load_imatrix, save_imatrix

    data = {
        "blk.0.attn_q.weight": rng.standard_normal(64).astype(np.float32),
        "blk.0.ffn_up.weight": rng.standard_normal(128).astype(np.float32),
    }
    p = tmp_path / "cal.imatrix"
    save_imatrix(str(p), data, ncall=7)
    out = load_imatrix(str(p))
    assert set(out) == set(data)
    for k in data:
        np.testing.assert_allclose(out[k], data[k], rtol=1e-5)
