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
