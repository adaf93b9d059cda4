"""LoRA loading/application (reference has no LoRA; diffusers PEFT
semantics: delta_W = (alpha/r) * lora_B @ lora_A, fused for dense weights,
runtime low-rank term for quantized weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu import DiffusionGenerationParams, ModelSource, Pipeline
from diffusion_rs_tpu.io.lora import apply_flux_lora, read_lora_file
from diffusion_rs_tpu.io.safetensors import save_safetensors
from diffusion_rs_tpu.ops.linear import Linear, linear
from diffusion_rs_tpu.quant.qtensor import dequantize

from synth import FLUX_HIDDEN, write_checkpoint

RANK = 4
PARAMS = DiffusionGenerationParams(
    height=64, width=64, num_steps=2, guidance_scale=0.0, seed=42
)


def _write_lora(path, rng, alpha=None, kohya=False, scale_mag=1.0):
    """Synthetic LoRA touching a double-block q, a single-block linear2 and
    the top-level x_embedder, with mixed key conventions."""
    h = FLUX_HIDDEN
    a_suf, b_suf = (
        (".lora_down.weight", ".lora_up.weight") if kohya
        else (".lora_A.weight", ".lora_B.weight")
    )
    t = {}

    def pair(base, k_in, n_out):
        A = (rng.standard_normal((RANK, k_in)) * scale_mag).astype(np.float32)
        B = (rng.standard_normal((n_out, RANK)) * scale_mag).astype(np.float32)
        t[f"transformer.{base}{a_suf}"] = A
        t[f"transformer.{base}{b_suf}"] = B
        if alpha is not None:
            t[f"transformer.{base}.alpha"] = np.float32(alpha)
        return A, B

    pairs = {
        "transformer_blocks.1.attn.to_q": pair(
            "transformer_blocks.1.attn.to_q", h, h),
        "single_transformer_blocks.0.proj_out": pair(
            "single_transformer_blocks.0.proj_out", h + 4 * h, h),
        "x_embedder": pair("x_embedder", 64, h),
    }
    save_safetensors(str(path), t)
    return pairs


def test_read_lora_file(tmp_path):
    rng = np.random.default_rng(0)
    _write_lora(tmp_path / "l.safetensors", rng, alpha=8.0)
    pairs = read_lora_file(str(tmp_path / "l.safetensors"))
    assert set(pairs) == {
        "transformer_blocks.1.attn.to_q",
        "single_transformer_blocks.0.proj_out",
        "x_embedder",
    }
    p = pairs["transformer_blocks.1.attn.to_q"]
    assert p["A"].shape == (RANK, FLUX_HIDDEN) and p["alpha"] == 8.0


@pytest.mark.parametrize("kohya", [False, True], ids=["peft", "kohya"])
def test_apply_fuses_dense_exactly(tmp_path, kohya):
    from diffusion_rs_tpu.models.flux import FluxConfig, init_flux_params

    cfg = FluxConfig(
        in_channels=64, pooled_projection_dim=64, joint_attention_dim=64,
        num_attention_heads=2, num_layers=2, num_single_layers=2,
        guidance_embeds=False, hidden_size=FLUX_HIDDEN, axes_dim=(4, 6, 6),
    )
    params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(1)
    pairs = _write_lora(tmp_path / "l.safetensors", rng, alpha=2 * RANK,
                        kohya=kohya)
    before_q = np.asarray(params["double"]["img_attn"]["q"].w).copy()
    before_l2 = np.asarray(params["single"]["linear2"].w).copy()
    before_in = np.asarray(params["img_in"].w).copy()
    params = apply_flux_lora(params, cfg, str(tmp_path / "l.safetensors"),
                             scale=0.5, dtype=jnp.float32)
    # effective scale = lora_scale * alpha / r = 0.5 * 2 = 1.0
    A, B = pairs["transformer_blocks.1.attn.to_q"]
    after_q = np.asarray(params["double"]["img_attn"]["q"].w)
    np.testing.assert_allclose(
        after_q[1], before_q[1] + A.T @ B.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(after_q[0], before_q[0])  # untouched layer
    A, B = pairs["single_transformer_blocks.0.proj_out"]
    after_l2 = np.asarray(params["single"]["linear2"].w)
    np.testing.assert_allclose(
        after_l2[0], before_l2[0] + A.T @ B.T, rtol=1e-5, atol=1e-5)
    A, B = pairs["x_embedder"]
    np.testing.assert_allclose(
        np.asarray(params["img_in"].w), before_in + A.T @ B.T,
        rtol=1e-5, atol=1e-5)


def test_quantized_linear_lora_term(rng_seed=3):
    """Quantized base: LoRA attaches as a runtime term; linear() output
    equals qmm(x) + (x@A.T)@(B.T)*s."""
    from diffusion_rs_tpu.util.synthetic import random_qtensor

    rng = np.random.default_rng(rng_seed)
    qt = random_qtensor(jax.random.PRNGKey(0), 256, 128)
    A = rng.standard_normal((RANK, 256)).astype(np.float32)
    B = rng.standard_normal((128, RANK)).astype(np.float32)
    s = 0.7
    lin = Linear(w=qt, lora=(jnp.asarray(A.T), jnp.asarray(B.T * s)))
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    y = np.asarray(linear(x, lin), np.float32)
    base = np.asarray(x @ dequantize(qt, jnp.float32))
    want = base + (np.asarray(x) @ A.T) @ B.T * s
    np.testing.assert_allclose(y, want, rtol=2e-2, atol=2e-2)


def test_pipeline_lora_end_to_end(tmp_path):
    """Pipeline(lora=...) changes the image; unmatched keys raise."""
    root = write_checkpoint(tmp_path / "ck", seed=0)
    rng = np.random.default_rng(5)
    _write_lora(tmp_path / "l.safetensors", rng, scale_mag=0.2)
    plain = Pipeline(ModelSource.from_model_id(str(root)), silent=True)
    lora = Pipeline(ModelSource.from_model_id(str(root)), silent=True,
                    lora=str(tmp_path / "l.safetensors"))
    a = np.asarray(plain.forward_images(["a cat"], PARAMS)[0])
    b = np.asarray(lora.forward_images(["a cat"], PARAMS)[0])
    b2 = np.asarray(lora.forward_images(["a cat"], PARAMS)[0])
    np.testing.assert_array_equal(b, b2)  # deterministic
    assert (a != b).any()  # the adapter changed the output

    # zero lora_scale -> identical to plain
    zero = Pipeline(ModelSource.from_model_id(str(root)), silent=True,
                    lora=str(tmp_path / "l.safetensors"), lora_scale=0.0)
    z = np.asarray(zero.forward_images(["a cat"], PARAMS)[0])
    np.testing.assert_array_equal(a, z)


def test_pipeline_lora_on_quantized_ckpt(tmp_path):
    """nf4 checkpoint + LoRA: quantized linears (x_embedder, ff.net.2 in the
    tiny ckpt) get runtime low-rank terms — the packed planes stay untouched
    — and the terms ride through the scan over stacked blocks."""
    root = write_checkpoint(tmp_path / "ck", seed=0, quant="nf4")
    rng = np.random.default_rng(6)
    h = FLUX_HIDDEN
    t = {}

    def pair(base, k_in, n_out):
        t[f"transformer.{base}.lora_A.weight"] = (
            rng.standard_normal((RANK, k_in)) * 0.2).astype(np.float32)
        t[f"transformer.{base}.lora_B.weight"] = (
            rng.standard_normal((n_out, RANK)) * 0.2).astype(np.float32)

    pair("x_embedder", 64, h)                        # quantized, unstacked
    pair("transformer_blocks.0.ff.net.2", 4 * h, h)  # quantized, stacked
    pair("transformer_blocks.1.attn.to_q", h, h)     # dense, stacked
    save_safetensors(str(tmp_path / "l.safetensors"), t)

    plain = Pipeline(ModelSource.from_model_id(str(root)), silent=True)
    lora = Pipeline(ModelSource.from_model_id(str(root)), silent=True,
                    lora=str(tmp_path / "l.safetensors"))
    a = np.asarray(plain.forward_images(["a cat"], PARAMS)[0])
    b = np.asarray(lora.forward_images(["a cat"], PARAMS)[0])
    assert (a != b).any()
    # the quantized planes themselves are untouched; runtime terms attached
    for path in (("img_in",), ("double", "img_mlp", "out")):
        ql = lora._inner.flux_params
        pl = plain._inner.flux_params
        for k in path:
            ql, pl = ql[k], pl[k]
        assert ql.lora is not None, path
        np.testing.assert_array_equal(
            np.asarray(ql.w.packed), np.asarray(pl.w.packed))
    # stacked lora term has the layer axis
    st = lora._inner.flux_params["double"]["img_mlp"]["out"].lora
    assert st[0].shape[0] == 2 and st[1].shape[0] == 2


def test_unmatched_lora_keys_raise(tmp_path):
    from diffusion_rs_tpu.models.flux import FluxConfig, init_flux_params

    cfg = FluxConfig(
        in_channels=64, pooled_projection_dim=64, joint_attention_dim=64,
        num_attention_heads=2, num_layers=2, num_single_layers=2,
        guidance_embeds=False, hidden_size=FLUX_HIDDEN, axes_dim=(4, 6, 6),
    )
    params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    save_safetensors(str(tmp_path / "bad.safetensors"), {
        "lora_unet_mystery_block.lora_A.weight": np.zeros((2, 4), np.float32),
        "lora_unet_mystery_block.lora_B.weight": np.zeros((4, 2), np.float32),
    })
    with pytest.raises(ValueError, match="do not match"):
        apply_flux_lora(params, cfg, str(tmp_path / "bad.safetensors"))


def test_lora_skips_text_encoder_groups(tmp_path):
    """Bundled text-encoder adapters are skipped (our encoders take no
    adapters); transformer factors still apply. TE-only files error."""
    from diffusion_rs_tpu.models.flux import FluxConfig, init_flux_params

    cfg = FluxConfig(
        in_channels=64, pooled_projection_dim=64, joint_attention_dim=64,
        num_attention_heads=2, num_layers=2, num_single_layers=2,
        guidance_embeds=False, hidden_size=FLUX_HIDDEN, axes_dim=(4, 6, 6),
    )
    params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    t = {
        "transformer.x_embedder.lora_A.weight":
            rng.standard_normal((RANK, 64)).astype(np.float32),
        "transformer.x_embedder.lora_B.weight":
            rng.standard_normal((FLUX_HIDDEN, RANK)).astype(np.float32),
        "text_encoder.layers.0.q.lora_A.weight":
            np.zeros((RANK, 8), np.float32),
        "text_encoder.layers.0.q.lora_B.weight":
            np.zeros((8, RANK), np.float32),
    }
    save_safetensors(str(tmp_path / "mix.safetensors"), t)
    before = np.asarray(params["img_in"].w).copy()
    params = apply_flux_lora(params, cfg, str(tmp_path / "mix.safetensors"))
    assert (np.asarray(params["img_in"].w) != before).any()

    save_safetensors(str(tmp_path / "te.safetensors"), {
        "text_encoder.layers.0.q.lora_A.weight": np.zeros((RANK, 8), np.float32),
        "text_encoder.layers.0.q.lora_B.weight": np.zeros((8, RANK), np.float32),
    })
    with pytest.raises(ValueError, match="only text-encoder"):
        apply_flux_lora(params, cfg, str(tmp_path / "te.safetensors"))


def _tiny_cfg():
    from diffusion_rs_tpu.models.flux import FluxConfig

    return FluxConfig(
        in_channels=64, pooled_projection_dim=64, joint_attention_dim=64,
        num_attention_heads=2, num_layers=2, num_single_layers=2,
        guidance_embeds=False, hidden_size=FLUX_HIDDEN, axes_dim=(4, 6, 6),
    )


def test_kohya_bfl_naming(tmp_path):
    """sd-scripts/kohya FLUX LoRAs (lora_unet_* BFL underscore naming, fused
    qkv factors) split correctly onto the diffusers-shaped tree."""
    from diffusion_rs_tpu.models.flux import init_flux_params

    cfg = _tiny_cfg()
    h, mlp = cfg.hidden_size, cfg.mlp_size
    params = init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(7)
    A = rng.standard_normal((RANK, h)).astype(np.float32)
    Bqkv = rng.standard_normal((3 * h, RANK)).astype(np.float32)
    A1 = rng.standard_normal((RANK, h)).astype(np.float32)
    B1 = rng.standard_normal((3 * h + mlp, RANK)).astype(np.float32)
    t = {
        "lora_unet_double_blocks_1_img_attn_qkv.lora_down.weight": A,
        "lora_unet_double_blocks_1_img_attn_qkv.lora_up.weight": Bqkv,
        "lora_unet_double_blocks_1_img_attn_qkv.alpha": np.float32(RANK),
        "lora_unet_single_blocks_0_linear1.lora_down.weight": A1,
        "lora_unet_single_blocks_0_linear1.lora_up.weight": B1,
    }
    save_safetensors(str(tmp_path / "k.safetensors"), t)
    before_q = np.asarray(params["double"]["img_attn"]["q"].w).copy()
    before_v = np.asarray(params["double"]["img_attn"]["v"].w).copy()
    before_pm = np.asarray(params["single"]["proj_mlp"].w).copy()
    params = apply_flux_lora(params, cfg, str(tmp_path / "k.safetensors"),
                             dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["double"]["img_attn"]["q"].w)[1],
        before_q[1] + A.T @ Bqkv[0:h].T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["double"]["img_attn"]["v"].w)[1],
        before_v[1] + A.T @ Bqkv[2 * h:3 * h].T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["single"]["proj_mlp"].w)[0],
        before_pm[0] + A1.T @ B1[3 * h:3 * h + mlp].T, rtol=1e-5, atol=1e-5)


def test_lora_on_fused_tree(tmp_path):
    """Trees with BFL fused layouts (qkv / qkv_mlp — e.g. single-file GGUF
    loads, or DIFFUSION_RS_TPU_FUSE): per-part targets land in the fused
    linear's column range; dense deltas and quantized runtime terms both."""
    from diffusion_rs_tpu.models.flux import init_flux_params
    from diffusion_rs_tpu.models.optimize import fuse_flux_qkv

    cfg = _tiny_cfg()
    h = cfg.hidden_size
    params = fuse_flux_qkv(init_flux_params(jax.random.PRNGKey(0), cfg, jnp.float32))
    assert "qkv" in params["double"]["img_attn"]
    rng = np.random.default_rng(8)
    A = rng.standard_normal((RANK, h)).astype(np.float32)
    B = rng.standard_normal((h, RANK)).astype(np.float32)
    t = {
        "transformer.transformer_blocks.0.attn.to_k.lora_A.weight": A,
        "transformer.transformer_blocks.0.attn.to_k.lora_B.weight": B,
    }
    save_safetensors(str(tmp_path / "f.safetensors"), t)
    before = np.asarray(params["double"]["img_attn"]["qkv"].w).copy()
    params = apply_flux_lora(params, cfg, str(tmp_path / "f.safetensors"),
                             dtype=jnp.float32)
    after = np.asarray(params["double"]["img_attn"]["qkv"].w)
    # k occupies fused columns [h, 2h)
    np.testing.assert_allclose(
        after[0][:, h:2 * h], before[0][:, h:2 * h] + A.T @ B.T,
        rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(after[0][:, :h], before[0][:, :h])
    np.testing.assert_array_equal(after[0][:, 2 * h:], before[0][:, 2 * h:])

    # quantized fused tree -> merged runtime term, column-placed
    from diffusion_rs_tpu.util.synthetic import init_flux_params_quantized

    qparams = init_flux_params_quantized(jax.random.PRNGKey(1), cfg)
    from diffusion_rs_tpu.models.optimize import fuse_flux_qkv as fq

    qparams = fq(qparams)
    qparams = apply_flux_lora(qparams, cfg, str(tmp_path / "f.safetensors"))
    lora = qparams["double"]["img_attn"]["qkv"].lora
    assert lora is not None
    a, bl = np.asarray(lora[0], np.float32), np.asarray(lora[1], np.float32)
    assert a.shape[0] == cfg.num_layers and bl.shape[-1] == 3 * h
    assert np.abs(bl[0][:, h:2 * h]).sum() > 0   # k columns populated
    assert np.abs(bl[0][:, :h]).sum() == 0       # q columns empty
    assert np.abs(bl[1]).sum() == 0              # other layer untouched


def test_multi_lora_stacking(tmp_path):
    """A list of LoRA files applies in order: dense deltas sum; quantized
    runtime terms stack by rank concatenation."""
    root = write_checkpoint(tmp_path / "ck", seed=0, quant="nf4")
    rng = np.random.default_rng(9)
    h = FLUX_HIDDEN
    for i in (1, 2):
        save_safetensors(str(tmp_path / f"l{i}.safetensors"), {
            "transformer.x_embedder.lora_A.weight": (
                rng.standard_normal((RANK, 64)) * 0.2).astype(np.float32),
            "transformer.x_embedder.lora_B.weight": (
                rng.standard_normal((h, RANK)) * 0.2).astype(np.float32),
            "transformer.transformer_blocks.0.attn.to_q.lora_A.weight": (
                rng.standard_normal((RANK, h)) * 0.2).astype(np.float32),
            "transformer.transformer_blocks.0.attn.to_q.lora_B.weight": (
                rng.standard_normal((h, RANK)) * 0.2).astype(np.float32),
        })
    both = Pipeline(
        ModelSource.from_model_id(str(root)), silent=True,
        lora=[str(tmp_path / "l1.safetensors"), str(tmp_path / "l2.safetensors")],
        lora_scale=[1.0, 0.5],
    )
    # quantized x_embedder carries both terms: rank 2*RANK
    lor = both._inner.flux_params["img_in"].lora
    assert lor is not None and lor[0].shape[-1] == 2 * RANK
    one = Pipeline(ModelSource.from_model_id(str(root)), silent=True,
                   lora=str(tmp_path / "l1.safetensors"))
    a = np.asarray(both.forward_images(["a cat"], PARAMS)[0])
    b = np.asarray(one.forward_images(["a cat"], PARAMS)[0])
    assert (a != b).any()

    with pytest.raises(ValueError, match="scales"):
        Pipeline(ModelSource.from_model_id(str(root)), silent=True,
                 lora=[str(tmp_path / "l1.safetensors")], lora_scale=[1.0, 2.0])
