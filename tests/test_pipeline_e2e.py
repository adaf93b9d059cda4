"""End-to-end pipeline tests on a synthetic tiny checkpoint: the PR1 slice of
SURVEY.md §7.2 — load -> tokenize -> T5+CLIP encode -> denoise scan -> VAE
decode -> PNG bytes, plus the DDUF path and the bnb-quantized transformer
path."""

import io as stdio

import numpy as np
import pytest

from diffusion_rs_tpu import (
    DiffusionGenerationParams,
    ModelSource,
    Pipeline,
)

from synth import write_checkpoint, write_dduf


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    return write_checkpoint(tmp_path_factory.mktemp("flux_tiny"), seed=0)


@pytest.fixture(scope="module")
def pipe(ckpt):
    return Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True)


PARAMS = DiffusionGenerationParams(
    height=64, width=64, num_steps=2, guidance_scale=0.0, seed=42
)


def assert_latents_close(p_a, p_b, prompts, rtol=1e-3, atol=1e-3):
    """Mid-pipeline f32 latent comparison (VERDICT r2 weak #8): the u8 image
    bands (mean<1, max<=16) are loose enough to hide a small systematic
    numeric regression; the packed pre-VAE latents at f32 are not.

    Defaults suit same-device layout changes (near-bit-exact). Cross-mesh
    comparisons pass 0.05: bf16 model compute + tp partial-sum reordering
    drifts ~1% max over the 2-step scan (measured 0.033 abs on ~3-magnitude
    latents at dp2 x tp4) — still ~6x tighter than the u8 max band."""
    la = p_a.forward_latents(prompts, PARAMS)
    lb = p_b.forward_latents(prompts, PARAMS)
    assert la.shape == lb.shape and la.dtype == np.float32
    np.testing.assert_allclose(la, lb, rtol=rtol, atol=atol)


def test_forward_returns_png_bytes(pipe):
    out = pipe.forward(["a photo of a cat"], PARAMS)
    assert len(out) == 1
    from PIL import Image

    img = Image.open(stdio.BytesIO(out[0]))
    assert img.size == (64, 64)
    assert img.mode == "RGB"


def test_forward_batch(pipe):
    imgs = pipe.forward_images(["a cat", "a dog"], PARAMS)
    assert len(imgs) == 2
    a, b = (np.asarray(i) for i in imgs)
    assert a.shape == (64, 64, 3)
    # different prompts, same seed -> different images
    assert (a != b).any()


def test_behavior_toggles_are_constructor_frozen(ckpt, pipe):
    """t5_mask_pads / step_progress are Pipeline options resolved at
    construction (env vars are defaults only); they are read-only because
    the jitted graphs trace them as constants — a post-construction toggle
    would otherwise silently keep the cached graph (VERDICT r2 weak #5)."""
    masked = Pipeline(
        ModelSource.from_model_id(str(ckpt)), silent=True, t5_mask_pads=True
    )
    assert masked._inner.t5_mask_pads is True
    assert pipe._inner.t5_mask_pads is False
    # masking pads changes the conditioning, hence the image
    a = np.asarray(masked.forward_images(["a short prompt"], PARAMS)[0])
    b = np.asarray(pipe.forward_images(["a short prompt"], PARAMS)[0])
    assert (a != b).any()
    with pytest.raises(AttributeError):
        masked._inner.t5_mask_pads = False
    with pytest.raises(AttributeError):
        masked._inner.step_progress = True


def test_seed_determinism(ckpt, pipe):
    a = pipe.forward_images(["a photo"], PARAMS)[0]
    b = pipe.forward_images(["a photo"], PARAMS)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dduf_source_matches_directory(ckpt, pipe, tmp_path):
    dduf = write_dduf(ckpt, tmp_path / "tiny.dduf")
    pipe2 = Pipeline(ModelSource.dduf(str(dduf)), silent=True)
    a = pipe.forward_images(["a photo"], PARAMS)[0]
    b = pipe2.forward_images(["a photo"], PARAMS)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_transformer_runs(tmp_path):
    root = write_checkpoint(tmp_path / "flux_nf4", seed=0, quant="nf4")
    pipe = Pipeline(ModelSource.from_model_id(str(root)), silent=True)
    img = pipe.forward_images(["a cat"], PARAMS)[0]
    arr = np.asarray(img)
    assert arr.shape == (64, 64, 3)


def test_isq_quantizes_transformer_and_t5_e2e(ckpt, pipe, monkeypatch):
    """--isq reaches BOTH the transformer and T5 (VERDICT r2 next #5): the
    reference's quantized checkpoints quantize T5 throughout
    (models/t5/mod.rs — every linear is Arc<dyn QuantMethod>). The tiny
    synthetic dims sit under the production min-feature gate, so the test
    lowers it via the load-time env override."""
    import jax

    from diffusion_rs_tpu.quant.qtensor import QuantizedTensor

    monkeypatch.setenv("DIFFUSION_RS_TPU_ISQ_MIN", "8")
    qpipe = Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True,
                     isq="q4_0")

    def n_quant(tree):
        return sum(
            isinstance(x, QuantizedTensor)
            for x in jax.tree.leaves(
                tree, is_leaf=lambda x: isinstance(x, QuantizedTensor)
            )
        )

    assert n_quant(qpipe._inner.flux_params) > 0
    assert n_quant(qpipe._inner.t5_params) > 0
    a = np.asarray(qpipe.forward_images(["a photo"], PARAMS)[0], np.float32)
    b = np.asarray(pipe.forward_images(["a photo"], PARAMS)[0], np.float32)
    assert a.shape == (64, 64, 3) and np.isfinite(a).all()
    # q4 on both transformer and T5: images stay close to the dense pipeline
    diff = np.abs(a - b)
    assert diff.mean() < 24.0, diff.mean()


def test_isq_requantizes_prequantized_checkpoint(tmp_path, monkeypatch):
    """A pre-quantized (nf4) checkpoint + an explicit differing ISQ target
    requantizes at load (host dequantize -> re-encode): the path that gives
    a q4-bnb checkpoint the TPU-native q8t execution format. Output must
    stay close to the plain nf4 pipeline (one extra int8 rounding)."""
    import jax

    from diffusion_rs_tpu.quant.qtensor import QuantizedTensor

    monkeypatch.setenv("DIFFUSION_RS_TPU_ISQ_MIN", "8")
    nf4_root = write_checkpoint(tmp_path / "q", seed=0, quant="nf4")
    base = Pipeline(ModelSource.from_model_id(str(nf4_root)), silent=True)
    req = Pipeline(ModelSource.from_model_id(str(nf4_root)), silent=True,
                   isq="q8t")
    kinds = {
        x.kind for x in jax.tree.leaves(
            req._inner.flux_params,
            is_leaf=lambda x: isinstance(x, QuantizedTensor),
        ) if isinstance(x, QuantizedTensor)
    }
    assert kinds == {"q8t"}, kinds
    ia = np.asarray(base.forward_images(["a photo"], PARAMS)[0], np.float32)
    ib = np.asarray(req.forward_images(["a photo"], PARAMS)[0], np.float32)
    assert np.abs(ia - ib).mean() < 8.0, np.abs(ia - ib).mean()


def test_isq_t5_capacity_guard(tmp_path, monkeypatch):
    """Per-component ISQ routing (VERDICT r4 next #5): isq='q8t' follows to
    T5 when HBM allows, but when transformer-q8t + T5-q8t would exceed the
    per-chip budget (the real FLUX case: 12.1 + 4.8 GB > 16 GiB v5e) the
    loader keeps T5 in its smaller current format; isq_t5= forces."""
    import jax

    from diffusion_rs_tpu.quant.qtensor import QuantizedTensor
    from diffusion_rs_tpu.util.capacity import (
        estimate_isq_tree_bytes,
        tree_device_bytes,
    )

    def t5_kinds(p):
        return {
            x.kind for x in jax.tree.leaves(
                p._inner.t5_params,
                is_leaf=lambda x: isinstance(x, QuantizedTensor),
            ) if isinstance(x, QuantizedTensor)
        }

    monkeypatch.setenv("DIFFUSION_RS_TPU_ISQ_MIN", "8")
    nf4_root = write_checkpoint(tmp_path / "q", seed=0, quant="nf4")
    # generous budget: T5 follows isq to q8t
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", str(1 << 40))
    rich = Pipeline(ModelSource.from_model_id(str(nf4_root)), silent=True,
                    isq="q8t")
    assert t5_kinds(rich) == {"q8t"}
    # Keep-branch: requires requant-would-GROW-T5 + over budget. At REAL
    # T5-XXL dims q8t (8.125 bits/elem) > nf4 (4.5), but the tiny synthetic
    # dims invert that (nf4's per-group scale overhead dominates), so the
    # test exaggerates the q8t estimate entry to recreate the real-scale
    # relation and exercise the routing.
    from diffusion_rs_tpu.util import capacity

    monkeypatch.setitem(capacity._ISQ_BITS, "q8t", 4096.0)
    flux_b = tree_device_bytes(rich._inner.flux_params)
    t5_est = estimate_isq_tree_bytes(rich._inner.t5_params, "q8t")
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", str(flux_b + t5_est))
    tight = Pipeline(ModelSource.from_model_id(str(nf4_root)), silent=True,
                     isq="q8t")
    # T5 keeps its current format (dense here — the tiny checkpoint's T5
    # sits under bnb's block size, so quant="nf4" leaves it unquantized)
    assert t5_kinds(tight) == set()
    flux_kinds = {
        x.kind for x in jax.tree.leaves(
            tight._inner.flux_params,
            is_leaf=lambda x: isinstance(x, QuantizedTensor),
        ) if isinstance(x, QuantizedTensor)
    }
    assert flux_kinds == {"q8t"}
    # explicit isq_t5 overrides the guard at the same tight budget
    forced = Pipeline(ModelSource.from_model_id(str(nf4_root)), silent=True,
                      isq="q8t", isq_t5="q8t")
    assert t5_kinds(forced) == {"q8t"}


def test_int8_attention_e2e_band(ckpt, pipe, monkeypatch):
    """E2e numeric band for the int8 attention paths (VERDICT r4 next #1):
    a fresh pipeline with DIFFUSION_RS_TPU_ATTN_S8=1 + S8PV=1 through the
    interpret-mode flash kernel must stay visually identical to the default
    XLA-attention output — the mean |Δu8| pattern used for the q8t band.
    (A fresh Pipeline is required: the env toggles act at trace time, and a
    shared pipeline's jitted graphs would not retrace.)"""
    from diffusion_rs_tpu.ops import attention

    base = np.asarray(pipe.forward_images(["a photo"], PARAMS)[0], np.float32)
    monkeypatch.setenv("DIFFUSION_RS_TPU_FLASH", "interpret")
    monkeypatch.setenv("DIFFUSION_RS_TPU_ATTN_S8", "1")
    monkeypatch.setenv("DIFFUSION_RS_TPU_ATTN_S8PV", "1")
    attention._flash_mode.cache_clear()
    attention._s8_default.cache_clear()
    attention._s8_pv_default.cache_clear()
    try:
        p2 = Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True)
        int8 = np.asarray(
            p2.forward_images(["a photo"], PARAMS)[0], np.float32
        )
    finally:
        attention._flash_mode.cache_clear()
        attention._s8_default.cache_clear()
        attention._s8_pv_default.cache_clear()
    d = np.abs(base - int8)
    assert d.mean() < 8.0 and d.max() <= 64, (d.mean(), d.max())


def test_dev_model_guidance_and_dynamic_shift(tmp_path):
    """Dev-style checkpoint: guidance embedder + dynamic mu shift + 512-token
    T5 pad; guidance scale changes the output (flux/mod.rs:297-315)."""
    root = write_checkpoint(tmp_path / "dev", seed=0, guidance=True,
                            dynamic_shifting=True)
    pipe = Pipeline(ModelSource.from_model_id(str(root)), silent=True)
    p1 = DiffusionGenerationParams(height=64, width=64, num_steps=2,
                                   guidance_scale=3.5, seed=42)
    p2 = DiffusionGenerationParams(height=64, width=64, num_steps=2,
                                   guidance_scale=0.0, seed=42)
    a = np.asarray(pipe.forward_images(["a cat"], p1)[0])
    b = np.asarray(pipe.forward_images(["a cat"], p2)[0])
    assert a.shape == (64, 64, 3)
    assert (a != b).any()


def test_offloading_full_matches_resident(ckpt, pipe):
    """Offloading::Full (host-resident weights, per-stage device swaps) must
    be numerically identical to the fully-resident path."""
    from diffusion_rs_tpu import Offloading

    off = Pipeline(
        ModelSource.from_model_id(str(ckpt)), silent=True,
        offloading=Offloading.Full,
    )
    a = off.forward_images(["a photo"], PARAMS)[0]
    b = pipe.forward_images(["a photo"], PARAMS)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_vae_decode_matches(pipe, monkeypatch):
    """Chunked batch decode (peak-memory control for big batches) is exact:
    per-sample VAE decode is batch-independent."""
    prompts = ["a photo", "a dog", "a tree"]
    full = pipe.forward_images(prompts, PARAMS)
    monkeypatch.setenv("DIFFUSION_RS_TPU_DECODE_CHUNK", "1")
    chunked = pipe.forward_images(prompts, PARAMS)
    for a, b in zip(full, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offloading_full_with_mesh_keeps_sharding(ckpt, pipe):
    """mesh + Offloading.Full: HostOffload must restore each component to
    its ORIGINAL mesh sharding (not collapse onto device 0), and the output
    must match the plain single-device run (ADVICE r1 medium)."""
    import jax
    from diffusion_rs_tpu import Offloading
    from diffusion_rs_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=2, tp=4)
    off = Pipeline(
        ModelSource.from_model_id(str(ckpt)), silent=True,
        offloading=Offloading.Full, mesh=mesh,
    )
    # the restored transformer must be mesh-sharded (tensor-parallel)
    inner = off._inner
    flux = inner.offload.resident("flux")
    qw = flux["double"]["img_attn"]["q"].w
    assert "tp" in str(qw.sharding.spec), qw.sharding.spec
    inner.offload.release("flux")
    a = off.forward_images(["a photo", "a dog"], PARAMS)
    b = pipe.forward_images(["a photo", "a dog"], PARAMS)
    for x, y_ in zip(a, b):
        diff = np.abs(np.asarray(x, np.float32) - np.asarray(y_, np.float32))
        assert diff.mean() < 1.0 and diff.max() <= 16, (diff.mean(), diff.max())
    assert_latents_close(off, pipe, ["a photo", "a dog"], rtol=0.05, atol=0.05)


def test_streamed_offload_matches_resident(ckpt, pipe):
    """Offloading.Stream (per-block weight streaming) must match the
    resident path numerically (same jitted block math, different residency)."""
    from diffusion_rs_tpu import Offloading

    streamed = Pipeline(
        ModelSource.from_model_id(str(ckpt)), silent=True,
        offloading=Offloading.Stream,
    )
    a = streamed.forward_images(["a photo"], PARAMS)[0]
    b = pipe.forward_images(["a photo"], PARAMS)[0]
    diff = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    assert diff.mean() < 1.0 and diff.max() <= 16, (diff.mean(), diff.max())
    assert_latents_close(streamed, pipe, ["a photo"])


def test_mesh_sharded_pipeline_matches(ckpt, pipe):
    """End-to-end generation under a dp2 x tp4 mesh must equal single-device
    output (GSPMD tensor/data parallel; reference has no multi-device path)."""
    import jax
    from diffusion_rs_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=2, tp=4)
    sharded = Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True, mesh=mesh)
    a = sharded.forward_images(["a photo", "a dog"], PARAMS)
    b = pipe.forward_images(["a photo", "a dog"], PARAMS)
    for x, y_ in zip(a, b):
        diff = np.abs(np.asarray(x, np.float32) - np.asarray(y_, np.float32))
        # f32 reduction-order drift compounds over the denoise scan; images
        # must stay visually identical (tiny mean/max drift in u8 space).
        assert diff.mean() < 1.0 and diff.max() <= 16, (diff.mean(), diff.max())
    assert_latents_close(sharded, pipe, ["a photo", "a dog"],
                         rtol=0.05, atol=0.05)


def test_mesh_sp_pipeline_rings_and_matches(ckpt, pipe, monkeypatch):
    """Sequence parallelism through the USER-FACING Pipeline (VERDICT r2
    next #1): Pipeline(mesh=make_mesh(dp=2, sp=2, tp=2)) shards the packed
    image tokens over sp through the denoise scan. The denoise HLO must run
    the RING kernel over sp (collective-permute from lax.ppermute — not the
    seq-replicated fallback), and the output must match single-device within
    the reduction-order bands. This makes BASELINE config 5 (dev 2048² on a
    v5e-8 mesh) an API capability, not a test-level one."""
    import jax
    import jax.numpy as jnp
    from diffusion_rs_tpu.ops import attention
    from diffusion_rs_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setenv("DIFFUSION_RS_TPU_FLASH", "interpret")
    attention._flash_mode.cache_clear()
    try:
        mesh = make_mesh(dp=2, sp=2, tp=2)
        sp_pipe = Pipeline(
            ModelSource.from_model_id(str(ckpt)), silent=True, mesh=mesh
        )
        inner = sp_pipe._inner

        # Lower the denoise graph exactly as _forward_arrays calls it
        # (schnell tiny ckpt: t5_len 256, 64x64 -> 16 img tokens; the joint
        # 272-token sequence divides sp=2) and assert the ring collective.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from diffusion_rs_tpu.pipelines.sampling import get_noise

        b = 2
        txt = jnp.zeros((b, 256, inner.t5_cfg.d_model), inner.dtype)
        y = jnp.zeros((b, inner.clip_cfg.projection_dim), inner.dtype)
        sigmas = jnp.asarray(inner.scheduler.timesteps(PARAMS.num_steps))
        noise = get_noise(jax.random.PRNGKey(0), b, 64, 64)
        noise = jax.device_put(noise, NamedSharding(mesh, P("dp")))
        with jax.sharding.set_mesh(mesh):
            hlo = (
                inner._denoise_jit
                .lower(inner.flux_params, txt, y, sigmas, None, noise, None,
                       height=64, width=64)
                .compile()
                .as_text()
            )
        assert "collective-permute" in hlo  # ring k/v rotation over sp

        a = sp_pipe.forward_images(["a photo", "a dog"], PARAMS)
        b_ = pipe.forward_images(["a photo", "a dog"], PARAMS)
        for x, y_ in zip(a, b_):
            diff = np.abs(np.asarray(x, np.float32) - np.asarray(y_, np.float32))
            assert diff.mean() < 1.0 and diff.max() <= 16, (diff.mean(), diff.max())
        assert_latents_close(sp_pipe, pipe, ["a photo", "a dog"],
                             rtol=0.05, atol=0.05)
    finally:
        attention._flash_mode.cache_clear()


def test_gguf_transformer_checkpoint(tmp_path):
    """End-to-end with a GGUF-quantized (q4_0) transformer — a capability
    the reference implements at tensor level but never wires to its model
    factory (SURVEY §2.3 GgufMatMul note)."""
    root = write_checkpoint(tmp_path / "gguf", seed=0, quant="gguf_q4_0")
    pipe = Pipeline(ModelSource.from_model_id(str(root)), silent=True)
    img = np.asarray(pipe.forward_images(["a cat"], PARAMS)[0])
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img.astype(np.float32)).all()


def _diffusers_to_bfl(st) -> dict:
    """Rename a tiny synth transformer's tensors to the original BFL layout
    (fused qkv / linear1, swapped final-AdaLN halves) — what city96-style
    single-file FLUX GGUFs contain."""
    t = {n: np.asarray(st.numpy(n)) for n in st.keys()}
    out = {}

    def mv(src, dst):
        for s in (".weight", ".bias"):
            if src + s in t:
                out[dst + s] = t[src + s]

    def fuse(srcs, dst):
        # torch [out, in]: fuse along the OUT rows
        out[dst + ".weight"] = np.concatenate(
            [t[s + ".weight"] for s in srcs], axis=0
        )
        out[dst + ".bias"] = np.concatenate([t[s + ".bias"] for s in srcs])

    mv("x_embedder", "img_in")
    mv("context_embedder", "txt_in")
    mv("time_text_embed.timestep_embedder.linear_1", "time_in.in_layer")
    mv("time_text_embed.timestep_embedder.linear_2", "time_in.out_layer")
    mv("time_text_embed.text_embedder.linear_1", "vector_in.in_layer")
    mv("time_text_embed.text_embedder.linear_2", "vector_in.out_layer")
    mv("time_text_embed.guidance_embedder.linear_1", "guidance_in.in_layer")
    mv("time_text_embed.guidance_embedder.linear_2", "guidance_in.out_layer")
    mv("proj_out", "final_layer.linear")
    # swap (scale, shift) -> (shift, scale) halves along the out rows
    w = t["norm_out.linear.weight"]
    h = w.shape[0] // 2
    out["final_layer.adaLN_modulation.1.weight"] = np.concatenate(
        [w[h:], w[:h]], axis=0
    )
    b = t["norm_out.linear.bias"]
    out["final_layer.adaLN_modulation.1.bias"] = np.concatenate([b[h:], b[:h]])
    i = 0
    while f"transformer_blocks.{i}.norm1.linear.weight" in t:
        p, q = f"transformer_blocks.{i}", f"double_blocks.{i}"
        mv(f"{p}.norm1.linear", f"{q}.img_mod.lin")
        mv(f"{p}.norm1_context.linear", f"{q}.txt_mod.lin")
        fuse([f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v"],
             f"{q}.img_attn.qkv")
        fuse([f"{p}.attn.add_q_proj", f"{p}.attn.add_k_proj",
              f"{p}.attn.add_v_proj"], f"{q}.txt_attn.qkv")
        mv(f"{p}.attn.to_out.0", f"{q}.img_attn.proj")
        mv(f"{p}.attn.to_add_out", f"{q}.txt_attn.proj")
        mv(f"{p}.ff.net.0.proj", f"{q}.img_mlp.0")
        mv(f"{p}.ff.net.2", f"{q}.img_mlp.2")
        mv(f"{p}.ff_context.net.0.proj", f"{q}.txt_mlp.0")
        mv(f"{p}.ff_context.net.2", f"{q}.txt_mlp.2")
        out[f"{q}.img_attn.norm.query_norm.scale"] = t[f"{p}.attn.norm_q.weight"]
        out[f"{q}.img_attn.norm.key_norm.scale"] = t[f"{p}.attn.norm_k.weight"]
        out[f"{q}.txt_attn.norm.query_norm.scale"] = t[f"{p}.attn.norm_added_q.weight"]
        out[f"{q}.txt_attn.norm.key_norm.scale"] = t[f"{p}.attn.norm_added_k.weight"]
        i += 1
    i = 0
    while f"single_transformer_blocks.{i}.proj_out.weight" in t:
        p, q = f"single_transformer_blocks.{i}", f"single_blocks.{i}"
        fuse([f"{p}.attn.to_q", f"{p}.attn.to_k", f"{p}.attn.to_v",
              f"{p}.proj_mlp"], f"{q}.linear1")
        mv(f"{p}.proj_out", f"{q}.linear2")
        mv(f"{p}.norm.linear", f"{q}.modulation.lin")
        out[f"{q}.norm.query_norm.scale"] = t[f"{p}.attn.norm_q.weight"]
        out[f"{q}.norm.key_norm.scale"] = t[f"{p}.attn.norm_k.weight"]
        i += 1
    return out


def test_bfl_gguf_single_file_transformer(ckpt, pipe, tmp_path):
    """Single-file GGUF transformer with original BFL tensor names
    (ROADMAP r1 #7): config derived from the keys, fused qkv/linear1 layouts
    map onto the model's fused paths, final-AdaLN halves un-swapped. Output
    must match the diffusers-named checkpoint bit-for-bit (same f32 values,
    pure renames/fusions)."""
    from diffusion_rs_tpu.io import SafeTensors, write_gguf

    st = SafeTensors.from_file(
        str(ckpt / "transformer" / "diffusion_pytorch_model.safetensors")
    )
    bfl = _diffusers_to_bfl(st)
    gguf_path = tmp_path / "flux-bfl.gguf"
    write_gguf(
        str(gguf_path),
        {n: ("f32", a.shape, np.ascontiguousarray(a).tobytes())
         for n, a in bfl.items()},
    )
    bfl_pipe = Pipeline(
        ModelSource.from_model_id(str(ckpt), str(gguf_path)), silent=True
    )
    a = np.asarray(bfl_pipe.forward_images(["a photo"], PARAMS)[0])
    b = np.asarray(pipe.forward_images(["a photo"], PARAMS)[0])
    diff = np.abs(a.astype(np.float32) - b.astype(np.float32))
    assert diff.mean() < 1.0 and diff.max() <= 16, (diff.mean(), diff.max())
    assert_latents_close(bfl_pipe, pipe, ["a photo"])


def test_quantized_close_to_dense(tmp_path):
    """nf4 transformer output stays close to the dense one (same seed/weights
    modulo quantization) — the moral equivalent of the reference's 0.02
    quantized-matmul budget at pipeline level."""
    dense_root = write_checkpoint(tmp_path / "d", seed=0)
    nf4_root = write_checkpoint(tmp_path / "q", seed=0, quant="nf4")
    a = Pipeline(ModelSource.from_model_id(str(dense_root)), silent=True)
    b = Pipeline(ModelSource.from_model_id(str(nf4_root)), silent=True)
    ia = np.asarray(a.forward_images(["a photo"], PARAMS)[0], np.float32)
    ib = np.asarray(b.forward_images(["a photo"], PARAMS)[0], np.float32)
    # u8 images; mean abs diff should be small relative to 255 full-scale
    assert np.abs(ia - ib).mean() < 16.0

def test_tiled_vae_decode_pipeline(pipe, monkeypatch):
    """Resolutions past the single-shot decode HBM limit switch to the
    spatially tiled decoder (_decode_any). Forced here by lowering the
    threshold; the image must stay deterministic and close to the one-shot
    decode away from per-tile GroupNorm drift."""
    from diffusion_rs_tpu.pipelines.flux_pipeline import FluxPipeline

    p = DiffusionGenerationParams(
        height=96, width=64, num_steps=2, guidance_scale=0.0, seed=42
    )
    base = np.asarray(pipe.forward_images(["a photo"], p)[0])
    monkeypatch.setattr(FluxPipeline, "_TILE_DECODE_ABOVE", 8)
    monkeypatch.setenv("DIFFUSION_RS_TPU_VAE_TILE", "8")
    tiled = np.asarray(pipe.forward_images(["a photo"], p)[0])
    tiled2 = np.asarray(pipe.forward_images(["a photo"], p)[0])
    assert tiled.shape == base.shape == (96, 64, 3)
    np.testing.assert_array_equal(tiled, tiled2)  # deterministic
    # same latent, different GN statistics per tile: images remain similar
    d = np.abs(tiled.astype(np.float32) - base.astype(np.float32))
    assert d.mean() < 48, d.mean()

def test_img2img(pipe):
    """img2img: truncated flow-match schedule from a VAE-encoded init image
    (reference has no img2img; semantics follow diffusers
    FluxImg2ImgPipeline). Deterministic; strength=1.0 degenerates to the
    text-to-image output; low strength stays closer to the init image than
    high strength."""
    rng = np.random.default_rng(0)
    init = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    p4 = DiffusionGenerationParams(
        height=64, width=64, num_steps=4, guidance_scale=0.0, seed=42
    )
    a = np.asarray(pipe._inner.img2img(["a photo"], p4, init, strength=0.5)[0])
    b = np.asarray(pipe._inner.img2img(["a photo"], p4, init, strength=0.5)[0])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 64, 3)

    # strength=1.0 == text-to-image (sigma0 = 1 -> the init latent drops out)
    t2i = np.asarray(pipe.forward_images(["a photo"], p4)[0])
    full = np.asarray(pipe._inner.img2img(["a photo"], p4, init, strength=1.0)[0])
    d = np.abs(full.astype(np.float32) - t2i.astype(np.float32))
    assert d.mean() < 1.0 and d.max() <= 16, (d.mean(), d.max())

    # lower strength -> output closer to the (VAE-roundtripped) init image
    weak = np.asarray(pipe._inner.img2img(["a photo"], p4, init, strength=0.25)[0])
    def dist(x):
        return np.abs(x.astype(np.float32) - init.astype(np.float32)).mean()
    assert dist(weak) < dist(full), (dist(weak), dist(full))


def test_img2img_validation(pipe):
    rng = np.random.default_rng(0)
    init = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    p2 = DiffusionGenerationParams(
        height=64, width=64, num_steps=2, guidance_scale=0.0, seed=1
    )
    with pytest.raises(ValueError, match="strength"):
        pipe._inner.img2img(["a"], p2, init, strength=0.0)
    with pytest.raises(ValueError, match="init images"):
        pipe._inner.img2img(["a", "b"], p2, [init], strength=0.5)

def test_inpaint(pipe):
    """Inpainting: unmasked pixels must round-trip the VAE nearly unchanged
    (they are pinned to the init latent at every step); the masked region is
    repainted. Deterministic."""
    rng = np.random.default_rng(0)
    init = np.full((64, 64, 3), 128, np.uint8)
    init[:, :, 0] = rng.integers(100, 156, size=(64, 64))
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255  # repaint the center square
    p4 = DiffusionGenerationParams(
        height=64, width=64, num_steps=4, guidance_scale=0.0, seed=11
    )
    a = np.asarray(pipe._inner.inpaint(["a red square"], p4, init, mask)[0])
    b = np.asarray(pipe._inner.inpaint(["a red square"], p4, init, mask)[0])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (64, 64, 3)
    # Unmasked latents are pinned, but the conv decoder's receptive field
    # and global GroupNorm stats let repainted content bleed a little across
    # the boundary — compare regions RELATIVELY against the all-pinned
    # round-trip (mask of zeros): the repainted center must move much more
    # than the pinned border.
    roundtrip = np.asarray(
        pipe._inner.inpaint(["x"], p4, init, np.zeros((64, 64), np.uint8))[0]
    )
    border = np.s_[0:8, :, :]
    center = np.s_[24:40, 24:40, :]
    d_border = np.abs(a[border].astype(np.float32) - roundtrip[border].astype(np.float32))
    d_center = np.abs(a[center].astype(np.float32) - roundtrip[center].astype(np.float32))
    assert d_center.mean() > 2.0 * d_border.mean(), (
        d_center.mean(), d_border.mean())


def test_inpaint_requires_init(pipe):
    p2 = DiffusionGenerationParams(height=64, width=64, num_steps=2, seed=1)
    with pytest.raises(ValueError, match="mask_image requires init_image"):
        pipe._inner.forward_arrays(["a"], p2, mask_image=np.zeros((64, 64), np.uint8))


def test_mesh_tp_q8t_capacity_and_parity(ckpt, monkeypatch, caplog):
    """The 2048²+q8t story at test scale (VERDICT r3 next #3): q8t exec
    under a tensor-parallel mesh matches the single-device q8t pipeline
    e2e, and the static capacity accounting routes correctly — per-chip
    weight residency divides by tp, so a budget that warns single-device
    stays silent on the mesh."""
    import logging

    import jax
    from diffusion_rs_tpu.parallel import make_mesh
    from diffusion_rs_tpu.util.capacity import (
        estimate_denoise_activation_bytes,
        tree_device_bytes,
    )

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    single = Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True,
                      isq="q8t")
    mesh = make_mesh(tp=4, devices=jax.devices()[:4])
    sharded = Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True,
                       isq="q8t", mesh=mesh)
    # distinct geometry from other tests so warn_once keys don't collide
    params = DiffusionGenerationParams(
        height=80, width=64, num_steps=2, guidance_scale=0.0, seed=11
    )
    inner = single._inner
    w = tree_device_bytes(inner.flux_params)
    act = estimate_denoise_activation_bytes(
        1, (80 // 16) * (64 // 16), 256, inner.flux_cfg.hidden_size
    )
    # budget passes at tp=4, warns (not raises) at tp=1
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", str(w // 2 + act + 1))

    caplog.set_level(logging.WARNING, logger="diffusion_rs_tpu")
    a = sharded.forward_images(["a photo"], params)  # mesh first: no warning
    assert not [r for r in caplog.records if "capacity" in str(r.msg)]
    b = single.forward_images(["a photo"], params)
    assert [r for r in caplog.records if "exceeds" in str(r.msg)], (
        "single-device q8t run over the budget must warn with a route"
    )
    diff = np.abs(np.asarray(a[0], np.float32) - np.asarray(b[0], np.float32))
    assert diff.mean() < 1.0 and diff.max() <= 16, (diff.mean(), diff.max())


def test_mesh_tp_clears_weights_alone_valueerror(ckpt, monkeypatch):
    """The dev-2048+q8t capacity route at test scale (VERDICT r4 next #3):
    a budget the packed q8t weights ALONE exceed raises the routed
    ValueError on a single device — that failure is certain, not an
    estimate — and the SAME budget on a tp=4 mesh executes end-to-end
    (per-chip residency w/tp; the activation estimate may still warn, but
    the run must succeed)."""
    import jax
    from diffusion_rs_tpu.parallel import make_mesh
    from diffusion_rs_tpu.util.capacity import tree_device_bytes

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    single = Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True,
                      isq="q8t")
    w = tree_device_bytes(single._inner.flux_params)
    monkeypatch.setenv("DIFFUSION_RS_TPU_HBM_BYTES", str(w - 1))
    params = DiffusionGenerationParams(
        height=64, width=48, num_steps=2, guidance_scale=0.0, seed=13
    )
    with pytest.raises(ValueError, match="tensor-parallel mesh"):
        single.forward_images(["a photo"], params)
    mesh = make_mesh(tp=4, devices=jax.devices()[:4])
    sharded = Pipeline(ModelSource.from_model_id(str(ckpt)), silent=True,
                       isq="q8t", mesh=mesh)
    imgs = sharded.forward_images(["a photo"], params)
    assert np.asarray(imgs[0]).shape == (64, 48, 3)
    assert np.isfinite(np.asarray(imgs[0], np.float32)).all()


def test_img2img_tiled_encode_smoke(pipe, monkeypatch):
    """Capacity-bound resolutions route the img2img init encode through
    vae_encode_tiled (VERDICT r3 missing #5); at test scale the threshold is
    lowered so the tiled path runs through the real pipeline and stays close
    to the one-shot result (per-tile GroupNorm drift only)."""
    from diffusion_rs_tpu.pipelines.flux_pipeline import FluxPipeline

    rng = np.random.default_rng(3)
    init = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    p4 = DiffusionGenerationParams(
        height=64, width=64, num_steps=2, guidance_scale=0.0, seed=5
    )
    one_shot = np.asarray(
        pipe._inner.img2img(["a photo"], p4, init, strength=0.5)[0]
    )
    monkeypatch.setattr(FluxPipeline, "_TILE_DECODE_ABOVE", 2)
    monkeypatch.setenv("DIFFUSION_RS_TPU_VAE_TILE", "8")  # 8 latent px tiles
    calls = []
    import diffusion_rs_tpu.pipelines.flux_pipeline as fpm
    real = fpm.vae_encode_tiled

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(fpm, "vae_encode_tiled", spy)
    tiled = np.asarray(
        pipe._inner.img2img(["a photo"], p4, init, strength=0.5)[0]
    )
    assert calls, "tiled encode path was not taken"
    assert tiled.shape == one_shot.shape
    assert np.isfinite(tiled.astype(np.float32)).all()
    # random-weight per-tile GroupNorm drifts far more than a trained VAE;
    # bound mirrors test_vae_tiled_decode: same image class, not pixel-equal
    d = np.abs(tiled.astype(np.float32) - one_shot.astype(np.float32))
    assert d.mean() < 0.5 * one_shot.std(), (d.mean(), one_shot.std())
