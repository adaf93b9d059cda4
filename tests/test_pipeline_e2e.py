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


def test_gguf_transformer_checkpoint(tmp_path):
    """End-to-end with a GGUF-quantized (q4_0) transformer — a capability
    the reference implements at tensor level but never wires to its model
    factory (SURVEY §2.3 GgufMatMul note)."""
    root = write_checkpoint(tmp_path / "gguf", seed=0, quant="gguf_q4_0")
    pipe = Pipeline(ModelSource.from_model_id(str(root)), silent=True)
    img = np.asarray(pipe.forward_images(["a cat"], PARAMS)[0])
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img.astype(np.float32)).all()


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
