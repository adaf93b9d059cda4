"""IO container tests: safetensors round-trip, DDUF zero-copy, GGUF
round-trip, npy/npz/pickle adapters, VarStore assembly."""

import numpy as np
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu.io import (
    DdufFile,
    GgufFile,
    SafeTensors,
    VarStore,
    write_gguf,
)
from diffusion_rs_tpu.io.safetensors import save_safetensors
from diffusion_rs_tpu.io import legacy_formats as lf


def test_safetensors_roundtrip(tmp_path, rng):
    import ml_dtypes

    tensors = {
        "a": rng.standard_normal((4, 8)).astype(np.float32),
        "b": rng.integers(0, 255, size=(16,)).astype(np.uint8),
        "c.bf16": rng.standard_normal((2, 2)).astype(ml_dtypes.bfloat16),
    }
    p = tmp_path / "x.safetensors"
    save_safetensors(str(p), tensors)
    st = SafeTensors.from_file(str(p))
    assert set(st.keys()) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(st.numpy(k), v)


def test_dduf_zero_copy_safetensors(tmp_path, rng):
    import zipfile

    inner = {"w": rng.standard_normal((8, 8)).astype(np.float32)}
    stp = tmp_path / "m.safetensors"
    save_safetensors(str(stp), inner)
    dduf = tmp_path / "a.dduf"
    with zipfile.ZipFile(dduf, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.write(stp, "transformer/m.safetensors")
    d = DdufFile(str(dduf))
    st = d.safetensors("transformer/m.safetensors")
    np.testing.assert_array_equal(st.numpy("w"), inner["w"])


def test_dduf_rejects_compressed_for_zero_copy(tmp_path, rng):
    import zipfile

    dduf = tmp_path / "b.dduf"
    with zipfile.ZipFile(dduf, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("x.safetensors", b"not really")
    d = DdufFile(str(dduf))
    assert d.read_bytes("x.safetensors") == b"not really"
    with pytest.raises(ValueError, match="zero-copy"):
        d.safetensors("x.safetensors")


def test_gguf_roundtrip(tmp_path, rng):
    from diffusion_rs_tpu.quant import gguf_quants as gq

    w = (rng.standard_normal((8, 512)) * 0.05).astype(np.float32)
    raw = gq.ENCODERS["q4_0"](w)
    dense = rng.standard_normal((4, 4)).astype(np.float32)
    p = tmp_path / "m.gguf"
    write_gguf(
        str(p),
        {"blk.w": ("q4_0", (8, 512), raw), "norm.w": ("f32", (4, 4), dense.tobytes())},
        metadata={"general.name": "test", "n": 3},
    )
    g = GgufFile(str(p))
    assert g.metadata["general.name"] == "test"
    assert g.metadata["n"] == 3
    assert g.tensors["blk.w"].fmt == "q4_0"
    assert g.tensors["blk.w"].shape == (8, 512)
    np.testing.assert_array_equal(bytes(g.raw("blk.w")), raw)
    np.testing.assert_array_equal(g.numpy("norm.w"), dense)


def test_legacy_ggml_roundtrip(tmp_path, rng):
    """Legacy pre-GGUF container (ggml_file.rs): ggjt alignment, inline
    vocab+hparams, quantized payloads decode identically to GGUF."""
    from diffusion_rs_tpu.io.ggml import GgmlFile, GgmlHParams, write_ggml
    from diffusion_rs_tpu.quant import gguf_quants as gq

    w = (rng.standard_normal((8, 512)) * 0.05).astype(np.float32)
    raw = gq.ENCODERS["q4_0"](w)
    dense = rng.standard_normal((4, 4)).astype(np.float32)
    vocab = [(b"<s>", 0.0), (b"hello", -1.5)]
    p = tmp_path / "m.ggjt"
    write_ggml(
        str(p),
        {"blk.w": ("q4_0", (8, 512), raw), "norm.w": ("f32", (4, 4), dense.tobytes())},
        hparams=GgmlHParams(2, 64, 256, 4, 2, 16, 2),
        vocab=vocab,
    )
    g = GgmlFile(str(p))
    assert g.version == 3 and g.hparams.n_embd == 64
    assert g.vocab[1][0] == b"hello"
    assert g.tensors["blk.w"].fmt == "q4_0"
    assert g.tensors["blk.w"].start % 32 == 0  # ggjt alignment
    np.testing.assert_array_equal(bytes(g.raw("blk.w")), raw)
    np.testing.assert_array_equal(g.numpy("norm.w"), dense)
    # decoded payload matches the same bytes read through the GGUF path
    dec = gq.dequantize_rows("q4_0", g.raw("blk.w"), (8, 512))
    assert np.isfinite(dec).all()


def test_legacy_ggml_unversioned(tmp_path, rng):
    """'ggml' magic: no version, unscored vocab, unaligned data."""
    from diffusion_rs_tpu.io.ggml import (
        MAGIC_GGML, GgmlFile, GgmlHParams, write_ggml,
    )

    dense = rng.standard_normal((2, 8)).astype(np.float32)
    p = tmp_path / "m.ggml"
    write_ggml(
        str(p), {"w": ("f32", (2, 8), dense.tobytes())},
        hparams=GgmlHParams(1, 8, 32, 1, 1, 4, 0),
        vocab=[(b"x", 0.0)], magic=MAGIC_GGML,
    )
    g = GgmlFile(str(p))
    assert g.version == 0
    np.testing.assert_array_equal(g.numpy("w"), dense)


def test_gguf_into_varstore_linear(tmp_path, rng):
    """GGUF-quantized weight -> VarStore -> Linear with QuantizedTensor
    (a path the reference implements but never wires up — SURVEY §2.3)."""
    from diffusion_rs_tpu.quant import gguf_quants as gq
    from diffusion_rs_tpu.quant.qtensor import QuantizedTensor, dequantize

    w = (rng.standard_normal((128, 512)) * 0.05).astype(np.float32)
    raw = gq.ENCODERS["q8_0"](w)
    p = tmp_path / "m.gguf"
    write_gguf(str(p), {"layer.weight": ("q8_0", (128, 512), raw)})
    store = VarStore(default_dtype=jnp.float32)
    store.add_gguf(GgufFile(str(p)))
    lin = store.pp("layer").linear(bias=False)
    assert isinstance(lin.w, QuantizedTensor)
    wd = np.asarray(dequantize(lin.w, jnp.float32))
    ref = gq.dequantize_rows("q8_0", raw, (128, 512))
    np.testing.assert_allclose(wd, ref.T, rtol=1e-5, atol=1e-6)


def test_npy_npz(tmp_path, rng):
    a = rng.standard_normal((3, 4)).astype(np.float32)
    lf.write_npy(str(tmp_path / "a.npy"), a)
    np.testing.assert_array_equal(lf.read_npy(str(tmp_path / "a.npy")), a)
    lf.write_npz(str(tmp_path / "z.npz"), {"x": a, "y": a * 2})
    z = lf.read_npz(str(tmp_path / "z.npz"))
    np.testing.assert_array_equal(z["y"], a * 2)


def test_pytorch_pickle(tmp_path, rng):
    torch = pytest.importorskip("torch")
    sd = {
        "layer.weight": torch.randn(4, 4),
        "nested": {"bias": torch.arange(3, dtype=torch.float32)},
        "bf16": torch.randn(2, 2, dtype=torch.bfloat16),
    }
    p = tmp_path / "m.pt"
    torch.save(sd, str(p))
    out = lf.read_pytorch(str(p))
    np.testing.assert_array_equal(out["layer.weight"], sd["layer.weight"].numpy())
    np.testing.assert_array_equal(out["nested.bias"], [0, 1, 2])
    assert out["bf16"].dtype.name == "bfloat16"
