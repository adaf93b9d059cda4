"""Native IO engine tests: the C++ paths must agree bit-for-bit with the
numpy reference implementations."""

import numpy as np
import pytest

from diffusion_rs_tpu.io import native
from diffusion_rs_tpu.quant.qtensor import pack4, choose_split
from diffusion_rs_tpu.quant.bnb import unpack_bnb_nibbles


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_transpose_matches_numpy(lib, rng):
    for dt in (np.uint8, np.float32, np.float16, np.int64):
        a = rng.integers(0, 100, size=(130, 70)).astype(dt)
        np.testing.assert_array_equal(native.transpose_2d(a), a.T)


def test_bnb_repack_matches_python(lib, rng):
    n_out, n_in = 48, 512
    stream = rng.integers(0, 256, size=n_out * n_in // 2, dtype=np.uint8)
    split = choose_split(n_in)
    got = native.bnb_repack4(stream, n_out, n_in, split)
    assert got is not None
    q = unpack_bnb_nibbles(stream, n_out * n_in).reshape(n_out, n_in)
    want = pack4(np.ascontiguousarray(q.T), split)
    np.testing.assert_array_equal(got, want)


def test_read_spans(lib, tmp_path, rng):
    data = rng.integers(0, 256, size=4096, dtype=np.uint8).tobytes()
    p = tmp_path / "blob.bin"
    p.write_bytes(data)
    offsets = [0, 100, 4000]
    sizes = [50, 1024, 96]
    bufs = native.read_spans(str(p), offsets, sizes)
    assert bufs is not None
    for off, size, buf in zip(offsets, sizes, bufs):
        assert bytes(buf) == data[off : off + size]


def test_bnb_canonical_native_vs_python(rng):
    """bnb4bit_to_canonical must give identical tensors with/without the
    native repack (exercised via env flag)."""
    import importlib
    import os

    from diffusion_rs_tpu.quant import bnb as bnb_mod

    w = rng.standard_normal((16, 256)).astype(np.float32)
    packed, absmax = bnb_mod.quantize_4bit_bnb_layout(w, 64, "nf4")
    a = bnb_mod.bnb4bit_to_canonical(packed, absmax, (16, 256), 64, "nf4")
    os.environ["DIFFUSION_RS_TPU_NO_NATIVE"] = "1"
    try:
        native._tried = False
        native._lib = None
        b = bnb_mod.bnb4bit_to_canonical(packed, absmax, (16, 256), 64, "nf4")
    finally:
        del os.environ["DIFFUSION_RS_TPU_NO_NATIVE"]
        native._tried = False
        native._lib = None
    np.testing.assert_array_equal(np.asarray(a.packed), np.asarray(b.packed))
    np.testing.assert_array_equal(np.asarray(a.scale), np.asarray(b.scale))
