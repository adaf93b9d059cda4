"""Ops tests: norms, rope, attention, linear dispatch, Pallas kernels
(interpret mode on CPU; the same kernels are validated on real TPU by
bench.py runs).

Tolerances follow the reference test corpus: SDPA summed relative error
<= 5e-4 for f32 (nn/tests/sdpa.rs:32-37); quantized matmul relative error
<= 0.02 (core/tests/quantized_tests.rs:40-46).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu import ops
from diffusion_rs_tpu.ops.flash_pallas import flash_attention
from diffusion_rs_tpu.ops.qmatmul_pallas import quantized_matmul
from diffusion_rs_tpu.quant import bnb, gguf_quants as gq
from diffusion_rs_tpu.quant.qtensor import (
    dequantize,
    quantize_q4_0,
    quantize_q8_0,
)


def summed_rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).sum() / (np.abs(b).sum() + 1e-9)


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------


def test_layer_norm_matches_numpy(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(ops.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-6))
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-6) * w + b
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_layer_norm_no_affine(rng):
    """FLUX blocks use parameter-free LayerNorm (model.rs:33-38)."""
    x = rng.standard_normal((2, 8, 32)).astype(np.float32)
    got = np.asarray(ops.layer_norm(jnp.asarray(x)))
    assert abs(got.mean(-1)).max() < 1e-5
    np.testing.assert_allclose(got.std(-1), 1.0, atol=1e-3)


def test_rms_norm_f32_accum(rng):
    """T5LayerNorm semantics: f32 variance accum, cast back, then weight
    (models/t5/mod.rs:94-120)."""
    x = rng.standard_normal((4, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(ops.rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    want = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_group_norm_nhwc(rng):
    x = rng.standard_normal((2, 4, 4, 32)).astype(np.float32)
    w = np.ones(32, np.float32)
    b = np.zeros(32, np.float32)
    got = np.asarray(ops.group_norm(jnp.asarray(x), 8, jnp.asarray(w), jnp.asarray(b)))
    # groups over channels: stats over (H, W, C/G)
    xg = x.reshape(2, 16, 8, 4)
    mu = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    want = ((xg - mu) / np.sqrt(var + 1e-6)).reshape(2, 4, 4, 32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------


def test_rope_rotation_identity(rng):
    """Rotating by position 0 is the identity."""
    ids = jnp.zeros((1, 4, 3))
    cos, sin = ops.rope_tables(ids, [16, 56, 56])
    assert cos.shape == (1, 4, 64)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 128)), jnp.float32)
    out = ops.apply_rope(x, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_rope_preserves_norm(rng):
    ids = jnp.asarray(rng.integers(0, 50, size=(1, 8, 3)).astype(np.float32))
    cos, sin = ops.rope_tables(ids, [16, 56, 56])
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 128)), jnp.float32)
    out = ops.apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_reference_rotation_math(rng):
    """Pairwise rotation: out_2i = cos*x_2i - sin*x_2i+1 (model.rs:86-95)."""
    ids = jnp.asarray(np.array([[[3.0]]], np.float32))  # 1 axis, dim 4
    cos, sin = ops.rope_tables(ids, [4], theta=10000)
    x = jnp.asarray(rng.standard_normal((1, 1, 1, 4)), jnp.float32)
    out = np.asarray(ops.apply_rope(x, cos, sin))[0, 0, 0]
    xn = np.asarray(x)[0, 0, 0]
    for i, freq in enumerate([3.0, 3.0 / 10000 ** (2 / 4)]):
        c, s = np.cos(freq), np.sin(freq)
        np.testing.assert_allclose(out[2 * i], c * xn[2 * i] - s * xn[2 * i + 1], rtol=1e-5)
        np.testing.assert_allclose(out[2 * i + 1], s * xn[2 * i] + c * xn[2 * i + 1], rtol=1e-5)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def test_flash_attention_matches_xla(rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    o1 = flash_attention(q, k, v, interpret=True)
    o2 = ops.sdpa_xla(q, k, v)
    assert summed_rel(o1, o2) <= 5e-4


def test_flash_attention_ragged_kv(rng):
    """kv length not a multiple of the block must be masked, not padded-in."""
    q = jnp.asarray(rng.standard_normal((1, 1, 130, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 130, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 130, 128)), jnp.float32)
    o1 = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    o2 = ops.sdpa_xla(q, k, v)
    assert summed_rel(o1, o2) <= 5e-4


def test_sdpa_bias(rng):
    """Additive bias path (T5 relative position / CLIP causal mask)."""
    q = jnp.asarray(rng.standard_normal((2, 2, 16, 64)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, 2, 16, 16)), jnp.float32)
    out = ops.sdpa(q, q, q, bias=bias, impl="xla")
    s = np.einsum("bhsd,bhtd->bhst", np.asarray(q), np.asarray(q)) / 8.0
    s = s + np.asarray(bias)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhst,bhtd->bhsd", p, np.asarray(q))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# quantized matmul kernel (interpret mode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "make",
    [
        lambda w: quantize_q4_0(w),
        lambda w: quantize_q8_0(w),
        lambda w: bnb.quantize_nf4(np.ascontiguousarray(w.T), blocksize=64),
    ],
    ids=["q4_0", "q8_0", "nf4"],
)
def test_qmm_kernel_matches_dequant(rng, make):
    w = (rng.standard_normal((512, 256)) * 0.05).astype(np.float32)
    qt = make(w)
    x = jnp.asarray(rng.standard_normal((33, 512)), jnp.float32)
    y1 = quantized_matmul(x, qt, interpret=True)
    y2 = jnp.matmul(x, dequantize(qt, jnp.float32))
    assert summed_rel(y1, y2) <= 1e-5  # same math, same order -> near-exact


def test_qmm_int8_whole_column_scale(rng):
    w8 = rng.integers(-127, 128, size=(256, 512), dtype=np.int8)
    scb = rng.standard_normal(256).astype(np.float32)
    qt = bnb.bnb_int8_to_canonical(w8, scb)
    x = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32)
    y1 = quantized_matmul(x, qt, interpret=True)
    y2 = jnp.matmul(x, dequantize(qt, jnp.float32))
    assert summed_rel(y1, y2) <= 1e-5


def test_qmm_kquant_group16(rng):
    """Q6K: 16-wide groups exercise the scale-plane tiling."""
    w = (rng.standard_normal((8, 512)) * 0.05).astype(np.float32)
    raw = gq.ENCODERS["q6_k"](w)
    qt = gq.gguf_to_canonical("q6_k", raw, (8, 512))
    # N=8 < 128 -> kernel refuses; falls back to XLA path, still correct.
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    y1 = quantized_matmul(x, qt, interpret=True)
    y2 = jnp.matmul(x, dequantize(qt, jnp.float32))
    assert summed_rel(y1, y2) <= 1e-5


def test_qmm_fast16_decode_budget(rng):
    """DIFFUSION_RS_TPU_QMM_FAST16=1 decodes in bf16 (2x VPU lanes); its
    extra rounding must stay ~2^-9 relative — noise against the 4-bit
    quantization error. Default is the bit-exact-vs-dequantize f32 decode."""
    import os

    w = (rng.standard_normal((512, 256)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((33, 512)), jnp.bfloat16)
    for make in (quantize_q4_0, quantize_q8_0,
                 lambda w: bnb.quantize_nf4(np.ascontiguousarray(w.T), blocksize=64)):
        qt = make(w)
        ref = np.asarray(
            jnp.matmul(x.astype(jnp.float32), dequantize(qt, jnp.float32)))
        os.environ["DIFFUSION_RS_TPU_QMM_FAST16"] = "1"
        try:
            y_fast = np.asarray(quantized_matmul(x, qt, interpret=True), np.float32)
        finally:
            del os.environ["DIFFUSION_RS_TPU_QMM_FAST16"]
        y_f32 = np.asarray(quantized_matmul(x, qt, interpret=True), np.float32)
        rel_fast = np.abs(y_fast - ref).sum() / np.abs(ref).sum()
        rel_f32 = np.abs(y_f32 - ref).sum() / np.abs(ref).sum()
        # bf16 inputs already cost ~2.3e-3; fast16 may add at most ~2x
        assert rel_f32 <= 3e-3, (qt.kind, rel_f32)
        assert rel_fast <= 2.0 * rel_f32 + 1e-4, (qt.kind, rel_fast, rel_f32)


def test_qmm_plan_accounts_out_dtype():
    """The VMEM tile planner must size the output block by the CALLER's out
    dtype: with the north-star nf4 shape (M4608 K=N=3072, bn_cap 1024) an f32
    out at the bf16-sized plan exceeded the 16 MB scoped-vmem limit on-chip
    (caught by tools/smoke_tpu.py, r4) — the f32 plan must shrink."""
    from diffusion_rs_tpu.ops.qmatmul_pallas import _plan_tiles

    args = (4608, 3072, 3072, 4, 64, 64, False, 1536, 1024)
    plan_bf16 = _plan_tiles(*args, out_itemsize=2)
    plan_f32 = _plan_tiles(*args, out_itemsize=4)
    assert plan_bf16 is not None and plan_f32 is not None
    bm16, bn16, _ = plan_bf16
    bm32, bn32, _ = plan_f32
    assert bm32 * bn32 < bm16 * bn16  # f32 out must buy a smaller tile
    # and the shrunken plan actually fits the planner's own budget
    assert bm32 >= 256 and bn32 >= 128


def test_qmm_plan_pad_aware_bm():
    """The m-tile is chosen pad-first INSIDE the VMEM-feasible range (r5):
    the legacy plan padded production M up to bm multiples AFTER the budget
    shrink — 4096 -> 4224 rows at the north star's img calls and
    3600 -> 3840 at 720x1280 (q8t), 4096 -> 4608 (12.5% dead MXU rows) at
    nf4's bigger tiles. Every production M must now plan with zero pad."""
    from diffusion_rs_tpu.ops.qmatmul_pallas import _plan_tiles, _round_up

    # (m, bits, group, split, bn_cap): q8t runs full-N tiles, nf4 bn 1024
    cases = [
        (512, 8, 256, 256, 3072), (4096, 8, 256, 256, 3072),
        (4608, 8, 256, 256, 3072), (3600, 8, 256, 256, 3072),
        (36864, 8, 256, 256, 3072),
        (4096, 4, 64, 64, 1024), (3600, 4, 64, 64, 1024),
        (4608, 4, 64, 64, 1024),
    ]
    for m, bits, group, split, bn_cap in cases:
        plan = _plan_tiles(m, 3072, 3072, bits, group, split, False,
                           1536, bn_cap, 2)
        assert plan is not None, m
        bm, bn, bk = plan
        assert _round_up(m, bm) == m, (m, bm)  # zero padded rows
        assert bm % 16 == 0 and bm >= 256
    # non-divisible M still pads, but only to the next 16-aligned tile grid
    bm, _, _ = _plan_tiles(4100, 3072, 3072, 8, 256, 256, False,
                           1536, 3072, 2)
    assert _round_up(4100, bm) - 4100 <= bm  # bounded, not a bm_cap multiple


def test_qmm_grouped_matches_separate(rng):
    """Grouped call (one launch, per-m-tile weight selection) must be
    bit-identical to the per-group calls for both the s8 (q8t) and the
    codebook (nf4) paths, including the fallback when formats mismatch."""
    from diffusion_rs_tpu.ops.qmatmul_pallas import quantized_matmul_grouped
    from diffusion_rs_tpu.quant import bnb
    from diffusion_rs_tpu.quant.qtensor import quantize_q8_tile

    K, N = 512, 256
    makers = {
        "q8t": lambda w: quantize_q8_tile(w),
        "nf4": lambda w: bnb.quantize_nf4(
            np.ascontiguousarray(w.T), blocksize=64
        ),
    }
    for name, make in makers.items():
        qts = [
            make((rng.standard_normal((K, N)) * 0.05).astype(np.float32))
            for _ in range(2)
        ]
        xs = [
            jnp.asarray(rng.standard_normal((1, m, K)), jnp.bfloat16)
            for m in (48, 272)
        ]
        got = quantized_matmul_grouped(xs, qts, interpret=True)
        want = [
            quantized_matmul(x, qt, interpret=True)
            for x, qt in zip(xs, qts)
        ]
        for g, w_ in zip(got, want):
            np.testing.assert_array_equal(
                np.asarray(g, np.float32), np.asarray(w_, np.float32),
                err_msg=name,
            )
    # mixed formats -> falls back to per-group calls (still exact)
    mixed = [makers["q8t"]((rng.standard_normal((K, N)) * 0.05).astype(np.float32)),
             makers["nf4"]((rng.standard_normal((K, N)) * 0.05).astype(np.float32))]
    xs = [jnp.asarray(rng.standard_normal((1, 32, K)), jnp.bfloat16)] * 2
    got = quantized_matmul_grouped(xs, mixed, interpret=True)
    for g, x, qt in zip(got, xs, mixed):
        np.testing.assert_array_equal(
            np.asarray(g, np.float32),
            np.asarray(quantized_matmul(x, qt, interpret=True), np.float32),
        )


def test_qmm_accuracy_budget(rng):
    """End-to-end quantize->fused-matmul error budget (reference: <= 0.02)."""
    m, k, n = 16, 512, 256
    x = (np.arange(m * k, dtype=np.float32).reshape(m, k) % 64) / 64.0
    w = (np.arange(k * n, dtype=np.float32).reshape(k, n) % 32) / 32.0
    qt = quantize_q4_0(w)
    y_ref = x @ w
    y_q = np.asarray(quantized_matmul(jnp.asarray(x), qt, interpret=True))
    assert summed_rel(y_q, y_ref) <= 0.02


# ---------------------------------------------------------------------------
# linear dispatch
# ---------------------------------------------------------------------------


def test_linear_dense_and_bias(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    b = rng.standard_normal(32).astype(np.float32)
    lin = ops.make_linear(w, b, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ops.linear(x, lin)), np.asarray(x) @ w + b, rtol=1e-4, atol=1e-5
    )


def test_linear_transpose_torch_layout(rng):
    w_torch = rng.standard_normal((32, 64)).astype(np.float32)  # [out, in]
    lin = ops.make_linear(w_torch, transpose=True, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ops.linear(x, lin)), np.asarray(x) @ w_torch.T, rtol=1e-4, atol=1e-5
    )


def test_linear_quantized_weight(rng):
    w = (rng.standard_normal((512, 256)) * 0.05).astype(np.float32)
    qt = quantize_q8_0(w)
    lin = ops.Linear(w=qt, b=None)
    x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    y = ops.linear(x, lin)  # CPU -> XLA dequant path
    y2 = np.asarray(x) @ np.asarray(dequantize(qt, jnp.float32))
    assert summed_rel(y, y2) <= 1e-4


def test_linear_is_pytree(rng):
    lin = ops.make_linear(rng.standard_normal((8, 4)).astype(np.float32))
    leaves = jax.tree_util.tree_leaves(lin)
    assert len(leaves) == 1
    lin2 = ops.Linear(w=quantize_q8_0(rng.standard_normal((64, 4)).astype(np.float32)), b=jnp.zeros(4))
    leaves2 = jax.tree_util.tree_leaves(lin2)
    assert len(leaves2) >= 3  # packed, scale, bias


def test_flash_attention_s8_matches_xla(rng):
    """s8xs8 QK^T (per-row q scales, mean-centered per-tile k prepass) must
    track the f32 reference within the int8 quantization budget — softmax is
    exactly invariant under the k mean-centering, so only the int8 rounding
    of q/k contributes."""
    q = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    o1 = flash_attention(q, k, v, interpret=True, s8=True)
    o2 = ops.sdpa_xla(q, k, v)
    # N(0,1) q/k over 300 near-orthogonal keys is the harsh case (outputs
    # shrink toward the mean, inflating relative error); the reference's own
    # quantized-dot budget is 2e-2 (quantized_tests.rs:40-46)
    assert summed_rel(o1, o2) <= 2e-2
    # and the ragged-kv tail stays masked on the s8 path too
    o3 = flash_attention(q[:, :, :130], k[:, :, :130], v[:, :, :130],
                         block_q=128, block_k=128, interpret=True, s8=True)
    o4 = ops.sdpa_xla(q[:, :, :130], k[:, :, :130], v[:, :, :130])
    assert summed_rel(o3, o4) <= 2e-2


def test_flash_attention_s8_pv_matches_xla(rng):
    """s8xs8 P.V (in-kernel p quantize at the exact [0,1] range with
    quantized-l normalization; mean-centered per-tile int8 v prepass with
    the mean added back at finalize) must track the f32 reference within
    the int8 budget — and compose with the s8 QK^T path."""
    q = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 300, 128)), jnp.float32)
    # non-zero v channel means: exercises the centering add-back exactness
    v = jnp.asarray(rng.standard_normal((1, 2, 300, 128)) + 3.0, jnp.float32)
    o2 = ops.sdpa_xla(q, k, v)
    o1 = flash_attention(q, k, v, interpret=True, s8_pv=True)
    assert summed_rel(o1, o2) <= 2e-2
    # combined QK^T + P.V int8 stays inside the same budget
    o3 = flash_attention(q, k, v, interpret=True, s8=True, s8_pv=True)
    assert summed_rel(o3, o2) <= 2e-2
    # ragged kv tail masked on the s8_pv path too
    o4 = flash_attention(q[:, :, :130], k[:, :, :130], v[:, :, :130],
                         block_q=128, block_k=128, interpret=True,
                         s8_pv=True)
    o5 = ops.sdpa_xla(q[:, :, :130], k[:, :, :130], v[:, :, :130])
    assert summed_rel(o4, o5) <= 2e-2
    # seq-major output layout composes with s8_pv (the pipeline's default
    # merged-output path under DIFFUSION_RS_TPU_ATTN_S8PV=1)
    o6 = flash_attention(q, k, v, interpret=True, s8_pv=True,
                         out_seqmajor=True)
    b, h, s, d = o1.shape
    merged = np.asarray(o1).transpose(0, 2, 1, 3).reshape(b, s, h * d)
    np.testing.assert_allclose(np.asarray(o6), merged, rtol=0, atol=0)


def test_flash_attention_s8_pv_diffuse_tail(rng):
    """ADVICE r4 (medium): at-scale adversarial parity for s8_pv — one sharp
    logit plus a heavy diffuse tail (~6 logits down, > 90% of the true
    softmax mass) across the full FLUX kv length S=4608.

    The kernel quantizes p relative to each kv BLOCK's own row max, so a
    whole block sitting far below the running max keeps its mass at full
    7-bit precision (under the round-4 fixed-global scale it quantized to
    all-zeros and its mass was silently renormalized away). What remains
    truncated is the within-block tail of the block holding the sharp key —
    exactly what s8pv_dropped_mass predicts, and the kernel's error must
    track that prediction rather than blow past it."""
    from diffusion_rs_tpu.ops.flash_pallas import s8pv_dropped_mass

    S, d = 4608, 128
    # logits are read straight off k[..., 0]: q = sqrt(d) * e0, so that
    # scale * (q . k_j) == k_j[0]
    q = np.zeros((1, 1, 256, d), np.float32)
    q[..., 0] = float(d) ** 0.5
    v = rng.standard_normal((1, 1, S, d)).astype(np.float32)
    v[:, :, 0] += 5.0  # the sharp key's v is distinctive

    # Case 1: the diffuse tail lives in OTHER kv blocks than the sharp key
    # (block 0: sharp at index 0, rest at -30 ≈ zero mass even exactly;
    # blocks 1-2: all keys at -6 -> 87% of the true mass). The per-block
    # scale must preserve essentially all of it.
    k1 = np.full((1, 1, S, d), 0.0, np.float32)
    k1[:, :, :, 0] = -6.0
    k1[:, :, 0, 0] = 0.0
    k1[:, :, 1:1536, 0] = -30.0
    qj, k1j, vj = jnp.asarray(q), jnp.asarray(k1), jnp.asarray(v)
    dropped1 = float(s8pv_dropped_mass(qj, k1j).max())
    assert dropped1 <= 1e-3, dropped1  # diagnostic: below-max blocks kept
    o1 = flash_attention(qj, k1j, vj, interpret=True, s8_pv=True)
    ref1 = ops.sdpa_xla(qj, k1j, vj)
    assert summed_rel(o1, ref1) <= 2e-2  # the r4 fixed-global scale: ~1.0

    # Case 2: sharp key and diffuse tail SHARE a block — the inherent int8
    # truncation case. The diagnostic predicts the dropped fraction (~0.3
    # by construction) and the kernel error must stay within it: the error
    # is a renormalization among true softmax mass, never a blowup.
    k2 = np.full((1, 1, S, d), 0.0, np.float32)
    k2[:, :, :, 0] = -6.0
    k2[:, :, 0, 0] = 0.0
    k2j = jnp.asarray(k2)
    dropped2 = float(s8pv_dropped_mass(qj, k2j).max())
    assert 0.1 <= dropped2 <= 0.5, dropped2  # the construction is harsh
    o2 = flash_attention(qj, k2j, vj, interpret=True, s8_pv=True)
    ref2 = ops.sdpa_xla(qj, k2j, vj)
    # dropping mass fraction d renormalizes the survivors by 1/(1-d):
    # |o' - o| <= d/(1-d) * |o_surv| + |o_drop| <= 2 d/(1-d) * |o|-scale
    # (measured here: 0.44 ~= d/(1-d), the o_drop term ~0 for zero-mean v)
    assert summed_rel(o2, ref2) <= 2 * dropped2 / (1 - dropped2) + 0.05

    # Case 3: realistic magnitudes at full FLUX scale (bf16 N(0, 0.3) q/k —
    # the smoke_tpu distribution) must stay inside the standard quantized
    # budget, with negligible predicted truncation.
    q3 = jnp.asarray(rng.standard_normal((1, 1, 512, d)) * 0.3, jnp.bfloat16)
    k3 = jnp.asarray(rng.standard_normal((1, 1, S, d)) * 0.3, jnp.bfloat16)
    v3 = jnp.asarray(rng.standard_normal((1, 1, S, d)) * 0.3, jnp.bfloat16)
    dropped3 = float(s8pv_dropped_mass(q3, k3).max())
    assert dropped3 <= 2e-2, dropped3
    o3 = flash_attention(q3, k3, v3, interpret=True, s8_pv=True)
    ref3 = ops.sdpa_xla(q3, k3, v3)
    assert summed_rel(o3, ref3) <= 2e-2


def test_flash_attention_seqmajor_output(rng):
    """out_seqmajor writes head column slices of [B, S, H*D]: must equal the
    bhsd kernel output transposed+merged, bit-for-bit (same accumulations,
    different store layout)."""
    q = jnp.asarray(rng.standard_normal((2, 2, 300, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 300, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 300, 128)), jnp.float32)
    bhsd = np.asarray(flash_attention(q, k, v, interpret=True))
    merged = np.asarray(flash_attention(q, k, v, interpret=True,
                                        out_seqmajor=True))
    b, h, s, d = bhsd.shape
    np.testing.assert_array_equal(
        merged, bhsd.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    )


def test_sdpa_merged_dispatch(rng, monkeypatch):
    """sdpa_merged: flash path (interpret) and the XLA fallback agree; the
    MERGED=0 ablation knob restores the transpose path bit-for-bit."""
    from diffusion_rs_tpu.ops import attention

    q = jnp.asarray(rng.standard_normal((1, 2, 64, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 128)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 128)), jnp.float32)
    a = np.asarray(attention.sdpa_merged(q, k, v, impl="interpret"))
    b = np.asarray(attention.sdpa_merged(q, k, v, impl="xla"))
    assert a.shape == b.shape == (1, 64, 256)
    assert summed_rel(a, b) <= 5e-4
    monkeypatch.setenv("DIFFUSION_RS_TPU_ATTN_MERGED", "0")
    attention._merged_default.cache_clear()
    try:
        c = np.asarray(attention.sdpa_merged(q, k, v, impl="interpret"))
    finally:
        attention._merged_default.cache_clear()
    np.testing.assert_array_equal(a, c)


def test_flash_mode_keyed_on_active_backend(monkeypatch):
    """The flash/xla pick must be cached PER BACKEND: one process can trace
    under the TPU backend and then run a forced-CPU mesh dryrun (the
    __graft_entry__ / conftest pattern) — a backend-blind cache leaked the
    'flash' pick into the CPU trace, whose custom_partitioning wrapper has
    no autodiff rule (NotImplementedError under jax.grad)."""
    from diffusion_rs_tpu.ops import attention

    monkeypatch.delenv("DIFFUSION_RS_TPU_FLASH", raising=False)
    monkeypatch.delenv("DIFFUSION_RS_TPU_NO_FLASH", raising=False)
    attention._flash_mode.cache_clear()
    try:
        # Populate the cache for a TPU backend first, then ask for cpu:
        # the cpu answer must not be poisoned by the earlier entry.
        assert attention._flash_mode_for("tpu") == "flash"
        assert attention._flash_mode_for("cpu") is None
        # The public entry point resolves through the CURRENT backend
        # (cpu under the test conftest) and so picks the XLA path.
        import jax

        assert attention._flash_mode() == (
            None if jax.default_backend() == "cpu" else "flash"
        )
    finally:
        attention._flash_mode.cache_clear()
