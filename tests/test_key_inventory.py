"""Real-weight readiness: the builders must consume EXACTLY the authoritative
checkpoint inventories (every key read, none missing, shapes as shipped).

Ground truth comes from two independent sources:
* T5/CLIP: state dicts generated from the ``transformers`` model classes at
  the published configs (tools/gen_key_inventory.py -> tests/key_inventories/)
  — the same classes the real FLUX repo checkpoints were saved from.
* FLUX/VAE: io/audit.py inventories hand-derived from the diffusers layout
  the reference's VarBuilder paths traverse (models/flux/model.rs:709-788,
  models/vaes/vae.rs:67-88), cross-checked here against known parameter
  totals (FLUX.1-dev transformer = 11.90B params, FLUX VAE = 83.8M).

A renamed/missing/mis-shaped key in io/builders.py — the failure mode that
silently produces garbage images on a real checkpoint — fails these tests.
"""

import json
import math
import pathlib

import numpy as np
import pytest

from diffusion_rs_tpu.io.audit import (
    audit_keys,
    expected_clip_keys,
    expected_flux_keys,
    expected_flux_keys_bfl,
    expected_t5_keys,
    expected_vae_keys,
)
from diffusion_rs_tpu.io.builders import (
    build_clip_params,
    build_flux_params,
    build_t5_params,
    build_vae_params,
)
from diffusion_rs_tpu.io.varstore import VarStore
from diffusion_rs_tpu.models.clip import ClipTextConfig
from diffusion_rs_tpu.models.flux import FluxConfig
from diffusion_rs_tpu.models.t5 import T5Config
from diffusion_rs_tpu.models.vae import VAEConfig

FIXTURES = pathlib.Path(__file__).parent / "key_inventories"


class RecordingStore(VarStore):
    """VarStore that records every key actually read (membership checks do
    not count — only raw_entry, which all get/linear/conv paths funnel
    through)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def raw_entry(self, name):
        self.read.add(name)
        return super().raw_entry(name)


def store_from_inventory(inv) -> RecordingStore:
    import jax.numpy as jnp

    store = RecordingStore(default_dtype=jnp.float32)
    for k, shape in inv.items():
        store.add_array(k, np.zeros(shape, np.float32))
    return store


# -- generator vs transformers ground truth ---------------------------------


def test_t5_inventory_matches_transformers_fixture():
    fix = json.loads((FIXTURES / "t5_xxl.json").read_text())
    gen = expected_t5_keys(T5Config())
    assert {k: tuple(v) for k, v in fix.items()} == gen


def test_clip_inventory_matches_transformers_fixture():
    fix = json.loads((FIXTURES / "clip_l.json").read_text())
    gen = expected_clip_keys(ClipTextConfig())
    assert {k: tuple(v) for k, v in fix.items()} == gen


def test_flux_inventory_parameter_totals():
    """The full-size inventories must total the known published parameter
    counts — a wrong shape anywhere shifts the sum."""
    dev = expected_flux_keys(FluxConfig())
    total = sum(math.prod(s) for s in dev.values())
    assert total == 11_901_408_320  # FLUX.1-dev transformer, 11.90B
    # BFL single-file layout is a re-packing of the same weights
    bfl = expected_flux_keys_bfl(FluxConfig())
    assert sum(math.prod(s) for s in bfl.values()) == total
    # schnell differs from dev by exactly the guidance MLP embedder
    schnell = expected_flux_keys(FluxConfig(guidance_embeds=False))
    assert total - sum(math.prod(s) for s in schnell.values()) == (
        3072 * 256 + 3072 + 3072 * 3072 + 3072
    )
    vae = expected_vae_keys(VAEConfig())
    assert sum(math.prod(s) for s in vae.values()) == 83_819_683  # 83.8M
    t5 = expected_t5_keys(T5Config())
    assert sum(math.prod(s) for s in t5.values()) == 4_762_310_656  # 4.76B


# -- builders consume exactly the inventory ---------------------------------
# Key NAMES depend only on layer counts / flags, so the coverage tests run
# with REAL layer counts at tiny widths (full-size widths are exercised by
# the opt-in full-size load test below / tools/load_bench.py).

TINY_FLUX = dict(
    in_channels=8, pooled_projection_dim=12, joint_attention_dim=16,
    num_attention_heads=4, hidden_size=48,
)


@pytest.mark.parametrize("guidance", [True, False], ids=["dev", "schnell"])
def test_flux_builder_consumes_exact_inventory(guidance):
    cfg = FluxConfig(num_layers=19, num_single_layers=38,
                     guidance_embeds=guidance, **TINY_FLUX)
    inv = expected_flux_keys(cfg)
    store = store_from_inventory(inv)
    build_flux_params(store, cfg, dtype=np.float32)
    assert store.read == set(inv), (
        sorted(set(inv) - store.read)[:5], sorted(store.read - set(inv))[:5]
    )


def test_flux_builder_bfl_consumes_exact_inventory():
    cfg = FluxConfig(num_layers=19, num_single_layers=38,
                     guidance_embeds=True, **TINY_FLUX)
    inv = expected_flux_keys_bfl(cfg)
    store = store_from_inventory(inv)
    build_flux_params(store, cfg, dtype=np.float32)  # dispatches to BFL map
    assert store.read == set(inv), (
        sorted(set(inv) - store.read)[:5], sorted(store.read - set(inv))[:5]
    )


def test_t5_builder_consumes_exact_inventory():
    cfg = T5Config(vocab_size=100, d_model=16, d_kv=4, d_ff=32,
                   num_layers=24, num_heads=4)
    inv = expected_t5_keys(cfg)
    store = store_from_inventory(inv)
    build_t5_params(store, cfg, dtype=np.float32)
    assert store.read == set(inv), (
        sorted(set(inv) - store.read)[:5], sorted(store.read - set(inv))[:5]
    )


def test_clip_builder_consumes_exact_inventory():
    cfg = ClipTextConfig(vocab_size=100, projection_dim=16,
                         intermediate_size=32, num_hidden_layers=12,
                         num_attention_heads=4)
    inv = expected_clip_keys(cfg)
    store = store_from_inventory(inv)
    build_clip_params(store, cfg, dtype=np.float32)
    assert store.read == set(inv), (
        sorted(set(inv) - store.read)[:5], sorted(store.read - set(inv))[:5]
    )


def test_vae_builder_consumes_exact_inventory():
    cfg = VAEConfig(block_out_channels=(8, 16, 32, 32), latent_channels=4)
    inv = expected_vae_keys(cfg)
    store = store_from_inventory(inv)
    build_vae_params(store, cfg, dtype=np.float32)
    assert store.read == set(inv), (
        sorted(set(inv) - store.read)[:5], sorted(store.read - set(inv))[:5]
    )


def test_vae_builder_reads_quant_convs_when_configured():
    cfg = VAEConfig(block_out_channels=(8, 16), latent_channels=4,
                    use_quant_conv=True, use_post_quant_conv=True)
    inv = expected_vae_keys(cfg)
    assert "quant_conv.weight" in inv and "post_quant_conv.weight" in inv
    store = store_from_inventory(inv)
    params = build_vae_params(store, cfg, dtype=np.float32)
    assert params["quant_conv"] is not None
    assert params["post_quant_conv"] is not None
    assert store.read == set(inv)


def test_missing_key_fails_loudly():
    """A checkpoint missing one expected tensor must raise, not silently
    skip (the reference's VarBuilder get() errors the same way)."""
    cfg = FluxConfig(num_layers=2, num_single_layers=2, guidance_embeds=False,
                     **TINY_FLUX)
    inv = expected_flux_keys(cfg)
    del inv["transformer_blocks.1.attn.to_k.weight"]
    store = store_from_inventory(inv)
    with pytest.raises(KeyError):
        build_flux_params(store, cfg, dtype=np.float32)


def test_audit_report():
    cfg = FluxConfig(num_layers=1, num_single_layers=1, guidance_embeds=False,
                     **TINY_FLUX)
    inv = expected_flux_keys(cfg)
    present = dict(inv)
    del present["proj_out.bias"]
    present["stray.key"] = (3,)
    k = "transformer_blocks.0.attn.to_q.weight"
    present[k] = (1, 2)
    rep = audit_keys(present, inv)
    assert not rep.ok
    assert rep.missing == ["proj_out.bias"]
    assert rep.unexpected == ["stray.key"]
    assert rep.shape_mismatch == [(k, inv[k], (1, 2))]
    assert "1 missing" in rep.summary()
    assert audit_keys(inv, inv).ok
