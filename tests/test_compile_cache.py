"""Persistent XLA compilation cache (util/compile_cache.py).

The reference has no compile step to cache; on TPU the pipeline's jitted
stages cost 20-40 s each to compile cold, so the library exposes JAX's
persistent compilation cache via Pipeline(compile_cache=...) / the
DIFFUSION_RS_TPU_COMPILE_CACHE env var / --compile-cache.
"""

import os

import jax
import jax.numpy as jnp
import pytest

from diffusion_rs_tpu.util import compile_cache as cc


@pytest.fixture
def reset_cache_config():
    """jax_compilation_cache_dir is process-global: restore it (and the
    module's first-enable latch) so the rest of the suite never writes
    compile artifacts into a deleted tmpdir."""
    prev = cc._enabled_dir
    yield
    cc._enabled_dir = prev
    jax.config.update("jax_compilation_cache_dir", prev)


def test_disabled_without_arg_or_env(monkeypatch, reset_cache_config):
    monkeypatch.delenv("DIFFUSION_RS_TPU_COMPILE_CACHE", raising=False)
    cc._enabled_dir = None
    assert cc.enable_compile_cache() is None


def test_enable_writes_entries(tmp_path, reset_cache_config):
    cc._enabled_dir = None
    d = cc.enable_compile_cache(str(tmp_path / "cache"))
    assert d == str(tmp_path / "cache")
    assert jax.config.jax_compilation_cache_dir == d

    # a fresh (unseen) graph must leave an artifact on disk
    @jax.jit
    def f(x):
        return (x * 3.0 + 1.0).sum()

    f(jnp.arange(64.0)).block_until_ready()
    assert os.listdir(d), "no cache entries written"


def test_first_enable_wins(tmp_path, reset_cache_config, caplog):
    cc._enabled_dir = None
    first = cc.enable_compile_cache(str(tmp_path / "a"))
    with caplog.at_level("WARNING", logger="diffusion_rs_tpu"):
        second = cc.enable_compile_cache(str(tmp_path / "b"))
    assert second == first
    assert "already enabled" in caplog.text
    # re-enabling the SAME dir is silent and idempotent
    assert cc.enable_compile_cache(str(tmp_path / "a")) == first


def test_env_var_is_the_default(tmp_path, monkeypatch, reset_cache_config):
    cc._enabled_dir = None
    monkeypatch.setenv("DIFFUSION_RS_TPU_COMPILE_CACHE", str(tmp_path / "env"))
    assert cc.enable_compile_cache() == str(tmp_path / "env")


def test_pipeline_plumbs_compile_cache(monkeypatch, tmp_path):
    """Pipeline(compile_cache=...) must reach enable_compile_cache BEFORE
    any load work (the cache only serves compilations after enabling)."""
    from diffusion_rs_tpu.pipelines import loader as loader_mod

    calls = []
    monkeypatch.setattr(
        cc, "enable_compile_cache", lambda d=None: calls.append(d)
    )
    from diffusion_rs_tpu.pipelines.api import ModelSource, Pipeline

    empty = tmp_path / "empty-model-dir"
    empty.mkdir()  # no model_index.json -> load fails offline, AFTER enable
    with pytest.raises(Exception):
        Pipeline(
            ModelSource.from_model_id(str(empty)),
            compile_cache=str(tmp_path / "cc"),
        )
    assert calls == [str(tmp_path / "cc")], calls
    assert loader_mod is not None
