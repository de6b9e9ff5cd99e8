"""utils.multihost: env-gated launch plumbing stays a strict no-op when
the env vars are unset, and the compile cache actually configures jax."""
import os

import jax
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.multihost import (
    maybe_enable_compile_cache, maybe_initialize_distributed)


def test_distributed_init_noop_without_env(monkeypatch):
    monkeypatch.delenv("TPUSEG_MULTIHOST", raising=False)
    assert maybe_initialize_distributed() is False
    assert jax.process_count() == 1


def test_compile_cache_noop_without_env(monkeypatch):
    monkeypatch.delenv("TPUSEG_COMPILE_CACHE", raising=False)
    assert maybe_enable_compile_cache() is None


def test_compile_cache_configures_jax(monkeypatch, tmp_path):
    cache = str(tmp_path / "xla_cache")
    monkeypatch.setenv("TPUSEG_COMPILE_CACHE", cache)
    try:
        assert maybe_enable_compile_cache() == cache
        assert os.path.isdir(cache)
        assert jax.config.jax_compilation_cache_dir == cache
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
