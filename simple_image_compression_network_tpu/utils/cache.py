"""Persistent XLA compile cache setup (shared by tests, bench, CLI tools)."""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> None:
    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
