"""Shared helpers for the CLI examples."""

from __future__ import annotations

import sys


def say(msg: str) -> None:
    print(msg, flush=True)


def fr_hex(v: int) -> str:
    return f"0x{v:064x}"


def setup_jax_cache() -> None:
    import os

    os.makedirs("/tmp/zerokit_tpu_xla_cache", exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/zerokit_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
