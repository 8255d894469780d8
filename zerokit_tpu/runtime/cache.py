"""Persistent XLA compilation cache, keyed by machine fingerprint.

XLA:CPU AOT results embed the compile machine's feature set; loading an entry
produced on a different host is rejected at best (with a full recompile) and
can SIGILL at worst. A shared /tmp cache directory that survives across
heterogeneous hosts therefore poisons cold starts. Keying the directory by a
fingerprint of the CPU feature flags + JAX version makes every distinct
machine class get its own cache while same-machine reruns stay warm.
"""

from __future__ import annotations

import hashlib
import os


def _fingerprint() -> str:
    parts = []
    # Include family/model/stepping alongside flags: LLVM tunes pseudo-
    # features like +prefer-no-gather/+prefer-no-scatter from the detected
    # microarchitecture, so two hosts with identical flag lists and model
    # names can still produce mutually-rejected AOT entries (observed: a
    # 452MB cache fully invalidated by a driver-host rotation).
    keys = ("flags", "model name", "cpu family", "model\t", "stepping")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(keys):
                    parts.append(line.strip())
                    if len(parts) >= len(keys):
                        break
    except OSError:
        import platform

        parts.append(platform.machine() + platform.processor())
    try:
        import jax

        parts.append(jax.__version__)
    except Exception:
        pass
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def enable_persistent_cache(base: str = "/tmp/zerokit_tpu_xla_cache") -> str:
    """Points jax at a machine-keyed persistent compilation cache dir."""
    import jax

    path = os.path.join(base, _fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Persist EVERY compile: on the tunneled TPU backend even a trivial
    # reshape/squeeze compile is a ~0.5s remote roundtrip, and the prover's
    # eager orchestration issues hundreds of them — with the default 1s
    # threshold none were cached and every cold start re-paid minutes of
    # sub-second compiles.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
