"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; unit and
parity tests run on CPU so they are hermetic and exercise multi-chip sharding
via xla_force_host_platform_device_count.

Note: the environment may pre-import jax (sitecustomize) with a TPU platform
pinned via JAX_PLATFORMS, so we override through jax.config, which takes
effect as long as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# u64 limb path for the CPU backend (ff/field.py _mont_mul_u64): ~5x faster
# XLA:CPU compiles of EC programs and ~3x faster limb runtime than the
# TPU-shaped u32 formulation
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache (machine-keyed: foreign AOT entries are
# rejected/SIGILL-prone): the limb-arithmetic programs are large and
# recompiling them every test run dominates wall-clock.
from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(1234)
