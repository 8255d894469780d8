"""Parity + timing for the Pallas NTT kernels vs the XLA reference path.

Runs on the attached TPU: coset_lift_bn (Pallas) against groth16/ntt.py
coset_lift (XLA) on random residues, then times both.

Usage: python tools/ntt_pallas_check.py [n] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()


def sync(v):
    return int(jnp.sum(v.astype(jnp.uint32)))


def timeit(fn, *a, rounds=4):
    sync(fn(*a))
    best = 1e9
    for _ in range(rounds):
        t0 = time.time()
        sync(fn(*a))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from zerokit_tpu.ff import pallas_ntt
    from zerokit_tpu.groth16 import ntt

    root = ntt.coset_root_2n(n)
    rnd = np.random.default_rng(1)
    x = rnd.integers(0, 1 << 16, size=(16, n, B), dtype=np.uint64).astype("uint32")
    x[15] &= 0xFFF
    x = jax.device_put(x)
    jax.block_until_ready(x)

    xla = np.asarray(ntt.coset_lift(x, root))
    print("xla done", flush=True)
    pal = np.asarray(
        jnp.swapaxes(pallas_ntt.coset_lift_bn(jnp.swapaxes(x, 1, 2), root), 1, 2)
    )
    match = np.array_equal(xla, pal)
    print(f"parity: {'OK' if match else 'MISMATCH'}", flush=True)
    if not match:
        bad = np.argwhere(xla != pal)
        print(f"  first diffs: {bad[:5].tolist()}  ({bad.shape[0]} total)")
        sys.exit(1)

    t_p = timeit(lambda v: pallas_ntt.coset_lift_bn(v, root), jnp.swapaxes(x, 1, 2))
    t_x = timeit(lambda v: ntt.coset_lift(v, root), x)
    print(f"pallas coset_lift: {t_p:8.2f} ms   xla: {t_x:8.2f} ms")


if __name__ == "__main__":
    main()
