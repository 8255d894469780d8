"""Microbenchmark: isolate the cost of one NTT butterfly stage on device.

Variants, each its own jit, timed with forced device->host sync:
  mul_flat     — FrField.mul on (16, N) flat               (compute floor)
  stage_m      — full butterfly at half-size m (reshape/slice/stack form)
  stage_nostack— butterfly writing via concatenate on axis 1
  addsub       — add+sub only (no twiddle mul)
  mul5d        — FrField.mul on the 5-D (16, nb, m, B) view
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

from zerokit_tpu.constants import R
from zerokit_tpu.ff.field import FR, FrField


def sync(x):
    return int(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.uint32)))


def timeit(fn, *args, rounds=5):
    sync(fn(*args))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        sync(fn(*args))
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rnd = np.random.default_rng(0)
    x = rnd.integers(0, 1 << 16, size=(16, n, B), dtype=np.uint64).astype("uint32")
    x[15] &= 0xFFF
    x = jax.device_put(x)
    tw_np = np.asarray(FR.encode([pow(5, i, R) for i in range(n // 2)]), np.uint32)
    jax.block_until_ready(x)

    @jax.jit
    def mul_flat(a):
        f = a.reshape(16, -1)
        return FrField.mul(f, f)

    def stage_for(m):
        @jax.jit
        def stage(a):
            t = a.reshape(16, n // (2 * m), 2, m, B)
            lo, hi = t[:, :, 0], t[:, :, 1]
            tw = jnp.asarray(tw_np[:, :m]).reshape(16, 1, m, 1)
            hi_t = FrField.mul(hi, jnp.broadcast_to(tw, hi.shape))
            out = jnp.stack(
                [FrField.add(lo, hi_t), FrField.sub(lo, hi_t)], axis=2
            )
            return out.reshape(16, n, B)

        return stage

    @jax.jit
    def addsub(a):
        t = a.reshape(16, n // 2, 2, B)
        lo, hi = t[:, :, 0], t[:, :, 1]
        out = jnp.stack([FrField.add(lo, hi), FrField.sub(lo, hi)], axis=2)
        return out.reshape(16, n, B)

    @jax.jit
    def mul5d(a):
        t = a.reshape(16, n // 128, 2, 64, B)
        hi = t[:, :, 1]
        tw = jnp.asarray(tw_np[:, :64]).reshape(16, 1, 64, 1)
        return FrField.mul(hi, jnp.broadcast_to(tw, hi.shape))

    print(f"n={n} B={B}  ({16*n*B*4/1e6:.0f} MB/array)")
    print(f"mul_flat : {timeit(mul_flat, x):8.2f} ms")
    print(f"addsub   : {timeit(addsub, x):8.2f} ms")
    print(f"mul5d    : {timeit(mul5d, x):8.2f} ms")
    for m in (1, 8, 64, 512, n // 2):
        print(f"stage m={m:5d}: {timeit(stage_for(m), x):8.2f} ms")


if __name__ == "__main__":
    main()
