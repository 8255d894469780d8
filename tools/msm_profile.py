"""Stage-attribution bisect for the fused TPU MSM.

Times the REAL fused program (groth16/msm_fused.py) truncated after each
stage — the cut points live inside _build_fused, so the profile can never
drift from the shipped code. The difference between consecutive stages
attributes the warm pass time. Completion is forced by a device->host
transfer (this backend's block_until_ready can return early).

Usage: python tools/msm_profile.py [n] [batch] [stages_csv]
"""

import sys
import time

import jax
import numpy as np

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from zerokit_tpu.constants import NUM_LIMBS
from zerokit_tpu.ff.fq2 import FqAdapter
from zerokit_tpu.groth16.msm import C_BITS, N_WINDOWS, MSM, _window_group
from zerokit_tpu.groth16.msm_fused import _build_fused

STAGES = ["digits", "sort", "gather", "fine", "coarse", "qgather", "sumq", "full"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    stages = sys.argv[3].split(",") if len(sys.argv) > 3 else STAGES
    rng = np.random.default_rng(0)
    from zerokit_tpu.hostmath import bn254

    gen = (1, 2)  # BN254 G1 generator
    pts = []
    p = gen
    for _ in range(64):
        pts.append((int(p[0]), int(p[1])))
        p = bn254.G1.add(p, gen)
    points = [pts[i % 64] for i in range(n)]
    msm = MSM(points, FqAdapter)
    tables = msm.tables()[0]
    scal = rng.integers(0, 1 << 16, size=(NUM_LIMBS, n, batch), dtype=np.uint32)
    scalars = jax.numpy.asarray(scal)
    group = _window_group(batch, 1, N_WINDOWS)
    print(f"n={n} batch={batch} group={group}", flush=True)

    prev = 0.0
    for stage in stages:
        fn = _build_fused(FqAdapter, n, N_WINDOWS, C_BITS, group, stage)
        t0 = time.time()
        out = fn(tables, scalars)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn(tables, scalars)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"{stage:8s}: {best*1e3:8.1f} ms  (delta {1e3*(best-prev):+8.1f} ms,"
            f" compile {compile_s:.1f}s)",
            flush=True,
        )
        prev = best


if __name__ == "__main__":
    main()
