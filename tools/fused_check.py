"""Correctness + timing check for the fused TPU MSM after a rewrite.

Runs MSM (fused path) on random points/scalars, compares a few lanes against
the host big-int MSM, and times warm passes.

Usage: python tools/fused_check.py [n] [batch] [n_check] [lane_batch]
Env:   FC_CURVE=g2 checks the G2 (Fq2) pipeline instead of G1.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

from zerokit_tpu.constants import NUM_LIMBS, R
from zerokit_tpu.ff.field import encode_canonical_fast
from zerokit_tpu.ff.fq2 import Fq2Adapter, FqAdapter
from zerokit_tpu.groth16.msm import MSM
from zerokit_tpu.hostmath import bn254


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_check = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    lane_batch = int(sys.argv[4]) if len(sys.argv) > 4 else None
    import os

    rng = np.random.default_rng(7)
    g2_mode = os.environ.get("FC_CURVE") == "g2"
    curve = bn254.G2 if g2_mode else bn254.G1
    gen = bn254.G2_GENERATOR if g2_mode else bn254.G1_GENERATOR
    adapter = Fq2Adapter if g2_mode else FqAdapter
    # base set: 64 distinct small multiples of the generator, tiled
    pts = []
    p = gen
    for _ in range(64):
        pts.append(p)
        p = curve.add(p, gen)
    points = [pts[i % 64] for i in range(n)]
    scal_ints = [[int.from_bytes(rng.bytes(31), "little") % R for _ in range(batch)] for _ in range(n)]
    sc = encode_canonical_fast(
        [scal_ints[i][b] for i in range(n) for b in range(batch)]
    ).reshape(NUM_LIMBS, n, batch)

    msm = MSM(points, adapter)
    if lane_batch is not None:
        msm.lane_batch = lane_batch
    print(f"n={n} batch={batch} lane_batch={msm.lane_batch} fused={msm._fused}", flush=True)
    t0 = time.time()
    res = msm.to_affine_ints(msm(sc))
    print(f"first pass (compile+run): {time.time() - t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        acc = msm(sc)
        res = msm.to_affine_ints(acc)
        print(f"warm pass: {(time.time() - t0)*1e3:.1f} ms", flush=True)
    for b in range(n_check):
        want = curve.msm(points, [scal_ints[i][b] for i in range(n)])
        assert res[b] == want, f"lane {b}: {res[b]} != {want}"
    print(f"parity OK on {n_check} lanes", flush=True)


if __name__ == "__main__":
    main()
