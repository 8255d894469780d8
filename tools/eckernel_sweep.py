"""Sweep Pallas EC-kernel block widths (LANE_W) on the real chip.

The fused MSM's dominant stage is the fine prefix scan — a lax.scan of
mixed-add kernel calls over ~131K lanes (msm_profile.py attribution). The
kernel runs well below the VPU ALU bound because one field element at
LANE_W=512 is 64 vregs, so every temporary spills. This sweep measures the
standalone add/add_mixed/double kernels at several widths to pick the best
per-kernel width empirically.

Usage: python tools/eckernel_sweep.py [n_lanes] [widths_csv]
"""

import sys
import time

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

from zerokit_tpu.constants import NUM_LIMBS
from zerokit_tpu.ff import pallas_field as pf
from zerokit_tpu.hostmath import bn254


def encode_pt_array(n, proj=True):
    from zerokit_tpu.ff.fq2 import FqAdapter

    pts = []
    g = bn254.G1_GENERATOR
    p = g
    for _ in range(64):
        pts.append(p)
        p = bn254.G1.add(p, g)
    coords = []
    for i in range(n):
        x, y = pts[i % 64]
        if proj:
            coords.extend([x, y, 1])
        else:
            coords.extend([x, y])
    k = 3 if proj else 2
    enc = np.asarray(FqAdapter.encode(coords), dtype=np.uint32).reshape(
        NUM_LIMBS, 1, n, k
    )
    return np.moveaxis(enc, 3, 2)  # (16, 1, k, n)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    widths = (
        [int(w) for w in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [128, 256, 512, 1024]
    )
    p = jax.device_put(encode_pt_array(n, proj=True))
    q = jax.device_put(encode_pt_array(n, proj=True))
    qa = jax.device_put(encode_pt_array(n, proj=False))
    for op, b in (("add_mixed", qa), ("add", q), ("double", None)):
        for w in widths:
            pf._LANE_W_BY_KERNEL[f"g1_{op}"] = w
            pf._run_elem_kernel.clear_cache()
            try:
                t0 = time.time()
                out = pf.ec_op(op, 1, p, b)
                np.asarray(out)
                compile_s = time.time() - t0
                times = []
                for _ in range(5):
                    t0 = time.time()
                    out = pf.ec_op(op, 1, p, b)
                    np.asarray(out[:1, :1, :1, :8])
                    times.append(time.time() - t0)
                best = min(times)
                print(
                    f"g1_{op:10s} W={w:5d}: {best*1e3:8.2f} ms "
                    f"({n/best/1e6:7.1f} M ops/s, compile {compile_s:.1f}s)",
                    flush=True,
                )
            except Exception as e:
                print(f"g1_{op:10s} W={w:5d}: FAILED {type(e).__name__}: {e}", flush=True)
        pf._LANE_W_BY_KERNEL.pop(f"g1_{op}", None)
        pf._run_elem_kernel.clear_cache()


if __name__ == "__main__":
    main()
