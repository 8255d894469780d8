"""Per-component benchmark suite (BASELINE.md measurement configs).

Mirrors the reference's criterion suites (rln/benches/, utils/benches/) with
the TPU-shaped configs from BASELINE.md: standalone MSM at 2^16..2^22 G1
points, the NTT pipeline at 2^20..2^22 (fft/ifft/coset), Poseidon hash
throughput, and the device-resident batched Merkle tree bulk insert.

Each config emits one JSON line:
    {"suite": "msm", "config": "g1_2e16_b4", "value": ..., "unit": "..."}
Results are appended to BENCHLOG.jsonl when --log is passed.

Usage:  python tools/bench_components.py [suite ...] [--log]
        suites: msm ntt poseidon tree   (default: all, smallest configs
        first so partial runs still produce numbers)
Env:    BC_MAX_LOG2 caps the largest MSM/NTT size (default 20 to bound
        device memory on a single chip; 22 on larger parts).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

T0 = time.time()
MAX_LOG2 = int(os.environ.get("BC_MAX_LOG2", "20"))


def log(msg):
    print(f"[components +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def emit(suite, config, value, unit, extra=None):
    line = {"suite": suite, "config": config, "value": round(value, 3), "unit": unit}
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)
    if "--log" in sys.argv:
        with open(os.path.join(os.path.dirname(__file__), "..", "BENCHLOG.jsonl"), "a") as f:
            f.write(json.dumps(line) + "\n")
    return line


def _timeit(fn, *args, rounds=3):
    fn(*args)  # warmup/compile
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def bench_msm():
    """Standalone G1 MSM throughput, random points/scalars, batch 4."""
    import numpy as np

    from zerokit_tpu.constants import R
    from zerokit_tpu.ff.field import encode_canonical_fast
    from zerokit_tpu.ff.fq2 import FqAdapter
    from zerokit_tpu.groth16.msm import MSM
    from zerokit_tpu.hostmath import bn254

    B = 4
    rnd = np.random.default_rng(7)
    for log2n in (16, 18, 20, 22):
        if log2n > MAX_LOG2:
            log(f"msm 2^{log2n} skipped (BC_MAX_LOG2={MAX_LOG2})")
            continue
        n = 1 << log2n
        # distinct pseudo-random affine points without n host scalar-muls:
        # repeat a block of 256 random multiples of G cyclically (MSM cost
        # is independent of point values).
        base = [
            bn254.G1.mul(bn254.G1_GENERATOR, int(rnd.integers(1, 1 << 62)))
            for _ in range(256)
        ]
        points = [base[i % 256] for i in range(n)]
        t0 = time.time()
        msm = MSM(points, FqAdapter)
        log(f"msm 2^{log2n}: tables/encode built in {time.time() - t0:.1f}s")
        # random canonical scalars: 16x16-bit limbs, top limb < 2^12 so the
        # value stays < 2^252 < R
        scal = rnd.integers(0, 1 << 16, size=(16, n, B), dtype=np.uint64).astype(
            "uint32"
        )
        scal[15] &= 0x0FFF
        dt = _timeit(lambda s: msm(s), scal)
        emit(
            "msm",
            f"g1_2e{log2n}_b{B}",
            n * B / dt,
            "points/s",
            {"sec_per_msm": round(dt / B, 4)},
        )


def bench_ntt():
    import numpy as np

    from zerokit_tpu.constants import R
    from zerokit_tpu.ff.field import FR
    from zerokit_tpu.groth16 import ntt

    B = 1
    rnd = np.random.default_rng(3)
    for log2n in (20, 21, 22):
        if log2n > MAX_LOG2:
            log(f"ntt 2^{log2n} skipped (BC_MAX_LOG2={MAX_LOG2})")
            continue
        n = 1 << log2n
        vals = [int(x) for x in rnd.integers(0, 1 << 62, size=min(n, 4096))]
        col = (vals * (n // len(vals) + 1))[:n]
        arr = np.asarray(FR.encode(col)).reshape(16, n, B)
        dt = _timeit(lambda a: ntt.fft(a), arr)
        emit("ntt", f"fft_2e{log2n}", n / dt, "elements/s", {"sec": round(dt, 4)})
        dt = _timeit(lambda a: ntt.ifft(a), arr)
        emit("ntt", f"ifft_2e{log2n}", n / dt, "elements/s", {"sec": round(dt, 4)})


def bench_poseidon():
    """Batched Poseidon hash throughput on device (the reference's
    utils/benches/poseidon_benchmark.rs measures host hashing; here the
    batched lax.scan permutation is the product path)."""
    import jax.numpy as jnp
    import numpy as np

    from zerokit_tpu.hash.poseidon import poseidon_hash_pair_mont

    rnd = np.random.default_rng(11)
    for n in (1 << 10, 1 << 16, 1 << 20):
        if n > (1 << MAX_LOG2):
            continue
        # random Montgomery-domain limb arrays (any residue is a valid input)
        left = rnd.integers(0, 1 << 16, size=(16, n), dtype=np.uint64).astype("uint32")
        right = rnd.integers(0, 1 << 16, size=(16, n), dtype=np.uint64).astype("uint32")
        left[15] &= 0x0FFF
        right[15] &= 0x0FFF
        la, ra = jnp.asarray(left), jnp.asarray(right)
        dt = _timeit(lambda l, r: poseidon_hash_pair_mont(l, r), la, ra)
        emit("poseidon", f"pairs_{n}", n / dt, "hashes/s", {"sec": round(dt, 4)})


def bench_tree():
    """Device-resident batched Merkle tree: bulk insert + root (BASELINE
    'Batched Poseidon Merkle tree' config, capped by BC_MAX_LOG2)."""
    import numpy as np

    from zerokit_tpu.tree.batched import DeviceMerkleTree

    depth = min(20, MAX_LOG2)
    n = 1 << depth
    rnd = np.random.default_rng(13)
    leaves = [int(x) for x in rnd.integers(1, 1 << 62, size=min(n, 4096))]
    leaves = (leaves * (n // len(leaves) + 1))[:n]

    def run():
        tree = DeviceMerkleTree(depth)
        tree.set_leaves(0, leaves)
        return tree.root()

    t0 = time.time()
    run()  # compile + run
    cold = time.time() - t0
    t0 = time.time()
    run()
    warm = time.time() - t0
    emit(
        "tree",
        f"bulk_insert_2e{depth}",
        n / warm,
        "leaves/s",
        {"warm_sec": round(warm, 3), "cold_sec": round(cold, 3)},
    )


SUITES = {
    "poseidon": bench_poseidon,
    "tree": bench_tree,
    "msm": bench_msm,
    "ntt": bench_ntt,
}


def main():
    chosen = [a for a in sys.argv[1:] if not a.startswith("-")] or list(SUITES)
    log(f"devices: {jax.devices()}  suites: {chosen}")
    for name in chosen:
        try:
            SUITES[name]()
        except Exception as e:  # keep later suites running
            log(f"suite {name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
