"""Precompiles the full proving pipeline on the attached TPU.

The remote TPU compiler is slow on the big limb-arithmetic programs; all
compiles are cached persistently (jax compilation cache), so running this
once makes bench.py and production proving start fast. Compiles, in order:
field ops, Poseidon, witness-evaluator scan programs, QAP witness map, MSM
stage programs (G1 + G2) at bench shapes, and affine conversion.

Usage: python tools/warmup_tpu.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from zerokit_tpu.runtime.cache import enable_persistent_cache

# Must match bench.py exactly (fingerprint-keyed subdir) or the warmed
# entries land in a directory the bench never reads.
enable_persistent_cache()


def log(msg):
    print(f"[warmup +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.time()


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    log(f"devices: {jax.devices()}; batch={batch}")

    from zerokit_tpu import RLN, RLNWitnessInput, hash_to_field_le
    from zerokit_tpu.hash.poseidon import poseidon_hash, poseidon_hash_pair
    from zerokit_tpu.tree.merkle import OptimalMerkleTree

    rln = RLN.stateless()
    log("engine built")

    tree = OptimalMerkleTree(20)
    secrets = [hash_to_field_le(b"warm-%d" % i) for i in range(batch)]
    for i, s in enumerate(secrets):
        tree.set(i, poseidon_hash_pair(poseidon_hash([s]), 100))
    ext = hash_to_field_le(b"warm-ext")
    witnesses = []
    for i, s in enumerate(secrets):
        mp = tree.proof(i)
        witnesses.append(
            RLNWitnessInput.new_single(
                s, 100, 1, mp.get_path_elements(), mp.get_path_index(),
                hash_to_field_le(b"sig-%d" % i), ext,
            )
        )
    log("witnesses built")

    from zerokit_tpu.runtime.profiling import PipelineMetrics

    m1 = PipelineMetrics()
    t0 = time.time()
    results = rln.generate_proofs(witnesses, metrics=m1)
    log(f"first batched prove done in {time.time() - t0:.1f}s")
    log(f"first-run stages: {m1.dumps()}")

    m2 = PipelineMetrics()
    t0 = time.time()
    results = rln.generate_proofs(witnesses, metrics=m2)
    dt = time.time() - t0
    log(f"steady prove: {dt:.2f}s -> {batch / dt:.2f} proofs/s")
    log(f"steady stages: {m2.dumps()}")

    proof, values = results[0]
    assert rln.verify(proof, values)
    log("proof verified; warmup complete")


if __name__ == "__main__":
    main()
