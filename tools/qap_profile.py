"""Stage attribution for the QAP witness map on the attached device.

Times, at a given batch size (default 64), on the real depth-20 circuit:
  * one sparse matvec (A rows),
  * one coset lift (DIF -> pointwise -> DIT chain),
  * the full fused witness map,
so the witness-map cost can be attributed (VERDICT r4 weak #6: the QAP ran
~40x off its roofline share). Random Montgomery residues stand in for the
assignment — cost is value-independent.

Usage: python tools/qap_profile.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

T0 = time.time()


def log(msg):
    print(f"[qap +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _timeit(fn, *args, rounds=3):
    """Completion is forced by a device->host transfer of a scalar checksum —
    this backend's block_until_ready can return early (see msm_profile)."""
    import jax.numpy as jnp

    def run():
        return int(jnp.sum(fn(*args).astype(jnp.uint32)))

    run()
    best = float("inf")
    for _ in range(rounds):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import numpy as np

    from zerokit_tpu.circuit.zkey import zkey_from_bytes
    from zerokit_tpu.groth16 import ntt
    from zerokit_tpu.groth16.qap import WitnessMapper, sparse_matvec
    from zerokit_tpu.resources import load_resource

    log(f"devices: {jax.devices()}  batch={batch}")
    zk = zkey_from_bytes(load_resource("tree_depth_20/rln_final.arkzkey"))
    mapper = WitnessMapper(zk.matrices)
    n_wires = len(zk.pk.a_query)
    n = mapper.domain_size
    rnd = np.random.default_rng(5)

    def rand_limbs(rows):
        a = rnd.integers(0, 1 << 16, size=(16, rows, batch), dtype=np.uint64).astype(
            "uint32"
        )
        a[15] &= 0x0FFF
        return a

    assignment = jax.device_put(rand_limbs(n_wires))
    evals = jax.device_put(rand_limbs(n))
    jax.block_until_ready((assignment, evals))

    dt = _timeit(lambda x: sparse_matvec(mapper.a, x), assignment)
    log(f"matvec_a:    {dt * 1e3:8.2f} ms")
    dt = _timeit(lambda x: ntt.coset_lift(x, mapper.root_2n), evals)
    log(f"coset_lift:  {dt * 1e3:8.2f} ms  (x3 in the map)")
    dt = _timeit(lambda x: ntt.fft(x), evals)
    log(f"fft:         {dt * 1e3:8.2f} ms")
    dt = _timeit(mapper.witness_map, assignment)
    log(f"witness_map: {dt * 1e3:8.2f} ms  ({dt / batch * 1e3:.2f} ms/proof)")


if __name__ == "__main__":
    main()
