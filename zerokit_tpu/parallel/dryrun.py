"""Multi-chip dry run: one batched proving step over an ("dp","tp") mesh.

Two tiers (the driver budget on a virtual CPU mesh is limited and XLA:CPU
compiles of the limb programs are slow on small hosts):

  * toy    — 2-constraint circuit through the REAL mesh prover
             (Groth16Prover(mesh=...) -> ShardedMSM tp-sharding + dp batch
             sharding + sharded QAP input), host-verified. Minutes even on
             a 2-core host; this is the guaranteed-completion tier.
  * depth10 — the real depth-10 RLN circuit through the same path (witness
             vectors from the host interpreter; QAP + all five MSMs sharded
             on device). Run in a budgeted subprocess by the entry point so
             a slow compile cannot blow the whole dry run.

Both tiers end with a full pairing verification of a produced proof — a
sharding bug anywhere in the pipeline makes the proof invalid, so verify is
the parity assertion.
"""

from __future__ import annotations

import os
import sys
import time


def _log(msg):
    print(f"[dryrun +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()


def _mesh(n_devices: int):
    import jax

    from .sharded import make_mesh

    devices = jax.devices()[:n_devices]
    tp = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    return make_mesh(tp=tp, dp=n_devices // tp, devices=devices)


def run_toy(n_devices: int) -> None:
    """Toy circuit (w1*w1 = w2, w2*w1 = x) through the mesh prover."""
    import random

    import jax
    import numpy as np

    from ..circuit.zkey import ConstraintMatrices
    from ..constants import NUM_LIMBS, R
    from ..ff.field import FrField, encode_canonical_fast
    from ..groth16.prover import Groth16Prover
    from ..groth16.qap import WitnessMapper
    from ..groth16.setup import groth16_setup
    from ..groth16.verifier import prepare_verifying_key, verify_proof
    from ..ff.fq2 import Fq2Adapter, FqAdapter
    from .sharded import ShardedMSM

    mesh = _mesh(n_devices)
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    _log(f"toy tier: mesh dp={dp} tp={tp}")

    matrices = ConstraintMatrices(
        num_instance_variables=2,
        num_witness_variables=2,
        num_constraints=2,
        a_num_non_zero=2,
        b_num_non_zero=2,
        c_num_non_zero=2,
        a=[[(1, 2)], [(1, 3)]],
        b=[[(1, 2)], [(1, 2)]],
        c=[[(1, 3)], [(1, 1)]],
    )
    rng = random.Random(5)
    zkey = groth16_setup(matrices, rng)

    prover = Groth16Prover.__new__(Groth16Prover)
    prover.zkey = zkey
    prover.graph = None
    prover.mesh = mesh
    prover.evaluator = None
    prover.num_inputs = 2
    prover.n_wires = 4
    prover.mapper = WitnessMapper(matrices)
    prover.msm_a = ShardedMSM(zkey.pk.a_query, FqAdapter, mesh)
    prover.msm_b1 = ShardedMSM(zkey.pk.b_g1_query, FqAdapter, mesh)
    prover.msm_b2 = ShardedMSM(zkey.pk.b_g2_query, Fq2Adapter, mesh)
    prover.msm_h = ShardedMSM(zkey.pk.h_query, FqAdapter, mesh)
    prover.msm_l = ShardedMSM(zkey.pk.l_query, FqAdapter, mesh)
    _log("toy tier: sharded prover built")

    B = prover._batch_target(dp)
    rows = []
    for _ in range(B):
        w1 = rng.randrange(R)
        w2 = w1 * w1 % R
        rows.append([1, w2 * w1 % R, w1, w2])
    flat = [rows[b][i] for i in range(4) for b in range(B)]
    canon = encode_canonical_fast(flat).reshape(NUM_LIMBS, 4, B)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assignment = FrField.to_mont(jnp.asarray(canon))
    with mesh:
        assignment = jax.device_put(
            assignment, NamedSharding(mesh, P(None, None, "dp"))
        )
        t0 = time.time()
        proofs = prover.prove_batch_with_assignment(
            assignment, list(range(1, B + 1)), list(range(7, 7 + B))
        )
        _log(f"toy tier: batch of {B} proved over mesh in {time.time() - t0:.1f}s")
    pvk = prepare_verifying_key(zkey.pk.vk)
    for b in (0, B - 1):
        assert verify_proof(pvk, proofs[b], [rows[b][1]]), f"toy proof {b} invalid"
    _log("toy tier: proofs verified under vk")


def run_depth10(n_devices: int) -> None:
    """Real depth-10 RLN circuit: host witness vectors, sharded QAP + MSMs."""
    from ..api import RLN
    from ..circuit import witness_host
    from ..constants import NUM_LIMBS
    from ..ff.field import FrField, encode_canonical_fast
    from ..protocol.proof import proof_values_from_witness
    from ..resources import load_resource

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh(n_devices)
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    _log(f"depth10 tier: mesh dp={dp} tp={tp}")

    from .. import hash_to_field_le, poseidon_hash, poseidon_hash_pair
    from ..protocol.witness import RLNWitnessInput
    from ..tree.merkle import OptimalMerkleTree

    rln = RLN.stateless(
        zkey_bytes=load_resource("tree_depth_10/rln_final.arkzkey"),
        graph_bytes=load_resource("tree_depth_10/graph.bin"),
        mesh=mesh,
    )
    _log("depth10 tier: sharded engine built")

    prover = rln.prover
    B = prover._batch_target(dp)
    tree = OptimalMerkleTree(10)
    witnesses = []
    ext = poseidon_hash_pair(hash_to_field_le(b"dry-epoch"), hash_to_field_le(b"dry-app"))
    secrets = [hash_to_field_le(b"dry-%d" % i) for i in range(B)]
    for i, s in enumerate(secrets):
        tree.set(i, poseidon_hash_pair(poseidon_hash([s]), 10))
    for i, s in enumerate(secrets):
        mp = tree.proof(i)
        witnesses.append(
            RLNWitnessInput.new_single(
                s, 10, 1, mp.get_path_elements(), mp.get_path_index(),
                hash_to_field_le(b"m%d" % i), ext,
            )
        )
    cols = [witness_host.calc_witness(w.named_inputs(), rln.graph) for w in witnesses]
    flat = [cols[b][i] for i in range(prover.n_wires) for b in range(B)]
    canon = encode_canonical_fast(flat).reshape(NUM_LIMBS, prover.n_wires, B)
    assignment = FrField.to_mont(jnp.asarray(canon))
    _log(f"depth10 tier: {B} host witness vectors ({prover.n_wires} wires)")

    with mesh:
        assignment = jax.device_put(
            assignment, NamedSharding(mesh, P(None, None, "dp"))
        )
        t0 = time.time()
        proofs = prover.prove_batch_with_assignment(
            assignment, list(range(1, B + 1)), list(range(11, 11 + B))
        )
        _log(f"depth10 tier: batch of {B} proved over mesh in {time.time() - t0:.1f}s")
    values = proof_values_from_witness(witnesses[0])
    assert rln.verify(proofs[0], values), "depth10 mesh proof invalid"
    _log("depth10 tier: proof verified under the embedded vk")


def main():
    # subprocess entry: pin the CPU platform before any backend initializes
    # (site hooks may pre-register an accelerator plugin that overrides the
    # JAX_PLATFORMS env var)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from ..runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tier = sys.argv[2] if len(sys.argv) > 2 else "depth10"
    (run_depth10 if tier == "depth10" else run_toy)(n)
    print(f"DRYRUN-{tier.upper()}-OK", flush=True)


if __name__ == "__main__":
    main()
