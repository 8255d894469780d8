"""Multi-chip dry run: batched proving over an ("dp","tp") mesh.

Three tiers, descending cost (the driver budget on a virtual CPU mesh is
limited and XLA:CPU compiles of the limb programs are slow on 2-core hosts):

  * depth10 — the real depth-10 RLN circuit through the full mesh prover
             (witness vectors from the host interpreter; QAP + all five MSMs
             sharded on device). Only attempted on hosts with enough cores to
             compile it inside the budget; run in a budgeted subprocess.
  * toy    — 2-constraint circuit. The QAP witness map runs on device with
             the proof batch sharded over "dp"; the A/B1/L MSMs run through
             the REAL tensor-parallel path (ShardedMSM: base points sharded
             over "tp", per-shard window tables, all_gather + EC tree-reduce
             combine, batch over "dp") with 4 windows of 4 bits — the toy
             witness values are < 2^16 so those cover them exactly, which
             shrinks the table build to three doublek calls and the bucket
             scan to 16 lanes (XLA:CPU executes the limb programs orders of
             magnitude slower than TPU, so the dry-run cost model is #EC-add
             lanes, not FLOPs). The G2 and h MSMs (full-range scalars) run on
             host. The assembled proofs verify under the vk — a sharding bug
             anywhere makes them invalid, so verify is the parity assertion.
  * pico   — guaranteed-completion floor: one dp-sharded Montgomery multiply
             program and one tp-sharded partial-dot + all_gather, checked
             against host big-int math. Compiles in seconds on any host.

Every tier prints DRYRUN-<TIER>-OK on success.
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


def run_pico(n_devices: int) -> None:
    """Floor tier: dp-sharded field multiply + tp-sharded dot, host-checked."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..constants import NUM_LIMBS, R
    from ..ff.field import FrField, decode_canonical_fast, encode_canonical_fast

    mesh = _mesh(n_devices)
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    _log(f"pico tier: mesh dp={dp} tp={tp}")

    rng = random.Random(11)
    B = 4 * dp
    n = 8 * tp
    a_ints = [rng.randrange(R) for _ in range(B)]
    b_ints = [rng.randrange(R) for _ in range(B)]
    a = FrField.to_mont(jnp.asarray(encode_canonical_fast(a_ints).reshape(NUM_LIMBS, B)))
    b = FrField.to_mont(jnp.asarray(encode_canonical_fast(b_ints).reshape(NUM_LIMBS, B)))
    with mesh:
        # dp-sharded batched Montgomery multiply
        a = jax.device_put(a, NamedSharding(mesh, P(None, "dp")))
        b = jax.device_put(b, NamedSharding(mesh, P(None, "dp")))
        prod = jax.jit(FrField.mul)(a, b)
        got = decode_canonical_fast(np.asarray(FrField.from_mont(prod)))
        for i in range(B):
            assert got[i] == a_ints[i] * b_ints[i] % R, f"pico dp mul lane {i}"
        _log("pico tier: dp-sharded Montgomery multiply checked")

        # tp-sharded partial products + all_gather (the MSM communication
        # pattern, over Fr instead of curve points)
        v_ints = [rng.randrange(R) for _ in range(n)]
        s_ints = [rng.randrange(R) for _ in range(n)]
        v = FrField.to_mont(jnp.asarray(encode_canonical_fast(v_ints).reshape(NUM_LIMBS, n)))
        s = FrField.to_mont(jnp.asarray(encode_canonical_fast(s_ints).reshape(NUM_LIMBS, n)))

        def local(v_sh, s_sh):
            prod = FrField.mul(v_sh, s_sh)  # (16, n/tp)
            return jax.lax.all_gather(prod, "tp")  # (tp, 16, n/tp)

        fn = jax.jit(
            shard_map(
                local,
                mesh=mesh,
                in_specs=(P(None, "tp"), P(None, "tp")),
                out_specs=P(),
                check_rep=False,
            )
        )
        parts = np.asarray(fn(v, s))  # (tp, 16, n/tp) Montgomery partials
        total = 0
        for t in range(tp):
            dec = decode_canonical_fast(
                np.asarray(FrField.from_mont(jnp.asarray(parts[t])))
            )
            total = (total + sum(dec)) % R
        want = sum(vi * si for vi, si in zip(v_ints, s_ints)) % R
        assert total == want, "pico tp dot mismatch"
        _log("pico tier: tp-sharded dot + all_gather checked")


def run_toy(n_devices: int) -> None:
    """Toy circuit (w1*w1 = w2, w2*w1 = x): dp-sharded QAP + tp-sharded MSMs."""
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..circuit.zkey import ConstraintMatrices
    from ..constants import NUM_LIMBS, R
    from ..ff.field import FrField, encode_canonical_fast
    from ..ff.fq2 import FqAdapter
    from ..groth16.qap import WitnessMapper
    from ..groth16.setup import groth16_setup
    from ..groth16.verifier import prepare_verifying_key, verify_proof
    from ..hostmath import bn254
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
    pk = zkey.pk
    mapper = WitnessMapper(matrices)
    _log("toy tier: setup done")

    # Witness values stay < 2^16 INDEPENDENT of dp (w1 <= 18 -> w1^3 < 2^16)
    # so the device MSM scalars always fit the 4x4-bit window config; a
    # dp-dependent bound silently truncated digits on large virtual meshes.
    B = 2 * dp
    rows = []
    for i in range(B):
        w1 = 3 + (i % 16)
        w2 = w1 * w1
        rows.append([1, w2 * w1, w1, w2])
    assert max(r[1] for r in rows) < (1 << 16), "toy witness exceeds window range"
    flat = [rows[b][i] for i in range(4) for b in range(B)]
    canon = encode_canonical_fast(flat).reshape(NUM_LIMBS, 4, B)
    assignment = FrField.to_mont(jnp.asarray(canon))

    with mesh:
        # dp: the proof batch axis shards for the QAP witness map
        assignment = jax.device_put(
            assignment, NamedSharding(mesh, P(None, None, "dp"))
        )
        h = mapper.witness_map(assignment)
        h_canon = np.asarray(FrField.from_mont(h))
        _log("toy tier: dp-sharded QAP witness map done")

        # tp: the A/B1/L MSMs through the real tensor-parallel path
        msm_a = ShardedMSM(pk.a_query, FqAdapter, mesh, n_windows=4, c_bits=4)
        msm_b1 = ShardedMSM(pk.b_g1_query, FqAdapter, mesh, n_windows=4, c_bits=4)
        msm_l = ShardedMSM(pk.l_query, FqAdapter, mesh, n_windows=4, c_bits=4)
        z_canon = jnp.asarray(canon)
        a_pts = msm_a.to_affine_ints(msm_a(z_canon))
        _log("toy tier: tp-sharded MSM A done")
        b1_pts = msm_b1.to_affine_ints(msm_b1(z_canon))
        l_pts = msm_l.to_affine_ints(msm_l(z_canon[:, 2:]))
        _log("toy tier: tp-sharded MSMs B1/L done")

    # cross-check one device MSM against host big-int math
    want_a0 = bn254.G1.msm(pk.a_query, rows[0])
    assert a_pts[0] == want_a0, "tp-sharded MSM A lane 0 != host MSM"

    # G2 and h MSMs carry full-range scalars: host math (4 points each)
    from ..ff.field import decode_canonical_fast

    h_host = [decode_canonical_fast(h_canon[:, :, b]) for b in range(B)]
    proofs = []
    for b in range(B):
        r, s = (7 + b) % R, (11 + b) % R
        z = rows[b]
        b2 = bn254.G2.msm(pk.b_g2_query, z)
        hp = bn254.G1.msm(pk.h_query, h_host[b])
        g_a = bn254.G1.add(pk.vk.alpha_g1, a_pts[b])
        g_a = bn254.G1.add(g_a, bn254.G1.mul(pk.delta_g1, r))
        g1_b = bn254.G1.add(pk.beta_g1, b1_pts[b])
        g1_b = bn254.G1.add(g1_b, bn254.G1.mul(pk.delta_g1, s))
        g2_b = bn254.G2.add(pk.vk.beta_g2, b2)
        g2_b = bn254.G2.add(g2_b, bn254.G2.mul(pk.vk.delta_g2, s))
        g_c = bn254.G1.add(bn254.G1.mul(g_a, s), bn254.G1.mul(g1_b, r))
        g_c = bn254.G1.add(g_c, bn254.G1.neg(bn254.G1.mul(pk.delta_g1, r * s % R)))
        g_c = bn254.G1.add(g_c, l_pts[b])
        g_c = bn254.G1.add(g_c, hp)
        proofs.append((g_a, g2_b, g_c))
    _log(f"toy tier: {B} proofs assembled from mesh MSM/QAP outputs")

    pvk = prepare_verifying_key(pk.vk)
    for b in (0, B - 1):
        assert verify_proof(pvk, proofs[b], [rows[b][1]]), f"toy proof {b} invalid"
    _log("toy tier: proofs verified under vk")


def run_depth10_lite(n_devices: int) -> None:
    """Real depth-10 circuit with the DISTRIBUTED pieces on device — the
    proof batch dp-sharded into the tp-sharded Bailey-NTT witness map
    (parallel/ntt_sharded.py at the real 2^12 domain) — and the five MSMs on
    the native host backend (groth16/msm_host.py). Rationale: the sharded
    QAP is SURVEY §2d's sequence-parallel analog and has never run at real
    circuit scale inside a driver budget, while compiling the eager sharded
    EC programs costs minutes each under XLA:CPU; the tp-sharded MSM path is
    validated by the toy tier here and at full scale by bench/tools on real
    hardware. Proofs verify under the real embedded vk."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .. import hash_to_field_le, poseidon_hash, poseidon_hash_pair
    from ..circuit import witness_host
    from ..circuit.graph import graph_from_bytes
    from ..circuit.zkey import zkey_from_bytes
    from ..constants import NUM_LIMBS
    from ..ff.field import FrField, encode_canonical_fast
    from ..ff.fq2 import Fq2Adapter, FqAdapter
    from ..groth16.msm_host import HostMSM
    from ..groth16.prover import Groth16Prover
    from ..groth16.qap import WitnessMapper
    from ..groth16.verifier import prepare_verifying_key, rln_public_inputs, verify_proof
    from ..protocol.proof import proof_values_from_witness
    from ..protocol.witness import RLNWitnessInput
    from ..resources import load_resource
    from ..tree.merkle import OptimalMerkleTree

    mesh = _mesh(n_devices)
    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    _log(f"depth10-lite tier: mesh dp={dp} tp={tp}")

    zkey = zkey_from_bytes(load_resource("tree_depth_10/rln_final.arkzkey"))
    graph = graph_from_bytes(load_resource("tree_depth_10/graph.bin"), 10, None)
    prover = Groth16Prover.__new__(Groth16Prover)
    prover.zkey = zkey
    prover.graph = graph
    prover.mesh = mesh
    prover.evaluator = None  # host witness vectors; QAP is the device piece
    prover.num_inputs = zkey.matrices.num_instance_variables
    prover.n_wires = len(zkey.pk.a_query)
    prover.mapper = WitnessMapper(zkey.matrices, mesh=mesh)
    assert prover.mapper.mesh is not None, "domain must shard over tp"
    pk = zkey.pk
    prover.msm_a = HostMSM(pk.a_query, FqAdapter)
    prover.msm_b1 = HostMSM(pk.b_g1_query, FqAdapter)
    prover.msm_b2 = HostMSM(pk.b_g2_query, Fq2Adapter)
    prover.msm_h = HostMSM(pk.h_query, FqAdapter)
    prover.msm_l = HostMSM(pk.l_query, FqAdapter)
    _log("depth10-lite tier: engine built (sharded QAP + native-host MSMs)")

    B = prover._batch_target(dp)
    tree = OptimalMerkleTree(10)
    ext = poseidon_hash_pair(hash_to_field_le(b"lite-epoch"), hash_to_field_le(b"lite-app"))
    secrets = [hash_to_field_le(b"lite-%d" % i) for i in range(B)]
    for i, s in enumerate(secrets):
        tree.set(i, poseidon_hash_pair(poseidon_hash([s]), 10))
    witnesses = []
    for i, s in enumerate(secrets):
        mp = tree.proof(i)
        witnesses.append(
            RLNWitnessInput.new_single(
                s, 10, 1, mp.get_path_elements(), mp.get_path_index(),
                hash_to_field_le(b"m%d" % i), ext,
            )
        )
    cols = [witness_host.calc_witness(w.named_inputs(), graph) for w in witnesses]
    flat = [cols[b][i] for i in range(prover.n_wires) for b in range(B)]
    canon = encode_canonical_fast(flat).reshape(NUM_LIMBS, prover.n_wires, B)
    assignment = FrField.to_mont(jnp.asarray(canon))
    _log(f"depth10-lite tier: {B} host witness vectors ({prover.n_wires} wires)")

    with mesh:
        assignment = jax.device_put(
            assignment, NamedSharding(mesh, P(None, None, "dp"))
        )
        t0 = time.time()
        proofs = prover.prove_batch_with_assignment(
            assignment, list(range(1, B + 1)), list(range(11, 11 + B))
        )
        _log(
            f"depth10-lite tier: {B} proofs (dp-sharded batch, tp-sharded "
            f"Bailey-NTT QAP) in {time.time() - t0:.1f}s"
        )
    pvk = prepare_verifying_key(pk.vk)
    for b in (0, B - 1):
        values = proof_values_from_witness(witnesses[b])
        assert verify_proof(pvk, proofs[b], rln_public_inputs(values)), (
            f"depth10-lite proof {b} invalid"
        )
    _log("depth10-lite tier: proofs verified under the embedded vk")


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

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        # u64 limb path (ff/field.py): much cheaper XLA:CPU compiles
        jax.config.update("jax_enable_x64", True)
    from ..runtime.cache import enable_persistent_cache

    enable_persistent_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tier = sys.argv[2] if len(sys.argv) > 2 else "toy"
    {
        "depth10": run_depth10,
        "depth10-lite": run_depth10_lite,
        "toy": run_toy,
        "pico": run_pico,
    }[tier](n)
    print(f"DRYRUN-{tier.upper()}-OK", flush=True)


if __name__ == "__main__":
    main()
