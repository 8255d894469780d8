"""End-to-end Groth16: setup -> TPU prove -> pairing verify, small circuit.

Exercises the full proving pipeline (QAP witness map with NTTs, all five
MSMs, blinding assembly incl. the r = s = 0 deterministic edge) against the
host verifier, plus the partial/finish two-phase path
(reference semantics: partial_proof.rs:108-299).
"""

import random

import pytest

from zerokit_tpu.circuit.zkey import ConstraintMatrices
from zerokit_tpu.constants import NUM_LIMBS, R
from zerokit_tpu.ff.field import FrField, encode_canonical_fast
from zerokit_tpu.ff.fq2 import Fq2Adapter, FqAdapter
from zerokit_tpu.groth16.msm import MSM
from zerokit_tpu.groth16.prover import Groth16Prover
from zerokit_tpu.groth16.qap import WitnessMapper
from zerokit_tpu.groth16.setup import groth16_setup
from zerokit_tpu.groth16.verifier import prepare_verifying_key, verify_proof

# circuit: public x; witness w1, w2; constraints w1*w1 = w2, w2*w1 = x
MATRICES = ConstraintMatrices(
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


def _make_prover(zkey, make=MSM):
    """make=MSM exercises the device MSM pipeline (slow-marked tests: each
    EC program costs minutes of XLA:CPU compile); pass HostMSM for fast-tier
    tests of prover logic above the MSM backend."""
    prover = Groth16Prover.__new__(Groth16Prover)
    prover.zkey = zkey
    prover.graph = None
    prover.mesh = None
    prover.evaluator = None
    prover.num_inputs = 2
    prover.n_wires = 4
    prover.mapper = WitnessMapper(MATRICES)
    prover.msm_a = make(zkey.pk.a_query, FqAdapter)
    prover.msm_b1 = make(zkey.pk.b_g1_query, FqAdapter)
    prover.msm_b2 = make(zkey.pk.b_g2_query, Fq2Adapter)
    prover.msm_h = make(zkey.pk.h_query, FqAdapter)
    prover.msm_l = make(zkey.pk.l_query, FqAdapter)
    return prover


def _assignments(rng, batch):
    rows = []
    for _ in range(batch):
        w1 = rng.randrange(R)
        w2 = w1 * w1 % R
        x = w2 * w1 % R
        rows.append([1, x, w1, w2])
    flat = [rows[b][i] for i in range(4) for b in range(batch)]
    canon = encode_canonical_fast(flat).reshape(NUM_LIMBS, 4, batch)
    return rows, FrField.to_mont(canon)


@pytest.mark.slow
def test_prove_and_verify_small_circuit():
    rng = random.Random(11)
    zkey = groth16_setup(MATRICES, rng)
    prover = _make_prover(zkey)
    pvk = prepare_verifying_key(zkey.pk.vk)

    B = 2
    rows, assignment = _assignments(rng, B)
    rs = [rng.randrange(R) for _ in range(B)]
    ss = [rng.randrange(R) for _ in range(B)]
    proofs = prover.prove_batch_with_assignment(assignment, rs, ss)
    for b in range(B):
        assert verify_proof(pvk, proofs[b], [rows[b][1]])
        assert not verify_proof(pvk, proofs[b], [(rows[b][1] + 1) % R])

    # deterministic r = s = 0 (used by _with_rs parity flows)
    p0 = prover.prove_batch_with_assignment(assignment, [0] * B, [0] * B)
    assert verify_proof(pvk, p0[0], [rows[0][1]])


@pytest.mark.slow
def test_partial_then_finish_matches_full():
    rng = random.Random(12)
    zkey = groth16_setup(MATRICES, rng)
    prover = _make_prover(zkey)
    pvk = prepare_verifying_key(zkey.pk.vk)

    rows, assignment = _assignments(rng, 1)
    # partial: w1 known, x and w2 unknown (values excluding leading 1)
    partial_values = [None, rows[0][2], None]
    partial = prover.prove_partial(partial_values)
    assert partial.mask == [False, True, False]
    proof = prover.finish_proof(partial, assignment, r=rng.randrange(R), s=rng.randrange(R))
    assert verify_proof(pvk, proof, [rows[0][1]])

    # all-known partial + finish with nothing remaining still verifies
    partial2 = prover.prove_partial([rows[0][1], rows[0][2], rows[0][3]])
    proof2 = prover.finish_proof(partial2, assignment, r=5, s=7)
    assert verify_proof(pvk, proof2, [rows[0][1]])

    # deterministic: partial+finish equals full prove with the same r, s
    full = prover.prove_batch_with_assignment(assignment, [5], [7])[0]
    assert proof2 == full


def test_verify_batch_random_combination():
    """verify_batch (random-linear-combination multi-pairing, B+3 Miller
    loops + one final exp) accepts valid batches and pinpoints corruption.
    The reference has no batch verifier (proof.rs:856-894 is per-proof);
    this covers the new serving-path API."""
    from zerokit_tpu.groth16.verifier import verify_batch

    rng = random.Random(55)
    zkey = groth16_setup(MATRICES, rng)
    from zerokit_tpu.groth16.msm_host import HostMSM

    prover = _make_prover(zkey, make=HostMSM)
    rows, assignment = _assignments(rng, 4)
    rs = [rng.randrange(R) for _ in range(4)]
    ss = [rng.randrange(R) for _ in range(4)]
    proofs = prover.prove_batch_with_assignment(assignment, rs, ss)
    pubs = [[rows[b][1]] for b in range(4)]
    pvk = prepare_verifying_key(zkey.pk.vk)
    check_rng = random.Random(99)
    assert verify_batch(pvk, proofs, pubs, rng=check_rng)
    # single-element batch delegates to verify_proof
    assert verify_batch(pvk, proofs[:1], pubs[:1])
    # empty batch is vacuously true
    assert verify_batch(pvk, [], [])
    # a corrupted proof fails the whole batch
    from zerokit_tpu.hostmath import bn254

    bad = list(proofs)
    bad[1] = (bad[1][0], bad[1][1], bn254.G1.add(bad[1][2], bn254.G1_GENERATOR))
    assert not verify_batch(pvk, bad, pubs, rng=random.Random(7))
    # a corrupted public input fails too
    bad_pubs = [list(p) for p in pubs]
    bad_pubs[3][0] = (bad_pubs[3][0] + 1) % R
    assert not verify_batch(pvk, proofs, bad_pubs, rng=random.Random(8))
