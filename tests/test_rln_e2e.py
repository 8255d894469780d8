"""End-to-end RLN proving on the REAL circuit (embedded zkey + graph).

This is the committed equivalent of the reference's rln/tests/proof.rs /
protocol.rs:182 flow: build a real Merkle tree, compute a witness for a real
identity, run the full device pipeline (witness eval -> QAP -> 5 MSMs ->
blinding), and verify the proof under the EMBEDDED verifying key.  Uses the
depth-10 artifacts so the CPU-mesh run stays bounded; the depth-20 pipeline is
exercised by bench.py on hardware.
"""

import pytest

import dataclasses

from zerokit_tpu import RLN, hash_to_field_le, poseidon_hash, poseidon_hash_pair
from zerokit_tpu.circuit import witness_host
from zerokit_tpu.constants import R
from zerokit_tpu.protocol.proof import proof_values_from_witness
from zerokit_tpu.protocol.witness import RLNWitnessInput
from zerokit_tpu.resources import load_resource
from zerokit_tpu.tree.merkle import OptimalMerkleTree


@pytest.fixture(scope="module")
def rln10():
    return RLN.stateless(
        zkey_bytes=load_resource("tree_depth_10/rln_final.arkzkey"),
        graph_bytes=load_resource("tree_depth_10/graph.bin"),
    )


def _witness(rln, index=0, limit=7, message_id=2):
    tree = OptimalMerkleTree(rln.tree_depth())
    secret = hash_to_field_le(b"real-circuit-secret-%d" % index)
    rate_commitment = poseidon_hash_pair(poseidon_hash([secret]), limit)
    tree.set(index, rate_commitment)
    proof = tree.proof(index)
    ext = poseidon_hash_pair(
        hash_to_field_le(b"epoch"), hash_to_field_le(b"rln-app")
    )
    w = RLNWitnessInput.new_single(
        secret,
        limit,
        message_id,
        proof.get_path_elements(),
        proof.get_path_index(),
        hash_to_field_le(b"the signal"),
        ext,
    )
    return w, tree.root()


@pytest.mark.slow
def test_real_circuit_prove_verify(rln10):
    """Full prove+verify on the embedded depth-10 circuit, deterministic r=s
    vector included (proof must be identical across runs when r, s fixed)."""
    w, root = _witness(rln10)
    values = proof_values_from_witness(w)
    assert values.root == root  # tree path in the witness reproduces the root

    proof, vals = rln10.generate_proof(w, r=123456789, s=987654321)
    assert rln10.verify(proof, vals)
    proof2, _ = rln10.generate_proof(w, r=123456789, s=987654321)
    assert proof == proof2  # deterministic for fixed blinding

    # verify_with_roots ordering (V3): root-set check before the pairing
    assert rln10.verify_with_roots(proof, vals, vals.x, [root])

    # a corrupted public value must NOT verify
    bad = dataclasses.replace(vals, root=(root + 1) % R)
    assert not rln10.verify(proof, bad)


@pytest.mark.slow
def test_real_circuit_external_witness(rln10):
    """The wasm/browser flow: witness computed OUTSIDE the engine (host
    interpreter standing in for the circom witness calculator), proved via
    generate_proof_with_witness (reference public.rs:643)."""
    w, _ = _witness(rln10, index=3)
    calculated = witness_host.calc_witness(w.named_inputs(), rln10.graph)
    proof, vals = rln10.generate_proof_with_witness(calculated, w, r=7, s=11)
    assert rln10.verify(proof, vals)
    # must equal the internally-evaluated proof for the same blinding
    proof_int, _ = rln10.generate_proof(w, r=7, s=11)
    assert proof == proof_int


@pytest.mark.slow
def test_real_circuit_slashing(rln10):
    """Two proofs with the same (secret, external nullifier, message_id)
    leak the identity secret (protocol.rs share-recovery semantics)."""
    tree = OptimalMerkleTree(rln10.tree_depth())
    secret = hash_to_field_le(b"double-signaler")
    limit = 5
    tree.set(0, poseidon_hash_pair(poseidon_hash([secret]), limit))
    mp = tree.proof(0)
    ext = poseidon_hash_pair(hash_to_field_le(b"ep"), hash_to_field_le(b"app"))
    ws = [
        RLNWitnessInput.new_single(
            secret, limit, 1, mp.get_path_elements(), mp.get_path_index(),
            hash_to_field_le(b"signal-%d" % i), ext,
        )
        for i in range(2)
    ]
    (p1, v1), (p2, v2) = rln10.generate_proofs(ws, rs=[1, 2], ss=[3, 4])
    assert rln10.verify(p1, v1) and rln10.verify(p2, v2)
    assert RLN.recover_id_secret(v1, v2) == secret


@pytest.fixture(scope="module")
def rln10_multi():
    return RLN.stateless(
        zkey_bytes=load_resource(
            "tree_depth_10/multi_message_id/max_out_4/rln_final.arkzkey"
        ),
        graph_bytes=load_resource(
            "tree_depth_10/multi_message_id/max_out_4/graph.bin"
        ),
    )


@pytest.mark.slow
def test_multi_message_id_prove_verify_slash(rln10_multi, rln10):
    """Groth16 end-to-end on the multi_message_id/max_out_4 circuit —
    prove, verify (multi public-input ordering through the real pairing
    check), tamper-reject, and Single x Multi cross-mode slashing.
    Reference: rln/tests/proof.rs single/multi matrix."""
    from zerokit_tpu.protocol.slashing import recover_secret

    assert rln10_multi.max_out() == 4
    tree = OptimalMerkleTree(rln10_multi.tree_depth())
    secret = hash_to_field_le(b"multi-e2e-secret")
    limit = 7
    tree.set(0, poseidon_hash_pair(poseidon_hash([secret]), limit))
    mp = tree.proof(0)
    ext = poseidon_hash_pair(
        hash_to_field_le(b"multi-epoch"), hash_to_field_le(b"multi-app")
    )
    x_multi = hash_to_field_le(b"multi signal")
    w_multi = RLNWitnessInput.new_multi(
        secret, limit, [2, 5, 0, 0], mp.get_path_elements(),
        mp.get_path_index(), x_multi, ext,
        selector_used=[True, True, False, False],
    )
    values = proof_values_from_witness(w_multi)
    assert values.root == tree.root()

    proof, vals = rln10_multi.generate_proof(w_multi, r=424242, s=171717)
    assert rln10_multi.verify(proof, vals)
    # deterministic for fixed blinding
    proof2, _ = rln10_multi.generate_proof(w_multi, r=424242, s=171717)
    assert proof == proof2
    # multi ordering: ys/nullifiers per active slot, inactive slots zeroed
    assert len(vals.ys) == 4 and len(vals.nullifiers) == 4
    assert vals.selector_used == [True, True, False, False]
    # a corrupted nullifier must not verify (public-input ordering is load
    # bearing: a mis-ordered verifier would accept)
    bad = dataclasses.replace(
        vals, nullifiers=[(vals.nullifiers[0] + 1) % R] + vals.nullifiers[1:]
    )
    assert not rln10_multi.verify(proof, bad)

    # Single x Multi slashing: same secret signs message_id=2 under the
    # SINGLE circuit with the same external nullifier -> shared nullifier
    # -> secret recovery across modes (reference proof.rs:1015-1143)
    w_single = RLNWitnessInput.new_single(
        secret, limit, 2, mp.get_path_elements(), mp.get_path_index(),
        hash_to_field_le(b"single signal"), ext,
    )
    p_s, v_s = rln10.generate_proof(w_single, r=5, s=6)
    assert rln10.verify(p_s, v_s)
    assert recover_secret(v_s, vals) == secret
    assert recover_secret(vals, v_s) == secret
