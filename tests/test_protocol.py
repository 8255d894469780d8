"""Protocol layer: keygen vectors, proof values, slashing, wire formats.

Golden vectors from rln/tests/protocol.rs (seeded keygen :461-507, depth-20
root :39-47) and behavior parity for validation errors and serialization
roundtrips (witness.rs, proof.rs, serialize.rs semantics).
"""

import random

import pytest

from zerokit_tpu import errors
from zerokit_tpu.constants import R
from zerokit_tpu.protocol import serialize as ser
from zerokit_tpu.protocol.keygen import (
    extended_keygen,
    extended_seeded_keygen,
    hash_to_field_be,
    hash_to_field_le,
    keygen,
    seeded_keygen,
)
from zerokit_tpu.hash.poseidon import poseidon_hash, poseidon_hash_pair
from zerokit_tpu.protocol.proof import RLNProofValues, proof_values_from_witness
from zerokit_tpu.protocol.slashing import compute_id_secret, recover_id_secret, recover_secret
from zerokit_tpu.protocol.witness import (
    RLNPartialWitnessInput,
    RLNWitnessInput,
    compute_tree_root,
)
from zerokit_tpu.tree.merkle import OptimalMerkleTree


def _test_witness(multi=False):
    rnd = random.Random(77)
    secret = hash_to_field_le(b"test-secret")
    limit = 100
    tree = OptimalMerkleTree(20)
    rate = poseidon_hash_pair(poseidon_hash([secret]), limit)
    tree.set(3, rate)
    proof = tree.proof(3)
    x = hash_to_field_le(b"hey hey")
    ext = poseidon_hash_pair(hash_to_field_le(b"test-epoch"), hash_to_field_le(b"test-rln-identifier"))
    if multi:
        return RLNWitnessInput.new_multi(
            secret, limit, [1, 2, 0, 0], proof.get_path_elements(),
            proof.get_path_index(), x, ext, [True, True, False, False],
        ), tree.root()
    return RLNWitnessInput.new_single(
        secret, limit, 1, proof.get_path_elements(), proof.get_path_index(), x, ext
    ), tree.root()


def test_seeded_keygen_golden():
    secret, commitment = seeded_keygen(b"A seed phrase example")
    assert secret == 0x20DF38F3F00496F19FE7C6535492543B21798ED7CB91AEBE4AF8012DB884EDA3
    assert commitment == 0x1223A78A5D66043A7F9863E14507DC80720A5602B2A894923E5B5147D5A9C325
    secret2, commitment2 = seeded_keygen(bytes(range(10)))
    assert secret2 == 0x766CE6C7E7A01BDF5B3F257616F603918C30946FA23480F2859C597817E6716
    assert commitment2 == 0xBF16D2B5C0D6F9D9D561E05BFCA16A81B4B873BB063508FAE360D8C74CEF51F
    assert seeded_keygen(b"A seed phrase example") == (secret, commitment)


def test_keygen_relations():
    secret, commitment = keygen()
    assert commitment == poseidon_hash([secret])
    t, n, s, c = extended_keygen()
    assert s == poseidon_hash_pair(t, n)
    assert c == poseidon_hash([s])
    first = extended_seeded_keygen(b"test-seed-extended")
    assert first == extended_seeded_keygen(b"test-seed-extended")
    t, n, s, c = first
    assert s == poseidon_hash_pair(t, n)
    assert c == poseidon_hash([s])


def test_hash_to_field():
    a = hash_to_field_le(b"abc")
    b = hash_to_field_be(b"abc")
    assert 0 <= a < R and 0 <= b < R
    # LE and BE read the same keccak digest in opposite byte orders; the
    # reference's BE variant reverses then reads BE == reads LE again
    assert a == b


def test_witness_validation_errors():
    w, _ = _test_witness()
    with pytest.raises(errors.ZeroUserMessageLimit):
        RLNWitnessInput.new_single(1, 0, 0, w.path_elements, w.identity_path_index, 1, 1)
    with pytest.raises(errors.InvalidMessageId):
        RLNWitnessInput.new_single(1, 10, 10, w.path_elements, w.identity_path_index, 1, 1)
    with pytest.raises(errors.InvalidMerkleProofLength):
        RLNWitnessInput.new_single(1, 10, 1, [1, 2], [0], 1, 1)
    with pytest.raises(errors.EmptyMessageIds):
        RLNWitnessInput.new_multi(1, 10, [], w.path_elements, w.identity_path_index, 1, 1, [])
    with pytest.raises(errors.NoActiveSelectorUsed):
        RLNWitnessInput.new_multi(
            1, 10, [1], w.path_elements, w.identity_path_index, 1, 1, [False]
        )
    with pytest.raises(errors.DuplicateMessageIds):
        RLNWitnessInput.new_multi(
            1, 10, [1, 1], w.path_elements, w.identity_path_index, 1, 1, [True, True]
        )


def test_proof_values_root_matches_tree():
    for multi in (False, True):
        w, root = _test_witness(multi)
        values = proof_values_from_witness(w)
        assert values.root == root
        assert values.x == w.x
        if multi:
            assert values.nullifiers[2] == 0 and values.ys[2] == 0  # inactive slots


def test_proof_values_shamir_share():
    w, _ = _test_witness()
    values = proof_values_from_witness(w)
    a1 = poseidon_hash([w.identity_secret, w.external_nullifier, w.message_id])
    assert values.y == (w.identity_secret + w.x * a1) % R
    assert values.nullifier == poseidon_hash([a1])


def test_slashing_recovers_secret():
    w1, _ = _test_witness()
    v1 = proof_values_from_witness(w1)
    # same identity, different signal
    w2 = RLNWitnessInput.new_single(
        w1.identity_secret, w1.user_message_limit, w1.message_id,
        w1.path_elements, w1.identity_path_index,
        hash_to_field_le(b"another signal"), w1.external_nullifier,
    )
    v2 = proof_values_from_witness(w2)
    assert recover_id_secret(v1, v2) == w1.identity_secret
    assert recover_secret(v1, v2) == w1.identity_secret
    # cross mode: multi sharing slot 0 nullifier
    wm, _ = _test_witness(multi=True)
    wm2 = RLNWitnessInput.new_multi(
        wm.identity_secret, wm.user_message_limit, wm.message_ids,
        wm.path_elements, wm.identity_path_index,
        hash_to_field_le(b"zzz"), wm.external_nullifier, wm.selector_used,
    )
    vm1 = proof_values_from_witness(wm)
    vm2 = proof_values_from_witness(wm2)
    assert recover_id_secret(vm1, vm2) == wm.identity_secret
    # mismatched external nullifier
    w3 = RLNWitnessInput.new_single(
        w1.identity_secret, w1.user_message_limit, w1.message_id,
        w1.path_elements, w1.identity_path_index, w1.x, 999,
    )
    v3 = proof_values_from_witness(w3)
    with pytest.raises(errors.ExternalNullifierMismatch):
        recover_id_secret(v1, v3)
    # same x -> division by zero
    with pytest.raises(errors.DivisionByZero):
        compute_id_secret((5, 7), (5, 9))


@pytest.mark.parametrize("be", [False, True], ids=["le", "be"])
@pytest.mark.parametrize("multi", [False, True], ids=["single", "multi"])
def test_witness_serde_roundtrip(be, multi):
    w, _ = _test_witness(multi)
    data = ser.rln_witness_to_bytes(w, be)
    assert data[0] == (0x01 if multi else 0x00)
    back, read = ser.bytes_to_rln_witness(data, be)
    assert read == len(data)
    assert back == w
    # trailing bytes rejected
    with pytest.raises(errors.InvalidReadLen):
        ser.bytes_to_rln_witness(data + b"\x00", be)
    # unknown version byte
    with pytest.raises(errors.UnknownVersionByte):
        ser.bytes_to_rln_witness(b"\x07" + data[1:], be)


@pytest.mark.parametrize("be", [False, True], ids=["le", "be"])
def test_partial_witness_serde_roundtrip(be):
    w, _ = _test_witness()
    pw = RLNPartialWitnessInput.from_witness(w)
    data = ser.rln_partial_witness_to_bytes(pw, be)
    back, read = ser.bytes_to_rln_partial_witness(data, be)
    assert read == len(data)
    assert back == pw


@pytest.mark.parametrize("be", [False, True], ids=["le", "be"])
@pytest.mark.parametrize("multi", [False, True], ids=["single", "multi"])
def test_proof_values_serde_roundtrip(be, multi):
    w, _ = _test_witness(multi)
    v = proof_values_from_witness(w)
    data = ser.rln_proof_values_to_bytes(v, be)
    back, read = ser.bytes_to_rln_proof_values(data, be)
    assert read == len(data)
    assert back == v
    # v3 codec roundtrip
    d3 = ser.proof_values_v3_to_bytes(v, be)
    assert ser.bytes_to_proof_values_v3(d3, be) == v


def test_non_canonical_fr_rejected():
    data = ser._len_prefix(1, False) + (R).to_bytes(32, "little")
    with pytest.raises(errors.NonCanonicalFieldElement):
        ser.bytes_to_vec_fr(data, False)


def test_compute_tree_root_matches_reference_vector():
    secret = hash_to_field_le(b"test-merkle-proof")
    tree = OptimalMerkleTree(20)
    rate = poseidon_hash_pair(poseidon_hash([secret]), 100)
    tree.set(3, rate)
    proof = tree.proof(3)
    root = compute_tree_root(secret, 100, proof.get_path_elements(), proof.get_path_index())
    assert root == tree.root()


def test_id_secret_zeroizing_wrapper():
    """IdSecret semantics per reference utils.rs:440-545."""
    from zerokit_tpu.protocol.identity import IdSecret

    s = IdSecret(12345)
    assert int(s) == 12345
    assert s == 12345
    assert s % R == 12345
    assert s.to_bytes_le() == (12345).to_bytes(32, "little")
    assert s.to_bytes_be() == (12345).to_bytes(32, "big")
    assert IdSecret.from_bytes_le(s.to_bytes_le()) == s
    assert "12345" not in repr(s)  # never prints the secret
    s.zeroize()
    assert int(s) == 0

    sk, pk = keygen()
    assert isinstance(sk, IdSecret)
    assert poseidon_hash([int(sk)]) == pk


def test_witness_pipeline_zeroizes_secret_buffers():
    """Secret hygiene parity (reference iden3calc.rs:44-57): the host witness
    interpreter scrubs its input buffer, the device path scrubs the numpy
    input buffer after upload, and IdSecret is accepted end-to-end."""
    import numpy as np

    from zerokit_tpu import RLNWitnessInput, hash_to_field_le, poseidon_hash, poseidon_hash_pair
    from zerokit_tpu.circuit import witness_host
    from zerokit_tpu.circuit.graph import graph_from_bytes
    from zerokit_tpu.protocol.identity import IdSecret
    from zerokit_tpu.resources import load_resource
    from zerokit_tpu.tree.merkle import OptimalMerkleTree

    graph = graph_from_bytes(load_resource("tree_depth_10/graph.bin"), 10, None)
    secret = IdSecret(hash_to_field_le(b"zeroize-secret"))
    tree = OptimalMerkleTree(10)
    tree.set(0, poseidon_hash_pair(poseidon_hash([secret.to_int()]), 5))
    mp = tree.proof(0)
    w = RLNWitnessInput.new_single(
        secret,  # IdSecret accepted directly
        5, 1, mp.get_path_elements(), mp.get_path_index(),
        hash_to_field_le(b"x"), hash_to_field_le(b"e"),
    )
    assert w.identity_secret == secret.to_int()

    # host interpreter scrubs the populated input buffer
    captured = {}
    orig_populate = witness_host._populate

    def capture_populate(inputs, mapping, buffer):
        orig_populate(inputs, mapping, buffer)
        captured["buf"] = buffer

    witness_host._populate = capture_populate
    try:
        witness_host.calc_witness(w.named_inputs(), graph)
    finally:
        witness_host._populate = orig_populate
    assert all(v == 0 for v in captured["buf"]), "host input buffer not scrubbed"

    # device path scrubs the numpy canonical buffer after upload
    from zerokit_tpu.circuit.witness_eval import WitnessEvaluator
    from zerokit_tpu.circuit.zkey import zkey_from_bytes
    from zerokit_tpu.groth16.prover import Groth16Prover

    zkey = zkey_from_bytes(load_resource("tree_depth_10/rln_final.arkzkey"))
    prover = Groth16Prover(zkey, graph)
    if prover.evaluator is None:
        return
    bufs = []
    orig_build = prover.evaluator.build_input_buffer

    def capture_build(named, batch):
        buf = orig_build(named, batch)
        bufs.append(buf)
        return buf

    prover.evaluator.build_input_buffer = capture_build
    named = {k: [[v] for v in vals] for k, vals in w.named_inputs().items()}
    prover.full_assignments(named, 1)
    assert bufs and all(np.all(b == 0) for b in bufs), "device input buffer not scrubbed"

    # best-effort witness scrub + IdSecret zeroize
    w.zeroize()
    assert w.identity_secret == 0
    secret.zeroize()
    assert secret.to_int() == 0
