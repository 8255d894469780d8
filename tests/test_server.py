"""Prover service: micro-batching, wire formats, verify paths (stub prover)."""

import threading
import time

import pytest

from zerokit_tpu import RLNWitnessInput, hash_to_field_le
from zerokit_tpu.constants import R
from zerokit_tpu.hostmath import bn254
from zerokit_tpu.protocol.proof import proof_values_from_witness
from zerokit_tpu.protocol.serialize import bytes_to_rln_proof, rln_witness_to_bytes
from zerokit_tpu.server import ProverService


class StubRLN:
    """Duck-typed RLN: returns fixed curve points instead of proving."""

    def __init__(self):
        self.batches = []
        self.proof = (
            bn254.G1.mul(bn254.G1_GENERATOR, 7),
            bn254.G2.mul(bn254.G2_GENERATOR, 9),
            bn254.G1.mul(bn254.G1_GENERATOR, 11),
        )

    def max_out(self):
        return 1

    def tree_depth(self):
        return 20

    def generate_proofs(self, witnesses):
        self.batches.append(len(witnesses))
        return [(self.proof, proof_values_from_witness(w)) for w in witnesses]

    def verify(self, proof, values):
        return proof == self.proof

    def verify_with_roots(self, proof, values, x, roots):
        from zerokit_tpu import errors

        if roots and values.root not in roots:
            raise errors.InvalidRoot("root")
        if x % R != values.x:
            raise errors.InvalidSignal("x")
        return proof == self.proof


def _witness(i: int) -> RLNWitnessInput:
    return RLNWitnessInput.new_single(
        hash_to_field_le(b"s%d" % i), 100, 1,
        [0] * 20, [0] * 20, hash_to_field_le(b"x%d" % i), 12345,
    )


def test_prove_roundtrip_and_batching():
    stub = StubRLN()
    svc = ProverService(rln=stub, max_batch=8, max_wait_ms=80)
    try:
        results = {}

        def call(i):
            results[i] = svc.prove(rln_witness_to_bytes(_witness(i)))

        threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
            time.sleep(0.005)
        for t in threads:
            t.join(timeout=30)
        assert len(results) == 4
        # concurrent requests coalesced into fewer device batches
        assert len(stub.batches) < 4
        proof, _ = bytes_to_rln_proof(results[0])
        assert proof.proof == stub.proof
        assert svc.total_proofs == 4
    finally:
        svc.stop()


def test_verify_paths():
    stub = StubRLN()
    svc = ProverService(rln=stub, max_wait_ms=1)
    try:
        blob = svc.prove(rln_witness_to_bytes(_witness(0)))
        values = proof_values_from_witness(_witness(0))
        assert svc.verify(blob, None, [])
        assert svc.verify(blob, values.x, [values.root])
        from zerokit_tpu import errors

        with pytest.raises(errors.InvalidRoot):
            svc.verify(blob, values.x, [123456789])
        with pytest.raises(errors.InvalidSignal):
            svc.verify(blob, values.x + 1, [values.root])
    finally:
        svc.stop()
