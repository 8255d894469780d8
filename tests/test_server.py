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


# ---------------------------------------------------------------------------
# HTTP-level coverage: real socket, routing, content handling, error mapping
# (server.py make_handler / ThreadingHTTPServer surface).
# ---------------------------------------------------------------------------

import http.client
import json

from http.server import ThreadingHTTPServer

from zerokit_tpu.server import make_handler


@pytest.fixture()
def http_service():
    stub = StubRLN()
    svc = ProverService(rln=stub, max_batch=8, max_wait_ms=20)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield stub, svc, server.server_address[1]
    finally:
        server.shutdown()
        server.server_close()
        svc.stop()


def _request(port, method, path, payload=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    body = json.dumps(payload).encode() if payload is not None else None
    headers = {"Content-Type": "application/json"} if body else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = json.loads(resp.read() or b"{}")
    conn.close()
    return resp.status, data


def test_http_healthz_and_routing(http_service):
    _, _, port = http_service
    status, data = _request(port, "GET", "/healthz")
    assert status == 200
    assert data["status"] == "ok" and data["tree_depth"] == 20
    status, _ = _request(port, "GET", "/nope")
    assert status == 404
    status, _ = _request(port, "POST", "/nope", {})
    assert status == 404


def test_http_prove_verify_roundtrip(http_service):
    stub, svc, port = http_service
    wbytes = rln_witness_to_bytes(_witness(1))
    status, data = _request(port, "POST", "/prove", {"witness_hex": wbytes.hex()})
    assert status == 200, data
    proof_hex = data["proof_hex"]
    proof, _ = bytes_to_rln_proof(bytes.fromhex(proof_hex))
    assert proof.proof == stub.proof

    # stateless verify
    status, data = _request(port, "POST", "/verify", {"proof_hex": proof_hex})
    assert status == 200 and data["valid"] is True

    # verify_with_roots path: wrong root set -> valid: false via error mapping
    vals = proof.proof_values
    status, data = _request(
        port, "POST", "/verify",
        {"proof_hex": proof_hex, "x": "%x" % vals.x, "roots": ["%x" % vals.root]},
    )
    assert status == 200 and data["valid"] is True
    status, data = _request(
        port, "POST", "/verify",
        {"proof_hex": proof_hex, "x": "%x" % vals.x, "roots": ["1"]},
    )
    assert status == 200 and data["valid"] is False


def test_http_malformed_requests(http_service):
    _, _, port = http_service
    status, data = _request(port, "POST", "/prove", {"witness_hex": "zz"})
    assert status == 400 and "error" in data
    status, data = _request(port, "POST", "/prove", {})
    assert status == 400 and "error" in data
    status, data = _request(port, "POST", "/verify", {"proof_hex": "00"})
    assert status == 400 and "error" in data


def test_http_keygen_and_poseidon(http_service):
    """Round-3 endpoints backing the JS client's Identity/Merkle helpers."""
    _, _, port = http_service
    status, data = _request(port, "POST", "/keygen", {"seed_hex": b"js-seed".hex()})
    assert status == 200
    from zerokit_tpu.protocol.keygen import seeded_keygen

    sk, pk = seeded_keygen(b"js-seed")
    assert int(data["secret"], 16) == int(sk)
    assert int(data["commitment"], 16) == pk

    status, data = _request(port, "POST", "/keygen", {"extended": True})
    assert status == 200
    assert set(data) == {"trapdoor", "nullifier", "secret", "commitment"}

    from zerokit_tpu.hash.poseidon import poseidon_hash

    status, data = _request(port, "POST", "/poseidon", {"inputs": ["ab", "3"]})
    assert status == 200
    assert int(data["hash"], 16) == poseidon_hash([0xAB, 3])


def test_http_partial_finish_routing(http_service):
    """/prove_partial and /finish route to the engine (stub: no partial
    support -> clean 400 error, no crash)."""
    _, _, port = http_service
    status, data = _request(
        port, "POST", "/prove_partial", {"partial_witness_hex": "00"}
    )
    assert status == 400 and "error" in data
    status, data = _request(
        port, "POST", "/finish", {"partial_proof_hex": "00", "witness_hex": "00"}
    )
    assert status == 400 and "error" in data


def test_finish_decodes_partial_proof_wire():
    """Regression: bytes_to_rln_partial_proof returns (obj, read); both the
    server and the FFI glue must unpack it (a tuple leaked through to
    finish_proof and failed only when the two-phase flow was driven)."""
    from zerokit_tpu.groth16.prover import PartialProof
    from zerokit_tpu.protocol.serialize import (
        bytes_to_rln_partial_proof,
        rln_partial_proof_to_bytes,
    )

    p = PartialProof(
        mask=[True, False, True],
        partial_pi_a=bn254.G1.mul(bn254.G1_GENERATOR, 3),
        partial_rho=bn254.G1.mul(bn254.G1_GENERATOR, 5),
        partial_pi_b=bn254.G2.mul(bn254.G2_GENERATOR, 7),
        partial_pi_c=bn254.G1.mul(bn254.G1_GENERATOR, 9),
    )
    wire = rln_partial_proof_to_bytes(p)

    class FinishCapture:
        def finish_proof(self, partial, witness):
            assert isinstance(partial, PartialProof)  # not a (obj, read) tuple
            assert partial.mask == p.mask
            raise RuntimeError("stop-after-decode")

    svc = ProverService.__new__(ProverService)
    svc.rln = FinishCapture()
    with pytest.raises(RuntimeError, match="stop-after-decode"):
        svc.finish(wire, rln_witness_to_bytes(_witness(1)))

    import zerokit_tpu.ffi_glue as glue

    obj, read = bytes_to_rln_partial_proof(wire)
    assert read == len(wire) and isinstance(obj, PartialProof)
