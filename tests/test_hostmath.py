"""Host BN254 math: field/curve laws, pairing bilinearity, ark serde roundtrips."""

import random

import pytest

from zerokit_tpu.constants import Q, R
from zerokit_tpu.hostmath import arkserde, bn254


def test_generators_on_curve():
    assert bn254.G1.is_on_curve(bn254.G1_GENERATOR)
    assert bn254.G2.is_on_curve(bn254.G2_GENERATOR)


def test_group_order():
    assert bn254.G1.mul(bn254.G1_GENERATOR, R) is None
    assert bn254.G2.mul(bn254.G2_GENERATOR, R) is None


def test_group_laws():
    rnd = random.Random(7)
    p = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
    q = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
    assert bn254.G1.add(p, q) == bn254.G1.add(q, p)
    assert bn254.G1.add(p, bn254.G1.neg(p)) is None
    assert bn254.G1.add(p, p) == bn254.G1.double(p)


def test_fq2_inverse():
    rnd = random.Random(3)
    a = (rnd.randrange(Q), rnd.randrange(Q))
    assert bn254.fq2_mul(a, bn254.fq2_inv(a)) == bn254.FQ2_ONE


def test_fq12_inverse():
    rnd = random.Random(4)
    a = tuple(rnd.randrange(Q) for _ in range(12))
    assert bn254.fq12_mul(a, bn254.fq12_inv(a)) == bn254.FQ12_ONE


@pytest.mark.slow
def test_pairing_bilinearity():
    p = bn254.G1_GENERATOR
    q = bn254.G2_GENERATOR
    e6 = bn254.fq12_pow(bn254.pairing(q, p), 6)
    assert bn254.pairing(q, bn254.G1.mul(p, 6)) == e6
    assert bn254.pairing(bn254.G2.mul(q, 3), bn254.G1.mul(p, 2)) == e6
    assert bn254.pairing(q, p) != bn254.FQ12_ONE


def test_g1_serde_roundtrip():
    rnd = random.Random(11)
    for _ in range(5):
        p = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
        assert arkserde.g1_from_uncompressed(arkserde.g1_to_uncompressed(p)) == p
        assert arkserde.g1_from_compressed(arkserde.g1_to_compressed(p)) == p
    assert arkserde.g1_from_compressed(arkserde.g1_to_compressed(None)) is None
    assert arkserde.g1_from_uncompressed(arkserde.g1_to_uncompressed(None)) is None


def test_g2_serde_roundtrip():
    rnd = random.Random(12)
    for _ in range(5):
        p = bn254.G2.mul(bn254.G2_GENERATOR, rnd.randrange(R))
        assert arkserde.g2_from_uncompressed(arkserde.g2_to_uncompressed(p)) == p
        assert arkserde.g2_from_compressed(arkserde.g2_to_compressed(p)) == p
    assert arkserde.g2_from_compressed(arkserde.g2_to_compressed(None)) is None


def test_proof_serde_roundtrip():
    rnd = random.Random(13)
    proof = (
        bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)),
        bn254.G2.mul(bn254.G2_GENERATOR, rnd.randrange(R)),
        bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)),
    )
    data = arkserde.proof_to_bytes(proof)
    assert len(data) == 128
    assert arkserde.proof_from_bytes(data) == proof
