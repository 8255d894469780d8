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


# ---------------------------------------------------------------------------
# Native tower pairing (native/pairing.cpp) vs the Python oracle
# ---------------------------------------------------------------------------


def _native_pairing_available():
    from zerokit_tpu.runtime import native

    return native.pairing_available()


needs_native = pytest.mark.skipif(
    not _native_pairing_available(), reason="librln_native.so not built"
)


@needs_native
def test_native_g1_msm_matches_host():
    from zerokit_tpu.runtime import native

    rnd = random.Random(31)
    pts = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(5)]
    pts.append(None)  # infinity entry is skipped
    scal = [rnd.randrange(R) for _ in range(6)]
    got = native.g1_msm_native(pts, scal)
    want = bn254.G1.msm(pts[:5], scal[:5])
    assert got == want
    # zero combination -> infinity encoded as None
    assert native.g1_msm_native(pts[:1], [0]) is None


@needs_native
def test_native_multi_pairing_cancellation():
    from zerokit_tpu.runtime import native

    rnd = random.Random(32)
    a, b = rnd.randrange(R), rnd.randrange(R)
    P = bn254.G1.mul(bn254.G1_GENERATOR, a)
    Q = bn254.G2.mul(bn254.G2_GENERATOR, b)
    # e(P, Q) * e(-P, Q) == 1
    assert native.multi_pairing_is_one_native([(P, Q), (bn254.G1.neg(P), Q)])
    # e(P, Q) * e(P, Q) != 1
    assert not native.multi_pairing_is_one_native([(P, Q), (P, Q)])
    # bilinearity: e(aG, bH) * e(-abG, H) == 1
    ab = bn254.G1.mul(bn254.G1_GENERATOR, (-a * b) % R)
    assert native.multi_pairing_is_one_native([(P, Q), (ab, bn254.G2_GENERATOR)])


@needs_native
@pytest.mark.slow
def test_native_pairing_matches_python_oracle():
    """Full cross-check: the native tower pairing output equals the Python
    flattened-basis pairing after the basis change u = w^6 - 9, v = w^2."""
    import ctypes

    from zerokit_tpu.constants import Q
    from zerokit_tpu.runtime.native import _g1_bytes, _g2_bytes, _load

    lib = _load()
    rnd = random.Random(33)
    P = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
    Qp = bn254.G2.mul(bn254.G2_GENERATOR, rnd.randrange(R))
    out = ctypes.create_string_buffer(384)
    assert lib.rln_pairing(_g1_bytes(P), _g2_bytes(Qp), out) == 0
    coeffs = [
        int.from_bytes(out.raw[32 * i : 32 * (i + 1)], "little") for i in range(12)
    ]
    # tower coeff i of Fq2 at w-power pos -> flattened w-basis
    flat = [0] * 12
    pos_of = [0, 2, 4, 1, 3, 5]  # a.c0, a.c1, a.c2, b.c0, b.c1, b.c2
    for i in range(6):
        x, y = coeffs[2 * i], coeffs[2 * i + 1]
        p0 = pos_of[i]
        flat[p0] = (flat[p0] + x - 9 * y) % Q
        flat[p0 + 6] = (flat[p0 + 6] + y) % Q
    assert tuple(flat) == bn254.pairing(Qp, P)
