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


@needs_native
def test_native_assemble_batch_matches_python():
    """rln_groth16_assemble_batch (fixed-base tables + Straus chains,
    threaded) must be bit-identical to the pure-Python per-proof blinding
    algebra, including the r = 0 / s = 0 edge cases (where the reference's
    g1_b is the infinity point — partial_proof.rs:237-268)."""
    from zerokit_tpu.groth16.prover import Groth16Prover
    from zerokit_tpu.runtime import native

    rnd = random.Random(33)

    class _VK:
        pass

    class _PK:
        pass

    pk = _PK()
    pk.vk = _VK()
    pk.vk.alpha_g1 = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
    pk.beta_g1 = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
    pk.delta_g1 = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
    pk.vk.beta_g2 = bn254.G2.mul(bn254.G2_GENERATOR, rnd.randrange(R))
    pk.vk.delta_g2 = bn254.G2.mul(bn254.G2_GENERATOR, rnd.randrange(R))

    B = 5
    a_pts = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(B)]
    b1_pts = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(B)]
    b2_pts = [bn254.G2.mul(bn254.G2_GENERATOR, rnd.randrange(R)) for _ in range(B)]
    l_pts = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(B)]
    h_pts = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(B)]
    l_pts[2] = None  # infinity MSM outputs must round-trip
    rs = [rnd.randrange(R), 0, rnd.randrange(R), 0, 1]
    ss = [rnd.randrange(R), rnd.randrange(R), 0, 0, 1]

    got = native.groth16_assemble_batch_native(
        pk, a_pts, b1_pts, b2_pts, l_pts, h_pts, rs, ss
    )
    assert got is not None and len(got) == B
    # compare against the pure-Python blinding algebra, not the native
    # per-proof path: force _assemble onto its fallback branch
    orig = native.pairing_available
    native.pairing_available = lambda: False
    try:
        for b in range(B):
            want = Groth16Prover._assemble(
                pk, rs[b], ss[b], a_pts[b], b1_pts[b], b2_pts[b], l_pts[b], h_pts[b]
            )
            assert got[b] == want, f"lane {b} (r={rs[b]}, s={ss[b]})"
    finally:
        native.pairing_available = orig


def test_proof_point_validation():
    """Untrusted proof points are validated before pairing math (ark
    CanonicalDeserialize analog): non-canonical coordinates, off-curve
    points and non-subgroup G2 points are rejected; valid points and
    infinity pass. Exercises whichever backend is available and, when the
    native library is built, asserts the Python fallback agrees."""
    from zerokit_tpu.groth16 import verifier
    from zerokit_tpu.runtime import native

    rnd = random.Random(34)
    P = bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R))
    Qp = bn254.G2.mul(bn254.G2_GENERATOR, rnd.randrange(R))
    good = (P, Qp, bn254.G1.mul(bn254.G1_GENERATOR, 7))
    assert verifier.proof_points_valid(good)
    assert verifier.proof_points_valid((None, None, None))  # infinity legal

    # non-canonical coordinate (x + q) on A
    bad_a = ((P[0] + Q) if P[0] + Q < (1 << 256) else P[0], P[1])
    assert not verifier.proof_points_valid((bad_a, Qp, P))
    # off-curve A
    assert not verifier.proof_points_valid(((P[0], (P[1] + 1) % Q), Qp, P))
    # off-curve G2
    bx = (Qp[0][0], Qp[0][1])
    by = ((Qp[1][0] + 1) % Q, Qp[1][1])
    assert not verifier.proof_points_valid((P, (bx, by), P))

    # non-subgroup G2: a point on the twist curve NOT in the r-torsion.
    # Search small x for a twist point, multiply by r; if nonzero it
    # witnesses a curve point outside the subgroup.
    def _fq_sqrt(a):
        # q = 3 mod 4: candidate a^((q+1)/4), verified by squaring back
        r_ = pow(a, (Q + 1) // 4, Q)
        return r_ if r_ * r_ % Q == a % Q else None

    def _fq2_sqrt(a):
        # complex method for Fq2 = Fq[i]/(i^2+1): with n = sqrt(x^2 + y^2),
        # sqrt(x + yi) = (u, y / (2u)) for u = sqrt((x + n)/2) or ((x - n)/2)
        x, y = a
        n = _fq_sqrt((x * x + y * y) % Q)
        if n is None:
            return None
        for t in ((x + n) * pow(2, -1, Q) % Q, (x - n) * pow(2, -1, Q) % Q):
            u = _fq_sqrt(t)
            if u is None or u == 0:
                continue
            cand = (u, y * pow(2 * u, -1, Q) % Q)
            if bn254.fq2_mul(cand, cand) == (x % Q, y % Q):
                return cand
        return None

    found = None
    for xc in range(1, 60):
        x = (xc, 1)
        rhs = bn254.fq2_add(
            bn254.fq2_mul(bn254.fq2_mul(x, x), x), bn254.G2.b
        )
        y = _fq2_sqrt(rhs)
        if y is not None:
            found = (x, y)
            break
    assert found is not None, "no twist point found for the subgroup test"
    assert bn254.G2.is_on_curve(found)
    acc, base, k = None, found, R
    while k:
        if k & 1:
            acc = bn254.G2.add(acc, base)
        base = bn254.G2.double(base)
        k >>= 1
    if acc is not None:  # found a genuine non-subgroup point
        assert not verifier.proof_points_valid((P, found, P))
        if native.pairing_available():
            assert native.g2_is_valid_native(found) is False
            assert native.g2_is_valid_native(found, check_subgroup=False)

    if native.pairing_available():
        assert native.g1_is_valid_native(P) and native.g2_is_valid_native(Qp)
        assert native.g1_is_valid_native(None) and native.g2_is_valid_native(None)
        assert native.g1_is_valid_native((P[0], (P[1] + 1) % Q)) is False
