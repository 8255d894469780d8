"""Golden byte-layout vectors for every wire codec.

The expected buffers are constructed HERE, independently of the library's
primitives, straight from the reference layouts:
  * v2 function codecs — rln/src/protocol/proof.rs:190-407 (values),
    witness.rs:369-628 (witness), layouts documented in mode.rs:26-74.
  * V3 enum codecs — rln/src/protocol/serialize.rs: LE = arkworks derive
    (struct field order, witness.rs:1288-1307), BE = hand-written
    (serialize.rs:352-366 puts Single message_id third).
Self-roundtrips cannot catch field-order bugs; these vectors can
(mirrors reference rln/tests/serialize.rs).
"""

import struct

import pytest

from zerokit_tpu import errors
from zerokit_tpu.constants import R
from zerokit_tpu.protocol import serialize as ser
from zerokit_tpu.protocol.proof import RLNProofValues
from zerokit_tpu.protocol.witness import RLNPartialWitnessInput, RLNWitnessInput

DEPTH = 4

SECRET = 0x1234567890ABCDEF_FEDCBA0987654321_0011223344556677_0123456789ABCDEF % R
LIMIT = 100
MSG_ID = 7
PATH = [(i * 0x1111111111111111222222) % R for i in range(1, DEPTH + 1)]
IDX = [0, 1, 1, 0]
X = 0x0A0B0C0D0E0F_102030405060708090A0B0C0 % R
EXT = 0xDEADBEEF_CAFEBABE_12345678 % R


def fr(v, be):
    return int(v).to_bytes(32, "big" if be else "little")


def u64(n, be):
    return struct.pack(">Q" if be else "<Q", n)


def vec_fr(vals, be):
    return u64(len(vals), be) + b"".join(fr(v, be) for v in vals)


def vec_u8(vals, be):
    return u64(len(vals), be) + bytes(vals)


def vec_bool(vals, be):
    return u64(len(vals), be) + bytes(1 if v else 0 for v in vals)


def witness_single():
    return RLNWitnessInput.new_single(SECRET, LIMIT, MSG_ID, PATH, IDX, X, EXT)


def witness_multi():
    return RLNWitnessInput.new_multi(
        SECRET, LIMIT, [3, 0, 9, 0], PATH, IDX, X, EXT, [True, False, True, False]
    )


# -- v2 witness: version byte; Single has message_id THIRD (witness.rs:376) --


@pytest.mark.parametrize("be", [False, True])
def test_v2_witness_single_layout(be):
    expected = (
        bytes([0x00])
        + fr(SECRET, be)
        + fr(LIMIT, be)
        + fr(MSG_ID, be)
        + vec_fr(PATH, be)
        + vec_u8(IDX, be)
        + fr(X, be)
        + fr(EXT, be)
    )
    got = ser.rln_witness_to_bytes(witness_single(), be)
    assert got == expected
    w, n = ser.bytes_to_rln_witness(expected, be)
    assert n == len(expected) and w == witness_single()


@pytest.mark.parametrize("be", [False, True])
def test_v2_witness_multi_layout(be):
    expected = (
        bytes([0x01])
        + fr(SECRET, be)
        + fr(LIMIT, be)
        + vec_fr(PATH, be)
        + vec_u8(IDX, be)
        + fr(X, be)
        + fr(EXT, be)
        + vec_fr([3, 0, 9, 0], be)
        + vec_bool([True, False, True, False], be)
    )
    got = ser.rln_witness_to_bytes(witness_multi(), be)
    assert got == expected
    w, _ = ser.bytes_to_rln_witness(expected, be)
    assert w == witness_multi()


@pytest.mark.parametrize("be", [False, True])
def test_v2_partial_witness_layout(be):
    pw = RLNPartialWitnessInput.new(SECRET, LIMIT, PATH, IDX)
    expected = (
        bytes([0x00]) + fr(SECRET, be) + fr(LIMIT, be) + vec_fr(PATH, be) + vec_u8(IDX, be)
    )
    assert ser.rln_partial_witness_to_bytes(pw, be) == expected
    got, _ = ser.bytes_to_rln_partial_witness(expected, be)
    assert got == pw


# -- v2 proof values: root, ext_nullifier, x, then outputs (proof.rs:213-234) --


@pytest.mark.parametrize("be", [False, True])
def test_v2_proof_values_single_layout(be):
    v = RLNProofValues.new_single(11, X, EXT, 22, 33)
    expected = (
        bytes([0x00]) + fr(11, be) + fr(EXT, be) + fr(X, be) + fr(22, be) + fr(33, be)
    )
    assert ser.rln_proof_values_to_bytes(v, be) == expected
    got, _ = ser.bytes_to_rln_proof_values(expected, be)
    assert got == v


@pytest.mark.parametrize("be", [False, True])
def test_v2_proof_values_multi_layout(be):
    v = RLNProofValues.new_multi(11, X, EXT, [1, 2], [3, 4], [True, False])
    expected = (
        bytes([0x01])
        + fr(11, be)
        + fr(EXT, be)
        + fr(X, be)
        + vec_fr([1, 2], be)
        + vec_fr([3, 4], be)
        + vec_bool([True, False], be)
    )
    assert ser.rln_proof_values_to_bytes(v, be) == expected
    got, _ = ser.bytes_to_rln_proof_values(expected, be)
    assert got == v


# -- V3 witness: LE = derive order (message_id LAST, witness.rs:1288-1296);
#    BE = hand-written order (message_id THIRD, serialize.rs:352-366) ---------


def test_v3_witness_single_le_layout():
    expected = (
        bytes([0])
        + fr(SECRET, False)
        + fr(LIMIT, False)
        + vec_fr(PATH, False)
        + vec_u8(IDX, False)
        + fr(X, False)
        + fr(EXT, False)
        + fr(MSG_ID, False)  # message_id LAST in the ark derive order
    )
    assert ser.witness_v3_to_bytes(witness_single(), be=False) == expected
    assert ser.bytes_to_witness_v3(expected, be=False) == witness_single()


def test_v3_witness_single_be_layout():
    expected = (
        bytes([0])
        + fr(SECRET, True)
        + fr(LIMIT, True)
        + fr(MSG_ID, True)  # message_id THIRD in the hand-written BE codec
        + vec_fr(PATH, True)
        + vec_u8(IDX, True)
        + fr(X, True)
        + fr(EXT, True)
    )
    assert ser.witness_v3_to_bytes(witness_single(), be=True) == expected
    assert ser.bytes_to_witness_v3(expected, be=True) == witness_single()


@pytest.mark.parametrize("be", [False, True])
def test_v3_witness_multi_layout(be):
    expected = (
        bytes([1])
        + fr(SECRET, be)
        + fr(LIMIT, be)
        + vec_fr(PATH, be)
        + vec_u8(IDX, be)
        + fr(X, be)
        + fr(EXT, be)
        + vec_fr([3, 0, 9, 0], be)
        + vec_bool([True, False, True, False], be)
    )
    assert ser.witness_v3_to_bytes(witness_multi(), be) == expected
    assert ser.bytes_to_witness_v3(expected, be) == witness_multi()


@pytest.mark.parametrize("be", [False, True])
def test_v3_witness_roundtrip(be):
    for w in (witness_single(), witness_multi()):
        assert ser.bytes_to_witness_v3(ser.witness_v3_to_bytes(w, be), be) == w


@pytest.mark.parametrize("be", [False, True])
def test_v3_partial_witness_layout(be):
    pw = RLNPartialWitnessInput.new(SECRET, LIMIT, PATH, IDX)
    # no enum tag byte: RLNPartialWitnessInputV3 is a plain struct
    expected = fr(SECRET, be) + fr(LIMIT, be) + vec_fr(PATH, be) + vec_u8(IDX, be)
    assert ser.partial_witness_v3_to_bytes(pw, be) == expected
    assert ser.bytes_to_partial_witness_v3(expected, be) == pw


# -- V3 proof values: Single = y, root, nullifier, x, ext (proof.rs:983-989
#    field order == BE hand order, serialize.rs:594-600) ----------------------


@pytest.mark.parametrize("be", [False, True])
def test_v3_proof_values_single_layout(be):
    v = RLNProofValues.new_single(11, X, EXT, 22, 33)
    expected = (
        bytes([0]) + fr(22, be) + fr(11, be) + fr(33, be) + fr(X, be) + fr(EXT, be)
    )
    assert ser.proof_values_v3_to_bytes(v, be) == expected
    assert ser.bytes_to_proof_values_v3(expected, be) == v


@pytest.mark.parametrize("be", [False, True])
def test_v3_proof_values_multi_layout(be):
    v = RLNProofValues.new_multi(11, X, EXT, [1, 2], [3, 4], [True, False])
    expected = (
        bytes([1])
        + vec_fr([1, 2], be)
        + fr(11, be)
        + vec_fr([3, 4], be)
        + fr(X, be)
        + fr(EXT, be)
        + vec_bool([True, False], be)
    )
    assert ser.proof_values_v3_to_bytes(v, be) == expected
    assert ser.bytes_to_proof_values_v3(expected, be) == v


# -- rejection cases (reference serialize.rs canonicality rules) --------------


@pytest.mark.parametrize("be", [False, True])
def test_non_canonical_fr_rejected(be):
    bad = int(R).to_bytes(32, "big" if be else "little")
    with pytest.raises(errors.NonCanonicalFieldElement):
        ser.bytes_to_fr(bad, be)


def test_v3_bad_enum_tag_rejected():
    with pytest.raises(errors.SerializationError):
        ser.bytes_to_witness_v3(bytes([2]) + b"\x00" * 64, be=False)
    with pytest.raises(errors.SerializationError):
        ser.bytes_to_proof_values_v3(bytes([9]) + b"\x00" * 160, be=True)


def test_v3_non_canonical_bool_rejected():
    data = ser.witness_v3_to_bytes(witness_multi(), be=True)
    bad = data[:-1] + bytes([2])  # last selector byte -> 2
    with pytest.raises(errors.NonCanonicalBool):
        ser.bytes_to_witness_v3(bad, be=True)


@pytest.mark.parametrize("be", [False, True])
def test_trailing_bytes_rejected(be):
    data = ser.rln_witness_to_bytes(witness_single(), be) + b"\x00"
    with pytest.raises(errors.InvalidReadLen):
        ser.bytes_to_rln_witness(data, be)
    data = ser.witness_v3_to_bytes(witness_single(), be) + b"\x00"
    with pytest.raises(errors.InvalidReadLen):
        ser.bytes_to_witness_v3(data, be)


def test_truncated_rejected():
    data = ser.witness_v3_to_bytes(witness_single(), be=False)
    with pytest.raises(errors.UtilsError):
        ser.bytes_to_witness_v3(data[:40], be=False)
