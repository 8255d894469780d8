"""Poseidon parity with the reference's golden vectors.

Vectors from utils/tests/poseidon_hash_test.rs (arity-1 and merkle pair
hashes) and spot checks of the Grain-LFSR constants against
utils/tests/poseidon_constants.rs.
"""

import random

import numpy as np
import pytest

from zerokit_tpu.ff.field import FR
from zerokit_tpu.hash.grain import find_poseidon_ark_and_mds
from zerokit_tpu.hash.poseidon import (
    ROUND_PARAMS,
    PoseidonError,
    poseidon_hash,
    poseidon_hash_mont,
    poseidon_hash_pair,
    poseidon_hash_pair_mont,
)

ARITY1_VECTORS = {
    0: 19014214495641488759237505126948346942972912379615652741039992445865937985820,
    1: 18586133768512220936620570745912940619677854269274689475585506675881198879027,
    255: 20026131459732984724454933360292530547665726761019872861025481903072111625788,
    65535: 12358868638722666642632413418981275677998688723398440898957566982787708451243,
    2**64 - 1: 17449307747295017006142981453320720946812828330895590310359634430146721583189,
}

# pair hashes building the 8-leaf merkle tree in poseidon_hash_test.rs
PAIR_VECTORS = [
    ((0, 1), 12583541437132735734108669866114103169564651237895298778035846191048104863326),
    ((2, 3), 17197790661637433027297685226742709599380837544520340689137581733613433332983),
    ((4, 5), 756592041685769348226045093946546956867261766023639881791475046640232555043),
    ((6, 7), 5558359459771725727593826278265342308584225092343962757289948761260561575479),
]


def test_arity1_golden():
    for inp, expected in ARITY1_VECTORS.items():
        assert poseidon_hash([inp]) == expected


def test_pair_golden_and_tree():
    for (a, b), expected in PAIR_VECTORS:
        assert poseidon_hash_pair(a, b) == expected
    h01 = PAIR_VECTORS[0][1]
    h23 = PAIR_VECTORS[1][1]
    h45 = PAIR_VECTORS[2][1]
    h67 = PAIR_VECTORS[3][1]
    h03 = poseidon_hash_pair(h01, h23)
    h47 = poseidon_hash_pair(h45, h67)
    assert h03 == 3720616653028013822312861221679392249031832781774563366107458835261883914924
    assert h47 == 7960741062684589801276390367952372418815534638314682948141519164356522829957
    assert (
        poseidon_hash_pair(h03, h47)
        == 11780650233517635876913804110234352847867393797952240856403268682492028497284
    )


def test_grain_first_constant():
    # first ark constant for t=2 (utils/tests/poseidon_constants.rs)
    ark, mds = find_poseidon_ark_and_mds(254, 2, 8, 56, 0)
    assert ark[0] == 4417881134626180770308697923359573201005643519861877412381846989312604493735
    assert ark[1] == 5433650512959517612316327474713065966758808864213826738576266661723522780033
    assert len(ark) == (8 + 56) * 2
    assert len(mds) == 2 and len(mds[0]) == 2


def test_unsupported_arity():
    with pytest.raises(PoseidonError):
        poseidon_hash([])
    with pytest.raises(PoseidonError):
        poseidon_hash(list(range(9)))  # t = 10 unsupported


def test_batched_matches_host():
    rnd = random.Random(5)
    ls = [rnd.randrange(FR.p) for _ in range(16)]
    rs = [rnd.randrange(FR.p) for _ in range(16)]
    out = poseidon_hash_pair_mont(np.asarray(FR.encode(ls)), np.asarray(FR.encode(rs)))
    assert list(FR.decode(np.asarray(out))) == [
        poseidon_hash([a, b]) for a, b in zip(ls, rs)
    ]


def test_batched_arity3_matches_host():
    rnd = random.Random(6)
    cols = [[rnd.randrange(FR.p) for _ in range(8)] for _ in range(3)]
    out = poseidon_hash_mont([np.asarray(FR.encode(c)) for c in cols])
    assert list(FR.decode(np.asarray(out))) == [
        poseidon_hash([a, b, c]) for a, b, c in zip(*cols)
    ]


# ---------------------------------------------------------------------------
# Full constants parity for ALL arities t=2..9 vs the reference's expected
# tables (/root/reference/utils/tests/poseidon_constants.rs, 3,543 LoC of
# ark/MDS decimal strings). The digests below are sha256[:16] over
# ",".join(ark) + "|" + ",".join(mds flattened row-major), computed from the
# reference file; the test regenerates the tables with our Grain LFSR and
# must reproduce them exactly.
# ---------------------------------------------------------------------------

REFERENCE_CONSTANT_DIGESTS = {
    2: "ce15afc16ce5c8e2",
    3: "7fa8719ea0d0c9ea",
    4: "9a55b5c2f3ae0e84",
    5: "f2deb06a6dc145f8",
    6: "fff717aadec9b193",
    7: "cad5d0b6d0300e32",
    8: "435f2a696d27612b",
    9: "bffe5cdc77e482f5",
}


@pytest.mark.parametrize("params", ROUND_PARAMS, ids=lambda p: f"t{p[0]}")
def test_grain_constants_match_reference_all_arities(params):
    import hashlib

    from zerokit_tpu.hash.grain import find_poseidon_ark_and_mds
    from zerokit_tpu.hash.poseidon import PRIME_BITS

    t, rf, rp, skip = params
    ark, mds = find_poseidon_ark_and_mds(PRIME_BITS, t, rf, rp, skip)
    flat_c = list(ark) if not isinstance(ark[0], (tuple, list)) else [
        x for row in ark for x in row
    ]
    flat_m = [x for row in mds for x in row]
    assert len(flat_c) == (rf + rp) * t and len(flat_m) == t * t
    digest = hashlib.sha256(
        (",".join(map(str, flat_c)) + "|" + ",".join(map(str, flat_m))).encode()
    ).hexdigest()[:16]
    assert digest == REFERENCE_CONSTANT_DIGESTS[t]
