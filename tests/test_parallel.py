"""Multi-chip sharding: tensor-parallel MSM and distributed NTT parity.

1-chip vs N-chip bit-parity on the virtual 8-device CPU mesh (the
reference has no distributed layer; SURVEY.md §2d defines this as a new
first-class component with exactly this test obligation).
"""

import random

import jax
import numpy as np
import pytest

from zerokit_tpu.constants import R
from zerokit_tpu.ff.field import FR, encode_canonical_fast
from zerokit_tpu.ff.fq2 import FqAdapter
from zerokit_tpu.groth16 import ntt
from zerokit_tpu.groth16.msm import MSM
from zerokit_tpu.hostmath import bn254
from zerokit_tpu.parallel.ntt_sharded import sharded_fft
from zerokit_tpu.parallel.sharded import make_mesh, sharded_msm

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


@pytest.mark.slow
def test_sharded_msm_matches_host():
    mesh = make_mesh(tp=4, dp=2)
    rnd = random.Random(9)
    n, B = 16, 2
    points = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(n)]
    scalars = [[rnd.randrange(R) for _ in range(B)] for _ in range(n)]
    msm = MSM(points, FqAdapter)
    sc = encode_canonical_fast(
        [scalars[i][b] for i in range(n) for b in range(B)]
    ).reshape(16, n, B)
    acc = sharded_msm(FqAdapter, msm.points, sc, mesh)
    res = msm.to_affine_ints(acc)
    for b in range(B):
        assert res[b] == bn254.G1.msm(points, [scalars[i][b] for i in range(n)])


@pytest.mark.slow
def test_sharded_ntt_matches_single_device():
    mesh = make_mesh(tp=8, dp=1)
    rnd = random.Random(4)
    N, B = 256, 2
    coeffs = [rnd.randrange(R) for _ in range(N * B)]
    arr = np.asarray(FR.encode(coeffs)).reshape(16, N, B)
    with mesh:
        got = sharded_fft(arr, mesh, "tp")
        back = sharded_fft(np.asarray(got), mesh, "tp", inverse=True)
    assert np.array_equal(np.asarray(got), np.asarray(ntt.fft(arr)))
    assert np.array_equal(np.asarray(back), np.asarray(arr))
