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
from zerokit_tpu.parallel.sharded import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


@pytest.mark.slow
def test_sharded_msm_matches_host():
    """ShardedMSM (tp-sharded tables + all_gather/tree-reduce combine) vs the
    host big-int MSM. 4x4-bit windows with scalars < 2^16: the sharding
    semantics are window-count-independent, and the small config keeps the
    XLA:CPU EC compiles inside the suite budget (same rationale as the toy
    dryrun tier, parallel/dryrun.py)."""
    from zerokit_tpu.parallel.sharded import ShardedMSM

    mesh = make_mesh(tp=4, dp=2)
    rnd = random.Random(9)
    n, B = 16, 2
    points = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(n)]
    scalars = [[rnd.randrange(1 << 16) for _ in range(B)] for _ in range(n)]
    msm = ShardedMSM(points, FqAdapter, mesh, n_windows=4, c_bits=4)
    sc = encode_canonical_fast(
        [scalars[i][b] for i in range(n) for b in range(B)]
    ).reshape(16, n, B)
    with mesh:
        res = msm.to_affine_ints(msm(sc))
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


@pytest.mark.slow
def test_mesh_prover_full_proof_parity():
    """RLN-level obligation (SURVEY §2d): a full Groth16 proof generated over
    a (dp, tp) mesh is bit-identical to the single-device proof."""
    from zerokit_tpu.circuit.zkey import ConstraintMatrices
    from zerokit_tpu.ff.field import FrField
    from zerokit_tpu.groth16.prover import Groth16Prover
    from zerokit_tpu.groth16.setup import groth16_setup
    from zerokit_tpu.groth16.verifier import prepare_verifying_key, verify_proof

    matrices = ConstraintMatrices(
        num_instance_variables=2,
        num_witness_variables=2,
        num_constraints=2,
        a_num_non_zero=2,
        b_num_non_zero=2,
        c_num_non_zero=2,
        a=[[(1, 2)], [(1, 3)]],
        b=[[(1, 2)], [(1, 2)]],
        c=[[(1, 3)], [(1, 1)]],
    )
    rnd = random.Random(77)
    zkey = groth16_setup(matrices, rnd)

    # Witness values < 2^16 (w1 <= 18 -> w1^3 < 2^16) so the device G1 MSMs
    # run 4x4-bit windows — sharding semantics are window-count-independent
    # and the small config keeps XLA:CPU EC compiles inside the suite budget
    # (toy-dryrun rationale). The G2 and h MSMs carry full-range values and
    # are NOT the piece under test: both provers share the native host
    # backend there, so the parity claim isolates the sharded QAP + sharded
    # G1 MSMs.
    B = 4
    rows = []
    for i in range(B):
        w1 = 3 + i
        w2 = w1 * w1
        rows.append([1, w2 * w1, w1, w2])
    flat = [rows[b][i] for i in range(4) for b in range(B)]
    canon = encode_canonical_fast(flat).reshape(16, 4, B)
    assignment = FrField.to_mont(np.asarray(canon))
    rs = [5, 6, 7, 8]
    ss = [9, 10, 11, 12]

    def prove(mesh):
        from zerokit_tpu.groth16.msm_host import HostMSM
        from zerokit_tpu.groth16.qap import WitnessMapper
        from zerokit_tpu.parallel.sharded import ShardedMSM

        prover = Groth16Prover.__new__(Groth16Prover)
        prover.zkey = zkey
        prover.graph = None
        prover.mesh = mesh
        prover.evaluator = None
        prover.num_inputs = 2
        prover.n_wires = 4
        # mesh=mesh so the full-proof path exercises _coset_lift_sharded
        # (the sharded Bailey-NTT QAP), not just the standalone map test
        prover.mapper = WitnessMapper(matrices, mesh=mesh)
        if mesh is not None:
            mk = lambda pts, ad: ShardedMSM(pts, ad, mesh, n_windows=4, c_bits=4)
        else:
            mk = lambda pts, ad: MSM(pts, ad, n_windows=4, c_bits=4)
        from zerokit_tpu.ff.fq2 import Fq2Adapter

        prover.msm_a = mk(zkey.pk.a_query, FqAdapter)
        prover.msm_b1 = mk(zkey.pk.b_g1_query, FqAdapter)
        prover.msm_b2 = HostMSM(zkey.pk.b_g2_query, Fq2Adapter)
        prover.msm_h = HostMSM(zkey.pk.h_query, FqAdapter)
        prover.msm_l = mk(zkey.pk.l_query, FqAdapter)
        return prover.prove_batch_with_assignment(assignment, rs, ss)

    single = prove(None)
    mesh = make_mesh(tp=2, dp=4)
    with mesh:
        sharded = prove(mesh)
    assert sharded == single
    pvk = prepare_verifying_key(zkey.pk.vk)
    assert verify_proof(pvk, single[0], [rows[0][1]])


@pytest.mark.slow
def test_msm_lane_batch_chunking_parity():
    """Batches above LANE_BATCH stream through the fixed-shape compiled
    programs in chunks (incl. a ragged tail) and must agree lane-for-lane
    with host MSMs. Small windows keep the compile cheap: scalars < 2^16."""
    rnd = random.Random(13)
    n, B = 16, 40  # 40 = 2 full chunks of 16 + ragged 8
    points = [bn254.G1.mul(bn254.G1_GENERATOR, rnd.randrange(R)) for _ in range(n)]
    scalars = [[rnd.randrange(1 << 16) for _ in range(B)] for _ in range(n)]
    msm = MSM(points, FqAdapter, n_windows=4, c_bits=4)
    assert msm.lane_batch == 16
    sc = encode_canonical_fast(
        [scalars[i][b] for i in range(n) for b in range(B)]
    ).reshape(16, n, B)
    res = msm.to_affine_ints(msm(sc))
    assert len(res) == B
    for b in range(0, B, 7):
        assert res[b] == bn254.G1.msm(points, [scalars[i][b] for i in range(n)])


@pytest.mark.slow
def test_sharded_witness_map_parity():
    """Full QAP witness map with the domain axis sharded over "tp" (Bailey
    NTT lifts, parallel/ntt_sharded.py) and the batch over "dp" must be
    bit-identical to the single-device map. Reference semantics:
    rln/src/circuit/qap.rs:30-98 (single-core there; the sharding is the
    SURVEY §2d sequence-parallel analog)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zerokit_tpu.circuit.zkey import ConstraintMatrices
    from zerokit_tpu.ff.field import FrField
    from zerokit_tpu.groth16.qap import WitnessMapper

    rnd = random.Random(21)
    n_wires, n_constraints, n_pub = 10, 12, 2

    def rows():
        return [
            [(rnd.randrange(R), rnd.randrange(n_wires)) for _ in range(2)]
            for _ in range(n_constraints)
        ]

    matrices = ConstraintMatrices(
        num_instance_variables=n_pub,
        num_witness_variables=n_wires - n_pub,
        num_constraints=n_constraints,
        a_num_non_zero=2 * n_constraints,
        b_num_non_zero=2 * n_constraints,
        c_num_non_zero=2 * n_constraints,
        a=rows(), b=rows(), c=rows(),
    )
    B = 4
    vals = [rnd.randrange(R) for _ in range(n_wires * B)]
    assign = FrField.to_mont(
        jnp.asarray(encode_canonical_fast(vals).reshape(16, n_wires, B))
    )
    single = np.asarray(WitnessMapper(matrices).witness_map(assign))

    mesh = make_mesh(tp=4, dp=2)
    mapper = WitnessMapper(matrices, mesh=mesh)
    assert mapper.mesh is not None, "mesh rejected despite compatible domain"
    with mesh:
        sharded_in = jax.device_put(assign, NamedSharding(mesh, P(None, None, "dp")))
        sharded = np.asarray(mapper.witness_map(sharded_in))
    assert np.array_equal(single, sharded)
