"""Device-resident batched tree parity with the host trees."""

import random

import pytest

from zerokit_tpu.constants import R
from zerokit_tpu.tree.batched import DeviceMerkleTree
from zerokit_tpu.tree.merkle import OptimalMerkleTree


@pytest.mark.slow
def test_device_tree_matches_host():
    rnd = random.Random(3)
    dt = DeviceMerkleTree(6)
    ht = OptimalMerkleTree(6)
    leaves = [rnd.randrange(R) for _ in range(40)]
    dt.set_leaves(2, leaves)
    ht.set_range(2, leaves)
    assert dt.root() == ht.root()
    assert dt.get(5) == ht.get(5)

    pe, pb = dt.proof(7)
    hp = ht.proof(7)
    assert pe == hp.get_path_elements()
    assert pb == hp.get_path_index()

    elems, bits = dt.proofs_batch([2, 7, 13])
    assert elems[1] == pe and bits[1] == pb

    # incremental second write agrees too
    more = [rnd.randrange(R) for _ in range(8)]
    dt.set_leaves(50, more)
    ht.set_range(50, more)
    assert dt.root() == ht.root()
