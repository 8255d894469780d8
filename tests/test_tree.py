"""Merkle tree semantics vs. reference golden vectors and behaviors.

Vectors: depth-20 Poseidon root/path for leaf 3 (rln/tests/protocol.rs:14-87)
and Keccak-hasher root progression (utils/tests/merkle_tree.rs:70-101).
"""

import pytest

from zerokit_tpu.constants import R
from zerokit_tpu.hash.keccak import keccak256
from zerokit_tpu.hash.poseidon import poseidon_hash, poseidon_hash_pair
from zerokit_tpu.tree.merkle import (
    FullMerkleTree,
    InvalidDepth,
    InvalidIndices,
    MerkleTreeError,
    OptimalMerkleTree,
    TooManySet,
)

EXPECTED_ROOT_DEPTH20 = sum(
    l << (64 * i)
    for i, l in enumerate(
        [4939322235247991215, 5110804094006647505, 4427606543677101242, 910933464535675827]
    )
)


class Keccak256Hasher:
    """32-byte big-endian Keccak pair hasher, as in utils/tests/merkle_tree.rs."""

    @staticmethod
    def default_leaf() -> int:
        return 0

    @staticmethod
    def hash_pair(left: int, right: int) -> int:
        out = keccak256(left.to_bytes(32, "big") + right.to_bytes(32, "big"))
        return int.from_bytes(out, "big")

    @staticmethod
    def hash_pairs_batch(lefts, rights):
        return [Keccak256Hasher.hash_pair(l, r) for l, r in zip(lefts, rights)]


def _rate_commitment() -> int:
    secret = int.from_bytes(keccak256(b"test-merkle-proof"), "little") % R
    return poseidon_hash_pair(poseidon_hash([secret]), 100)


@pytest.mark.parametrize("cls", [FullMerkleTree, OptimalMerkleTree])
def test_depth20_golden_root_and_path(cls):
    tree = cls(20)
    tree.set(3, _rate_commitment())
    assert tree.root() == EXPECTED_ROOT_DEPTH20
    proof = tree.proof(3)
    assert proof.get_path_index() == [1, 1] + [0] * 18
    elems = proof.get_path_elements()
    assert elems[0] == 0
    assert elems[1] == 0x2098F5FB9E239EAB3CEAC3F27B81E481DC3124D55FFED523A839EE8446B64864
    assert elems[19] == 0x1830EE67B5FB554AD5F63D4388800E1CFE78E310697D46E43C9CE36134F72CCA
    assert tree.verify(_rate_commitment(), proof)
    assert proof.leaf_index() == 3


@pytest.mark.parametrize("cls", [FullMerkleTree, OptimalMerkleTree])
def test_keccak_root_progression(cls):
    """utils/tests/merkle_tree.rs test_root vectors (keccak hasher, depth 2)."""
    tree = cls(2, hasher=Keccak256Hasher)
    assert tree.root() == int(
        "b4c11951957c6f8f642c4af61cd6b24640fec6dc7fc607ee8206a99e92410d30", 16
    )
    roots = [
        "c1ba1812ff680ce84c1d5b4f1087eeb08147a4d510f3496b2849df3a73f5af95",
        "893760ec5b5bee236f29e85aef64f17139c3c1b7ff24ce64eb6315fca0f2485b",
        "222ff5e0b5877792c2bc1670e2ccd0c2c97cd7bb1672a57d598db05092d3d72c",
        "a9bb8c3f1f12e9aa903a50c47f314b57610a3ab32f2d463293f58836def38d36",
    ]
    for i in range(4):
        leaf = int.from_bytes(bytes(28) + (i + 1).to_bytes(4, "big"), "big")
        tree.set(i, leaf)
        assert tree.root() == int(roots[i], 16)


@pytest.mark.parametrize("cls", [FullMerkleTree, OptimalMerkleTree])
def test_tree_ops(cls):
    tree = cls(4)
    assert tree.capacity() == 16
    assert tree.leaves_set() == 0
    tree.set_range(2, [11, 22, 33])
    assert tree.leaves_set() == 5
    assert tree.get(3) == 22
    assert tree.get_empty_leaves_indices() == [0, 1]
    tree.update_next(44)
    assert tree.get(5) == 44
    tree.delete(2)
    assert tree.get(2) == 0
    assert 2 in tree.get_empty_leaves_indices()
    # subtree roots
    assert tree.get_subtree_root(0, 0) == tree.root()
    assert tree.get_subtree_root(4, 3) == tree.get(3)
    assert tree.get_subtree_root(3, 2) == poseidon_hash_pair(tree.get(2), tree.get(3))
    # metadata
    tree.set_metadata(b"hello")
    assert tree.metadata() == b"hello"
    # errors
    with pytest.raises(MerkleTreeError):
        tree.get(16)
    with pytest.raises(TooManySet):
        tree.set_range(15, [1, 2])
    with pytest.raises(InvalidDepth):
        cls(64)


@pytest.mark.parametrize("cls", [FullMerkleTree, OptimalMerkleTree])
def test_override_range(cls):
    tree = cls(4)
    tree.set_range(0, [1, 2, 3, 4, 5])
    # remove 0,1 and write leaves at 2..5
    tree.override_range(2, [30, 40, 50], [0, 1])
    assert tree.get(0) == 0
    assert tree.get(1) == 0
    assert tree.get(2) == 30
    assert tree.get(4) == 50
    assert sorted(tree.get_empty_leaves_indices()) == [0, 1]
    # empty indices rejected (Full/Optimal policy, full_merkle_tree.rs:236-244)
    with pytest.raises(InvalidIndices):
        tree.override_range(0, [7], [])
    # out-of-capacity index rejected
    with pytest.raises(InvalidIndices):
        tree.override_range(0, [7], [99])


@pytest.mark.parametrize("cls", [FullMerkleTree, OptimalMerkleTree])
def test_batched_level_rehash_consistency(cls):
    """Ranges >= MIN_PARALLEL_NODES take the device path; roots must agree."""
    t1 = cls(5)
    t2 = cls(5)
    leaves = list(range(1, 25))
    t1.set_range(0, leaves)
    for i, leaf in enumerate(leaves):
        t2.set(i, leaf)
    assert t1.root() == t2.root()
