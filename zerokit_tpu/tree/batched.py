"""Device-resident batched Poseidon Merkle tree.

The host trees (tree/merkle.py) carry the incremental zerokit API; this tree
keeps every level on-device as Montgomery limb arrays and recomputes whole
levels with batched Poseidon — the TPU-native bulk path for workloads like
"insert 2^20 leaves and recompute root/paths" (BASELINE.md batched-tree
target). Bit-compatible with the host trees (same hash, same default-leaf
cascade); parity-tested against them.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NUM_LIMBS
from ..ff.field import FR, FrField, U32, encode_canonical_fast
from ..hash.poseidon import poseidon_hash, poseidon_hash_pair_mont


@functools.lru_cache(maxsize=None)
def _default_nodes(depth: int):
    """Default node value per level (leaf level = depth ... root = 0)."""
    cascade = [0]
    for _ in range(depth):
        cascade.append(poseidon_hash_pair_host(cascade[-1], cascade[-1]))
    return list(reversed(cascade))


def poseidon_hash_pair_host(a: int, b: int) -> int:
    return poseidon_hash([a, b])


@functools.lru_cache(maxsize=None)
def _recompute_fn(depth: int):
    def fn(leaves):  # (16, 2^depth) Montgomery
        levels = [leaves]
        cur = leaves
        for _ in range(depth):
            n = cur.shape[1]
            lefts = cur[:, 0:n:2]
            rights = cur[:, 1:n:2]
            cur = poseidon_hash_pair_mont(lefts, rights)
            levels.append(cur)
        return levels[::-1]  # [root_level, ..., leaf_level]

    return jax.jit(fn)


class DeviceMerkleTree:
    """Dense on-device tree; leaves and internal nodes in Montgomery form."""

    def __init__(self, depth: int):
        self.depth = depth
        defaults = _default_nodes(depth)
        self._levels: List[jnp.ndarray] = []
        for level in range(depth + 1):
            const = jnp.asarray(FR.encode([defaults[level]]), dtype=U32)  # (16,1)
            self._levels.append(jnp.broadcast_to(const, (NUM_LIMBS, 1 << level)))
        self.next_index = 0

    def capacity(self) -> int:
        return 1 << self.depth

    def set_leaves(self, start: int, leaves: Sequence[int]) -> None:
        """Writes a contiguous leaf range and recomputes all ancestors."""
        if start + len(leaves) > self.capacity():
            raise ValueError("set_leaves beyond capacity")
        canon = encode_canonical_fast(list(leaves))
        mont = FrField.to_mont(jnp.asarray(canon))
        leaf_level = jax.lax.dynamic_update_slice(
            self._levels[self.depth], mont, (0, start)
        )
        self._levels = _recompute_fn(self.depth)(leaf_level)
        self.next_index = max(self.next_index, start + len(leaves))

    def set_leaves_mont(self, start: int, mont: jnp.ndarray) -> None:
        """Device-side variant: mont is (16, k) Montgomery limbs."""
        leaf_level = jax.lax.dynamic_update_slice(
            self._levels[self.depth], mont, (0, start)
        )
        self._levels = _recompute_fn(self.depth)(leaf_level)
        self.next_index = max(self.next_index, start + mont.shape[1])

    def root(self) -> int:
        return int(FR.decode(np.asarray(self._levels[0]))[0])

    def get(self, index: int) -> int:
        leaf = np.asarray(self._levels[self.depth][:, index : index + 1])
        return int(FR.decode(leaf)[0])

    def proof(self, index: int):
        """Returns (path_elements, path_bits) as host ints, leaf to root."""
        elements: List[int] = []
        bits: List[int] = []
        i = index
        for level in range(self.depth, 0, -1):
            sib = i ^ 1
            val = np.asarray(self._levels[level][:, sib : sib + 1])
            elements.append(int(FR.decode(val)[0]))
            bits.append(i & 1)
            i >>= 1
        return elements, bits

    def proofs_batch(self, indices: Sequence[int]):
        """Gathers membership proofs for many leaves in one device pass."""
        idx = np.asarray(indices, dtype=np.int64)
        out_elements = []
        i = idx.copy()
        for level in range(self.depth, 0, -1):
            sib = i ^ 1
            vals = np.asarray(self._levels[level][:, sib])  # (16, K)
            out_elements.append([int(v) for v in FR.decode(vals)])
            i >>= 1
        # transpose: per-index lists
        elems = [[out_elements[lvl][k] for lvl in range(self.depth)] for k in range(len(idx))]
        bits = [[(int(indices[k]) >> lvl) & 1 for lvl in range(self.depth)] for k in range(len(idx))]
        return elems, bits
