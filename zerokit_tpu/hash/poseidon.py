"""Poseidon hash over BN254 Fr: host scalar version + batched TPU version.

Parity targets:
  * permutation structure — reference utils/src/poseidon/poseidon_hash.rs
    (ark -> sbox(x^5, partial rounds hit lane 0 only) -> MDS mix per round,
    state = [0, inputs...], output = state[0]),
  * round parameters — reference rln/src/hashers.rs:14-23
    (t = 2..9, RF = 8, RP per t, skip_matrices = 0),
  * golden hash vectors — utils/tests/poseidon_hash_test.rs.

TPU design: the batched version operates on Montgomery limb arrays of shape
(16, *batch) (see ff/field.py) and runs the rounds as three lax.scan phases
(first RF/2 full rounds, RP partial rounds, last RF/2 full rounds) so the
compiled program is small and the VPU sees full-width limb vector ops.
Hashing a whole Merkle level = one call with batch = level width.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import R
from ..ff.field import FR, FrField
from .grain import find_poseidon_ark_and_mds

# (t, RF, RP, skip_matrices) — reference rln/src/hashers.rs:14-23
ROUND_PARAMS = [
    (2, 8, 56, 0),
    (3, 8, 57, 0),
    (4, 8, 56, 0),
    (5, 8, 60, 0),
    (6, 8, 60, 0),
    (7, 8, 63, 0),
    (8, 8, 64, 0),
    (9, 8, 63, 0),
]

PRIME_BITS = 254


class PoseidonError(ValueError):
    pass


@functools.lru_cache(maxsize=None)
def params_for_t(t: int):
    for pt, rf, rp, skip in ROUND_PARAMS:
        if pt == t:
            ark, mds = find_poseidon_ark_and_mds(PRIME_BITS, t, rf, rp, skip)
            return rf, rp, ark, mds
    raise PoseidonError(f"no Poseidon parameters for input length {t - 1}")


# ---------------------------------------------------------------------------
# host (python int) version — protocol-layer single hashes
# ---------------------------------------------------------------------------


def poseidon_hash(inputs: Sequence[int]) -> int:
    if len(inputs) == 0:
        raise PoseidonError("empty input")
    t = len(inputs) + 1
    if 2 <= t <= 9:
        # fast path: native host runtime (C ABI), if built
        from ..runtime import native

        result = native.poseidon_hash_native([int(v) % R for v in inputs])
        if result is not None:
            return result
    rf, rp, ark, mds = params_for_t(t)
    state = [0] + [x % R for x in inputs]
    for rnd in range(rf + rp):
        # ark
        state = [(s + ark[rnd * t + i]) % R for i, s in enumerate(state)]
        # sbox
        if rnd < rf // 2 or rnd >= rf // 2 + rp:
            state = [pow(s, 5, R) for s in state]
        else:
            state[0] = pow(state[0], 5, R)
        # mix
        state = [sum(mds[i][j] * state[j] for j in range(t)) % R for i in range(t)]
    return state[0]


def poseidon_hash_pair(a: int, b: int) -> int:
    return poseidon_hash([a, b])


# ---------------------------------------------------------------------------
# batched TPU version (Montgomery limb arrays)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mont_params_for_t(t: int):
    # cache numpy (not jnp) so first use inside a jit trace cannot leak tracers
    rf, rp, ark, mds = params_for_t(t)
    n_rounds = rf + rp
    ark_mont = np.asarray(FR.encode(np.array(ark, dtype=object).reshape(n_rounds, t)))
    mds_mont = np.asarray(FR.encode(np.array(mds, dtype=object)))
    return rf, rp, ark_mont, mds_mont


def _x5(x):
    return FrField.mul(FrField.sqr(FrField.sqr(x)), x)


def _mix(state: List, mds, t: int) -> List:
    out = []
    for i in range(t):
        acc = FrField.mul(jnp.broadcast_to(_c(mds, i, 0, state[0]), state[0].shape), state[0])
        for j in range(1, t):
            acc = FrField.add(
                acc,
                FrField.mul(jnp.broadcast_to(_c(mds, i, j, state[0]), state[0].shape), state[j]),
            )
        out.append(acc)
    return out


def _c(mds, i, j, like):
    # mds: (16, t, t) -> (16, 1...) broadcastable constant
    return mds[:, i, j].reshape((16,) + (1,) * (like.ndim - 1))


@functools.lru_cache(maxsize=None)
def _batched_permutation(t: int):
    """Builds a jitted function: t-1 input limb arrays -> output limb array."""
    rf, rp, ark_np, mds_np = _mont_params_for_t(t)

    def hash_fn(*inputs):
        assert len(inputs) == t - 1
        ark = jnp.asarray(ark_np)
        mds = jnp.asarray(mds_np)
        state = [jnp.zeros_like(inputs[0])] + list(inputs)

        def round_body(full: bool):
            def body(state_tuple, ark_row):
                state = list(state_tuple)
                for i in range(t):
                    const = ark_row[:, i].reshape((16,) + (1,) * (state[i].ndim - 1))
                    state[i] = FrField.add(state[i], jnp.broadcast_to(const, state[i].shape))
                if full:
                    state = [_x5(s) for s in state]
                else:
                    state[0] = _x5(state[0])
                state = _mix(state, mds, t)
                return tuple(state), None

            return body

        half = rf // 2
        state, _ = jax.lax.scan(round_body(True), tuple(state), ark[:, :half].transpose(1, 0, 2))
        state, _ = jax.lax.scan(
            round_body(False), tuple(state), ark[:, half : half + rp].transpose(1, 0, 2)
        )
        state, _ = jax.lax.scan(
            round_body(True), tuple(state), ark[:, half + rp :].transpose(1, 0, 2)
        )
        return state[0]

    return jax.jit(hash_fn)


def poseidon_hash_mont(inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Batched Poseidon: inputs are Montgomery limb arrays (16, *batch)."""
    t = len(inputs) + 1
    return _batched_permutation(t)(*inputs)


def poseidon_hash_pair_mont(left: jnp.ndarray, right: jnp.ndarray) -> jnp.ndarray:
    return _batched_permutation(3)(left, right)
