"""Distributed NTT over a device mesh (Bailey four-step with all_to_all).

The reference's FFTs are single-core per proof (ark-poly radix-2,
rln/src/circuit/qap.rs:69-90); the multi-chip design is new (SURVEY.md §2d):
for domains 2^20-2^22 the butterfly stages are split N = N1 * N2 with
N1 = mesh size D:

    1. view coefficients as A[i1][i2], i2 sharded over "tp";
    2. local length-N1 DFTs over i1 (each device holds all i1 for its i2);
    3. twiddle by g_N^(i1 * i2);
    4. all_to_all transpose so each device holds all i2 for its rows;
    5. local length-N2 radix-2 NTTs over i2 (groth16/ntt.py kernels).

Output is the standard natural-order spectrum, returned with rows sharded —
a second all_to_all relayouts back to coefficient sharding when needed.
Forward/inverse are bit-exact with the single-device NTT (tested on the
virtual 8-device CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import R
from ..ff.field import FR, FrField, U32
from ..groth16 import ntt


@functools.lru_cache(maxsize=None)
def _small_dft_matrix(n1: int, inverse: bool) -> np.ndarray:
    """(16, n1, n1) Montgomery twiddle matrix W[k][i] = g^(ik)."""
    g = ntt.domain_generator(n1)
    if inverse:
        g = pow(g, -1, R)
    mat = [[pow(g, (i * k) % n1, R) for i in range(n1)] for k in range(n1)]
    return np.asarray(
        FR.encode(np.array(mat, dtype=object)), dtype=np.uint32
    )  # (16, n1, n1)


@functools.lru_cache(maxsize=None)
def _twiddle_block(n: int, n1: int, inverse: bool) -> np.ndarray:
    """(16, n1, n2) Montgomery table g_N^(k1*i2)."""
    g = ntt.domain_generator(n)
    if inverse:
        g = pow(g, -1, R)
    n2 = n // n1
    tw = [[pow(g, (k1 * i2) % n, R) for i2 in range(n2)] for k1 in range(n1)]
    return np.asarray(FR.encode(np.array(tw, dtype=object)), dtype=np.uint32)


def _local_small_dft(x: jnp.ndarray, mat_np: np.ndarray) -> jnp.ndarray:
    """x: (16, n1, m, B); returns y[k1] = sum_i1 W[k1][i1] * x[i1]."""
    mat = jnp.asarray(mat_np)
    n1 = x.shape[1]
    acc = None
    for k1 in range(n1):
        term = None
        for i1 in range(n1):
            w = mat[:, k1, i1].reshape((16,) + (1,) * (x.ndim - 2))
            prod = FrField.mul(jnp.broadcast_to(w, x[:, i1].shape), x[:, i1])
            term = prod if term is None else FrField.add(term, prod)
        term = term[:, None]
        acc = term if acc is None else jnp.concatenate([acc, term], axis=1)
    return acc


def sharded_fft(values: jnp.ndarray, mesh: Mesh, axis: str = "tp", inverse: bool = False):
    """values: (16, N, *batch) replicated or sharded on N; returns the
    natural-order (i)NTT, sharded over the N axis."""
    n = values.shape[1]
    n1 = mesh.shape[axis]
    if n % n1 or (n // n1) & (n // n1 - 1):
        raise ValueError("domain must split into mesh-size x power-of-two")
    n2 = n // n1
    batch = values.shape[2:]
    mat_np = _small_dft_matrix(n1, inverse)
    tw_np = _twiddle_block(n, n1, inverse)

    def local(x):
        # x: (16, n1, n2/D, *batch) — all rows i1, a shard of columns i2
        y = _local_small_dft(x, mat_np)  # DFT over i1
        d = jax.lax.axis_index(axis)
        tw_full = jnp.asarray(tw_np)  # (16, n1, n2)
        shard = jax.lax.dynamic_slice_in_dim(tw_full, d * x.shape[2], x.shape[2], axis=2)
        tw = shard.reshape((16, n1, x.shape[2]) + (1,) * len(batch))
        y = FrField.mul(y, jnp.broadcast_to(tw, y.shape))
        # transpose: gather all i2, keep a shard of k1 rows
        # (16, n1, n2/D, *b) -> rows split over devices, cols gathered
        y = jax.lax.all_to_all(y, axis, split_axis=1, concat_axis=2, tiled=True)
        # y: (16, n1/D, n2, *b); local length-n2 NTT over axis 2.
        # fold the row axis into the batch for the radix-2 kernel
        folded = jnp.moveaxis(y, 1, -1)  # (16, n2, *b, rows)
        out = ntt._fft_core(folded, n2, inverse)
        out = jnp.moveaxis(out, -1, 1)  # (16, rows, n2, *b)
        if inverse:
            # _fft_core scaled by 1/n2; complete to 1/n with 1/n1
            n1_inv = FR.encode([pow(n1, -1, R)])
            c = jnp.asarray(np.asarray(n1_inv, dtype=np.uint32)).reshape(
                (16,) + (1,) * (out.ndim - 1)
            )
            out = FrField.mul(out, jnp.broadcast_to(c, out.shape))
        return out

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, None, axis),
        out_specs=P(None, axis, None),
        check_rep=False,
    )
    reshaped = values.reshape((16, n1, n2) + batch)
    out = fn(reshaped)  # (16, n1, n2, *batch) with rows k1 sharded
    # natural order: X[k1 + n1*k2] => arrange as (k2-major, k1-minor)
    out = jnp.moveaxis(out, 1, 2)  # (16, n2, n1, *batch): [k2][k1]
    return out.reshape((16, n) + batch)
