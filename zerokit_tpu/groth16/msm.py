"""Batched Pippenger multi-scalar multiplication on TPU.

Replaces ark-ec VariableBaseMSM (reference: rln/src/partial_proof.rs:98-104
and ark-groth16's internal MSMs). The workload shape is RLN-specific: every
MSM in Groth16 proving uses a *fixed* base set (the zkey's a/b1/b2/h/l query
points, circuit scale ~6-8K points) and a *batch* of per-proof scalar vectors.

v0 formulation (correctness-first, fully vectorized over the proof batch):
  * 8-bit windows, most-significant first: acc = 256*acc + S_w per window.
  * Per window, bucket accumulation is a lax.scan over the points: one step
    gathers each batch lane's digit-selected bucket, mixed-adds the shared
    affine point, and scatters back — 256 Jacobian buckets per lane resident
    as the scan carry.
  * Digit 0 lands in bucket 0 which the weighted reduction ignores, so zero
    scalars and masked-out points (partial proofs, rln/src/partial_proof.rs
    mask semantics) cost nothing and need no branches.
  * S_w = sum_j j*B_j via 255 suffix-sum additions.

The scan-over-points structure is the TPU analog of bucket scatter;
per-window state is ~50KB/lane and stays on-device. Multi-chip: points are
sharded across devices and partial accumulators psum-reduced
(parallel/msm_sharded.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.field import FQ, NUM_LIMBS, U32
from ..ff.fq2 import Fq2Adapter, FqAdapter
from .curve import CurveOps

C_BITS = 8
N_BUCKETS = 1 << C_BITS
N_WINDOWS = 32  # 256 bits / 8


def _one_mont(adapter, like):
    """Field one as (16, C, 1...) broadcastable against (16, C, *batch)."""
    one = np.zeros((NUM_LIMBS, adapter.components) + (1,) * (like.ndim - 2), dtype=np.uint32)
    idx = (slice(None), 0) + (0,) * (like.ndim - 2)
    one[idx] = FQ.one_mont
    return jnp.asarray(one)


def msm_accumulate(adapter, points, scalars):
    """Pure traceable MSM core: windowed bucket accumulation over all points.

    points: (16, C, 2, n) affine Montgomery; scalars: (16, n, B) canonical.
    Returns Jacobian accumulators (16, C, 3, B). Composable under jit /
    shard_map (the multi-chip MSM shards the n axis and adds the partial
    accumulators across devices).
    """
    cv = CurveOps(adapter)
    batch = scalars.shape[2]
    one = _one_mont(adapter, jnp.zeros((NUM_LIMBS, adapter.components, batch), dtype=U32))

    def window_body(acc, w):
        limb_idx = w // 2
        shift = (w % 2) * 8
        digit_row = (jnp.take(scalars, limb_idx, axis=0) >> shift) & np.uint32(0xFF)

        buckets = jnp.zeros(
            (NUM_LIMBS, adapter.components, 3, N_BUCKETS, batch), dtype=U32
        )

        def acc_body(buckets, inputs):
            pt, digits = inputs
            d = digits[None, None, None, None, :]
            cur = jnp.take_along_axis(buckets, d.astype(jnp.int32), axis=3)[:, :, :, 0]
            q = jnp.broadcast_to(pt[:, :, :, None], cur[:, :, 0:2].shape)
            new = cv.add_mixed(cur, q, one)
            return _scatter_bucket(buckets, digits, new), None

        pts_scan = jnp.moveaxis(points, 3, 0)  # (n, 16, C, 2)
        buckets, _ = jax.lax.scan(acc_body, buckets, (pts_scan, digit_row))

        def suffix_body(carry, bucket):
            running, total = carry
            running = cv.add(running, bucket)
            total = cv.add(total, running)
            return (running, total), None

        buckets_rev = jnp.moveaxis(buckets, 3, 0)[::-1][:-1]
        zero = jnp.zeros((NUM_LIMBS, adapter.components, 3, batch), dtype=U32)
        (_, s_w), _ = jax.lax.scan(suffix_body, (zero, zero), buckets_rev)

        acc = jax.lax.fori_loop(0, C_BITS, lambda _, a: cv.double(a), acc)
        return cv.add(acc, s_w)

    acc0 = jnp.zeros((NUM_LIMBS, adapter.components, 3, batch), dtype=U32)
    return jax.lax.fori_loop(
        0, N_WINDOWS, lambda i, a: window_body(a, N_WINDOWS - 1 - i), acc0
    )


class MSM:
    """MSM over one base set. adapter = FqAdapter (G1) or Fq2Adapter (G2)."""

    def __init__(self, points, adapter):
        """points: list of affine points as ints (G1: (x, y); G2: ((x0,x1),(y0,y1))).
        The point at infinity is encoded (0, 0)."""
        self.adapter = adapter
        self.curve = CurveOps(adapter)
        self.n = len(points)
        if adapter is FqAdapter:
            flat = []
            for p in points:
                x, y = (0, 0) if p is None else p
                flat.extend([x, y])
            enc = adapter.encode(flat)  # (16, 1, 2n)
        else:
            flat = []
            for p in points:
                if p is None:
                    flat.extend([(0, 0), (0, 0)])
                else:
                    flat.extend([p[0], p[1]])
            enc = adapter.encode(flat)  # (16, 2, 2n)
        enc = np.asarray(enc).reshape(NUM_LIMBS, adapter.components, self.n, 2)
        self.points = jnp.asarray(np.moveaxis(enc, 3, 2))  # (16, C, 2, n)
        self._msm_fn = jax.jit(functools.partial(msm_accumulate, adapter))
        self._finish_fn = jax.jit(self._finish)

    def _finish(self, acc):
        return self.curve.to_affine(acc)

    # -- public API ---------------------------------------------------------

    def __call__(
        self, scalars_canon: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """scalars_canon: (16, n, B) canonical limbs. mask: optional (n, B)
        bool — points with False contribute nothing (partial-proof splits).
        Returns Jacobian accumulators (16, C, 3, B)."""
        if scalars_canon.shape[1] != self.n:
            raise ValueError(f"expected {self.n} scalars, got {scalars_canon.shape[1]}")
        scalars = jnp.asarray(scalars_canon)
        if mask is not None:
            scalars = jnp.where(jnp.asarray(mask)[None], scalars, 0)
        return self._msm_fn(self.points, scalars)

    def to_affine_ints(self, acc):
        """Jacobian accumulators -> list of host affine points (None = inf)."""
        aff = np.asarray(self._finish_fn(acc))
        batch = aff.shape[3]
        out = []
        for b in range(batch):
            if self.adapter is FqAdapter:
                x = FQ.decode(aff[:, 0, 0, b].reshape(NUM_LIMBS, 1))[0]
                y = FQ.decode(aff[:, 0, 1, b].reshape(NUM_LIMBS, 1))[0]
                out.append(None if (x == 0 and y == 0) else (int(x), int(y)))
            else:
                x0 = FQ.decode(aff[:, 0, 0, b].reshape(NUM_LIMBS, 1))[0]
                x1 = FQ.decode(aff[:, 1, 0, b].reshape(NUM_LIMBS, 1))[0]
                y0 = FQ.decode(aff[:, 0, 1, b].reshape(NUM_LIMBS, 1))[0]
                y1 = FQ.decode(aff[:, 1, 1, b].reshape(NUM_LIMBS, 1))[0]
                inf = x0 == x1 == y0 == y1 == 0
                out.append(None if inf else ((int(x0), int(x1)), (int(y0), int(y1))))
        return out


def _scatter_bucket(buckets, digits, new):
    """buckets: (16,C,3,256,B); digits: (B,); new: (16,C,3,B)."""
    b_idx = jnp.arange(buckets.shape[4])
    return buckets.at[:, :, :, digits.astype(jnp.int32), b_idx].set(new)
