"""Batched Pippenger multi-scalar multiplication on TPU.

Replaces ark-ec VariableBaseMSM (reference: rln/src/partial_proof.rs:98-104
and ark-groth16's internal MSMs). The workload shape is RLN-specific: every
MSM in Groth16 proving uses a *fixed* base set (the zkey's a/b1/b2/h/l query
points, circuit scale ~6-8K points) and a *batch* of per-proof scalar vectors.

TPU-first formulation — wide data-parallel steps, logarithmic sequential
depth (a sequential bucket-scatter loop is pathological on TPU):

  * Fixed-base window tables: T[w][i] = 2^(8w) * P_i precomputed once on
    device (8-bit windows, 32 windows, ~24 MB per G1 query set). Removes all
    doublings from the MSM itself, so window sums combine with a plain tree.
  * Per window: digits sorted per batch lane (jnp.argsort), points gathered
    in sorted order, and bucket sums computed with ONE segmented
    jax.lax.associative_scan whose combiner is the branchless Jacobian add —
    work-efficient (~2n point adds) and only ~2 log n wide steps deep.
  * Segment-end elements scatter into the 256 buckets; the weighted sum
    sum_j j*B_j is a reverse associative_scan (suffix sums) plus a tree
    reduction. Digit 0 lands in an ignored bucket, so zero scalars and
    masked-out points (partial proofs) are free and branchless.
  * Windows are processed in small groups to bound the gathered-points
    footprint; group results combine by tree.

Multi-chip: points shard over the mesh's "tp" axis; per-shard accumulators
combine with all_gather + EC tree reduction (parallel/sharded.py).
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
WINDOW_GROUP = 2  # windows processed per sorted-scan pass


def _one_mont(adapter, like):
    """Field one as (16, C, 1...) broadcastable against (16, C, *batch)."""
    one = np.zeros((NUM_LIMBS, adapter.components) + (1,) * (like.ndim - 2), dtype=np.uint32)
    idx = (slice(None), 0) + (0,) * (like.ndim - 2)
    one[idx] = FQ.one_mont
    return jnp.asarray(one)


def _tree_sum(cv: CurveOps, arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """EC tree reduction along `axis` of a (16, C, 3, ...) Jacobian array."""
    size = arr.shape[axis]
    while size > 1:
        half = size // 2
        left = jax.lax.slice_in_dim(arr, 0, half, axis=axis)
        right = jax.lax.slice_in_dim(arr, half, 2 * half, axis=axis)
        combined = cv.add(left, right)
        if size % 2:
            tail = jax.lax.slice_in_dim(arr, 2 * half, size, axis=axis)
            combined = jnp.concatenate([combined, tail], axis=axis)
        arr = combined
        size = arr.shape[axis]
    return jnp.squeeze(arr, axis=axis)


def precompute_window_tables(adapter, points_aff: jnp.ndarray) -> jnp.ndarray:
    """points_aff: (16, C, 2, n) affine -> tables (16, C, 2, W, n) affine
    with tables[..., w, i] = 2^(8w) * P_i."""
    cv = CurveOps(adapter)
    one = _one_mont(adapter, points_aff[:, :, 0])
    jac = cv.jac_from_affine(points_aff, one)  # (16, C, 3, n)

    def step(carry, _):
        nxt = jax.lax.fori_loop(0, C_BITS, lambda _, a: cv.double(a), carry)
        return nxt, carry

    _, stacked = jax.lax.scan(step, jac, None, length=N_WINDOWS)  # (W, 16, C, 3, n)
    stacked = jnp.moveaxis(stacked, 0, 3)  # (16, C, 3, W, n)
    return cv.to_affine(stacked)  # (16, C, 2, W, n); infinity -> (0, 0)


def _digits_for_windows(scalars: jnp.ndarray, w0: int, count: int) -> jnp.ndarray:
    """scalars (16, n, B) canonical -> digits (count, n, B) for windows w0.."""
    rows = []
    for w in range(w0, w0 + count):
        limb = scalars[w // 2]
        shift = (w % 2) * 8
        rows.append((limb >> shift) & np.uint32(0xFF))
    return jnp.stack(rows, axis=0)


def _stage_sort_gather(adapter, pts, digits):
    """Sort digits per lane, gather points in sorted order, build Jacobians.

    pts: (16,C,2,G,n); digits: (G,n,B) -> (jac (16,C,3,G,n,B),
    sorted_digits (G,n,B)). No EC arithmetic — compiles fast.
    """
    cv = CurveOps(adapter)
    batch = digits.shape[2]
    one = _one_mont(adapter, jnp.zeros((NUM_LIMBS, adapter.components, batch), dtype=U32))
    order = jnp.argsort(digits, axis=1)
    sorted_digits = jnp.take_along_axis(digits, order, axis=1)
    pts_b = jnp.broadcast_to(pts[..., None], pts.shape + (batch,))
    idx_b = jnp.broadcast_to(
        order[None, None, None, :, :, :].astype(jnp.int32), pts_b.shape
    )
    gathered = jnp.take_along_axis(pts_b, idx_b, axis=4)
    jac = cv.jac_from_affine(gathered, one[:, :, None, None, :])
    return jac, sorted_digits


def _hs_masked_combine(cv, val, shifted_val, keep_old_mask):
    """One Hillis-Steele level: combine shifted into val except where masked."""
    merged = cv.add(shifted_val, val)
    return jnp.where(keep_old_mask, val, merged)


def _stage_segmented_scan(adapter, jac, sorted_digits):
    """Segmented inclusive scan of sorted Jacobians along the n axis.

    Hillis-Steele formulation: log2(n) identical levels, each a dynamic
    jnp.roll + one branchless EC add + selects, under a fori_loop — the whole
    scan is ONE small compiled program (the remote TPU compiler scales badly
    with module size, so per-level program reuse beats work-efficient
    scan shapes whose every level is a distinct large computation).
    """
    cv = CurveOps(adapter)
    n = jac.shape[4]
    log_n = max(1, (n - 1).bit_length())
    prev = jnp.concatenate(
        [jnp.full_like(sorted_digits[:, :1], 0xFFFFFFFF), sorted_digits[:, :-1]],
        axis=1,
    )
    flags = (sorted_digits != prev).astype(U32)[None, None, None]  # (1,1,1,G,n,B)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, n, 1), 4)

    def level(k, carry):
        val, flg = carry
        shift = jnp.int32(1) << k
        sval = jnp.roll(val, shift, axis=4)
        sflg = jnp.roll(flg, shift, axis=4)
        in_range = pos >= shift  # positions with a valid left neighbor
        # segmented HS: if own flag set (segment start seen), keep; else merge
        keep_old = jnp.logical_or(flg != 0, jnp.logical_not(in_range))
        val = _hs_masked_combine(cv, val, sval, keep_old)
        flg = jnp.where(in_range, flg | sflg, flg)
        return val, flg

    scanned, _ = jax.lax.fori_loop(0, log_n, level, (jac, flags))
    return scanned


def _hs_plain_scan(cv, arr, axis: int):
    """Inclusive EC-add prefix scan along `axis` (Hillis-Steele, one program)."""
    n = arr.shape[axis]
    log_n = max(1, (n - 1).bit_length())
    shape = [1] * arr.ndim
    shape[axis] = n
    pos = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)

    def level(k, val):
        shift = jnp.int32(1) << k
        sval = jnp.roll(val, shift, axis=axis)
        keep_old = pos < shift
        return _hs_masked_combine(cv, val, sval, keep_old)

    return jax.lax.fori_loop(0, log_n, level, arr)


def _stage_bucket_reduce(adapter, scanned, sorted_digits):
    """Extract segment-end bucket sums and compute S = sum_j j*B_j."""
    cv = CurveOps(adapter)
    gw, n, batch = sorted_digits.shape
    nxt = jnp.concatenate(
        [sorted_digits[:, 1:], jnp.full_like(sorted_digits[:, :1], 0xFFFFFFFF)],
        axis=1,
    )
    is_end = sorted_digits != nxt
    target = jnp.where(is_end, sorted_digits, N_BUCKETS).astype(jnp.int32)
    g_idx = jnp.broadcast_to(jnp.arange(gw, dtype=jnp.int32)[:, None, None], target.shape)
    b_idx = jnp.broadcast_to(
        jnp.arange(batch, dtype=jnp.int32)[None, None, :], target.shape
    )
    buckets = jnp.zeros(
        (NUM_LIMBS, adapter.components, 3, gw, N_BUCKETS + 1, batch), dtype=U32
    )
    buckets = buckets.at[:, :, :, g_idx, target, b_idx].set(scanned)
    buckets = buckets[:, :, :, :, 1:N_BUCKETS]  # drop bucket 0 and the dummy
    # suffix sums = flip . prefix-scan . flip; S = last prefix of the suffixes
    suffix = jnp.flip(_hs_plain_scan(cv, jnp.flip(buckets, axis=4), 4), axis=4)
    totals = _hs_plain_scan(cv, suffix, 4)
    return totals[:, :, :, :, -1]  # (16, C, 3, G, B)


@functools.lru_cache(maxsize=None)
def _stage_fns(adapter):
    return (
        jax.jit(functools.partial(_stage_sort_gather, adapter)),
        jax.jit(functools.partial(_stage_segmented_scan, adapter)),
        jax.jit(functools.partial(_stage_bucket_reduce, adapter)),
        jax.jit(
            functools.partial(
                lambda ad, arr: _hs_plain_scan(CurveOps(ad), arr, 3)[:, :, :, -1],
                adapter,
            )
        ),
    )


def msm_from_tables(adapter, tables: jnp.ndarray, scalars: jnp.ndarray) -> jnp.ndarray:
    """tables: (16, C, 2, W, n); scalars: (16, n, B) canonical limbs.
    Returns Jacobian accumulators (16, C, 3, B).

    Orchestrated as separately-jitted stages per window group: each stage
    program is small (the remote TPU compiler scales badly with module size)
    and reused across groups, MSMs, and query sets of the same shape.
    """
    n = tables.shape[4]
    batch = scalars.shape[2]
    sort_fn, scan_fn, reduce_fn, final_fn = _stage_fns(adapter)

    assert N_WINDOWS % WINDOW_GROUP == 0
    n_groups = N_WINDOWS // WINDOW_GROUP
    all_digits = _digits_for_windows(scalars, 0, N_WINDOWS)  # (W, n, B)
    digits_g = all_digits.reshape(n_groups, WINDOW_GROUP, n, batch)
    tables_g = tables.reshape(NUM_LIMBS, adapter.components, 2, n_groups, WINDOW_GROUP, n)
    sums = []
    for g in range(n_groups):
        jac, sd = sort_fn(tables_g[:, :, :, g], digits_g[g])
        scanned = scan_fn(jac, sd)
        sums.append(reduce_fn(scanned, sd))
    all_windows = jnp.concatenate(sums, axis=3)  # (16, C, 3, W, B)
    return final_fn(all_windows)


def msm_accumulate(adapter, points, scalars):
    """One-shot MSM from affine points (tables built in-trace); used by the
    sharded path. For repeated MSMs over the same bases use the MSM class,
    which caches the window tables."""
    tables = precompute_window_tables(adapter, points)
    return msm_from_tables(adapter, tables, scalars)


PAD_GRANULARITY = 4096  # base sets pad up so equal-size MSMs share a compile


class MSM:
    """MSM over one fixed base set. adapter = FqAdapter (G1) / Fq2Adapter (G2).

    The base set is padded (with infinity points / zero scalars) to a
    multiple of PAD_GRANULARITY so that the a/b1/l/h query MSMs of a circuit
    all compile to the same program shape — compilation of the big MSM
    program is expensive and cached per shape.
    """

    def __init__(self, points, adapter):
        """points: list of affine points as ints (G1: (x, y); G2:
        ((x0,x1),(y0,y1))). None encodes the point at infinity."""
        self.adapter = adapter
        self.curve = CurveOps(adapter)
        self.n_real = len(points)
        pad_to = max(
            PAD_GRANULARITY,
            ((len(points) + PAD_GRANULARITY - 1) // PAD_GRANULARITY) * PAD_GRANULARITY,
        )
        if len(points) > 64:
            points = list(points) + [None] * (pad_to - len(points))
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
        self._tables = None
        # NOTE: msm_from_tables orchestrates its own per-stage jits; wrapping
        # it in an outer jit would inline them back into one huge program.
        self._msm_fn = functools.partial(msm_from_tables, adapter)
        self._finish_fn = jax.jit(self.curve.to_affine)

    def tables(self) -> jnp.ndarray:
        if self._tables is None:
            build = jax.jit(functools.partial(precompute_window_tables, self.adapter))
            self._tables = build(self.points)
        return self._tables

    def __call__(
        self, scalars_canon: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """scalars_canon: (16, n_real, B) canonical limbs. mask: optional
        (n_real, B) bool — points with False contribute nothing (partial-proof
        splits). Returns Jacobian accumulators (16, C, 3, B)."""
        if scalars_canon.shape[1] != self.n_real:
            raise ValueError(
                f"expected {self.n_real} scalars, got {scalars_canon.shape[1]}"
            )
        scalars = jnp.asarray(scalars_canon)
        if mask is not None:
            scalars = jnp.where(jnp.asarray(mask)[None], scalars, 0)
        if self.n != self.n_real:
            pad = jnp.zeros(
                (NUM_LIMBS, self.n - self.n_real, scalars.shape[2]), dtype=U32
            )
            scalars = jnp.concatenate([scalars, pad], axis=1)
        return self._msm_fn(self.tables(), scalars)

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
