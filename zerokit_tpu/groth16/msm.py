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
  * Per window: digits sorted per batch lane (jnp.argsort) and points
    gathered in sorted order, so "all points with digit <= d" is a prefix.
  * EC points form a GROUP (subtraction = add with negated Y), so bucket
    sums never need a segmented scan: with Q_d = prefix sum of the first
    C(d) sorted points (C(d) = #digits <= d), the window result telescopes:
        sum_{d=1..255} d * B_d  =  255 * S_total - sum_{d=0..254} Q_d.
    The 255 prefix values come from a Fenwick-style query over an up-sweep
    reduction tree: n-1 adds build the tree (levels kept), then each Q_d is
    <= log2(n) masked adds over width-255 lanes. Total EC work per window is
    ~n + 14*255 adds — work-optimal, no log(n) blowup on the wide axis.
  * Digit 0 contributes to every Q_d equally and cancels in the telescope,
    so zero scalars and masked-out points (partial proofs) are free.
  * Windows are processed in groups sized to bound the reduction-tree
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
from .curve import CurveOps, best_curve_ops

C_BITS = 8
N_BUCKETS = 1 << C_BITS
N_WINDOWS = 32  # 256 bits / 8
# Window-group size: bounds the reduction-tree footprint. The up-sweep keeps
# ~2x the base level resident: 384 * C * G * n * B bytes; cap C*G*B so the
# peak stays a few GB at n = 8192.
MAX_CGB = 1024


def _identity_np(adapter, shape):
    """Projective identity (0, 1, 0) as a host array of the given shape
    (16, C, 3, *batch); Y's component 0 is one in Montgomery form."""
    out = np.zeros(shape, dtype=np.uint32)
    one = FQ.one_mont.reshape((NUM_LIMBS,) + (1,) * (len(shape) - 3))
    out[:, 0, 1] = np.broadcast_to(one, (NUM_LIMBS,) + shape[3:])
    return out


def precompute_window_tables(adapter, points_aff: jnp.ndarray) -> jnp.ndarray:
    """points_aff: (16, C, 2, n) affine -> tables (16, C, 2, W, n) affine
    with tables[..., w, i] = 2^(8w) * P_i."""
    cv = best_curve_ops(adapter)
    proj = cv.from_affine(points_aff)  # (16, C, 3, n)

    def step(carry, _):
        nxt = jax.lax.fori_loop(0, C_BITS, lambda _, a: cv.double(a), carry)
        return nxt, carry

    _, stacked = jax.lax.scan(step, proj, None, length=N_WINDOWS)  # (W, 16, C, 3, n)
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


def tables_to_aos(adapter, tables: jnp.ndarray) -> jnp.ndarray:
    """(16, C, 2, W, n) SoA tables -> (W*n, 16*C*2) AoS point rows.

    TPU gathers cost ~per indexed slice, so gathering 128-byte CONTIGUOUS
    point rows along the leading axis is ~40x faster than a strided
    take_along_axis over the SoA layout. Row word order is limb-major
    (limb, comp, coord) so the transpose back to SoA is a pure reshape.
    """
    w, n = tables.shape[3], tables.shape[4]
    t = jnp.transpose(tables, (3, 4, 0, 1, 2))  # (W, n, 16, C, 2)
    return t.reshape(w * n, NUM_LIMBS * adapter.components * 2)


def _stage_sort_gather(adapter, tables_aos, digits, n, pad_to):
    """Sort digits per lane and gather points in sorted order (kept AFFINE —
    the base tree level enters through mixed addition).

    tables_aos: (G*n, K) AoS point rows; digits: (G,n,B) ->
    (16,C,2,G,pad_to,B) SoA. The gather moves contiguous 128-byte rows; one
    transpose converts back to the SoA kernel layout. The tail [n:pad_to] is
    padded with the (0, 0) infinity sentinel so the up-sweep tree is a
    perfect binary tree.
    """
    gw, _, batch = digits.shape
    order = jnp.argsort(digits, axis=1)  # (G, n, B)
    base = (jnp.arange(gw, dtype=jnp.int32) * n)[:, None, None]
    flat = (base + order.astype(jnp.int32)).reshape(-1)
    rows = jnp.take(tables_aos, flat, axis=0)  # (G*n*B, K) contiguous rows
    soa = rows.T.reshape(NUM_LIMBS, adapter.components, 2, gw, n, batch)
    if pad_to > n:
        pad_shape = soa.shape[:4] + (pad_to - n,) + soa.shape[5:]
        soa = jnp.concatenate([soa, jnp.zeros(pad_shape, dtype=U32)], axis=4)
    return soa


def _stage_counts(digits):
    """digits (G,n,B) -> counts (G,255,B) int32 with counts[d] = #(digit <= d).

    Integer-only histogram + cumsum; order-independent so the unsorted digits
    work as well as the sorted ones.
    """
    gw, n, batch = digits.shape
    d32 = digits.astype(jnp.int32)
    g_idx = jnp.broadcast_to(jnp.arange(gw, dtype=jnp.int32)[:, None, None], d32.shape)
    b_idx = jnp.broadcast_to(jnp.arange(batch, dtype=jnp.int32)[None, None, :], d32.shape)
    hist = jnp.zeros((gw, N_BUCKETS, batch), dtype=jnp.int32)
    hist = hist.at[g_idx, d32, b_idx].add(1)
    return jnp.cumsum(hist, axis=1)[:, : N_BUCKETS - 1]


def _stage_upsweep0(adapter, aff):
    """First reduction-tree level from the sorted AFFINE base: promote the
    even elements to projective and mixed-add the odd ones.
    (16,C,2,G,m,B) -> (16,C,3,G,m/2,B)."""
    cv = best_curve_ops(adapter)
    return cv.add_mixed(cv.from_affine(aff[:, :, :, :, 0::2]), aff[:, :, :, :, 1::2])


def _stage_upsweep(adapter, arr):
    """One reduction-tree level: combine adjacent pairs along the n axis.
    (16,C,3,G,m,B) -> (16,C,3,G,m/2,B)."""
    cv = best_curve_ops(adapter)
    return cv.add(arr[:, :, :, :, 0::2], arr[:, :, :, :, 1::2])


def _stage_downsweep(adapter, x_parent, level_even):
    """One Blelloch down-sweep level: exclusive block prefixes at granularity
    2^k -> granularity 2^(k-1).

    x_parent: (16,C,3,G,m,B); level_even: sums of the LEFT children (the even
    entries of the 2^(k-1) up-sweep level) — projective (coords 3) or the
    affine base (coords 2, entering through mixed addition). Left children
    inherit the parent prefix; right children add the left-child sum.
    """
    cv = best_curve_ops(adapter)
    if level_even.shape[2] == 2:
        right = cv.add_mixed(x_parent, level_even)
    else:
        right = cv.add(x_parent, level_even)
    both = jnp.stack([x_parent, right], axis=5)  # (...,m,2,B)
    s = both.shape
    return both.reshape(s[:4] + (s[4] * 2,) + s[6:])


def _stage_qsum(adapter, x_base, s_total, counts, n_real):
    """Gathers Q_d = (exclusive prefix at C(d)) for d = 0..254.

    x_base: (16,C,3,G,n,B) exclusive prefixes over the sorted base;
    s_total: (16,C,3,G,1,B) full sums; counts: (G,255,B) with C(d) <= n_real.
    Returns the Q_d values (16,C,3,G,255,B); C(d) = n_real selects S_total.
    """
    n = x_base.shape[4]
    idx = jnp.minimum(counts, n - 1).astype(jnp.int32)
    shape = x_base.shape[:4] + idx.shape[1:]
    idx_b = jnp.broadcast_to(idx[None, None, None], shape)
    gathered = jnp.take_along_axis(x_base, idx_b, axis=4)  # (16,C,3,G,255,B)
    full = (counts >= n_real)[None, None, None]
    q = jnp.where(full, jnp.broadcast_to(s_total, gathered.shape), gathered)
    return q


def _stage_window_finish(adapter, sum_q, s_total):
    """Window result from the telescoped bucket identity:
    sum_{d=1..255} d*B_d = 255*S_total - sum_{d=0..254} Q_d."""
    cv = best_curve_ops(adapter)
    t = s_total
    for _ in range(8):
        t = cv.double(t)  # 256 * S
    t = cv.add(t, cv.neg(s_total))  # 255 * S
    return cv.add(t, cv.neg(sum_q))


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
        merged = cv.add(sval, val)
        return jnp.where(keep_old, val, merged)

    return jax.lax.fori_loop(0, log_n, level, arr)


@functools.lru_cache(maxsize=None)
def _stage_fns(adapter):
    return {
        "sort": jax.jit(
            functools.partial(_stage_sort_gather, adapter), static_argnums=(2, 3)
        ),
        "counts": jax.jit(_stage_counts),
        "upsweep0": jax.jit(functools.partial(_stage_upsweep0, adapter)),
        "upsweep": jax.jit(functools.partial(_stage_upsweep, adapter)),
        "downsweep": jax.jit(functools.partial(_stage_downsweep, adapter)),
        "qsum": jax.jit(functools.partial(_stage_qsum, adapter), static_argnums=3),
        "finish": jax.jit(functools.partial(_stage_window_finish, adapter)),
        "final": jax.jit(
            functools.partial(
                lambda ad, arr: _hs_plain_scan(best_curve_ops(ad), arr, 3)[:, :, :, -1],
                adapter,
            )
        ),
    }


def _window_group(batch: int, components: int) -> int:
    g = 32
    while g > 2 and g * batch * components > MAX_CGB:
        g //= 2
    return g


def msm_from_tables(
    adapter, tables_aos: jnp.ndarray, scalars: jnp.ndarray, n: int
) -> jnp.ndarray:
    """tables_aos: (W*n, 16*C*2) AoS rows (tables_to_aos); scalars:
    (16, n, B) canonical limbs. Returns projective accumulators (16, C, 3, B).

    Orchestrated as separately-jitted stages per window group: each stage
    program is small (the remote TPU compiler scales badly with module size)
    and reused across groups, MSMs, and query sets of the same shape. The
    up/down-sweep stages recompile per tree level, but each program holds a
    single EC add (a Pallas kernel on TPU).
    """
    batch = scalars.shape[2]
    fns = _stage_fns(adapter)
    n_pad = 1 << max(1, (n - 1).bit_length())

    group = _window_group(batch, adapter.components)
    assert N_WINDOWS % group == 0
    n_groups = N_WINDOWS // group
    all_digits = _digits_for_windows(scalars, 0, N_WINDOWS)  # (W, n, B)
    digits_g = all_digits.reshape(n_groups, group, n, batch)
    tables_g = tables_aos.reshape(n_groups, group * n, tables_aos.shape[1])
    sums = []
    for g in range(n_groups):
        # levels[0] is the sorted AFFINE base; levels[k>=1] are projective
        # sums of blocks of 2^k sorted points
        levels = [fns["sort"](tables_g[g], digits_g[g], n, n_pad)]
        counts = fns["counts"](digits_g[g])
        if levels[0].shape[4] > 1:
            levels.append(fns["upsweep0"](levels[0]))
        while levels[-1].shape[4] > 1:
            levels.append(fns["upsweep"](levels[-1]))
        # Blelloch down-sweep: exclusive prefixes at every base position
        x = jnp.asarray(
            _identity_np(
                adapter, (NUM_LIMBS, adapter.components, 3, group, 1, batch)
            )
        )
        for level in levels[-2::-1]:
            x = fns["downsweep"](x, level[:, :, :, :, 0::2])
        q = fns["qsum"](x, levels[-1], counts, n)
        # tree-reduce the 255 queries (pad to 256 with the identity)
        pad = jnp.asarray(_identity_np(adapter, q[:, :, :, :, :1].shape))
        acc = jnp.concatenate([q, pad], axis=4)
        while acc.shape[4] > 1:
            acc = fns["upsweep"](acc)
        sums.append(fns["finish"](acc[:, :, :, :, 0], levels[-1][:, :, :, :, 0]))
    all_windows = jnp.concatenate(sums, axis=3)  # (16, C, 3, W, B)
    return fns["final"](all_windows)


def msm_accumulate(adapter, points, scalars):
    """One-shot MSM from affine points (tables built in-trace); used by the
    sharded path. For repeated MSMs over the same bases use the MSM class,
    which caches the window tables."""
    tables = precompute_window_tables(adapter, points)
    return msm_from_tables(
        adapter, tables_to_aos(adapter, tables), scalars, tables.shape[4]
    )


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
        """AoS window-table rows (W*n, 16*C*2) — the gather-friendly layout."""
        if self._tables is None:
            build = jax.jit(
                lambda pts: tables_to_aos(
                    self.adapter, precompute_window_tables(self.adapter, pts)
                )
            )
            self._tables = build(self.points)
        return self._tables

    def __call__(
        self, scalars_canon: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """scalars_canon: (16, n_real, B) canonical limbs. mask: optional
        (n_real, B) bool — points with False contribute nothing (partial-proof
        splits). Returns projective accumulators (16, C, 3, B)."""
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
        return self._msm_fn(self.tables(), scalars, self.n)

    def to_affine_ints(self, acc):
        """Projective accumulators -> list of host affine points (None = inf)."""
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
