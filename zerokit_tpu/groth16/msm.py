"""Batched Pippenger multi-scalar multiplication on TPU.

Replaces ark-ec VariableBaseMSM (reference: rln/src/partial_proof.rs:98-104
and ark-groth16's internal MSMs). The workload shape is RLN-specific: every
MSM in Groth16 proving uses a *fixed* base set (the zkey's a/b1/b2/h/l query
points, circuit scale ~6-8K points) and a *batch* of per-proof scalar vectors.

TPU-first formulation — wide data-parallel steps, small sequential depth:

  * Fixed-base window tables: T[w][i] = 2^(8w) * P_i precomputed once on
    device (8-bit windows, 32 windows, ~24 MB per G1 query set). Removes all
    doublings from the MSM itself.
  * Per window: digits sorted per batch lane (jnp.argsort) and points
    gathered in sorted order, so "all points with digit <= d" is a prefix.
  * EC points form a GROUP (subtraction = add with negated Y), so bucket
    sums never need a segmented scan: with Q_d = prefix sum of the first
    C(d) sorted points (C(d) = #digits <= d), the window result telescopes:
        sum_{d=1..255} d * B_d  =  255 * S_total - sum_{d=0..254} Q_d.
  * The prefix sums come from a two-level scan: intra-block inclusive
    prefixes over blocks of K=32 sorted points (K-1 wide mixed-adds),
    exclusive Hillis-Steele prefixes across the n/K block totals, then
    Q_d = block_prefix[(C(d)-1) div K] + fine_prefix[C(d)-1] — two gathers
    plus one wide add per window. ~n + O(n/K log n) EC adds total.
  * COMPILE ECONOMY is a design axis: XLA compiles of EC-arithmetic programs
    are expensive (~20s each on the remote TPU compiler; measured ~50x
    worse when the EC op sits inside an XLA while loop on CPU). So every
    primitive here is a small LOOP-FREE program compiled once per shape, and
    all sequential structure (the K-1 scan steps, the log-depth
    Hillis-Steele rounds) is sequenced eagerly from the host. ~7 EC programs
    per curve cover the whole MSM.
  * Digit 0 contributes to every Q_d equally and cancels in the telescope,
    so zero scalars and masked-out points (partial proofs) are free.
  * Windows are processed in groups sized to bound the prefix-array
    footprint; group results combine across windows with one more scan.

Every pipeline array carries a leading shard axis S (size 1 on a single
device) so the tensor-parallel path (parallel/sharded.py) reuses this exact
orchestration with shard_map-wrapped primitives: points shard over the mesh
"tp" axis, batches over "dp", and only the final (16*C*3*B)-word
accumulators cross chips.
"""

from __future__ import annotations

import functools
import os
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
# Window-group size: bounds the prefix-array footprint. The block scan keeps
# the projective fine-prefix array resident: 192 * C * G * n * B bytes; cap
# C*G*B so the peak stays a few GB at n = 8192. ZK_MAX_CGB overrides for
# batch-class experiments (tools/msm_profile.py).
MAX_CGB = int(os.environ.get("ZK_MAX_CGB", "1024"))
K_BLOCK = 32  # intra-block scan length (n is padded to a multiple)
# Base sets pad up so equal-size MSMs share a compile. 2048 (not 4096) since
# round 5: the depth-20 query sets (5,851 points) land on n = 6144 instead of
# 8192 — 25% less sort/gather/fine-scan work in four of the five proving MSMs
# (the h query is exactly the 8192 domain and keeps its own class). The fused
# sort handles non-power-of-two n via ceil-log2 packed keys.
PAD_GRANULARITY = 2048
# Max lanes per pipeline pass: larger batches stream through the SAME
# compiled programs in LANE_BATCH-sized chunks. The pin exists because every
# batch size class is a fresh set of program shapes (a multi-minute compile
# storm the first time) and scales the fine-prefix intermediates; 16 pins
# both to the B=16 class. Round-5 measurement on the real chip
# (tools/msm_profile.py, G1 n=8192): the per-pass fixed dispatch+XLA-glue
# cost amortizes with the class size, so the TPU default is raised where
# the measurement supports it; XLA:CPU keeps 16 (its compile cost per class
# is far worse and the virtual-mesh tests never stream big batches).
# Override with ZK_LANE_BATCH=<n>.


@functools.lru_cache(maxsize=None)
def _default_lane_batch() -> int:
    import os

    forced = os.environ.get("ZK_LANE_BATCH")
    if forced:
        return int(forced)
    from ..ff import pallas_field as pf

    return 64 if pf.available() else 16


def __getattr__(name: str):
    """LANE_BATCH is resolved LAZILY (PEP 562): computing it probes
    jax.devices(), and doing that at import time initializes the JAX backend
    before entry points (dryrun subprocesses, tests) can pin the platform —
    on an accelerator-attached host that silently breaks the virtual
    8-device CPU mesh. Import sites must read it at call time."""
    if name == "LANE_BATCH":
        return _default_lane_batch()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def encode_affine_points(points, adapter) -> np.ndarray:
    """Host affine points (ints; None = infinity) -> (16, C, 2, n) u32.

    G1 points are (x, y); G2 points are ((x0,x1), (y0,y1)). The (0, 0)
    encoding of infinity matches the zkey sentinel convention."""
    if adapter is FqAdapter:
        flat = []
        for p in points:
            x, y = (0, 0) if p is None else p
            flat.extend([x, y])
    else:
        flat = []
        for p in points:
            if p is None:
                flat.extend([(0, 0), (0, 0)])
            else:
                flat.extend([p[0], p[1]])
    enc = np.asarray(adapter.encode(flat)).reshape(
        NUM_LIMBS, adapter.components, len(points), 2
    )
    return np.moveaxis(enc, 3, 2)  # (16, C, 2, n)


# ---------------------------------------------------------------------------
# Loop-free primitive programs (leading shard axis S; bodies squeeze it)
# ---------------------------------------------------------------------------


def _squeezed(fn):
    """Wraps a body over squeezed arrays into the S-leading convention."""

    @functools.wraps(fn)
    def wrapped(*args):
        return fn(*(a[0] if hasattr(a, "ndim") and a.ndim > 0 else a for a in args))

    return wrapped


def _sort_gather_body(adapter, tables_aos, digits, n):
    """Sort digits per lane, gather AoS point rows in sorted order.

    tables_aos: (G*n, K) rows; digits: (G,n,B) -> (16,C,2,G,n,B) SoA affine.
    Gathering contiguous 128-byte rows along the leading axis is ~40x faster
    on TPU than a strided take_along_axis over the SoA layout.
    """
    gw, _, batch = digits.shape
    order = jnp.argsort(digits, axis=1)  # (G, n, B)
    base = (jnp.arange(gw, dtype=jnp.int32) * n)[:, None, None]
    flat = (base + order.astype(jnp.int32)).reshape(-1)
    rows = jnp.take(tables_aos, flat, axis=0)  # (G*n*B, K) contiguous rows
    return rows.T.reshape(NUM_LIMBS, adapter.components, 2, gw, n, batch)


def _counts_body(digits, n_buckets: int = N_BUCKETS):
    """digits (G,n,B) -> counts (G,nb-1,B) int32 with counts[d] = #(digit <= d)."""
    gw, n, batch = digits.shape
    d32 = digits.astype(jnp.int32)
    g_idx = jnp.broadcast_to(jnp.arange(gw, dtype=jnp.int32)[:, None, None], d32.shape)
    b_idx = jnp.broadcast_to(jnp.arange(batch, dtype=jnp.int32)[None, None, :], d32.shape)
    hist = jnp.zeros((gw, n_buckets, batch), dtype=jnp.int32)
    hist = hist.at[g_idx, d32, b_idx].add(1)
    return jnp.cumsum(hist, axis=1)[:, : n_buckets - 1]


def _mixed_step_body(cv, prev, blocks, j):
    """One intra-block scan step: prev + blocks[..., j, :] (j traced)."""
    col = jax.lax.dynamic_index_in_dim(blocks, j, axis=5, keepdims=False)
    return cv.add_mixed(prev, col)


def _hs_step_body(cv, arr, shift, axis):
    """One Hillis-Steele round: arr[i] += arr[i - shift] where defined."""
    shape = [1] * arr.ndim
    shape[axis] = arr.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    sval = jnp.roll(arr, shift, axis=axis)
    return jnp.where(pos < shift, arr, cv.add(sval, arr))


def _excl_shift_body(cv, arr, axis):
    """Inclusive -> exclusive prefixes: shift right by one, identity at 0."""
    shape = [1] * arr.ndim
    shape[axis] = arr.shape[axis]
    pos = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
    sval = jnp.roll(arr, 1, axis=axis)
    return jnp.where(pos == 0, cv.identity_like(arr), sval)


def _qgather_body(cv, fine_flat, coarse_excl, counts, k, n, n_buckets: int = N_BUCKETS):
    """Q_d gather: Q_d = inclusive prefix at C(d)-1 (identity when C(d)=0).

    fine_flat: (16,C,3,G,n,B) intra-block inclusive prefixes;
    coarse_excl: (16,C,3,G,n/k,B); counts: (G,nb-1,B).
    Returns (q (16,C,3,G,nb,B), s_total (16,C,3,G,B)); q[..., nb-1, :] is
    masked to the identity so a plain scan over the nb axis yields
    sum_{d=0..nb-2} Q_d, and s_total is the full prefix at n-1.
    """
    gw, _, batch = counts.shape
    total_col = jnp.full((gw, 1, batch), n, dtype=jnp.int32)
    c_all = jnp.concatenate([counts, total_col], axis=1)  # (G,nb,B)
    idx = jnp.maximum(c_all - 1, 0)
    shape = fine_flat.shape[:4] + idx.shape[1:]
    idx_b = jnp.broadcast_to(idx[None, None, None], shape)
    f = jnp.take_along_axis(fine_flat, idx_b, axis=4)  # (16,C,3,G,nb,B)
    blk_b = jnp.broadcast_to((idx // k)[None, None, None], shape)
    cq = jnp.take_along_axis(coarse_excl, blk_b, axis=4)
    q = cv.add(f, cq)
    ident = cv.identity_like(q)
    q = jnp.where((c_all == 0)[None, None, None], ident, q)
    s_total = q[:, :, :, :, n_buckets - 1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, n_buckets, 1), 4)
    return jnp.where(pos == n_buckets - 1, ident, q), s_total


def _finish_body(cv, sum_q, s_total, c_bits: int = C_BITS):
    """Window telescope: (2^c-1)*S_total - sum_{d=0..2^c-2} Q_d (c doublings).

    The doublings run as a fori_loop and the two subtractions as a length-2
    scan so double and add each compile ONCE — the fully unrolled form alone
    took ~160s of XLA:CPU compile on a 2-core host (the dry-run
    environment)."""
    t = jax.lax.fori_loop(0, c_bits, lambda _, p: cv.double(p), s_total)  # 2^c*S
    terms = jnp.stack([cv.neg(s_total), cv.neg(sum_q)])
    t, _ = jax.lax.scan(lambda acc, x: (cv.add(acc, x), None), t, terms)
    return t


def _double8_body(cv, proj, c_bits: int = C_BITS):
    """c_bits EC doublings as a fori_loop: the double compiles ONCE instead
    of unrolled copies (the unrolled form is the single slowest XLA:CPU
    compile in the whole pipeline — LLVM chokes on the fused limb chains)."""
    return jax.lax.fori_loop(0, c_bits, lambda _, p: cv.double(p), proj)


@functools.lru_cache(maxsize=None)
def _prims(adapter):
    """Single-device primitive programs (S = 1 leading axis convention).

    Primitives with static parameters are BUILDERS: prims["sort"](n) returns
    the jitted callable. parallel/sharded.py provides the same interface with
    shard_map-wrapped bodies for the tensor-parallel path.
    """
    cv = best_curve_ops(adapter)

    def builder(make_body):
        @functools.lru_cache(maxsize=None)
        def build(*static):
            return jax.jit(_squeezed(make_body(*static)))

        return build

    return {
        "sort": builder(
            lambda n: lambda t, d: _sort_gather_body(adapter, t, d, n)[None]
        ),
        "counts": builder(lambda nb: lambda d: _counts_body(d, nb)[None]),
        "promote": jax.jit(_squeezed(lambda aff: cv.from_affine(aff)[None])),
        "mixed_step": jax.jit(
            lambda prev, blocks, j: _mixed_step_body(cv, prev[0], blocks[0], j)[None]
        ),
        "hs_step": builder(
            lambda axis: lambda arr, shift: _hs_step_body(cv, arr, shift, axis)[None]
        ),
        "excl_shift": builder(
            lambda axis: lambda arr: _excl_shift_body(cv, arr, axis)[None]
        ),
        "qgather": builder(
            lambda k, n, nb: lambda fine, coarse, counts: tuple(
                x[None] for x in _qgather_body(cv, fine, coarse, counts, k, n, nb)
            )
        ),
        "finish": builder(
            lambda cb: lambda sum_q, s_total: _finish_body(cv, sum_q, s_total, cb)[None]
        ),
        "doublek": builder(lambda cb: lambda p: _double8_body(cv, p, cb)[None]),
        "to_affine": jax.jit(_squeezed(lambda p: cv.to_affine(p)[None])),
        "shard_reduce": jax.jit(lambda w: w[0]),  # S = 1: nothing to combine
    }


def _hs_scan_eager(prims, arr, axis_sq: int):
    """Inclusive EC prefix scan along squeezed axis `axis_sq`, sequenced
    eagerly over one compiled Hillis-Steele round program."""
    n = arr.shape[axis_sq + 1]
    step = prims["hs_step"](axis_sq)
    shift = 1
    while shift < n:
        arr = step(arr, jnp.int32(shift))
        shift *= 2
    return arr


def digits_for_windows(
    scalars_s: jnp.ndarray, n_windows: int = N_WINDOWS, c_bits: int = C_BITS
) -> jnp.ndarray:
    """scalars (S, 16, n, B) canonical -> digits (S, W, n, B) uint32.

    (n_windows, c_bits) below the (32, 8) default covers scalars under
    2^(c_bits*n_windows) — used by the dry-run tiers, whose toy scalars are
    tiny, to shrink the table build (W-1 sequenced doublek calls), the
    bucket-scan length (2^c_bits) and the pipeline footprint. c_bits must
    divide 16 (digits may not straddle limbs)."""
    assert 16 % c_bits == 0
    per_limb = 16 // c_bits
    mask = np.uint32((1 << c_bits) - 1)
    rows = []
    for w in range(n_windows):
        limb = scalars_s[:, w // per_limb]
        shift = (w % per_limb) * c_bits
        rows.append((limb >> shift) & mask)
    return jnp.stack(rows, axis=1)


def tables_to_aos_s(adapter, tables: jnp.ndarray) -> jnp.ndarray:
    """(S, 16, C, 2, W, n) SoA tables -> (S, W*n, 16*C*2) AoS point rows.

    Row word order is limb-major (limb, comp, coord) so the transpose back
    to SoA after the sorted gather is a pure reshape."""
    s, w, n = tables.shape[0], tables.shape[4], tables.shape[5]
    t = jnp.transpose(tables, (0, 4, 5, 1, 2, 3))  # (S, W, n, 16, C, 2)
    return t.reshape(s, w * n, NUM_LIMBS * adapter.components * 2)


def pack_aos_rows(rows: jnp.ndarray, components: int) -> jnp.ndarray:
    """(S, N, 16*C*cds) u32 AoS rows (word order (limb, comp, coord), limbs
    < 2^16) -> (S, N, 8*C*cds) with limb PAIRS packed per word
    (limb[2j] | limb[2j+1] << 16) — halves the fused path's gather traffic
    (pallas_field ec_scan_rows packed_io unpacks in-kernel)."""
    s, n, k = rows.shape
    cd = k // (NUM_LIMBS * components)
    r = rows.reshape(s, n, NUM_LIMBS // 2, 2, components, cd)
    packed = r[:, :, :, 0] | (r[:, :, :, 1] << jnp.uint32(16))
    return packed.reshape(s, n, k // 2)


def build_window_tables(
    prims, points_s: jnp.ndarray, n_windows: int = N_WINDOWS, c_bits: int = C_BITS
) -> jnp.ndarray:
    """points (S, 16, C, 2, n) affine -> tables (S, 16, C, 2, W, n) with
    tables[..., w, i] = 2^(c_bits*w) * P_i. Eagerly sequenced doublings over
    one compiled c_bits-double program."""
    proj = prims["promote"](points_s)  # (S, 16, C, 3, n)
    doublek = prims["doublek"](c_bits)
    cols = [proj]
    for _ in range(1, n_windows):
        proj = doublek(proj)
        cols.append(proj)
    stacked = jnp.stack(cols, axis=4)  # (S, 16, C, 3, W, n)
    return prims["to_affine"](stacked)  # (S, 16, C, 2, W, n); inf -> (0, 0)


def _window_group(batch: int, components: int, n_windows: int = N_WINDOWS) -> int:
    g = min(32, n_windows)
    while g > 2 and g * batch * components > MAX_CGB:
        g //= 2
    return g


def block_size_for(n: int) -> int:
    return K_BLOCK if n % K_BLOCK == 0 else n  # small test MSMs: one block


def msm_pipeline(
    prims, tables_aos, digits_all, n: int, group: int, c_bits: int = C_BITS
) -> jnp.ndarray:
    """Windowed bucket pipeline over S-leading arrays.

    tables_aos: (S, W*n, rowK) AoS rows; digits_all: (S, W, n, B).
    Returns per-window-group-combined projective accumulators via the
    provider's shard_reduce: (16, C, 3, B).
    """
    s_dim, w_dim, _, batch = digits_all.shape
    n_buckets = 1 << c_bits
    k = block_size_for(n)
    assert w_dim % group == 0
    n_groups = w_dim // group
    tables_g = tables_aos.reshape(s_dim, n_groups, group * n, tables_aos.shape[2])
    sort = prims["sort"](n)
    qgather = prims["qgather"](k, n, n_buckets)
    counts_fn = prims["counts"](n_buckets)
    finish = prims["finish"](c_bits)
    sums = []
    for g in range(n_groups):
        dg = digits_all[:, g * group : (g + 1) * group]  # (S, G, n, B)
        aff = sort(tables_g[:, g], dg)  # (S,16,C,2,G,n,B)
        counts = counts_fn(dg)
        # intra-block inclusive prefixes: K-1 eager steps of one program
        sh = aff.shape
        blocks = aff.reshape(sh[:5] + (n // k, k, batch))
        prev = prims["promote"](blocks[:, :, :, :, :, :, 0])
        cols = [prev]
        for j in range(1, k):
            prev = prims["mixed_step"](prev, blocks, jnp.int32(j))
            cols.append(prev)
        fine = jnp.stack(cols, axis=6)  # (S,16,C,3,G,NB,k,B)
        totals = fine[:, :, :, :, :, :, k - 1]
        fine = fine.reshape(sh[:3] + (3,) + sh[4:])  # (S,16,C,3,G,n,B)
        # exclusive block prefixes across the n/k totals
        coarse = _hs_scan_eager(prims, totals, 4)
        coarse = prims["excl_shift"](4)(coarse)
        q, s_total = qgather(fine, coarse, counts)
        sum_q = _hs_scan_eager(prims, q, 4)[:, :, :, :, :, -1]
        sums.append(finish(sum_q, s_total))
    all_windows = jnp.concatenate(sums, axis=4)  # (S, 16, C, 3, W, B)
    win = _hs_scan_eager(prims, all_windows, 3)[:, :, :, :, -1]  # (S,16,C,3,B)
    return prims["shard_reduce"](win)


def msm_accumulate(
    adapter, points, scalars, n_windows: int = N_WINDOWS, c_bits: int = C_BITS
):
    """One-shot MSM from affine points (16,C,2,n) + scalars (16,n,B); tables
    built on the fly. For repeated MSMs over the same bases use the MSM
    class, which caches the window tables. (n_windows, c_bits) below the
    default requires every scalar < 2^(c_bits*n_windows)."""
    prims = _prims(adapter)
    tables = build_window_tables(prims, points[None], n_windows, c_bits)
    aos = tables_to_aos_s(adapter, tables)
    digits = digits_for_windows(scalars[None], n_windows, c_bits)
    group = _window_group(scalars.shape[2], adapter.components, n_windows)
    return msm_pipeline(prims, aos, digits, points.shape[3], group, c_bits)


class MSM:
    """MSM over one fixed base set. adapter = FqAdapter (G1) / Fq2Adapter (G2).

    The base set is padded (with infinity points / zero scalars) to a
    multiple of PAD_GRANULARITY so that the a/b1/l/h query MSMs of a circuit
    all compile to the same program shapes — compilation is cached per shape.
    """

    def __init__(self, points, adapter, n_windows: int = N_WINDOWS, c_bits: int = C_BITS):
        """points: list of affine points as ints (G1: (x, y); G2:
        ((x0,x1),(y0,y1))). None encodes the point at infinity."""
        self.adapter = adapter
        self.curve = CurveOps(adapter)
        self.n_windows = n_windows
        self.c_bits = c_bits
        self.lane_batch = _default_lane_batch()
        self.n_real = len(points)
        pad_to = max(
            PAD_GRANULARITY,
            ((len(points) + PAD_GRANULARITY - 1) // PAD_GRANULARITY) * PAD_GRANULARITY,
        )
        if len(points) > 64:
            points = list(points) + [None] * (pad_to - len(points))
        self.n = len(points)
        self.points = jnp.asarray(encode_affine_points(points, adapter))
        self._prim_fns = _prims(adapter)
        self._tables = None
        # the single-program MSM pass (msm_fused.py) needs the Pallas group
        # laws and a TPU-friendly compiler; the eager pipeline stays the
        # default on CPU (XLA:CPU compile economy — see module docstring)
        from . import msm_fused

        # G2 included since the grid-carry-scan rewrite: the old monolith
        # (31 inline EC kernel calls + Hillis-Steele rounds) crashed the
        # remote TPU compiler on Fq2; the scan-kernel program is ~10x
        # smaller and compiles. A runtime fallback to the eager pipeline
        # remains in _pipeline_pass for compiler regressions.
        self._fused = (
            msm_fused.available()
            and os.environ.get("ZK_FUSED_MSM", "1") == "1"
            and self.n % K_BLOCK == 0
        )

    def tables(self) -> jnp.ndarray:
        """AoS window-table rows (1, W*n, 16*C*2) — the gather-friendly layout."""
        if self._tables is None:
            t = build_window_tables(
                self._prim_fns, self.points[None], self.n_windows, self.c_bits
            )
            self._tables = tables_to_aos_s(self.adapter, t)
        return self._tables


    def __call__(
        self, scalars_canon: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """scalars_canon: (16, n_real, B) canonical limbs. mask: optional
        (n_real, B) bool — points with False contribute nothing (partial-proof
        splits). Returns projective accumulators (16, C, 3, B)."""
        scalars = self.scalars_padded(scalars_canon, mask)
        batch = scalars.shape[2]
        b0 = self.lane_batch
        if batch <= b0:
            return self._pipeline_pass(scalars)
        # stream big batches through the B<=LANE_BATCH compiled programs
        chunks = []
        for lo in range(0, batch, b0):
            hi = min(lo + b0, batch)
            piece = scalars[:, :, lo:hi]
            if hi - lo < b0:  # ragged tail: pad lanes, slice the result
                reps = jnp.repeat(piece[:, :, :1], b0 - (hi - lo), axis=2)
                piece = jnp.concatenate([piece, reps], axis=2)
                chunks.append(self._pipeline_pass(piece)[:, :, :, : hi - lo])
            else:
                chunks.append(self._pipeline_pass(piece))
        return jnp.concatenate(chunks, axis=3)

    def _pipeline_pass(self, scalars: jnp.ndarray) -> jnp.ndarray:
        if self._fused:
            from .msm_fused import fused_msm_pass

            try:
                return fused_msm_pass(
                    self.adapter, self.tables(), scalars, self.n,
                    self.n_windows, self.c_bits,
                )
            except Exception as e:  # remote-compiler rejection: eager fallback
                import warnings

                warnings.warn(f"fused MSM unavailable ({type(e).__name__}); eager path")
                self._fused = False
        digits = digits_for_windows(scalars[None], self.n_windows, self.c_bits)
        group = _window_group(scalars.shape[2], self.adapter.components, self.n_windows)
        return msm_pipeline(
            self._prim_fns, self.tables(), digits, self.n, group, self.c_bits
        )

    def scalars_padded(self, scalars_canon, mask=None):
        """Validates, masks and pads scalars to the padded base size n."""
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
        return scalars

    def to_affine_ints(self, acc):
        """Projective accumulators (16, C, 3, B) -> host affine points.

        The Z inversion and normalization run in host Python: at accumulator
        widths (a few dozen lanes) the device Fermat-inversion scan costs
        ~300 ms per call in 254 narrow sequential steps, while Python modular
        inverses on the decoded ints cost microseconds. (The device to_affine
        stays in use where it is wide enough to pay off: window-table
        builds over W*n lanes.)"""
        from ..constants import Q
        from ..hostmath import bn254

        arr = np.asarray(acc)  # (16, C, 3, B) Montgomery limbs
        batch = arr.shape[3]
        vals = FQ.decode(arr.reshape(NUM_LIMBS, -1))  # C*3*B ints
        comps = self.adapter.components
        out = []
        for b in range(batch):
            def coord(c, j):
                return int(vals[(c * 3 + j) * batch + b])

            if self.adapter is FqAdapter:
                x, y, z = coord(0, 0), coord(0, 1), coord(0, 2)
                if z == 0:
                    out.append(None)
                    continue
                zi = pow(z, -1, Q)
                out.append((x * zi % Q, y * zi % Q))
            else:
                x = (coord(0, 0), coord(1, 0))
                y = (coord(0, 1), coord(1, 1))
                z = (coord(0, 2), coord(1, 2))
                if z == (0, 0):
                    out.append(None)
                    continue
                zi = bn254.fq2_inv(z)
                out.append((bn254.fq2_mul(x, zi), bn254.fq2_mul(y, zi)))
        return out


class FusedMSMGroup:
    """Runs k same-shape fixed-base MSMs as ONE fused program per pass.

    Each fused-MSM dispatch on the tunneled backend costs ~37 ms of fixed
    latency plus per-pass XLA glue; the Groth16 prover's a/b1/l G1 query
    MSMs share one padded base size, so merging them into a single program
    (lane axis = k*B, per-lane table base — msm_fused.fused_multi_msm_pass)
    pays those costs once per pass instead of three times.
    """

    def __init__(self, msms):
        assert len(msms) >= 2
        n = msms[0].n
        ad = msms[0].adapter
        assert all(m.n == n and m.adapter is ad and m._fused for m in msms)
        self.msms = list(msms)
        self.adapter = ad
        self.n = n
        self.n_windows = msms[0].n_windows
        self.c_bits = msms[0].c_bits
        self.lane_batch = msms[0].lane_batch
        self._tables_cat = None

    def tables_cat(self):
        if self._tables_cat is None:
            self._tables_cat = jnp.concatenate(
                [m.tables()[0] for m in self.msms], axis=0
            )
        return self._tables_cat

    def __call__(self, scalars_list, masks=None):
        """scalars_list[i]: (16, msms[i].n_real, B). Returns one projective
        accumulator array (16, C, 3, B) per member MSM."""
        from .msm_fused import fused_multi_msm_pass

        m_count = len(self.msms)
        if masks is None:
            masks = [None] * m_count
        padded = [
            msm.scalars_padded(s, mk)
            for msm, s, mk in zip(self.msms, scalars_list, masks)
        ]
        batch = padded[0].shape[2]
        assert all(p.shape[2] == batch for p in padded)
        b0 = self.lane_batch
        accs = None
        for lo in range(0, batch, b0):
            hi = min(lo + b0, batch)
            piece = [p[:, :, lo:hi] for p in padded]
            if hi - lo < b0:  # ragged tail: replicate lane 0, slice after
                piece = [
                    jnp.concatenate(
                        [p, jnp.repeat(p[:, :, :1], b0 - (hi - lo), axis=2)],
                        axis=2,
                    )
                    for p in piece
                ]
            stacked = jnp.concatenate(piece, axis=2)  # (16, n, M*b0)
            acc = fused_multi_msm_pass(
                self.adapter, self.tables_cat(), stacked, self.n,
                self.n_windows, self.c_bits, m_count,
            )  # (16, C, 3, M*b0)
            parts = [
                acc[:, :, :, m * b0 : m * b0 + (hi - lo)] for m in range(m_count)
            ]
            accs = parts if accs is None else [
                jnp.concatenate([a, p], axis=3) for a, p in zip(accs, parts)
            ]
        return accs
