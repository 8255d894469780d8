"""Batched big-integer Montgomery field arithmetic for TPU (JAX).

This replaces ark-ff's BN254 Fr/Fq arithmetic (used everywhere in the
reference, e.g. rln/src/circuit/mod.rs:91-94) with a TPU-native formulation:

  * A field element is 16 little-endian limbs of 16 bits stored in uint32.
  * Limbs live on axis 0; arbitrary batch dims trail:  shape (16, *batch).
    With batch in the minor dimensions the VPU processes 8x128 elements per
    op and every limb op is a full-width vector op.
  * 16-bit limbs make every partial product exact in uint32 (16x16 -> 32)
    with no widening multiplies or carry flags, which TPUs don't have.
  * The 256 partial products of a multiply are 16 unrolled shifted
    multiply-accumulates into 32 per-column row registers — every temporary
    is an (N,)-shaped elementwise value, so XLA fuses the whole multiply into
    one register-resident kernel with ~256 B/lane of memory traffic (no
    (16,16,N) tensors, no relayouts).
  * Column accumulators stay < 2^21 (32 terms of < 2^16 each), then
    log-depth carry-lookahead normalizes to 16-bit limbs.
  * Montgomery (SOS) reduction, R = 2^256: u = (t + ((t mod R)*n' mod R)*p)/R.

All functions are pure jnp and jit/vmap/shard_map-compatible. Hot paths can be
further specialized in Pallas kernels; this module is the portable
implementation and the building block for NTT/MSM/Poseidon/witness-eval.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LIMB_BITS, LIMB_MASK, MONT_R, NUM_LIMBS, Q, R

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
L = NUM_LIMBS  # 16


def int_to_limbs(x: int, n: int = NUM_LIMBS) -> np.ndarray:
    return np.array([(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n)], dtype=np.uint32)


def limbs_to_int(limbs) -> int:
    arr = np.asarray(limbs)
    return sum(int(arr[i]) << (LIMB_BITS * i) for i in range(arr.shape[0]))


class FieldSpec:
    """Constants for one prime field (Fr or Fq) in limb form."""

    def __init__(self, p: int):
        self.p = p
        self.r_mod = MONT_R % p
        self.r2_mod = (MONT_R * MONT_R) % p
        self.ninv = (-pow(p, -1, MONT_R)) % MONT_R
        self.p_limbs = int_to_limbs(p)
        self.ninv_limbs = int_to_limbs(self.ninv)
        self.one_mont = int_to_limbs(self.r_mod)  # 1 in Montgomery form
        self.r2_limbs = int_to_limbs(self.r2_mod)
        self.zero = np.zeros(NUM_LIMBS, dtype=np.uint32)

    # -- host-side conversions ----------------------------------------------

    def to_mont_int(self, x: int) -> int:
        return (x * MONT_R) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * pow(MONT_R, -1, self.p)) % self.p

    def encode(self, xs, mont: bool = True) -> np.ndarray:
        """Python ints -> limb array of shape (16, *np.shape(xs))."""
        flat = np.asarray(xs, dtype=object).reshape(-1)
        out = np.zeros((NUM_LIMBS, flat.shape[0]), dtype=np.uint32)
        for j, v in enumerate(flat):
            val = self.to_mont_int(int(v)) if mont else int(v) % self.p
            for i in range(NUM_LIMBS):
                out[i, j] = (val >> (LIMB_BITS * i)) & LIMB_MASK
        return out.reshape((NUM_LIMBS,) + np.shape(xs))

    def decode(self, limbs, mont: bool = True) -> np.ndarray:
        """Limb array (16, *batch) -> object array of Python ints (*batch)."""
        arr = np.asarray(limbs)
        batch_shape = arr.shape[1:]
        flat = arr.reshape(NUM_LIMBS, -1)
        out = np.empty(flat.shape[1], dtype=object)
        for j in range(flat.shape[1]):
            val = sum(int(flat[i, j]) << (LIMB_BITS * i) for i in range(NUM_LIMBS))
            out[j] = self.from_mont_int(val) if mont else val
        return out.reshape(batch_shape)


FR = FieldSpec(R)
FQ = FieldSpec(Q)


def encode_canonical_fast(vals) -> np.ndarray:
    """Python ints -> canonical limb array (16, N) without per-limb Python loops.

    Goes through a packed little-endian byte buffer, so the per-element Python
    cost is a single int.to_bytes call; used for bulk host->device transfers.
    """
    vals = list(vals)
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(vals), NUM_LIMBS)
    return np.ascontiguousarray(u16.T).astype(np.uint32)


def decode_canonical_fast(limbs: np.ndarray) -> List[int]:
    """Canonical limb array (16, N) -> list of Python ints (bulk, via bytes)."""
    arr = np.ascontiguousarray(np.asarray(limbs).T.astype("<u2"))
    raw = arr.tobytes()
    return [
        int.from_bytes(raw[i * 32 : (i + 1) * 32], "little") for i in range(arr.shape[0])
    ]


# ---------------------------------------------------------------------------
# core limb helpers. Internal convention: (limbs, *batch) uint32 arrays.
# ---------------------------------------------------------------------------


def _mul_cols_rows(a: jnp.ndarray, b: jnp.ndarray, n_cols: int = 2 * L) -> jnp.ndarray:
    """Column accumulators of a*b: (n_cols, *batch), each < 2^21.

    Schoolbook columns as 16 unrolled shifted multiply-accumulates: for each
    limb j of b, the (16, N) product row a * b[j] splits into lo/hi halves
    that accumulate into per-column row registers at offsets j and j+1. All
    temporaries are (N,)-shaped elementwise values — no (16, 16, N) tensor
    and no pad/reshape relayouts — so XLA fuses the whole thing into one
    register-resident elementwise kernel; memory traffic is just the in/out
    rows (~256 B/lane vs ~1 KB/lane for the outer-product formulation).
    """
    rows = [None] * (2 * L)

    def acc(idx, v):
        rows[idx] = v if rows[idx] is None else rows[idx] + v

    for j in range(L):
        prod = a * b[j][None]  # (16, *batch) — 16x16-bit products exact in u32
        lo = prod & _MASK
        hi = prod >> LIMB_BITS
        for i in range(L):
            acc(i + j, lo[i])
            acc(i + j + 1, hi[i])
    return jnp.stack(rows[:n_cols], axis=0)


@functools.lru_cache(maxsize=None)
def _col_matrices():
    """Static 0/1 anti-diagonal indicator matrices for the dot-form multiply:
    cols = M_lo @ lo_products + M_hi @ hi_products, flattened over (i, j).
    Held as host numpy (they become HLO constants at each trace site)."""
    lo = np.zeros((2 * L, L * L), dtype=np.uint32)
    hi = np.zeros((2 * L, L * L), dtype=np.uint32)
    for i in range(L):
        for j in range(L):
            lo[i + j, i * L + j] = 1
            hi[i + j + 1, i * L + j] = 1
    return lo, hi


def _mul_cols_dot(a: jnp.ndarray, b: jnp.ndarray, n_cols: int = 2 * L) -> jnp.ndarray:
    """Column accumulators of a*b via two integer matmuls (~10 HLO ops).

    Semantically identical to _mul_cols_rows but emits a tiny HLO graph:
    the unrolled-row form costs ~500 ops per multiply, which makes XLA's CPU
    backend take MINUTES to compile an EC-add program (measured ~90s+ for
    one add; LLVM chokes on the 30K-op fused chains). On CPU this dot form
    compiles in seconds and the 32x256 indicator matmuls vectorize well. The
    TPU path keeps the row form: XLA fuses it into register-resident
    elementwise code, while an int32 dot would not use the MXU anyway.
    """
    prod = a[:, None] * b[None, :]  # (16, 16, *batch), exact in u32
    flat = prod.reshape((L * L,) + prod.shape[2:])
    lo = flat & _MASK
    hi = flat >> LIMB_BITS
    m_lo, m_hi = _col_matrices()
    cols = jnp.tensordot(m_lo, lo, axes=1) + jnp.tensordot(m_hi, hi, axes=1)
    return cols[:n_cols]


def _mul_cols(a: jnp.ndarray, b: jnp.ndarray, n_cols: int = 2 * L) -> jnp.ndarray:
    """Backend-dependent column formulation (see _mul_cols_dot docstring)."""
    if jax.default_backend() == "cpu":
        return _mul_cols_dot(a, b, n_cols)
    return _mul_cols_rows(a, b, n_cols)


# ---------------------------------------------------------------------------
# u64 multiply path (CPU backend with x64 enabled)
#
# The TPU formulation above carries 16-bit limbs in u32 lanes because TPUs
# have no widening multiply; a full Montgomery multiply is ~1500 HLO ops,
# which LLVM compiles in MINUTES per EC program under XLA:CPU and executes
# far below scalar speed. CPUs have native 64-bit integer ops, so on the CPU
# backend the same multiply runs on 8x32-bit limbs held in u64 lanes
# (~330 ops): 8x8 schoolbook with lo/hi product splits (column sums of <= 8
# 32-bit parts stay exact in u64), sequential ripple carries (fine on CPU),
# SOS Montgomery reduction on the 32-bit basis. I/O stays the package-wide
# (16, *batch) u32 16-bit-limb convention.
# ---------------------------------------------------------------------------

_M32 = np.uint64(0xFFFFFFFF)


def _use_u64() -> bool:
    return jax.default_backend() == "cpu" and jax.config.jax_enable_x64


def _to_u64_limbs(a16: jnp.ndarray) -> jnp.ndarray:
    """(16, *b) u32 16-bit limbs -> (8, *b) u64 32-bit limbs."""
    a = a16.astype(jnp.uint64)
    return a[0::2] | (a[1::2] << 16)


def _from_u64_limbs(a8: jnp.ndarray) -> jnp.ndarray:
    """(8, *b) u64 32-bit limbs -> (16, *b) u32 16-bit limbs."""
    lo = (a8 & np.uint64(0xFFFF)).astype(U32)
    hi = ((a8 >> 16) & np.uint64(0xFFFF)).astype(U32)
    return jnp.stack([lo, hi], axis=1).reshape((16,) + a8.shape[1:])


def _mul_cols_u64(a8, b8, n_cols: int):
    """Schoolbook column sums of a8*b8 (8x32-bit limbs): values < 2^36."""
    cols = [None] * n_cols

    def acc(idx, v):
        if idx < n_cols:
            cols[idx] = v if cols[idx] is None else cols[idx] + v

    for i in range(8):
        for j in range(8):
            if i + j >= n_cols:
                continue
            p = a8[i] * b8[j]
            acc(i + j, p & _M32)
            acc(i + j + 1, p >> 32)
    zero = jnp.zeros_like(a8[0])
    return [zero if c is None else c for c in cols]


def _ripple_u64(cols, n_out: int):
    """Sequential carry ripple: columns (< 2^40) -> n_out 32-bit limbs.
    Returns (limbs list, carry_out)."""
    carry = jnp.zeros_like(cols[0]) if cols else None
    out = []
    for k in range(n_out):
        v = (cols[k] if k < len(cols) else jnp.zeros_like(cols[0])) + carry
        out.append(v & _M32)
        carry = v >> 32
    return out, carry


def _geq_u64(a, b):
    """a >= b over 32-bit limb lists (most-significant first compare)."""
    gt = jnp.zeros_like(a[0], dtype=jnp.bool_)
    eq = jnp.ones_like(a[0], dtype=jnp.bool_)
    for i in range(len(a) - 1, -1, -1):
        gt = gt | (eq & (a[i] > b[i]))
        eq = eq & (a[i] == b[i])
    return gt | eq


def _sub_u64(a, b):
    """a - b over 32-bit limb lists (sequential borrow)."""
    borrow = jnp.zeros_like(a[0])
    out = []
    for i in range(len(a)):
        d = a[i] - b[i] - borrow
        out.append(d & _M32)
        borrow = (d >> 63) & np.uint64(1)  # underflow wrapped: top bits set
    return out


@functools.lru_cache(maxsize=None)
def _u64_consts(p: int, ninv: int):
    p8 = np.array([(p >> (32 * i)) & 0xFFFFFFFF for i in range(8)], dtype=np.uint64)
    n8 = np.array([(ninv >> (32 * i)) & 0xFFFFFFFF for i in range(8)], dtype=np.uint64)
    return p8, n8


def _mont_mul_u64(a16: jnp.ndarray, b16: jnp.ndarray, spec) -> jnp.ndarray:
    """Montgomery multiply on the u64 path; (16, *batch) u32 in and out."""
    p8_np, n8_np = _u64_consts(spec.p, spec.ninv)
    batch = a16.shape[1:]

    def const(arr):
        c = jnp.asarray(arr).reshape((8,) + (1,) * len(batch))
        return jnp.broadcast_to(c, (8,) + batch)

    a8 = _to_u64_limbs(a16)
    b8 = _to_u64_limbs(b16)
    p8 = const(p8_np)
    n8 = const(n8_np)
    # t = a * b (16 limbs; t < p^2 < 2^508 so no 17th limb)
    t_cols = _mul_cols_u64(a8, b8, 16)
    t, _ = _ripple_u64(t_cols, 16)
    # m = (t mod 2^256) * ninv mod 2^256
    m_cols = _mul_cols_u64(t[:8], n8, 8)
    m, _ = _ripple_u64(m_cols, 8)
    # t + m*p, then /2^256: high 8 limbs
    mp_cols = _mul_cols_u64(m, p8, 16)
    total_cols = [mp_cols[i] + t[i] for i in range(16)]
    folded, carry = _ripple_u64(total_cols, 16)
    hi = list(folded[8:])
    # (t + mp)/2^256 < 2p: one conditional subtraction, with the ripple
    # carry-out standing in for bit 512 (2p can exceed 2^256... p < 2^254,
    # so 2p < 2^255 and carry is always 0; kept for safety)
    need = _geq_u64(hi, [p8[i] for i in range(8)]) | (carry != 0)
    diff = _sub_u64(hi, [p8[i] for i in range(8)])
    out8 = [jnp.where(need, diff[i], hi[i]) for i in range(8)]
    return _from_u64_limbs(jnp.stack(out8, axis=0))


def _kogge_stone_carries(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Carry-lookahead: carry_in[i] for each limb from generate/propagate bits.

    g[i] = position i generates a carry; p[i] = position i propagates an
    incoming carry. Returns c[i] = carry INTO position i (c[0] = 0).
    Log-depth (parallel prefix), pure elementwise ops — no sequential loop.
    """
    n = g.shape[0]
    shift = 1
    while shift < n:
        # combine: after k steps, (g, p) summarize windows of length 2^k
        g_prev = jnp.concatenate([jnp.zeros_like(g[:shift]), g[:-shift]], axis=0)
        p_prev = jnp.concatenate([jnp.zeros_like(p[:shift]), p[:-shift]], axis=0)
        g = g | (p & g_prev)
        p = p & p_prev
        shift *= 2
    # carry into position i is the combined generate of the window below it
    return jnp.concatenate([jnp.zeros_like(g[:1]), g[:-1]], axis=0)


def _carry_fold(cols: jnp.ndarray, n_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Carry normalization: (n, *batch) columns (values < 2^26) -> (n_out
    16-bit limbs, leftover carry). Log-depth: one lo/hi fold brings every
    limb below 2^16 + 2^10, then Kogge-Stone carry-lookahead resolves the
    remaining 0/1 carries in log2(n) elementwise steps."""
    n = cols.shape[0]
    if n < n_out:
        pad = jnp.zeros((n_out - n,) + cols.shape[1:], dtype=U32)
        cols = jnp.concatenate([cols, pad], axis=0)
    else:
        cols = cols[:n_out]
    lo = cols & _MASK
    hi = cols >> LIMB_BITS  # < 2^10 for column accumulators < 2^26
    hi_shift = jnp.concatenate([jnp.zeros_like(hi[:1]), hi[:-1]], axis=0)
    y = lo + hi_shift  # < 2^16 + 2^10: carry-out is 0 or 1
    g = y >> LIMB_BITS  # generates
    p = ((y & _MASK) == _MASK).astype(U32)  # propagates
    c = _kogge_stone_carries(g, p)
    limbs = (y + c) & _MASK
    # leftover carry out of the top limb
    top = y[-1] + c[-1]
    carry = (top >> LIMB_BITS) + hi[-1]
    return limbs, carry


def _sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """a - b over 16-bit limb arrays (n, *batch); returns (limbs, borrow).
    Borrow-lookahead via the same parallel-prefix structure."""
    d = a - b  # wraps in uint32; interpret per-limb
    g = (a < b).astype(U32)  # generates a borrow
    p = (a == b).astype(U32)  # propagates a borrow
    borrow_in = _kogge_stone_carries(g, p)
    limbs = (d - borrow_in) & _MASK
    # borrow out of the top limb
    top_borrow = g[-1] | (p[-1] & borrow_in[-1])
    return limbs, top_borrow


# Maximum flattened batch per multiply call. The row-accumulator multiply
# keeps ~48 live (N,) u32 rows (~200 B/lane), so chunks can be large; the cap
# bounds peak temp memory (2^21 lanes -> ~400 MB live) while keeping each
# kernel far off the latency floor. Larger batches stream through lax.map.
MUL_CHUNK = 1 << 21


def _flat2d(fn, chunk: bool = False):
    """Runs a limb-array op with all batch dims flattened to one axis.

    The compiler handles uniform (16, N) shapes far better than deep stacks
    of ops on 6-D arrays with tiny dims; reshapes at the boundary are free.
    With chunk=True (multiply-family ops) large batches are processed in
    MUL_CHUNK slices under lax.map so their partial-product temporaries
    cannot exhaust HBM.
    """

    @functools.wraps(fn)
    def wrapped(self, *args):
        shape = args[0].shape
        if args[0].ndim <= 2 and not (chunk and shape[-1] > MUL_CHUNK):
            return fn(self, *args)
        flat = tuple(a.reshape((a.shape[0], -1)) for a in args)
        n = flat[0].shape[1]
        if chunk and n > MUL_CHUNK:
            k = -(-n // MUL_CHUNK)
            pad = k * MUL_CHUNK - n
            if pad:
                flat = tuple(
                    jnp.concatenate(
                        [a, jnp.zeros((a.shape[0], pad), dtype=a.dtype)], axis=1
                    )
                    for a in flat
                )
            stacked = tuple(
                a.reshape(a.shape[0], k, MUL_CHUNK).transpose(1, 0, 2) for a in flat
            )
            out = jax.lax.map(lambda xs: fn(self, *xs), stacked)  # (k, L, CHUNK)
            out = out.transpose(1, 0, 2).reshape(out.shape[1], k * MUL_CHUNK)
            if pad:
                out = out[:, :n]
        else:
            out = fn(self, *flat)
        return out.reshape((out.shape[0],) + shape[1:])

    return wrapped


class Field:
    """Vectorized field ops bound to one FieldSpec. Limbs axis 0, batch trails."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p_limbs_np = spec.p_limbs
        self._inv_exp_bits = np.array(
            [(spec.p - 2) >> i & 1 for i in range(spec.p.bit_length())], dtype=np.uint32
        )
        # jit public entry points: fast eager calls, still inlineable under jit
        chunked = {"mul", "sqr", "to_mont", "from_mont"}
        for name in ("add", "sub", "neg", "mul", "sqr", "to_mont", "from_mont", "inv"):
            wrapped = _flat2d(getattr(self, name).__func__, chunk=name in chunked)
            setattr(self, name, jax.jit(wrapped.__get__(self)))

    def _const(self, const_np, like, n=L):
        c = jnp.asarray(const_np, dtype=U32).reshape((n,) + (1,) * (like.ndim - 1))
        return jnp.broadcast_to(c, (n,) + like.shape[1:])

    def zero_like(self, x):
        return jnp.zeros_like(x)

    def one(self, like):
        return self._const(self.spec.one_mont, like)

    # -- add/sub/neg --------------------------------------------------------

    def _cond_sub_p(self, limbs: jnp.ndarray, extra_carry=None) -> jnp.ndarray:
        p_b = self._const(self.p_limbs_np, limbs)
        diff, borrow = _sub_limbs(limbs, p_b)
        use_diff = borrow == 0
        if extra_carry is not None:
            use_diff = jnp.logical_or(use_diff, extra_carry != 0)
        return jnp.where(use_diff[None], diff, limbs)

    def add(self, a, b):
        limbs, carry = _carry_fold(a + b, L)
        return self._cond_sub_p(limbs, extra_carry=carry)

    def sub(self, a, b):
        diff, borrow = _sub_limbs(a, b)
        p_b = self._const(self.p_limbs_np, a)
        corrected = diff + jnp.where(borrow[None] != 0, p_b, 0)
        limbs, _ = _carry_fold(corrected, L)
        return jnp.where(borrow[None] != 0, limbs, diff)

    def neg(self, a):
        p_b = self._const(self.p_limbs_np, a)
        diff, _ = _sub_limbs(p_b, a)
        z = self.is_zero(a)
        return jnp.where(z[None], jnp.zeros_like(a), diff)

    # -- Montgomery multiply / square ---------------------------------------

    def _mont_reduce(self, t_cols: jnp.ndarray) -> jnp.ndarray:
        """SOS reduction of 32 column accumulators -> 16 reduced limbs."""
        t, t_extra = _carry_fold(t_cols, 2 * L)
        ninv_b = self._const(self.spec.ninv_limbs, t)
        m_cols = _mul_cols(t[:L], ninv_b, L)
        m, _ = _carry_fold(m_cols, L)
        p_b = self._const(self.p_limbs_np, t)
        mp_cols = _mul_cols(m, p_b, 2 * L)
        total = mp_cols + t  # accumulators < 2^21 + 2^16
        folded, overflow = _carry_fold(total, 2 * L)
        hi = folded[L:]
        return self._cond_sub_p(hi, extra_carry=overflow + t_extra)

    def mul(self, a, b):
        if _use_u64():
            return _mont_mul_u64(a, b, self.spec)
        return self._mont_reduce(_mul_cols(a, b, 2 * L))

    def sqr(self, a):
        if _use_u64():
            return _mont_mul_u64(a, a, self.spec)
        return self._mont_reduce(_mul_cols(a, a, 2 * L))

    def to_mont(self, a):
        """canonical limbs -> Montgomery form (multiply by R^2)."""
        return self.mul(a, self._const(self.spec.r2_limbs, a))

    def from_mont(self, a):
        """Montgomery form -> canonical limbs (Montgomery-reduce of a)."""
        if _use_u64():
            one = jnp.zeros_like(a).at[0].set(1)
            return _mont_mul_u64(a, one, self.spec)
        pad = jnp.zeros((L,) + a.shape[1:], dtype=U32)
        return self._mont_reduce(jnp.concatenate([a, pad], axis=0))

    # -- predicates ---------------------------------------------------------

    def is_zero(self, a):
        return jnp.logical_not(jnp.any(a != 0, axis=0))

    def eq(self, a, b):
        return jnp.all(a == b, axis=0)

    def select(self, cond, a, b):
        """cond has the batch shape; limbwise where."""
        return jnp.where(jnp.asarray(cond)[None], a, b)

    # -- exponentiation / inversion -----------------------------------------

    def pow_bits(self, a, exp_bits: np.ndarray):
        """a^e with e given LSB-first as a host bit array; O(len) scan."""
        bits = jnp.asarray(exp_bits, dtype=U32)

        def body(carry, bit):
            result, base = carry
            new_result = self.mul(result, base)
            result = jnp.where(bit != 0, new_result, result)
            base = self.sqr(base)
            return (result, base), None

        one = self.one(a)
        (result, _), _ = jax.lax.scan(body, (one, a), bits)
        return result

    def inv(self, a):
        """Batched inversion via Fermat: a^(p-2). inv(0) = 0 by construction."""
        return self.pow_bits(a, self._inv_exp_bits)

    # -- canonical-form helpers (for witness bit ops) ------------------------

    def canon_shift_right_const(self, canon, k: int):
        """(canonical limbs) >> k for a Python-int shift amount."""
        limb_off = k // LIMB_BITS
        bit_off = k % LIMB_BITS
        batch = canon.shape[1:]
        zero = jnp.zeros((L,) + batch, dtype=U32)
        shifted = jnp.concatenate([canon[limb_off:], zero], axis=0)[:L]
        if bit_off == 0:
            return shifted
        nxt = jnp.concatenate([shifted[1:], jnp.zeros((1,) + batch, dtype=U32)], axis=0)
        return ((shifted >> bit_off) | (nxt << (LIMB_BITS - bit_off))) & _MASK

    def canon_lt(self, a, b):
        """a < b on canonical limb arrays."""
        _, borrow = _sub_limbs(a, b)
        return borrow != 0


FrField = Field(FR)
FqField = Field(FQ)
