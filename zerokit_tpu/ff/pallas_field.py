"""Pallas TPU kernels for BN254 limb arithmetic and EC group laws.

Why: the XLA elementwise formulation of a Montgomery multiply is a ~1500-op
chain per lane; XLA cannot keep that in registers, so intermediates spill to
HBM and the measured throughput is ~50x below the ALU bound. These kernels
run the ENTIRE multiply (and the entire RCB EC add, which calls it 12x)
inside one Pallas invocation: every temporary lives in VMEM/vregs, and HBM
traffic is just the kernel's inputs and outputs.

Representation inside a kernel: a field element is a Python list of 16
separate (8, W) uint32 row values — one per 16-bit limb, each exactly
vreg-tiled. All cross-limb data movement (column shifts in the schoolbook
multiply, carry propagation) becomes list reindexing at TRACE time; the
compiled code is pure elementwise VPU ops with no sublane/lane shuffles.

Host-side arrays keep the package convention (16, *batch) u32; wrappers
reshape batch to (8, N/8) lanes and pad to the block width.

Kernels:
  * mont_mul(a, b)          — elementwise field multiply (Fr or Fq)
  * ec_add(p, q)            — complete projective add, G1/G2 (RCB15 Alg 7)
  * ec_add_mixed(p, q_aff)  — mixed add (Alg 8) + affine-infinity select
  * ec_double(p)            — doubling (Alg 9)

Reference semantics: ark-ff Montgomery backend / ark-ec short Weierstrass
(used throughout vacp2p/zerokit via arkworks, e.g. rln/src/circuit/mod.rs).
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LIMB_BITS, LIMB_MASK, NUM_LIMBS
from .field import FQ, FR, FieldSpec

L = NUM_LIMBS  # 16
U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)

# Montgomery reduction's two constant multiplies (t[:16] * n', m * p) as MXU
# matmuls of the operand's byte decomposition against a fixed byte Toeplitz
# matrix — exact in bf16 (bytes and their products are exact; f32
# accumulation of <= 64 terms < 2^23 is exact). Measured 1.75x on the
# mont_mul kernel (tools/mxu_mont_prototype.py); the EC kernels inherit.
# The Toeplitz matrices ride into every kernel as two extra operands
# (Pallas forbids captured constants).
MXU_REDUCE = os.environ.get("ZK_MXU_REDUCE", "1") == "1"


def _toeplitz_bytes(limbs16: np.ndarray, n_out_bytecols: int) -> np.ndarray:
    """Constant (16-bit limbs) -> (32, n_out) byte Toeplitz T with
    T[i, k] = byte_{k-i}, so (bytes(m) @ T)[k] = byte-column k of m * c."""
    cbytes = []
    for v in limbs16:
        cbytes.append(int(v) & 0xFF)
        cbytes.append((int(v) >> 8) & 0xFF)
    t = np.zeros((32, n_out_bytecols), dtype=np.float32)
    for i in range(32):
        for k in range(n_out_bytecols):
            j = k - i
            if 0 <= j < 32:
                t[i, k] = cbytes[j]
    return t

# Lane width per block: (8, W) per limb row; block bytes for one field
# element = 16 * 8 * W * 4. Sized so a kernel's live row values (inputs,
# outputs, double-buffered blocks, ~10 live field temporaries) stay inside
# the 16 MB VMEM budget: G2 kernels hold 2x the rows (Fq2), so half the width.
LANE_W = 512
_LANE_W_BY_KERNEL = {
    "g2_add": 128,
    "g2_add_mixed": 128,
    "g2_double": 256,
    "g1_scan_mixed": 256,
    "g1_scan_excl": 256,
    "g2_scan_mixed": 128,
    "g2_scan_excl": 128,
}


def _lane_w(kernel_name: str) -> int:
    import os

    env = os.environ.get("ZK_LANE_W_" + kernel_name.upper())
    if env:
        return int(env)
    return _LANE_W_BY_KERNEL.get(kernel_name, LANE_W)


def _block_lanes(kernel_name: str) -> int:
    return 8 * _lane_w(kernel_name)


# --------------------------------------------------------------------------
# Row-list arithmetic (pure jnp on (8, W) values; usable inside kernels)
# --------------------------------------------------------------------------


def _const_rows(limbs: np.ndarray, like) -> List:
    """16 constant rows broadcast to like's shape."""
    return [jnp.full_like(like, np.uint32(limbs[i])) for i in range(L)]


def _const_rows32(limbs: np.ndarray, like) -> List:
    """len(limbs) constant rows broadcast to like's shape (double-width)."""
    return [jnp.full_like(like, np.uint32(v)) for v in limbs]


def _mul_cols_rows(a: Sequence, b: Sequence, n_cols: int) -> List:
    """Schoolbook column accumulators of a*b as n_cols rows (< 2^21 each)."""
    rows: List = [None] * (n_cols + 1)

    def acc(idx, v):
        if idx <= n_cols:
            rows[idx] = v if rows[idx] is None else rows[idx] + v

    for j in range(L):
        if j > n_cols:
            break
        for i in range(L):
            if i + j > n_cols:
                break
            prod = a[i] * b[j]
            acc(i + j, prod & MASK)
            acc(i + j + 1, prod >> LIMB_BITS)
    zero = jnp.zeros_like(a[0])
    return [zero if r is None else r for r in rows[:n_cols]]


def _ks_carries(g: List, p: List) -> List:
    """Kogge-Stone carry-lookahead over row lists: returns carry-in rows."""
    n = len(g)
    g = list(g)
    p = list(p)
    shift = 1
    while shift < n:
        ng = list(g)
        np_ = list(p)
        for i in range(shift, n):
            ng[i] = g[i] | (p[i] & g[i - shift])
            np_[i] = p[i] & p[i - shift]
        g, p = ng, np_
        shift *= 2
    zero = jnp.zeros_like(g[0])
    return [zero] + g[:-1]


def _carry_fold_rows(cols: Sequence, n_out: int):
    """Normalize column accumulators (< 2^26) to n_out 16-bit limb rows.
    Returns (rows, carry_out_row)."""
    cols = list(cols)
    zero = jnp.zeros_like(cols[0])
    while len(cols) < n_out:
        cols.append(zero)
    cols = cols[:n_out]
    lo = [c & MASK for c in cols]
    hi = [c >> LIMB_BITS for c in cols]
    y = [lo[0]] + [lo[i] + hi[i - 1] for i in range(1, n_out)]
    g = [v >> LIMB_BITS for v in y]
    p = [((v & MASK) == MASK).astype(U32) for v in y]
    c = _ks_carries(g, p)
    rows = [(y[i] + c[i]) & MASK for i in range(n_out)]
    top = y[-1] + c[-1]
    carry = (top >> LIMB_BITS) + hi[-1]
    return rows, carry


def _sub_rows(a: Sequence, b: Sequence):
    """a - b over limb rows; returns (rows, borrow_row)."""
    n = len(a)
    d = [a[i] - b[i] for i in range(n)]
    g = [(a[i] < b[i]).astype(U32) for i in range(n)]
    p = [(a[i] == b[i]).astype(U32) for i in range(n)]
    bin_ = _ks_carries(g, p)
    rows = [(d[i] - bin_[i]) & MASK for i in range(n)]
    borrow = g[-1] | (p[-1] & bin_[-1])
    return rows, borrow


class RowField:
    """Field ops on 16-row-list elements; bound to one FieldSpec."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.p_limbs = spec.p_limbs
        self.ninv_limbs = spec.ninv_limbs
        self.one_limbs = spec.one_mont
        # MXU reduction operands (byte Toeplitz of n' and p); bound to the
        # kernel's traced refs by each kernel body via set_mxu
        self.np_t_ninv = _toeplitz_bytes(self.ninv_limbs, 32)
        self.np_t_p = _toeplitz_bytes(self.p_limbs, 2 * L * 2)
        self._mxu_t = None  # (tninv (32,32), tp (32,64)) traced values or None

    def set_mxu(self, operands) -> None:
        """Binds (or clears) the traced Toeplitz operands for this trace."""
        self._mxu_t = operands

    def _const_mul_mxu(self, rows, toeplitz, n_cols16: int):
        """rows: 16 (8, W) u32 limb rows (< 2^16) -> n_cols16 u32 column
        accumulators of rows * const via one bf16 matmul over the byte
        decomposition (exact: see MXU_REDUCE note)."""
        byte_rows = []
        for r in rows:
            byte_rows.append(r & jnp.uint32(0xFF))
            byte_rows.append(r >> jnp.uint32(8))
        m = jnp.stack(byte_rows)  # (32, 8, W)
        s8, w = m.shape[1], m.shape[2]
        # Mosaic lacks direct u32 <-> bf16 casts; go via i32/f32 (exact for
        # byte-scale values)
        mb = (
            m.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        ).reshape(32, s8 * w)
        out = jax.lax.dot_general(
            toeplitz[:, : 2 * n_cols16],
            mb,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (2*n_cols16, 8W)
        outu = out.astype(jnp.int32).astype(jnp.uint32).reshape(2 * n_cols16, s8, w)
        # byte cols -> 16-bit cols: c16[j] = b[2j] + (b[2j+1] << 8); each
        # < 2^31, and the limb fold's hi = c >> 16 < 2^15 keeps y < 2^17 so
        # the Kogge-Stone generate bits stay boolean
        return [
            outu[2 * j] + (outu[2 * j + 1] << jnp.uint32(8)) for j in range(n_cols16)
        ]

    def _cond_sub_p(self, rows: List, extra: jnp.ndarray = None) -> List:
        p_rows = _const_rows(self.p_limbs, rows[0])
        diff, borrow = _sub_rows(rows, p_rows)
        use_diff = borrow == 0
        if extra is not None:
            use_diff = jnp.logical_or(use_diff, extra != 0)
        return [jnp.where(use_diff, diff[i], rows[i]) for i in range(L)]

    def add(self, a: Sequence, b: Sequence) -> List:
        rows, carry = _carry_fold_rows([a[i] + b[i] for i in range(L)], L)
        return self._cond_sub_p(rows, carry)

    def sub(self, a: Sequence, b: Sequence) -> List:
        diff, borrow = _sub_rows(a, b)
        p_rows = _const_rows(self.p_limbs, a[0])
        corrected = [diff[i] + jnp.where(borrow != 0, p_rows[i], 0) for i in range(L)]
        rows, _ = _carry_fold_rows(corrected, L)
        return [jnp.where(borrow != 0, rows[i], diff[i]) for i in range(L)]

    def neg(self, a: Sequence) -> List:
        p_rows = _const_rows(self.p_limbs, a[0])
        diff, _ = _sub_rows(p_rows, a)
        z = self.is_zero(a)
        return [jnp.where(z, jnp.zeros_like(a[i]), diff[i]) for i in range(L)]

    def is_zero(self, a: Sequence) -> jnp.ndarray:
        acc = a[0]
        for i in range(1, L):
            acc = acc | a[i]
        return acc == 0

    def select(self, cond, a: Sequence, b: Sequence) -> List:
        return [jnp.where(cond, a[i], b[i]) for i in range(L)]

    def mont_reduce(self, t_cols: Sequence) -> List:
        """SOS reduction of 32 column accumulators -> 16 reduced limb rows."""
        t, t_extra = _carry_fold_rows(t_cols, 2 * L)
        if self._mxu_t is not None:
            m_cols = self._const_mul_mxu(t[:L], self._mxu_t[0], L)
        else:
            ninv = _const_rows(self.ninv_limbs, t[0])
            m_cols = _mul_cols_rows(t[:L], ninv, L)
        m, _ = _carry_fold_rows(m_cols, L)
        if self._mxu_t is not None:
            mp_cols = self._const_mul_mxu(m, self._mxu_t[1], 2 * L)
        else:
            p_rows = _const_rows(self.p_limbs, t[0])
            mp_cols = _mul_cols_rows(m, p_rows, 2 * L)
        total = [mp_cols[i] + t[i] for i in range(2 * L)]
        folded, overflow = _carry_fold_rows(total, 2 * L)
        return self._cond_sub_p(folded[L:], overflow + t_extra)

    def mul(self, a: Sequence, b: Sequence) -> List:
        return self.mont_reduce(_mul_cols_rows(a, b, 2 * L))

    def sqr(self, a: Sequence) -> List:
        return self.mul(a, a)


ROW_FR = RowField(FR)
ROW_FQ = RowField(FQ)


# --------------------------------------------------------------------------
# Fq / Fq2 adapters over row lists (elements: list of C lists of 16 rows)
# --------------------------------------------------------------------------


class RowFqAdapter:
    components = 1
    rf = ROW_FQ

    @classmethod
    def add(cls, a, b):
        return [cls.rf.add(a[0], b[0])]

    @classmethod
    def sub(cls, a, b):
        return [cls.rf.sub(a[0], b[0])]

    @classmethod
    def neg(cls, a):
        return [cls.rf.neg(a[0])]

    @classmethod
    def mul(cls, a, b):
        return [cls.rf.mul(a[0], b[0])]

    @classmethod
    def sqr(cls, a):
        return [cls.rf.sqr(a[0])]

    @classmethod
    def is_zero(cls, a):
        return cls.rf.is_zero(a[0])

    @classmethod
    def select(cls, cond, a, b):
        return [cls.rf.select(cond, a[0], b[0])]

    @classmethod
    def b3_mul(cls, a):
        """* 9 (b = 3 for G1): 8a + a via additions."""
        d = cls.rf.add(a[0], a[0])
        d = cls.rf.add(d, d)
        d = cls.rf.add(d, d)
        return [cls.rf.add(d, a[0])]

    @classmethod
    def one(cls, like):
        return [_const_rows(cls.rf.one_limbs, like)]

    @classmethod
    def zero(cls, like):
        z = jnp.zeros_like(like)
        return [[z] * L]


_P2_LIMBS_FQ = np.array(
    [((FQ.p * FQ.p) >> (LIMB_BITS * i)) & LIMB_MASK for i in range(2 * L)],
    dtype=np.uint32,
)


class RowFq2Adapter:
    components = 2
    rf = ROW_FQ

    @classmethod
    def add(cls, a, b):
        return [cls.rf.add(a[0], b[0]), cls.rf.add(a[1], b[1])]

    @classmethod
    def sub(cls, a, b):
        return [cls.rf.sub(a[0], b[0]), cls.rf.sub(a[1], b[1])]

    @classmethod
    def neg(cls, a):
        return [cls.rf.neg(a[0]), cls.rf.neg(a[1])]

    @classmethod
    def mul(cls, a, b):
        """Karatsuba with LAZY reduction: the three products stay unreduced
        (32-limb), the c0/c1 combinations happen in the double-width domain
        with +p^2 / +2p^2 offsets keeping them non-negative, and ONE
        Montgomery reduction lands each component (2p^2, 3p^2 < R*p so the
        standard reduction bound holds). Saves one of three mont_reduces
        per Fq2 multiply — the G2 scan kernels inherit. ZK_FQ2_LAZY=0
        restores the plain 3-reduction form (A/B lever)."""
        rf = cls.rf
        if os.environ.get("ZK_FQ2_LAZY", "1") != "1":
            t0 = rf.mul(a[0], b[0])
            t1 = rf.mul(a[1], b[1])
            t2 = rf.mul(rf.add(a[0], a[1]), rf.add(b[0], b[1]))
            return [rf.sub(t0, t1), rf.sub(rf.sub(t2, t0), t1)]
        t0c = _mul_cols_rows(a[0], b[0], 2 * L)
        t1c = _mul_cols_rows(a[1], b[1], 2 * L)
        t2c = _mul_cols_rows(rf.add(a[0], a[1]), rf.add(b[0], b[1]), 2 * L)
        t0, _ = _carry_fold_rows(t0c, 2 * L)  # < p^2 < 2^512: no carry out
        t1, _ = _carry_fold_rows(t1c, 2 * L)
        t2, _ = _carry_fold_rows(t2c, 2 * L)
        p2 = _const_rows32(_P2_LIMBS_FQ, t0[0])
        d1, _ = _sub_rows(p2, t1)  # p^2 - t1 >= 0 exact
        d0, _ = _sub_rows(p2, t0)
        c0_cols = [t0[i] + d1[i] for i in range(2 * L)]  # t0 - t1 + p^2
        c1_cols = [t2[i] + d0[i] + d1[i] for i in range(2 * L)]  # t2-t0-t1+2p^2
        return [rf.mont_reduce(c0_cols), rf.mont_reduce(c1_cols)]

    @classmethod
    def sqr(cls, a):
        """(a0 + a1 b)(a0 + a1 b) = (a0+a1)(a0-a1) + 2 a0 a1 b: the doubling
        of a0*a1 happens in the unreduced column domain — one reduction per
        component."""
        rf = cls.rf
        c0 = rf.mul(rf.add(a[0], a[1]), rf.sub(a[0], a[1]))
        tc = _mul_cols_rows(a[0], a[1], 2 * L)
        return [c0, rf.mont_reduce([c + c for c in tc])]

    @classmethod
    def is_zero(cls, a):
        return jnp.logical_and(cls.rf.is_zero(a[0]), cls.rf.is_zero(a[1]))

    @classmethod
    def select(cls, cond, a, b):
        return [cls.rf.select(cond, a[0], b[0]), cls.rf.select(cond, a[1], b[1])]

    @classmethod
    def b3_mul(cls, a):
        from .fq2 import _B3_G2_MONT

        c = [
            _const_rows(np.ascontiguousarray(_B3_G2_MONT[:, 0]), a[0][0]),
            _const_rows(np.ascontiguousarray(_B3_G2_MONT[:, 1]), a[0][0]),
        ]
        return cls.mul(a, c)

    @classmethod
    def one(cls, like):
        z = jnp.zeros_like(like)
        return [_const_rows(cls.rf.one_limbs, like), [z] * L]

    @classmethod
    def zero(cls, like):
        z = jnp.zeros_like(like)
        return [[z] * L, [z] * L]


def row_adapter_for(components: int):
    return RowFqAdapter if components == 1 else RowFq2Adapter


# --------------------------------------------------------------------------
# RCB15 group laws on row-list points (point = list of 3 field elements)
# --------------------------------------------------------------------------


def rcb_add(ra, p, q):
    """Complete projective add (Alg 7, a=0)."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    t0 = ra.mul(x1, x2)
    t1 = ra.mul(y1, y2)
    t2 = ra.mul(z1, z2)
    t3 = ra.sub(ra.mul(ra.add(x1, y1), ra.add(x2, y2)), ra.add(t0, t1))
    t4 = ra.sub(ra.mul(ra.add(y1, z1), ra.add(y2, z2)), ra.add(t1, t2))
    ty = ra.sub(ra.mul(ra.add(x1, z1), ra.add(x2, z2)), ra.add(t0, t2))
    t0 = ra.add(ra.add(t0, t0), t0)
    t2 = ra.b3_mul(t2)
    z3 = ra.add(t1, t2)
    t1 = ra.sub(t1, t2)
    ty = ra.b3_mul(ty)
    x3 = ra.sub(ra.mul(t3, t1), ra.mul(t4, ty))
    y3 = ra.add(ra.mul(t1, z3), ra.mul(ty, t0))
    z3 = ra.add(ra.mul(z3, t4), ra.mul(t0, t3))
    return [x3, y3, z3]


def rcb_add_mixed(ra, p, q_aff):
    """Mixed add (Alg 8, a=0) + select for the affine (0,0) infinity."""
    x1, y1, z1 = p
    x2, y2 = q_aff
    t0 = ra.mul(x1, x2)
    t1 = ra.mul(y1, y2)
    t3 = ra.sub(ra.mul(ra.add(x1, y1), ra.add(x2, y2)), ra.add(t0, t1))
    t4 = ra.add(ra.mul(x2, z1), x1)
    t5 = ra.add(ra.mul(y2, z1), y1)
    t0 = ra.add(ra.add(t0, t0), t0)
    t2 = ra.b3_mul(z1)
    z3 = ra.add(t1, t2)
    t1 = ra.sub(t1, t2)
    ty = ra.b3_mul(t4)
    x3 = ra.sub(ra.mul(t3, t1), ra.mul(t5, ty))
    y3 = ra.add(ra.mul(t1, z3), ra.mul(ty, t0))
    z3 = ra.add(ra.mul(z3, t5), ra.mul(t0, t3))
    q_inf = jnp.logical_and(ra.is_zero(x2), ra.is_zero(y2))
    return [
        ra.select(q_inf, p[0], x3),
        ra.select(q_inf, p[1], y3),
        ra.select(q_inf, p[2], z3),
    ]


def rcb_double(ra, p):
    """Doubling (Alg 9, a=0)."""
    x, y, z = p
    t0 = ra.sqr(y)
    z3 = ra.add(t0, t0)
    z3 = ra.add(z3, z3)
    z3 = ra.add(z3, z3)
    t1 = ra.mul(y, z)
    t2 = ra.b3_mul(ra.sqr(z))
    x3 = ra.mul(t2, z3)
    y3 = ra.add(t0, t2)
    z3 = ra.mul(t1, z3)
    t1 = ra.add(t2, t2)
    t2 = ra.add(t1, t2)
    t0 = ra.sub(t0, t2)
    y3 = ra.add(ra.mul(t0, y3), x3)
    t1 = ra.mul(x, y)
    x3 = ra.mul(t0, t1)
    x3 = ra.add(x3, x3)
    return [x3, y3, z3]


# --------------------------------------------------------------------------
# Kernel plumbing: (16*C*coords, 8, W) VMEM blocks <-> row lists
# --------------------------------------------------------------------------


def _flatten_elem(x):
    """(16, C, [coords,] N) u32 -> (16*C*coords, 8, N/8) block-friendly."""
    shape = x.shape
    n = shape[-1]
    lead = int(np.prod(shape[:-1]))
    return x.reshape(lead, 8, n // 8)


def _pad_lanes(x, block_lanes: int):
    """Pads the trailing lane axis of (16, C..., N) to a block multiple."""
    n = x.shape[-1]
    target = -(-n // block_lanes) * block_lanes
    if target == n:
        return x, n
    pad = [(0, 0)] * (x.ndim - 1) + [(0, target - n)]
    return jnp.pad(x, pad), n


def _mxu_field_for(kernel_name: str) -> RowField:
    """The RowField whose reduction constants ride into this kernel."""
    return ROW_FR if kernel_name == "fr_mul" else ROW_FQ


def _mxu_args(kernel_name: str):
    rf = _mxu_field_for(kernel_name)
    return (
        jnp.asarray(rf.np_t_ninv, dtype=jnp.bfloat16),
        jnp.asarray(rf.np_t_p, dtype=jnp.bfloat16),
    )


def _mxu_in_specs():
    return [
        pl.BlockSpec((32, 32), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((32, 2 * L * 2), lambda *_: (0, 0), memory_space=pltpu.VMEM),
    ]


def _bind_mxu(row_field: RowField, t1_ref, t2_ref) -> None:
    """Clears any stale trace bindings, then binds this kernel's operands."""
    ROW_FR.set_mxu(None)
    ROW_FQ.set_mxu(None)
    if t1_ref is not None:
        row_field.set_mxu((t1_ref[...], t2_ref[...]))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _run_elem_kernel(a_flat, b_flat, kernel_name: str, n_out_rows: int):
    """Shared runner for 2-operand elementwise kernels over row blocks."""
    kern, specs = _KERNELS[kernel_name]
    rows_a = a_flat.shape[0]
    rows_b = b_flat.shape[0]
    w = a_flat.shape[2]
    lane_w = _lane_w(kernel_name)
    grid = (w // lane_w,)

    in_specs = [
        pl.BlockSpec((rows_a, 8, lane_w), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows_b, 8, lane_w), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
    ]
    args = (a_flat, b_flat)
    if MXU_REDUCE:
        in_specs += _mxu_in_specs()
        args += _mxu_args(kernel_name)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n_out_rows, 8, w), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_out_rows, 8, lane_w), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        interpret=_FORCE_INTERPRET,
    )(*args)


def _make_mul_kernel(row_field: RowField):
    def kernel(a_ref, b_ref, *rest):
        out_ref = rest[-1]
        _bind_mxu(row_field, *(rest[:2] if MXU_REDUCE else (None, None)))
        a = [a_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        out = row_field.mul(a, b)
        for i in range(L):
            out_ref[i] = out[i]

    return kernel


def _make_ec_kernel(components: int, op: str):
    ra = row_adapter_for(components)
    C = components

    def load_point(ref, coords, base=0):
        pt = []
        for c in range(coords):
            elem = []
            for comp in range(C):
                elem.append([ref[base + (c * C + comp) * L + i] for i in range(L)])
            pt.append(elem)
        return pt

    def store_point(ref, pt):
        for c, elem in enumerate(pt):
            for comp in range(C):
                for i in range(L):
                    ref[(c * C + comp) * L + i] = elem[comp][i]

    def _bind(rest):
        _bind_mxu(ROW_FQ, *(rest[:2] if MXU_REDUCE else (None, None)))
        return rest[-1]

    if op == "add":

        def kernel(p_ref, q_ref, *rest):
            out_ref = _bind(rest)
            p = load_point(p_ref, 3)
            q = load_point(q_ref, 3)
            store_point(out_ref, rcb_add(ra, p, q))

    elif op == "add_mixed":

        def kernel(p_ref, q_ref, *rest):
            out_ref = _bind(rest)
            p = load_point(p_ref, 3)
            q = load_point(q_ref, 2)
            store_point(out_ref, rcb_add_mixed(ra, p, q))

    elif op == "double":

        def kernel(p_ref, q_ref, *rest):  # q_ref unused (dummy)
            out_ref = _bind(rest)
            p = load_point(p_ref, 3)
            store_point(out_ref, rcb_double(ra, p))

    else:
        raise ValueError(op)

    return kernel


_KERNELS = {
    "fr_mul": (_make_mul_kernel(ROW_FR), None),
    "fq_mul": (_make_mul_kernel(ROW_FQ), None),
    "g1_add": (_make_ec_kernel(1, "add"), None),
    "g1_add_mixed": (_make_ec_kernel(1, "add_mixed"), None),
    "g1_double": (_make_ec_kernel(1, "double"), None),
    "g2_add": (_make_ec_kernel(2, "add"), None),
    "g2_add_mixed": (_make_ec_kernel(2, "add_mixed"), None),
    "g2_double": (_make_ec_kernel(2, "double"), None),
}


# --------------------------------------------------------------------------
# Grid-carry EC prefix scans (the fused MSM's hot stages)
#
# A lax.scan of per-step EC kernel calls round-trips the carry point through
# HBM on every step and pays the kernel pipeline setup k times. These scans
# run the WHOLE prefix as one pallas_call: grid = (lane_blocks, k) with k
# innermost, the running carry lives in a VMEM scratch that persists across
# grid steps (TPU grids execute sequentially), and each step reads/writes
# only its own (8, W) lane block. Two variants:
#   * scan_mixed — inclusive prefixes of AFFINE inputs (the fine intra-block
#     stage): out[j] = sum_{t<=j} aff[t], via identity-initialized carry +
#     complete mixed adds.
#   * scan_excl  — exclusive prefixes of PROJECTIVE inputs (the coarse
#     cross-block stage): out[j] = sum_{t<j} x[t].
# --------------------------------------------------------------------------


def _scan_identity_rows(like, components: int):
    """(0, 1, 0) in LIMB-MAJOR row order ((i*C + m)*3 + c) shaped like `like`."""
    C = components
    zero = jnp.zeros_like(like)
    rows = []
    for i in range(L):
        for m in range(C):
            one_v = (
                jnp.full_like(like, np.uint32(ROW_FQ.one_limbs[i])) if m == 0 else zero
            )
            rows.extend([zero, one_v, zero])
    return rows


def _make_scan_kernel(
    components: int, kind: str, packed_in: bool = False, packed_out: bool = False
):
    """Rows are LIMB-MAJOR, word order (limb, comp, coord) — exactly the AoS
    table-row word order (tables_to_aos_s), so gathered rows feed the kernel
    with a pure reshape and the outputs row-gather the same way.

    packed_in / packed_out: the HBM-facing rows pack limb PAIRS into one u32
    word (word order (limb_pair, comp, coord), value = limb[2j] |
    limb[2j+1] << 16) — limbs are 16-bit so this halves the transpose/gather
    traffic around these scans. Measured: packing the scan OUTPUTS pays
    (the downstream coarse transpose + Q_d row gathers halve); packing the
    mixed scan's INPUT does not (the sorted table-row gather is row-count
    bound, and 64-byte rows gather SLOWER than 128-byte rows — sub-sector
    granularity), so the fused MSM gathers unpacked table rows and packs
    everything after. The carry scratch stays unpacked."""
    ra = row_adapter_for(components)
    C = components
    in_coords = 2 if kind == "mixed" else 3

    def load(ref, coords, lead=True, packed=False):
        idx = (lambda r: (0, r)) if lead else (lambda r: (r,))
        pt = [[[None] * L for _ in range(C)] for _ in range(coords)]
        if packed:
            for j in range(L // 2):
                for m in range(C):
                    for c in range(coords):
                        w = ref[idx((j * C + m) * coords + c)]
                        pt[c][m][2 * j] = w & jnp.uint32(0xFFFF)
                        pt[c][m][2 * j + 1] = w >> jnp.uint32(16)
        else:
            for i in range(L):
                for m in range(C):
                    for c in range(coords):
                        pt[c][m][i] = ref[idx((i * C + m) * coords + c)]
        return pt

    def store(ref, pt, lead=True, packed=False):
        idx = (lambda r: (0, r)) if lead else (lambda r: (r,))
        if packed:
            for j in range(L // 2):
                for m in range(C):
                    for c in range(3):
                        w = pt[c][m][2 * j] | (pt[c][m][2 * j + 1] << jnp.uint32(16))
                        ref[idx((j * C + m) * 3 + c)] = w
            return
        for i in range(L):
            for m in range(C):
                for c in range(3):
                    ref[idx((i * C + m) * 3 + c)] = pt[c][m][i]

    def kernel(x_ref, *rest):
        if MXU_REDUCE:
            t1_ref, t2_ref, out_ref, carry_ref = rest
            _bind_mxu(ROW_FQ, t1_ref, t2_ref)
        else:
            out_ref, carry_ref = rest
            _bind_mxu(ROW_FQ, None, None)
        k_idx = pl.program_id(1)

        @pl.when(k_idx == 0)
        def _init():
            like = x_ref[0, 0]
            rows = _scan_identity_rows(like, C)
            for r in range(3 * C * L):
                carry_ref[r] = rows[r]

        carry = load(carry_ref, 3, lead=False)
        x = load(x_ref, in_coords, packed=packed_in)
        if kind == "mixed":
            new = rcb_add_mixed(ra, carry, x)
            store(out_ref, new, packed=packed_out)
            store(carry_ref, new, lead=False)
        else:  # exclusive projective prefixes
            store(out_ref, carry, packed=packed_out)
            new = rcb_add(ra, carry, x)
            store(carry_ref, new, lead=False)

    return kernel


def _run_scan_kernel_impl(
    x_flat,
    components: int,
    kind: str,
    packed_in: bool = False,
    packed_out: bool = False,
):
    """x_flat: (k, in_rows, 8, w) -> (k, out_rows, 8, w) prefix points."""
    C = components
    in_rows = (2 if kind == "mixed" else 3) * C * L // (2 if packed_in else 1)
    out_rows = 3 * C * L // (2 if packed_out else 1)
    k_steps, rows, _, w = x_flat.shape
    assert rows == in_rows
    name = f"g{'1' if C == 1 else '2'}_scan_{'mixed' if kind == 'mixed' else 'excl'}"
    lane_w = _lane_w(name)
    grid = (w // lane_w, k_steps)
    kern = _make_scan_kernel(C, kind, packed_in, packed_out)
    in_specs = [
        pl.BlockSpec(
            (1, in_rows, 8, lane_w),
            lambda j, kk: (kk, 0, 0, j),
            memory_space=pltpu.VMEM,
        )
    ]
    args = (x_flat,)
    if MXU_REDUCE:
        in_specs += [
            pl.BlockSpec((32, 32), lambda j, kk: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (32, 2 * L * 2), lambda j, kk: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        args += _mxu_args(name)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((k_steps, out_rows, 8, w), jnp.uint32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, out_rows, 8, lane_w),
            lambda j, kk: (kk, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        # the carry scratch always holds UNPACKED limbs
        scratch_shapes=[pltpu.VMEM((3 * C * L, 8, lane_w), jnp.uint32)],
        interpret=_FORCE_INTERPRET,
    )(*args)


_run_scan_kernel = jax.jit(_run_scan_kernel_impl, static_argnums=(1, 2, 3, 4))


def ec_scan_rows(
    components: int,
    x_rows: jnp.ndarray,
    kind: str,
    packed_in: bool = False,
    packed_out: bool = False,
) -> jnp.ndarray:
    """Grid-carry EC prefix scan over the leading k axis.

    x_rows: (k, in_rows, N) u32 with LIMB-MAJOR word rows — in_rows =
    16*C*coords where coords = 2 for kind="mixed" (affine inputs, inclusive
    prefixes) and 3 for kind="excl" (projective inputs, exclusive prefixes).
    Returns (k, 16*C*3, N) projective prefix points in the same row order.

    packed_in / packed_out halve the respective row widths: words hold LIMB
    PAIRS (limb[2j] | limb[2j+1] << 16) in (limb_pair, comp, coord) order.
    """
    C = components
    k_steps, in_rows, n = x_rows.shape
    name = f"g{'1' if C == 1 else '2'}_scan_{'mixed' if kind == 'mixed' else 'excl'}"
    blk = 8 * _lane_w(name)
    target = -(-n // blk) * blk
    if target != n:
        x_rows = jnp.pad(x_rows, [(0, 0), (0, 0), (0, target - n)])
    x3 = x_rows.reshape(k_steps, in_rows, 8, target // 8)
    # interpret mode runs eagerly: under jit the interpreter's op stream
    # would itself be compiled by XLA:CPU (minutes for the limb chains)
    run = _run_scan_kernel_impl if _FORCE_INTERPRET else _run_scan_kernel
    out = run(x3, C, kind, packed_in, packed_out)
    half = 2 if packed_out else 1
    return out.reshape(k_steps, 3 * C * L // half, target)[:, :, :n]


# --------------------------------------------------------------------------
# Public wrappers (shapes follow the package conventions)
# --------------------------------------------------------------------------


def available() -> bool:
    """Pallas TPU kernels need a TPU (or forced interpret mode)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or _FORCE_INTERPRET
    except Exception:
        return False


_FORCE_INTERPRET = False  # set True in tests to run kernels interpreted


def mont_mul(spec_name: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Montgomery multiply on (16, *batch) u32 arrays."""
    shape = a.shape
    a2 = a.reshape(L, -1)
    b2 = b.reshape(L, -1)
    blk = _block_lanes(f"{spec_name}_mul")
    a2, n = _pad_lanes(a2, blk)
    b2, _ = _pad_lanes(b2, blk)
    out = _run_elem_kernel(
        _flatten_elem(a2), _flatten_elem(b2), f"{spec_name}_mul", L
    )
    return out.reshape(L, -1)[:, :n].reshape(shape)


def mont_from(spec_name: str, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> canonical on (16, *batch) u32 via the mul kernel:
    a * 1 * R^-1 = from_mont(a). The XLA elementwise from_mont measured
    ~10x slower at production lane counts (see mont_mul note)."""
    one = jnp.concatenate(
        [
            jnp.ones((1,) + a.shape[1:], dtype=jnp.uint32),
            jnp.zeros((L - 1,) + a.shape[1:], dtype=jnp.uint32),
        ]
    )
    return mont_mul(spec_name, a, one)


def ec_op(op: str, components: int, p: jnp.ndarray, q: jnp.ndarray = None) -> jnp.ndarray:
    """EC kernel on (16, C, coords, *batch) u32 arrays.

    op in {add, add_mixed, double}; q is (16, C, 3/2, *batch) or None.
    Output (16, C, 3, *batch). The (16, C, coords) leading axes move into the
    block's row axis as coord-major/component-minor 16-row groups.
    """
    g = "g1" if components == 1 else "g2"
    shape = p.shape
    batch = shape[3:]
    n = int(np.prod(batch)) if batch else 1
    # (16, C, coords, N) -> (coords, C, 16, N) -> rows
    def to_rows(x, coords):
        x2 = x.reshape(L, components, coords, n)
        x2 = jnp.moveaxis(x2, (2, 1, 0), (0, 1, 2))  # (coords, C, 16, N)
        return x2.reshape(coords * components * L, n)

    p_rows = to_rows(p, 3)
    if op == "double":
        q_rows = p_rows[:1]  # dummy operand
    else:
        q_rows = to_rows(q, 3 if op == "add" else 2)
    blk = _block_lanes(f"{g}_{op}")
    p_rows, n_real = _pad_lanes(p_rows, blk)
    q_rows, _ = _pad_lanes(q_rows, blk)
    out = _run_elem_kernel(
        _flatten_elem(p_rows), _flatten_elem(q_rows), f"{g}_{op}", 3 * components * L
    )
    out = out.reshape(3 * components * L, -1)[:, :n_real]
    out = out.reshape(3, components, L, n)
    out = jnp.moveaxis(out, (0, 1, 2), (2, 1, 0))  # (16, C, 3, N)
    return out.reshape((L, components, 3) + batch)
