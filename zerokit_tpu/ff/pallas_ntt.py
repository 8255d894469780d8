"""Pallas TPU kernels for the radix-2 NTT butterfly stages (BN254 Fr).

Why: the XLA elementwise limb formulation of one butterfly stage measured
~23 ms on (16, 8192, 64) arrays — the fused Montgomery multiply alone runs
~41 ms per 524K lanes under XLA:TPU (intermediates spill; integer multiply
lowers badly) while the Pallas mont_mul kernel does the same in ~3 ms
(tools/ntt_micro.py). These kernels run whole stages (and, for the small-m
stages, ALL of them at once) inside Pallas.

Layout: (16, B, n) u32 — batch SECOND-minor, domain minor. A kernel block is
(16, B_BLK, N_BLK); each limb row is a (B_BLK, N_BLK) vreg tile with the
domain axis on lanes, so per-stage twiddle tables of shape (16, 1, N_BLK)
broadcast across the batch sublanes for free.

Stage structure (matches groth16/ntt.py exactly — same math, same orders):
  * cross-block stages (half-size m >= N_BLK): pairs (i, i+m) live in
    different lane-blocks; the lo/hi/twiddle operands are delivered by
    block index maps, outputs written in-place-style to the same positions.
  * tail stages (m < N_BLK): every remaining stage runs inside ONE kernel
    invocation on a VMEM-resident block — log2(N_BLK) stages of compute per
    byte of HBM traffic. The butterfly pairing uses lane rolls + a parity
    select (in-kernel lane reshapes are Mosaic-hostile; rolls are cheap).
  * the DIF tail optionally fuses the coset pointwise multiply (the
    bitrev-permuted table of groth16/ntt.py) after its last stage — the
    coset_lift's middle pass costs zero extra HBM traffic.

Reference semantics: ark-poly Radix2EvaluationDomain as used by the
CircomReduction witness map (rln/src/circuit/qap.rs:69-90).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import NUM_LIMBS
from . import pallas_field as pf
from .pallas_field import (
    MXU_REDUCE,
    ROW_FR,
    _bind_mxu,
    _mxu_args,
    _mxu_in_specs,
)

L = NUM_LIMBS
U32 = jnp.uint32

B_BLK = 8  # batch sublanes per block
N_BLK = 512  # domain lanes per block (min tail size; 16*8*512*4 = 256 KB/op)


def _load(ref) -> List:
    return [ref[i] for i in range(L)]


def _store(ref, rows) -> None:
    for i in range(L):
        ref[i] = rows[i]


def _bcast_tw(tw_ref) -> List:
    """(16, 1, N_BLK) twiddle block -> rows broadcast over batch sublanes."""
    return [jnp.broadcast_to(tw_ref[i], (B_BLK, N_BLK)) for i in range(L)]


def _make_cross_kernel(direction: str):
    """One butterfly stage for half-size m >= N_BLK (lo/hi in separate
    blocks). dif: (lo', hi') = (lo+hi, (lo-hi)*tw); dit: t = hi*tw,
    (lo', hi') = (lo+t, lo-t)."""

    def kernel(lo_ref, hi_ref, tw_ref, *rest):
        out_lo, out_hi = rest[-2:]
        _bind_mxu(ROW_FR, *(rest[:2] if MXU_REDUCE else (None, None)))
        rf = ROW_FR
        lo = _load(lo_ref)
        hi = _load(hi_ref)
        tw = _bcast_tw(tw_ref)
        if direction == "dif":
            s = rf.add(lo, hi)
            d = rf.mul(rf.sub(lo, hi), tw)
        else:
            t = rf.mul(hi, tw)
            s = rf.add(lo, t)
            d = rf.sub(lo, t)
        _store(out_lo, s)
        _store(out_hi, d)

    return kernel


def _lane_pos():
    return jax.lax.broadcasted_iota(jnp.int32, (B_BLK, N_BLK), 1)


def _tail_stage(rf, rows, tw_rows, m: int, direction: str) -> List:
    """One in-VMEM stage at half-size m < N_BLK via lane rolls.

    Lane j is in the lo half of its pair-block iff (j % 2m) < m. For lo
    lanes, partner = j+m (roll -m brings it here); results: lo lanes get
    s = ..., hi lanes get d computed at the lo position and rolled +m."""
    pos = _lane_pos()
    is_lo = (pos % (2 * m)) < m
    # pltpu.roll is circular with non-negative shift: -m == N_BLK - m
    partner = [pltpu.roll(r, N_BLK - m, 1) for r in rows]  # value at j+m
    if direction == "dif":
        s = rf.add(rows, partner)
        d = rf.mul(rf.sub(rows, partner), tw_rows)
    else:
        t = rf.mul(partner, tw_rows)
        s = rf.add(rows, t)
        d = rf.sub(rows, t)
    d_sh = [pltpu.roll(r, m, 1) for r in d]  # d computed at lo pos -> hi pos
    return [jnp.where(is_lo, s[i], d_sh[i]) for i in range(L)]


def _make_tail_kernel(direction: str, n_blk_stages: int, fuse_table: bool):
    """All stages with m = 1..N_BLK/2 in one invocation. For "dif" the
    stage order is m descending (it runs LAST in the transform) and the
    optional table multiply comes after; for "dit" ascending, table first."""
    ms = [1 << s for s in range(n_blk_stages)]  # 1 .. N_BLK/2
    if direction == "dif":
        ms = ms[::-1]

    def kernel(x_ref, tw_ref, *rest):
        out_ref = rest[-1]
        nargs = 1 if fuse_table else 0
        _bind_mxu(ROW_FR, *(rest[nargs : nargs + 2] if MXU_REDUCE else (None, None)))
        rf = ROW_FR
        rows = _load(x_ref)
        if fuse_table and direction == "dit":
            rows = rf.mul(rows, _bcast_tw(rest[0]))
        for m in ms:
            # stage-m twiddles live at offset m in the concatenated tail
            # table: tail_tw[:, 0, m:2m] tiled across the block's sub-blocks
            tw = [
                jnp.broadcast_to(
                    pltpu.repeat(tw_ref[i][:, m : 2 * m], N_BLK // m, 1),
                    (B_BLK, N_BLK),
                )
                for i in range(L)
            ]
            rows = _tail_stage(rf, rows, tw, m, direction)
        if fuse_table and direction == "dif":
            rows = rf.mul(rows, _bcast_tw(rest[0]))
        _store(out_ref, rows)

    return kernel


# --------------------------------------------------------------------------
# Host-side runners
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _tail_tw_table(n: int, inverse: bool) -> np.ndarray:
    """(16, 1, N_BLK) concatenated tail twiddles: slot [m:2m) holds stage
    m's twiddles w_m^0..w_m^(m-1) (m = 1..N_BLK/2); slot 0 unused."""
    from ..groth16.ntt import _stage_twiddles

    tables = _stage_twiddles(n, inverse)
    out = np.zeros((L, N_BLK), dtype=np.uint32)
    for s in range(1, N_BLK.bit_length()):
        m = 1 << (s - 1)
        out[:, m : 2 * m] = tables[s - 1][:, :m]
    return out.reshape(L, 1, N_BLK)


@functools.lru_cache(maxsize=None)
def _stage_tw_padded(n: int, s: int, inverse: bool) -> np.ndarray:
    from ..groth16.ntt import _stage_twiddles

    return _stage_twiddles(n, inverse)[s - 1].reshape(L, 1, -1)


def _grid_cross(b: int, n: int, m: int):
    """Grid + index maps for a cross-block stage on (16, B, n)."""
    blocks_2m = n // (2 * m)
    j_blocks = m // N_BLK
    grid = (b // B_BLK, blocks_2m, j_blocks)

    def lo_idx(ib, blk, j):
        return (0, ib, blk * (2 * j_blocks) + j)

    def hi_idx(ib, blk, j):
        return (0, ib, blk * (2 * j_blocks) + j_blocks + j)

    def tw_idx(ib, blk, j):
        return (0, 0, j)

    return grid, lo_idx, hi_idx, tw_idx


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _run_cross(x, m: int, direction: str, inverse: bool):
    """x: (16, B, n). Runs one cross-block stage in-place-style."""
    _, b, n = x.shape
    s = m.bit_length()  # stage index (m = 2^(s-1))
    tw = jnp.asarray(_stage_tw_padded(n, s, inverse))
    grid, lo_idx, hi_idx, tw_idx = _grid_cross(b, n, m)
    blk = (L, B_BLK, N_BLK)
    in_specs = [
        pl.BlockSpec(blk, lo_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec(blk, hi_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 1, N_BLK), tw_idx, memory_space=pltpu.VMEM),
    ]
    args = (x, x, tw)
    if MXU_REDUCE:
        in_specs += [
            pl.BlockSpec((32, 32), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 64), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += _mxu_args("fr_mul")
    out_lo, out_hi = pl.pallas_call(
        _make_cross_kernel(direction),
        out_shape=[
            jax.ShapeDtypeStruct((L, b, n // 2), U32),
            jax.ShapeDtypeStruct((L, b, n // 2), U32),
        ],
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(blk, lambda ib, blk_, j: (0, ib, blk_ * (m // N_BLK) + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda ib, blk_, j: (0, ib, blk_ * (m // N_BLK) + j),
                         memory_space=pltpu.VMEM),
        ],
        interpret=pf._FORCE_INTERPRET,
    )(*args)
    # out_lo holds the lo-half results (contiguous per 2m-block), out_hi the
    # hi-half; interleave them back to in-place order: (B, nb, 2, m)
    nb = n // (2 * m)
    lo4 = out_lo.reshape(L, b, nb, 1, m)
    hi4 = out_hi.reshape(L, b, nb, 1, m)
    return jnp.concatenate([lo4, hi4], axis=3).reshape(L, b, n)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _run_tail(x, table, direction: str, inverse: bool, fuse_table: bool):
    """x: (16, B, n); runs all m < N_BLK stages (+ optional fused pointwise
    table multiply, table: (16, 1, n))."""
    _, b, n = x.shape
    n_stages = N_BLK.bit_length() - 1  # m = 1 .. N_BLK/2
    tail_tw = jnp.asarray(_tail_tw_table(n, inverse))
    grid = (b // B_BLK, n // N_BLK)
    in_specs = [
        pl.BlockSpec((L, B_BLK, N_BLK), lambda ib, j: (0, ib, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((L, 1, N_BLK), lambda ib, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, tail_tw]
    if fuse_table:
        in_specs.append(
            pl.BlockSpec((L, 1, N_BLK), lambda ib, j: (0, 0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(table)
    if MXU_REDUCE:
        in_specs += [
            pl.BlockSpec((32, 32), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 64), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += _mxu_args("fr_mul")
    return pl.pallas_call(
        _make_tail_kernel(direction, n_stages, fuse_table),
        out_shape=jax.ShapeDtypeStruct((L, b, n), U32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, B_BLK, N_BLK), lambda ib, j: (0, ib, j),
                               memory_space=pltpu.VMEM),
        interpret=pf._FORCE_INTERPRET,
    )(*args)


def dif(x: jnp.ndarray, inverse: bool, table: jnp.ndarray = None) -> jnp.ndarray:
    """Full DIF pass on (16, B, n): natural -> bit-reversed order. Optionally
    fuses a final pointwise multiply by `table` (16, 1, n)."""
    n = x.shape[2]
    m = n // 2
    while m >= N_BLK:
        x = _run_cross(x, m, "dif", inverse)
        m //= 2
    return _run_tail(x, table, "dif", inverse, table is not None)


def dit(x: jnp.ndarray, inverse: bool, table: jnp.ndarray = None) -> jnp.ndarray:
    """Full DIT pass on (16, B, n): bit-reversed -> natural order. Optionally
    fuses an initial pointwise multiply by `table`."""
    n = x.shape[2]
    x = _run_tail(x, table, "dit", inverse, table is not None)
    m = N_BLK
    while m <= n // 2:
        x = _run_cross(x, m, "dit", inverse)
        m *= 2
    return x


def available(n: int, b: int) -> bool:
    """These kernels need a TPU, n a multiple of 2*N_BLK, B of B_BLK."""
    return (
        pf.available()
        and n % (2 * N_BLK) == 0
        and b % B_BLK == 0
    )


def coset_lift_bn(evals_bn: jnp.ndarray, root: int) -> jnp.ndarray:
    """coset_lift on batch-second-minor layout: (16, B, n) -> (16, B, n).
    Same math as groth16/ntt.py coset_lift: DIF (inverse twiddles) ->
    bitrev-permuted coset table with 1/n folded in (fused into the DIF
    tail) -> DIT (forward)."""
    from ..groth16.ntt import _coset_table_brev

    n = evals_bn.shape[2]
    table = jnp.asarray(_coset_table_brev(n, root).reshape(L, 1, n))
    x = dif(evals_bn, True, table)
    return dit(x, False)
