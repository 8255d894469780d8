"""Prototype: Montgomery reduction's constant multiplies on the MXU.

The measured design space (tools/tpu_microbench.py): u32 VPU multiplies run
~3.6 Top/s while MXU int8/bf16 matmuls run ~165+ Top/s. Inside mont_mul,
~60% of the multiplies are BY CONSTANTS (t[:16] * n', m * p) — a multiply by
a constant is a matmul of the operand's byte-decomposition against a fixed
byte Toeplitz matrix, which is exact in bf16 (bytes 0..255 and their
products are exact; f32 accumulation of <= 64 terms < 2^23 is exact).

This tool builds a Pallas kernel with mont_reduce's two constant multiplies
rewritten as in-kernel dot_generals, checks bit-exactness against the host
field, and times it against the shipped pallas mont_mul at production lane
counts. If the matmul variant wins, the RowField in ff/pallas_field.py
adopts it (the EC kernels inherit automatically).

Run: python tools/mxu_mont_prototype.py [lanes]
"""

import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from zerokit_tpu.constants import LIMB_BITS, NUM_LIMBS
from zerokit_tpu.ff import pallas_field as pf
from zerokit_tpu.ff.field import FQ
from zerokit_tpu.ff.pallas_field import (
    L,
    MASK,
    ROW_FQ,
    _carry_fold_rows,
    _const_rows,
    _mul_cols_rows,
)

U32 = jnp.uint32


def _toeplitz_bytes(limbs16: np.ndarray, n_out_bytecols: int) -> np.ndarray:
    """Constant (16-bit limbs) -> (32, n_out) byte Toeplitz T with
    T[i, k] = byte_{k-i} of the constant, so that for an operand's byte
    vector m (32,), (m @ T)[k] = sum_i m_i * c_{k-i} = byte-column k of
    m * c."""
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


class RowFieldMXU(pf.RowField):
    """RowField with mont_reduce's constant multiplies on the MXU.

    The Toeplitz operands are kernel INPUTS (Pallas forbids captured
    constants); set_toeplitz binds the traced refs for the kernel body."""

    def __init__(self, spec):
        super().__init__(spec)
        self.np_t_ninv = _toeplitz_bytes(self.ninv_limbs, 32)  # m mod 2^256
        self.np_t_p = _toeplitz_bytes(self.p_limbs, 64)
        self._t_ninv = None
        self._t_p = None

    def set_toeplitz(self, t_ninv, t_p):
        self._t_ninv = t_ninv
        self._t_p = t_p

    def _const_mul_mxu(self, rows, toeplitz, n_cols16: int):
        """rows: 16 (8, W) u32 limb rows -> n_cols16 u32 column accumulators
        of rows * const via one bf16 matmul over the byte decomposition."""
        byte_rows = []
        for r in rows:
            byte_rows.append(r & jnp.uint32(0xFF))
            byte_rows.append(r >> jnp.uint32(8))
        m = jnp.stack(byte_rows)  # (32, 8, W)
        s8, w = m.shape[1], m.shape[2]
        # Mosaic lacks a direct u32 -> bf16 cast; go via i32 -> f32 (exact
        # for byte values)
        mb = (
            m.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        ).reshape(32, s8 * w)
        out = jax.lax.dot_general(
            toeplitz, mb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (2C, 8W)
        outu = out.astype(jnp.int32).astype(jnp.uint32).reshape(2 * n_cols16, s8, w)
        # byte columns -> 16-bit columns: c16[j] = b[2j] + (b[2j+1] << 8);
        # each < 64 * 255^2 * 257 < 2^31, and the limb fold only needs
        # hi = c >> 16 < 2^15 so y < 2^17 keeps the KS generate bits boolean
        return [outu[2 * j] + (outu[2 * j + 1] << jnp.uint32(8)) for j in range(n_cols16)]

    def mont_reduce(self, t_cols):
        t, t_extra = _carry_fold_rows(t_cols, 2 * L)
        m_cols = self._const_mul_mxu(t[:L], self._t_ninv, L)
        m, _ = _carry_fold_rows(m_cols, L)
        mp_cols = self._const_mul_mxu(m, self._t_p, 2 * L)
        total = [mp_cols[i] + t[i] for i in range(2 * L)]
        folded, overflow = _carry_fold_rows(total, 2 * L)
        return self._cond_sub_p(folded[L:], overflow + t_extra)


ROW_FQ_MXU = RowFieldMXU(FQ)


def _mxu_mul_kernel(a_ref, b_ref, tninv_ref, tp_ref, out_ref):
    ROW_FQ_MXU.set_toeplitz(tninv_ref[...], tp_ref[...])
    a = [a_ref[i] for i in range(L)]
    b = [b_ref[i] for i in range(L)]
    out = ROW_FQ_MXU.mul(a, b)
    for i in range(L):
        out_ref[i] = out[i]


@functools.partial(jax.jit, static_argnums=(2,))
def run_mxu_mul(a_flat, b_flat, lane_w: int):
    w = a_flat.shape[2]
    tninv = jnp.asarray(ROW_FQ_MXU.np_t_ninv[:, :32], dtype=jnp.bfloat16)
    tp = jnp.asarray(ROW_FQ_MXU.np_t_p, dtype=jnp.bfloat16)
    return pl.pallas_call(
        _mxu_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, 8, w), jnp.uint32),
        grid=(w // lane_w,),
        in_specs=[
            pl.BlockSpec((L, 8, lane_w), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 8, lane_w), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 64), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, 8, lane_w), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
    )(a_flat, b_flat, tninv, tp)


def main():
    lanes = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    lane_w = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    rng = np.random.default_rng(7)
    a_ints = [int.from_bytes(rng.bytes(31), "little") for _ in range(lanes)]
    b_ints = [int.from_bytes(rng.bytes(31), "little") for _ in range(lanes)]
    a = jnp.asarray(np.asarray(FQ.encode(a_ints), dtype=np.uint32).reshape(L, lanes))
    b = jnp.asarray(np.asarray(FQ.encode(b_ints), dtype=np.uint32).reshape(L, lanes))

    a3 = a.reshape(L, 8, lanes // 8)
    b3 = b.reshape(L, 8, lanes // 8)

    # correctness on a slice
    t0 = time.time()
    out = run_mxu_mul(a3, b3, lane_w)
    out.block_until_ready()
    print(f"mxu kernel compile+run: {time.time() - t0:.1f}s", flush=True)
    got = np.asarray(out).reshape(L, lanes)
    want_host = [
        int(FQ.decode(np.asarray(pf.mont_mul("fq", a[:, i : i + 1], b[:, i : i + 1])))[0])
        for i in range(4)
    ]
    got_dec = FQ.decode(got[:, :4])
    for i in range(4):
        assert int(got_dec[i]) == want_host[i], (
            f"lane {i}: {int(got_dec[i])} != {want_host[i]}"
        )
    # full-width check vs the shipped kernel
    ref = np.asarray(pf.mont_mul("fq", a, b))
    assert np.array_equal(got, ref), "MXU mont_mul mismatch vs shipped kernel"
    print("bit-exact vs shipped mont_mul", flush=True)

    def bench(label, fn):
        fn().block_until_ready()
        ts = []
        for _ in range(10):
            t0 = time.time()
            fn().block_until_ready()
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"{label}: {dt * 1e3:.3f} ms  ({lanes / dt / 1e6:.1f} M muls/s)", flush=True)
        return dt

    d_old = bench("shipped mont_mul", lambda: pf.mont_mul("fq", a, b))
    d_new = bench("mxu mont_mul   ", lambda: run_mxu_mul(a3, b3, lane_w))
    print(f"speedup: {d_old / d_new:.2f}x", flush=True)


if __name__ == "__main__":
    main()
