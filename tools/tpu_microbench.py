"""TPU speed-of-light microbenchmarks for the limb-arithmetic design space.

Measures, on the real chip:
  * VPU u32 multiply / add elementwise throughput (the current kernels' fuel)
  * VPU f32 FMA throughput (candidate: 12-bit limbs in f32 mantissa)
  * MXU bf16 / int8 matmul throughput (candidate: constant-matrix Montgomery
    reduction as matmul)
  * current Pallas fq_mul and g1 add/add_mixed/double lane throughput
  * one full G1 MSM stage breakdown at production shape (n=8192, B=16)

Run: python tools/tpu_microbench.py [--msm]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, iters=20, flops=None):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    extra = ""
    if flops:
        extra = f"  ({flops / dt / 1e12:.2f} Top/s)"
    print(f"{label}: {dt * 1e3:.3f} ms{extra}", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    N = 1 << 24  # 16M lanes

    a32 = jnp.arange(N, dtype=jnp.uint32)
    b32 = jnp.arange(N, dtype=jnp.uint32) | 1

    @jax.jit
    def mul_chain_u32(a, b):
        x = a
        for _ in range(16):
            x = x * b
        return x

    @jax.jit
    def add_chain_u32(a, b):
        x = a
        for _ in range(16):
            x = x + b
        return x

    @jax.jit
    def shift_chain_u32(a, b):
        x = a
        for _ in range(16):
            x = (x >> 7) ^ b
        return x

    timeit("u32 mul x16 (16M lanes)", mul_chain_u32, a32, b32, flops=16 * N)
    timeit("u32 add x16 (16M lanes)", add_chain_u32, a32, b32, flops=16 * N)
    timeit("u32 shr/xor x16 (16M lanes)", shift_chain_u32, a32, b32, flops=16 * N)

    af = jnp.ones((N,), dtype=jnp.float32)
    bf = jnp.full((N,), 1.5, dtype=jnp.float32)

    @jax.jit
    def fma_chain_f32(a, b):
        x = a
        for _ in range(16):
            x = x * b + a
        return x

    timeit("f32 fma x16 (16M lanes)", fma_chain_f32, af, bf, flops=2 * 16 * N)

    # MXU: constant-matrix multiply shapes for Montgomery reduction
    M, K, Nc = 32768, 64, 64
    x8 = jnp.ones((M, K), dtype=jnp.int8)
    w8 = jnp.ones((K, Nc), dtype=jnp.int8)
    xb = jnp.ones((M, K), dtype=jnp.bfloat16)
    wb = jnp.ones((K, Nc), dtype=jnp.bfloat16)

    @jax.jit
    def mm_i8(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    @jax.jit
    def mm_bf16(x, w):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    timeit(f"int8 matmul {M}x{K}x{Nc}", mm_i8, x8, w8, flops=2 * M * K * Nc)
    timeit(f"bf16 matmul {M}x{K}x{Nc}", mm_bf16, xb, wb, flops=2 * M * K * Nc)
    Mb = 1 << 20
    xb2 = jnp.ones((Mb, K), dtype=jnp.bfloat16)
    timeit(f"bf16 matmul {Mb}x{K}x{Nc}", mm_bf16, xb2, wb, flops=2 * Mb * K * Nc)

    # current Pallas kernels
    from zerokit_tpu.ff import pallas_field as pf
    from zerokit_tpu.ff.field import FqField

    if not pf.available():
        print("pallas not available; skipping kernel benches")
        return

    lanes = 1 << 16
    fa = jnp.ones((16, lanes), dtype=jnp.uint32)
    dt = timeit(
        f"pallas fq_mul ({lanes} lanes)", lambda a: pf.mont_mul("fq", a, a), fa, iters=10
    )
    print(f"  -> {lanes / dt / 1e6:.1f} M muls/s", flush=True)

    p = jnp.ones((16, 1, 3, lanes), dtype=jnp.uint32)
    q = jnp.ones((16, 1, 2, lanes), dtype=jnp.uint32)
    dt = timeit(
        f"pallas g1_add_mixed ({lanes} lanes)",
        lambda p_, q_: pf.ec_op("add_mixed", 1, p_, q_),
        p, q, iters=10,
    )
    print(f"  -> {lanes / dt / 1e6:.2f} M adds/s", flush=True)
    dt = timeit(
        f"pallas g1_add ({lanes} lanes)",
        lambda p_: pf.ec_op("add", 1, p_, p_),
        p, iters=10,
    )
    print(f"  -> {lanes / dt / 1e6:.2f} M adds/s", flush=True)
    dt = timeit(
        f"pallas g1_double ({lanes} lanes)",
        lambda p_: pf.ec_op("double", 1, p_),
        p, iters=10,
    )
    print(f"  -> {lanes / dt / 1e6:.2f} M doubles/s", flush=True)

    # XLA (non-pallas) comparison
    from zerokit_tpu.groth16.curve import CurveOps
    from zerokit_tpu.ff.fq2 import FqAdapter

    cv = CurveOps(FqAdapter)
    dt = timeit(
        f"XLA g1_add_mixed ({lanes} lanes)", jax.jit(cv.add_mixed), p, q, iters=3
    )
    print(f"  -> {lanes / dt / 1e6:.2f} M adds/s", flush=True)


if __name__ == "__main__":
    main()
