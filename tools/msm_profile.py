"""Stage-attribution bisect for the fused TPU MSM.

Builds partial variants of the fused single-program MSM (sort only, +gather,
+fine scan, ...) and times each warm, forcing completion by device->host
transfer (this backend's block_until_ready can return early). The difference
between consecutive variants attributes the pass time to each stage, guiding
round-4 optimization (VERDICT: ~450ms/pass of glue above a ~130ms kernel
floor).

Usage: python tools/msm_profile.py [n] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zerokit_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

from zerokit_tpu.constants import NUM_LIMBS
from zerokit_tpu.ff.fq2 import FqAdapter
from zerokit_tpu.groth16.curve import best_curve_ops
from zerokit_tpu.groth16.msm import (
    C_BITS,
    N_WINDOWS,
    MSM,
    _window_group,
    block_size_for,
)


def make_variant(adapter, n, n_windows, c_bits, group, stage):
    """stage in {digits, sort, gather, fine, coarse, qgather, sumq, full}."""
    cv = best_curve_ops(adapter)
    comps = adapter.components
    n_buckets = 1 << c_bits
    k = block_size_for(n)
    n_groups = n_windows // group
    idx_bits = n.bit_length() - 1
    per_limb = 16 // c_bits
    mask = np.uint32(n_buckets - 1)

    def digits_of(scalars):
        rows = []
        for w in range(n_windows):
            limb = scalars[w // per_limb]
            rows.append((limb >> ((w % per_limb) * c_bits)) & mask)
        return jnp.stack(rows, axis=0)

    def tree_sum(xs, axis):
        d = xs.shape[axis]
        while d > 1:
            half = d // 2
            a = jax.lax.slice_in_dim(xs, 0, half, axis=axis)
            b = jax.lax.slice_in_dim(xs, half, 2 * half, axis=axis)
            combined = cv.add(a, b)
            if d % 2:
                rem = jax.lax.slice_in_dim(xs, 2 * half, d, axis=axis)
                combined = jnp.concatenate([combined, rem], axis=axis)
            xs = combined
            d = xs.shape[axis]
        return jnp.squeeze(xs, axis=axis)

    def hs_excl_prefix(xs, axis):
        ln = xs.shape[axis]
        shape = [1] * xs.ndim
        shape[axis] = ln
        pos = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), axis)
        shift = 1
        while shift < ln:
            sval = jnp.roll(xs, shift, axis=axis)
            xs = jnp.where(pos < shift, xs, cv.add(sval, xs))
            shift *= 2
        sval = jnp.roll(xs, 1, axis=axis)
        return jnp.where(pos == 0, cv.identity_like(xs), sval)

    def run(tables_flat, scalars):
        batch = scalars.shape[2]
        digits = digits_of(scalars)
        if stage == "digits":
            return digits.astype(jnp.uint32).sum()
        outs = []
        iota_n = jax.lax.broadcasted_iota(jnp.uint32, (1, n, 1), 1)
        for g in range(n_groups):
            dg = digits[g * group : (g + 1) * group]
            keys = (dg << idx_bits) | iota_n
            skeys = jax.lax.sort(keys, dimension=1)
            order = (skeys & jnp.uint32(n - 1)).astype(jnp.int32)
            if stage == "sort":
                outs.append(order.sum())
                continue
            base = (
                jnp.arange(g * group, (g + 1) * group, dtype=jnp.int32) * n
            )[:, None, None]
            flat = (base + order).reshape(-1)
            rows = jnp.take(tables_flat, flat, axis=0)
            aff = rows.T.reshape(NUM_LIMBS, comps, 2, group, n, batch)
            if stage == "gather":
                outs.append(aff.astype(jnp.uint32).sum())
                continue
            d32 = dg.astype(jnp.int32)
            g_idx = jnp.broadcast_to(
                jnp.arange(group, dtype=jnp.int32)[:, None, None], d32.shape
            )
            b_idx = jnp.broadcast_to(
                jnp.arange(batch, dtype=jnp.int32)[None, None, :], d32.shape
            )
            hist = jnp.zeros((group, n_buckets, batch), dtype=jnp.int32)
            hist = hist.at[g_idx, d32, b_idx].add(1)
            counts = jnp.cumsum(hist, axis=1)[:, : n_buckets - 1]
            blocks = aff.reshape(NUM_LIMBS, comps, 2, group, n // k, k, batch)
            cols = jnp.moveaxis(blocks, 5, 0)
            first = cv.from_affine(cols[0])

            def fine_body(carry, col):
                new = cv.add_mixed(carry, col)
                return new, new

            last_carry, ys = jax.lax.scan(fine_body, first, cols[1:])
            fine = jnp.concatenate([first[None], ys], axis=0)
            fine = jnp.moveaxis(fine, 0, 5)
            fine = fine.reshape(NUM_LIMBS, comps, 3, group, n, batch)
            totals = last_carry
            if stage == "fine":
                outs.append(fine.sum() + totals.sum())
                continue
            coarse_excl = hs_excl_prefix(totals, 4)
            if stage == "coarse":
                outs.append(coarse_excl.sum() + fine.sum())
                continue
            total_col = jnp.full((group, 1, batch), n, dtype=jnp.int32)
            c_all = jnp.concatenate([counts, total_col], axis=1)
            idx = jnp.maximum(c_all - 1, 0)
            shape = fine.shape[:4] + idx.shape[1:]
            idx_b = jnp.broadcast_to(idx[None, None, None], shape)
            f = jnp.take_along_axis(fine, idx_b, axis=4)
            blk_b = jnp.broadcast_to((idx // k)[None, None, None], shape)
            cq = jnp.take_along_axis(coarse_excl, blk_b, axis=4)
            q = cv.add(f, cq)
            ident = cv.identity_like(q)
            q = jnp.where((c_all == 0)[None, None, None], ident, q)
            s_total = q[:, :, :, :, n_buckets - 1]
            pos = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, 1, n_buckets, 1), 4
            )
            q = jnp.where(pos == n_buckets - 1, ident, q)
            if stage == "qgather":
                outs.append(q.sum() + s_total.sum())
                continue
            sum_q = tree_sum(q, 4)
            if stage == "sumq":
                outs.append(sum_q.sum() + s_total.sum())
                continue
            t = jax.lax.fori_loop(0, c_bits, lambda _, p: cv.double(p), s_total)
            terms = jnp.stack([cv.neg(s_total), cv.neg(sum_q)])
            t, _ = jax.lax.scan(lambda acc, x: (cv.add(acc, x), None), t, terms)
            outs.append(t)
        if stage != "full":
            acc = outs[0]
            for o in outs[1:]:
                acc = acc + o
            return acc
        all_windows = jnp.concatenate(outs, axis=3)
        return tree_sum(all_windows, 3)

    return jax.jit(run)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    stages = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "digits", "sort", "gather", "fine", "coarse", "qgather", "sumq", "full",
    ]
    rng = np.random.default_rng(0)
    # random small multiples of the generator as the base set
    from zerokit_tpu.hostmath import bn254

    gen = (1, 2)  # BN254 G1 generator
    pts = []
    p = gen
    for _ in range(64):
        pts.append((int(p[0]), int(p[1])))
        p = bn254.G1.add(p, gen)
    points = [pts[i % 64] for i in range(n)]
    msm = MSM(points, FqAdapter)
    tables = msm.tables()[0]
    scal = rng.integers(0, 1 << 16, size=(NUM_LIMBS, n, batch), dtype=np.uint32)
    scalars = jnp.asarray(scal)
    group = _window_group(batch, 1, N_WINDOWS)
    print(f"n={n} batch={batch} group={group}", flush=True)

    prev = 0.0
    for stage in stages:
        fn = make_variant(FqAdapter, n, N_WINDOWS, C_BITS, group, stage)
        t0 = time.time()
        out = fn(tables, scalars)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            out = fn(tables, scalars)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"{stage:8s}: {best*1e3:8.1f} ms  (delta {1e3*(best-prev):+8.1f} ms,"
            f" compile {compile_s:.1f}s)",
            flush=True,
        )
        prev = best


if __name__ == "__main__":
    main()
