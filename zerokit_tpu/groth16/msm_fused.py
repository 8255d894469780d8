"""Single-program batched Pippenger MSM for TPU.

Same algorithm as the eager pipeline in groth16/msm.py (sorted digits, two
level block prefix sums, bucket telescope) but traced into ONE jitted
program per (base-set, batch) shape class. Motivation, measured on the real
chip (v5e via the tunneled backend):

  * the eager orchestration dispatches ~60 programs + hundreds of eager ops
    per MSM; profiler traces show ~30% of device time in copies/reshapes
    between programs and large host-side gaps — one program removes both;
  * the bucket-side Hillis-Steele scans do 8x the lane-adds of a sequential
    scan to win dispatch depth that costs nothing INSIDE a compiled program
    (a lax.scan step is a cheap on-device loop iteration, not a host
    dispatch): q-sum and coarse prefixes here run as narrow sequential
    scans — 1.05M lane-adds drop to 0.13M per window group;
  * sort runs as a single-array sort of packed (digit << log2(n)) | index
    keys (stability for free: equal digits order by index), not a
    key/value argsort;
  * the EC group laws are the same Pallas kernels (ff/pallas_field.py),
    called inside lax.scan bodies so each compiles once.

The eager path stays the default off-TPU: this monolith is hostile to the
XLA:CPU compiler (every EC body costs ~1 min of LLVM there — see
groth16/msm.py compile-economy notes), while on TPU the remote compiler
handles the scan-structured program in one shot and the result lands in the
persistent cache.

Reference semantics: ark-ec VariableBaseMSM (rln/src/partial_proof.rs:98-104
and ark-groth16's internal MSMs) — parity is asserted against the host
big-int MSM in tools/ and by end-to-end proof verification in bench.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ff.field import NUM_LIMBS
from .curve import best_curve_ops
from .msm import C_BITS, N_WINDOWS, _window_group, block_size_for


def available() -> bool:
    from ..ff import pallas_field as pf

    return pf.available()


@functools.lru_cache(maxsize=None)
def _build_fused(adapter, n: int, n_windows: int, c_bits: int, group: int,
                 stage: str = "full", n_instances: int = 1):
    """Returns jit(run)(tables_flat (M*W*n, rowK), scalars (16, n, M*B)) ->
    projective accumulators (16, C, 3, M*B).

    n_instances = M > 1 runs M same-shape MSMs (distinct base sets, lane
    order (m, b)) as ONE program — each pass of the tunneled backend costs
    ~37 ms of fixed dispatch/transfer latency plus shared XLA glue, so the
    prover merges its three same-size G1 query MSMs (a, b1, l) into one
    call. Only the gather base changes: lane l reads table instance l // B.

    stage != "full" truncates the program after the named stage and returns
    a cheap checksum instead — tools/msm_profile.py times consecutive stages
    against each other to attribute the pass cost (the cut points live HERE
    so the profiler can never drift from the real program)."""
    cv = best_curve_ops(adapter)
    comps = adapter.components
    n_buckets = 1 << c_bits
    k = block_size_for(n)
    assert n_windows % group == 0
    n_groups = n_windows // group
    # packed sort keys are (digit << idx_bits) | index in uint32; n need not
    # be a power of two (only K_BLOCK-aligned) — idx_bits covers [0, n)
    idx_bits = (n - 1).bit_length()
    assert c_bits + idx_bits <= 32, "packed sort key overflows uint32"
    per_limb = 16 // c_bits
    mask = np.uint32(n_buckets - 1)

    def digits_of(scalars):
        rows = []
        for w in range(n_windows):
            limb = scalars[w // per_limb]
            rows.append((limb >> ((w % per_limb) * c_bits)) & mask)
        return jnp.stack(rows, axis=0)  # (W, n, B)

    def tree_sum(xs, axis):
        """EC sum along a trailing batch axis via halving rounds: log2(L)
        WIDE kernel calls (narrow sequential scans pay a fixed per-step
        plumbing cost that dominates at <1k lanes — measured ~0.5 ms/step).
        The axis must sit after the (16, C, 3) point dims."""
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

    nb_blk = n // k  # blocks per window
    # The scan OUTPUTS pack limb pairs per u32 word (limbs are 16-bit):
    # halves the fine->coarse transpose and the Q_d row gathers. The table
    # gather stays on unpacked 128-byte rows — it is row-count bound and
    # 64-byte rows gather SLOWER (sub-sector granularity; measured).
    rows_in = NUM_LIMBS * comps * 2
    rows_out = NUM_LIMBS * comps * 3 // 2

    def run(tables_flat, scalars):
        from ..ff import pallas_field as pf

        batch = scalars.shape[2]

        def rows_to_soa(r, positions):
            """(G*pos*B, rows_out) packed limb-pair AoS -> (16,C,3,G,pos,B)."""
            t = r.reshape(group, positions, batch, NUM_LIMBS // 2, comps, 3)
            lo = t & jnp.uint32(0xFFFF)
            hi = t >> jnp.uint32(16)
            st = jnp.stack([lo, hi], axis=4)  # (G,P,B,8,2,C,3)
            st = jnp.transpose(st, (3, 4, 5, 6, 0, 1, 2))  # (8,2,C,3,G,P,B)
            return st.reshape(NUM_LIMBS, comps, 3, group, positions, batch)

        digits = digits_of(scalars)  # (W, n, B)
        if stage == "digits":
            return digits.astype(jnp.uint32).sum()
        window_results = []
        cuts = []
        iota_n = jax.lax.broadcasted_iota(jnp.uint32, (1, n, 1), 1)
        g_iota = jnp.arange(group, dtype=jnp.int32)[:, None, None]
        b_iota = jnp.arange(batch, dtype=jnp.int32)[None, None, :]
        for g in range(n_groups):
            dg = digits[g * group : (g + 1) * group]  # (G, n, B)
            # -- stable sort by digit via packed keys --------------------
            keys = (dg << idx_bits) | iota_n  # (G, n, B)
            skeys = jax.lax.sort(keys, dimension=1)
            order = (skeys & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
            # -- gather AoS table rows in sorted order, k-major so the
            #    fine scan consumes them with a pure 2D transpose ---------
            base = (
                jnp.arange(g * group, (g + 1) * group, dtype=jnp.int32) * n
            )[:, None, None]
            if n_instances > 1:  # per-lane base-set offset (lane order (m, b))
                lane_b = batch // n_instances
                inst = (
                    jnp.arange(batch, dtype=jnp.int32) // lane_b
                ) * (n_windows * n)
                base = base + inst[None, None, :]
            flat = base + order  # (G, n, B); n splits as (NB, k)
            flat_k = jnp.moveaxis(
                flat.reshape(group, nb_blk, k, batch), 2, 0
            ).reshape(-1)  # (k, G, NB, B) flat
            if stage == "sort":
                cuts.append(flat_k.sum())
                continue
            rows = jnp.take(tables_flat, flat_k, axis=0)  # (k*G*NB*B, rowK)
            if stage == "gather":
                cuts.append(rows.astype(jnp.uint32).sum())
                continue
            # -- counts C(d) = #(digit <= d), d in [0, nb-2] -------------
            d32 = dg.astype(jnp.int32)
            g_idx = jnp.broadcast_to(g_iota, d32.shape)
            b_idx = jnp.broadcast_to(b_iota, d32.shape)
            hist = jnp.zeros((group, n_buckets, batch), dtype=jnp.int32)
            hist = hist.at[g_idx, d32, b_idx].add(1)
            counts = jnp.cumsum(hist, axis=1)[:, : n_buckets - 1]
            # -- intra-block inclusive prefixes: ONE grid-carry kernel ---
            lanes = group * nb_blk * batch
            xk = jnp.swapaxes(rows.reshape(k, lanes, rows_in), 1, 2)
            fine_k = pf.ec_scan_rows(
                comps, xk, "mixed", packed_out=True
            )  # (k, rows_out, lanes)
            if stage == "fine":
                cuts.append(fine_k.sum())
                continue
            totals = fine_k[k - 1]  # (rows_out, G*NB*B)
            # -- exclusive block prefixes: grid-carry scan over NB -------
            tx = jnp.moveaxis(
                totals.reshape(rows_out, group, nb_blk, batch), 2, 0
            ).reshape(nb_blk, rows_out, group * batch)
            coarse_k = pf.ec_scan_rows(
                comps, tx, "excl", packed_in=True, packed_out=True
            )  # (NB, rows_out, G*B)
            if stage == "coarse":
                cuts.append(coarse_k.sum() + fine_k.sum())
                continue
            # -- Q_d gather: contiguous AoS row gathers ------------------
            total_col = jnp.full((group, 1, batch), n, dtype=jnp.int32)
            c_all = jnp.concatenate([counts, total_col], axis=1)  # (G,nb,B)
            idx = jnp.maximum(c_all - 1, 0)  # position in [0, n)
            # fine AoS rows: (k, lanes, rows_out); lane order (j, g, nb, b)
            fine_aos = jnp.swapaxes(fine_k, 1, 2).reshape(-1, rows_out)
            fflat = (
                (((idx % k) * group + g_iota) * nb_blk + idx // k) * batch + b_iota
            ).reshape(-1)
            f_rows = jnp.take(fine_aos, fflat, axis=0)  # (G*nb*B, rows_out)
            coarse_aos = jnp.swapaxes(coarse_k, 1, 2).reshape(-1, rows_out)
            cflat = (((idx // k) * group + g_iota) * batch + b_iota).reshape(-1)
            c_rows = jnp.take(coarse_aos, cflat, axis=0)
            q = cv.add(
                rows_to_soa(f_rows, n_buckets), rows_to_soa(c_rows, n_buckets)
            )  # (16,C,3,G,nb,B)
            ident = cv.identity_like(q)
            q = jnp.where((c_all == 0)[None, None, None], ident, q)
            s_total = q[:, :, :, :, n_buckets - 1]
            pos = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, 1, n_buckets, 1), 4
            )
            q = jnp.where(pos == n_buckets - 1, ident, q)
            if stage == "qgather":
                cuts.append(q.sum() + s_total.sum())
                continue
            # -- sum_d Q_d: halving tree ---------------------------------
            sum_q = tree_sum(q, 4)
            # -- telescope: (2^c - 1) * S_total - sum Q ------------------
            t = jax.lax.fori_loop(
                0, c_bits, lambda _, p: cv.double(p), s_total
            )
            if stage == "sumq":
                cuts.append(sum_q.sum() + s_total.sum())
                continue
            terms = jnp.stack([cv.neg(s_total), cv.neg(sum_q)])
            t, _ = jax.lax.scan(lambda acc, x: (cv.add(acc, x), None), t, terms)
            window_results.append(t)  # (16, C, 3, G, B)
        if stage != "full":
            acc = cuts[0]
            for c in cuts[1:]:
                acc = acc + c
            return acc
        all_windows = jnp.concatenate(window_results, axis=3)  # (...,W,B)
        # -- combine windows (tables bake the 2^(c*w) factors): plain sum
        acc = tree_sum(all_windows, 3)
        return acc  # (16, C, 3, B)

    return jax.jit(run)


def fused_msm_pass(adapter, tables_aos, scalars, n, n_windows, c_bits):
    """Drop-in for the eager msm_pipeline: tables_aos (1, W*n, rowK) or
    (W*n, rowK); scalars (16, n, B) canonical. Returns (16, C, 3, B)."""
    group = _window_group(scalars.shape[2], adapter.components, n_windows)
    tables_flat = tables_aos[0] if tables_aos.ndim == 3 else tables_aos
    fn = _build_fused(adapter, n, n_windows, c_bits, group)
    return fn(tables_flat, scalars)


def fused_multi_msm_pass(adapter, tables_cat, scalars_mb, n, n_windows,
                         c_bits, n_instances):
    """M same-shape MSMs as one program. tables_cat: (M*W*n, rowK) —
    instance-major concat of the per-MSM AoS tables; scalars_mb:
    (16, n, M*B) with lane order (m, b). Returns (16, C, 3, M*B)."""
    group = _window_group(scalars_mb.shape[2], adapter.components, n_windows)
    fn = _build_fused(adapter, n, n_windows, c_bits, group, "full", n_instances)
    return fn(tables_cat, scalars_mb)
