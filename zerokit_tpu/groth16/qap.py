"""CircomReduction witness map (snarkjs-compatible R1CS -> QAP) on TPU.

Exact semantics of the reference's CircomReduction
(rln/src/circuit/qap.rs:30-98): evaluate the A/B constraint rows on the
assignment, append the public inputs to A, C = A.*B on the constraint rows,
then h = coset(AB) - coset(C) where coset(x) = fft(distribute_powers(ifft(x),
g_2N)) — the snarkjs trick of reading H*Z off the odd powers of the 2N
domain, expressed on the N domain shifted by the 2N root g_2N.

TPU design: the sparse A/B matrices become static COO index arrays at load;
row evaluation is one batched Montgomery multiply over all nonzeros plus a
segment-sum with deferred modular reduction (limb sums of k terms stay exact
in uint32 for k < 2^10; a log-k chain of conditional subtractions of shifted
p then reduces each row).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.zkey import ConstraintMatrices
from ..constants import NUM_LIMBS
from ..ff.field import FR, FrField, U32, _carry_fold, _sub_limbs
from . import ntt


class QAPError(ValueError):
    pass


class SparseMatrix:
    """Constraint matrix bucketed by padded row density.

    Rows are grouped into power-of-two nnz classes (pad = 2^ceil(log2 nnz));
    each bucket stores static wire-index and Montgomery-coefficient arrays
    padded with (wire 0, coeff 0). The matvec is then gather + multiply +
    a static reshape-sum per bucket and one constant-index permutation back
    to domain order — no scatter-add (dynamic scatters are slow on TPU) and
    no cumsum (XLA:TPU lowers cumsum over ~10K elements to an O(n^2)
    reduce-window; measured 1.9 s for one matvec at b64). Total padded
    entries stay < 2x nnz (row densities: mean ~2, p99 <= 60)."""

    def __init__(self, rows: List[List[Tuple[int, int]]], domain_size: int):
        max_row_nnz = 1
        by_pad: dict = {}
        for r, row in enumerate(rows):
            if not row:
                continue
            max_row_nnz = max(max_row_nnz, len(row))
            pad = 1 << max(0, (len(row) - 1).bit_length())
            by_pad.setdefault(pad, []).append((r, row))
        self.buckets: List[Tuple[int, np.ndarray, np.ndarray]] = []
        out_rows: List[int] = []
        for pad in sorted(by_pad):
            rs = by_pad[pad]
            wires = np.zeros((len(rs), pad), dtype=np.int32)
            coeffs = [0] * (len(rs) * pad)
            for i, (r, row) in enumerate(rs):
                for j, (coeff, wire) in enumerate(row):
                    wires[i, j] = wire
                    coeffs[i * pad + j] = coeff
                out_rows.append(r)
            coeff_arr = np.asarray(FR.encode(coeffs), dtype=np.uint32).reshape(
                NUM_LIMBS, len(rs) * pad
            )
            self.buckets.append((pad, wires, coeff_arr))
        # perm[d] = concat position of row d's sum; absent rows -> zero slot
        n_used = len(out_rows)
        perm = np.full(domain_size, n_used, dtype=np.int32)
        for pos, r in enumerate(out_rows):
            perm[r] = pos
        self.perm = perm
        self.domain_size = domain_size
        self.max_row_nnz = max_row_nnz


def _reduce_partial(limbs: jnp.ndarray, max_terms: int) -> jnp.ndarray:
    """Reduces a (17, *batch) value < max_terms * p to < p via conditional
    subtraction of p << j for j = ceil(log2 max_terms) .. 0."""
    n_bits = max(1, (max_terms - 1).bit_length())
    batch = limbs.shape[1:]
    for j in range(n_bits, -1, -1):
        pj = (FR.p << j)
        pj_limbs = np.array(
            [(pj >> (16 * i)) & 0xFFFF for i in range(limbs.shape[0])], dtype=np.uint32
        )
        pj_b = jnp.broadcast_to(
            jnp.asarray(pj_limbs, U32).reshape((limbs.shape[0],) + (1,) * len(batch)),
            limbs.shape,
        )
        diff, borrow = _sub_limbs(limbs, pj_b)
        limbs = jnp.where((borrow == 0)[None], diff, limbs)
    return limbs[:NUM_LIMBS]


def sparse_matvec(matrix: SparseMatrix, assignment: jnp.ndarray) -> jnp.ndarray:
    """rows_out[r] = sum coeff * z[wire] over the row's nonzeros.

    assignment: (16, n_wires, B) Montgomery. Returns (16, domain_size, B).
    """
    from ..ff import pallas_field as pfmod

    use_pallas = pfmod.available()
    batch = assignment.shape[2:]
    parts = []
    for pad, wires, coeffs in matrix.buckets:
        z = assignment[:, jnp.asarray(wires.reshape(-1))]  # (16, n_c*pad, B)
        cf = jnp.asarray(coeffs).reshape((NUM_LIMBS, z.shape[1]) + (1,) * len(batch))
        cfb = jnp.broadcast_to(cf, z.shape)
        # the multiply runs in the Pallas mont_mul kernel on TPU — the XLA
        # elementwise limb multiply measured ~14x slower (tools/ntt_micro.py)
        prod = pfmod.mont_mul("fr", z, cfb) if use_pallas else FrField.mul(z, cfb)
        # per-limb sums over the pad axis: <= 64 terms < 2^16 — exact in u32
        sums = prod.reshape(
            (NUM_LIMBS, wires.shape[0], pad) + batch
        ).sum(axis=2, dtype=U32)
        parts.append(sums)
    zero = jnp.zeros((NUM_LIMBS, 1) + batch, dtype=U32)
    cat = jnp.concatenate(parts + [zero], axis=1)  # (16, n_used + 1, B)
    # 17 limbs absorb all carries: the sum is < max_row_nnz * p < 2^270
    carry_limbs, _ = _carry_fold(cat, NUM_LIMBS + 1)
    red = _reduce_partial(carry_limbs, matrix.max_row_nnz)
    return red[:, jnp.asarray(matrix.perm)]  # static permutation to domain


class WitnessMapper:
    """Witness map for one circuit's constraint matrices.

    Orchestrated eagerly over small cached jits (matvec, NTT cores,
    pointwise) — the remote TPU compiler scales badly with module size, so
    one monolithic program is avoided; each piece is compiled once and
    shared across the ifft/fft invocations.
    """

    def __init__(self, matrices: ConstraintMatrices, mesh=None):
        """mesh: optional ("dp","tp") jax.sharding.Mesh. When set, the three
        coset lifts run the distributed Bailey NTT (parallel/ntt_sharded.py):
        the domain axis shards over "tp" with all_to_all stage exchange while
        the proof batch stays dp-sharded — the witness map's work no longer
        replicates per device (north star: SURVEY §2d sequence-parallel
        analog; reference hot path qap.rs:69-90 is single-core)."""
        self.num_constraints = matrices.num_constraints
        self.num_inputs = matrices.num_instance_variables
        self.domain_size = ntt.domain_size_for(self.num_constraints + self.num_inputs)
        if mesh is not None:
            tp = mesh.shape.get("tp", 1)
            n2 = self.domain_size // tp if tp and self.domain_size % tp == 0 else 0
            if tp <= 1 or n2 == 0 or n2 & (n2 - 1):
                mesh = None  # domain does not split over this mesh
        self.mesh = mesh
        self.a = SparseMatrix(matrices.a, self.domain_size)
        self.b = SparseMatrix(matrices.b, self.domain_size)
        self.root_2n = ntt.coset_root_2n(self.domain_size)
        self._rows_a = [list(r) for r in matrices.a]
        self._rows_b = [list(r) for r in matrices.b]
        self._coset_powers = None  # built lazily by the host path
        self._matvec_a = jax.jit(functools.partial(sparse_matvec, self.a))
        self._matvec_b = jax.jit(functools.partial(sparse_matvec, self.b))
        self._insert_pub = jax.jit(
            lambda a, pub: jax.lax.dynamic_update_slice_in_dim(
                a, pub, self.num_constraints, axis=1
            )
        )
        # On TPU the whole witness map traces into ONE program (~12 fewer
        # dispatch/materialization boundaries per batch); on CPU the pieces
        # stay separate for compile economy (see class docstring).
        from ..ff import pallas_field as pf

        self._fused_map = jax.jit(self._witness_map_body) if pf.available() else None

    def _coset_lift(self, evals: jnp.ndarray) -> jnp.ndarray:
        return ntt.coset_lift(evals, self.root_2n)

    def _coset_lift_sharded(self, evals: jnp.ndarray) -> jnp.ndarray:
        from ..parallel.ntt_sharded import sharded_fft

        poly = sharded_fft(evals, self.mesh, "tp", inverse=True)
        shifted = ntt.distribute_powers(poly, self.root_2n)
        return sharded_fft(shifted, self.mesh, "tp")

    def _witness_map_body(self, assignment: jnp.ndarray) -> jnp.ndarray:
        a = sparse_matvec(self.a, assignment)
        b = sparse_matvec(self.b, assignment)
        a = jax.lax.dynamic_update_slice_in_dim(
            a, assignment[:, : self.num_inputs], self.num_constraints, axis=1
        )
        from ..ff import pallas_ntt

        batch = assignment.shape[2]
        if pallas_ntt.available(self.domain_size, 3 * batch):
            from ..ff.pallas_field import mont_mul

            c = mont_mul("fr", a, b)  # rows past num_constraints have b == 0,
            # so c stays 0 there exactly as the reference requires
            # (qap.rs:60-67)
            # One batched lift for a/b/c on the kernels' batch-second-minor
            # layout: (16, n, 3B) -> (16, 3B, n), lift, combine, back.
            stacked = jnp.concatenate([a, b, c], axis=2)
            lifted = pallas_ntt.coset_lift_bn(
                jnp.swapaxes(stacked, 1, 2), self.root_2n
            )
            la, lb, lc = jnp.split(lifted, 3, axis=1)
            h_bn = FrField.sub(mont_mul("fr", la, lb), lc)
            return jnp.swapaxes(h_bn, 1, 2)
        c = FrField.mul(a, b)  # see note above
        ab = FrField.mul(self._coset_lift(a), self._coset_lift(b))
        return FrField.sub(ab, self._coset_lift(c))

    @staticmethod
    def _use_host_map() -> bool:
        """QAP backend policy, mirroring Groth16Prover._use_host_msm: the
        XLA:CPU witness map measured 77s WARM at depth-10/B=4 (the limb NTT
        executes ~50x below scalar speed there), while the native C++ NTT
        pipeline runs the same map in ~0.5s. TPU keeps the device pipeline.
        Override with ZK_QAP_BACKEND=device|host."""
        import os

        forced = os.environ.get("ZK_QAP_BACKEND", "auto")
        if forced == "device":
            return False
        from ..runtime import native

        if forced == "host":
            return native.available()
        from ..ff import pallas_field as pf

        return not pf.available() and native.available()

    def _witness_map_host(self, assignment) -> jnp.ndarray:
        """CircomReduction witness map via the native NTT (qap.rs:30-98
        semantics, host integers)."""
        from ..constants import R
        from ..ff.field import FR
        from ..runtime import native

        arr = np.asarray(assignment)
        n_wires, batch = arr.shape[1], arr.shape[2]
        z = FR.decode(arr.reshape(NUM_LIMBS, -1))  # (n_wires*B) ints
        n = self.domain_size
        if self._coset_powers is None:
            acc, powers = 1, []
            for _ in range(n):
                powers.append(acc)
                acc = acc * self.root_2n % R
            self._coset_powers = powers
        pw = self._coset_powers

        def lift(vals):
            poly = native.fr_ntt_native(vals, inverse=True)
            shifted = [p * w % R for p, w in zip(poly, pw)]
            return native.fr_ntt_native(shifted)

        h_cols = []
        for b in range(batch):
            zb = [int(z[i * batch + b]) for i in range(n_wires)]
            av = [0] * n
            bv = [0] * n
            for r, row in enumerate(self._rows_a):
                av[r] = sum(c * zb[w] for c, w in row) % R
            for r, row in enumerate(self._rows_b):
                bv[r] = sum(c * zb[w] for c, w in row) % R
            for j in range(self.num_inputs):
                av[self.num_constraints + j] = zb[j]
            cv = [(x * y) % R for x, y in zip(av, bv)]
            ab = [x * y % R for x, y in zip(lift(av), lift(bv))]
            h_cols.append([(x - y) % R for x, y in zip(ab, lift(cv))])
        flat = [h_cols[b][i] for i in range(n) for b in range(batch)]
        enc = FR.encode(flat).reshape(NUM_LIMBS, n, batch)  # Montgomery
        return jnp.asarray(enc)

    def witness_map(self, assignment: jnp.ndarray) -> jnp.ndarray:
        """assignment: (16, n_wires, B) Montgomery -> h: (16, domain, B)."""
        if self.mesh is None and self._use_host_map():
            return self._witness_map_host(assignment)
        if self.mesh is not None:
            lift = self._coset_lift_sharded
            a = self._matvec_a(assignment)
            b = self._matvec_b(assignment)
            a = self._insert_pub(a, assignment[:, : self.num_inputs])
            c = FrField.mul(a, b)
            ab = FrField.mul(lift(a), lift(b))
            return FrField.sub(ab, lift(c))
        if self._fused_map is not None:
            return self._fused_map(assignment)
        a = self._matvec_a(assignment)
        b = self._matvec_b(assignment)
        a = self._insert_pub(a, assignment[:, : self.num_inputs])
        c = FrField.mul(a, b)
        ab = FrField.mul(self._coset_lift(a), self._coset_lift(b))
        return FrField.sub(ab, self._coset_lift(c))
