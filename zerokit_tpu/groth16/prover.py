"""Groth16 prover: batched full proving + two-phase partial/finish on TPU.

Semantics parity:
  * full prove — ark-groth16 create_proof_with_reduction_and_matrices with
    CircomReduction (reference call site rln/src/protocol/proof.rs:721,766):
        g_a  = alpha + sum_i z_i A_i + r delta_1
        g1_b = beta_1 + sum_i z_i B1_i + s delta_1   (zero when r == 0)
        g2_b = beta_2 + sum_i z_i B2_i + s delta_2
        g_c  = s g_a + r g1_b - rs delta_1 + sum_aux z L + sum h_i H_i
  * partial/finish — reference rln/src/partial_proof.rs:108-299: the witness
    is split by a known-mask; prove_partial precomputes the 4 MSMs over known
    entries (+ alpha/beta offsets), finish runs the complement MSMs, the
    h_query MSM, and the blinding assembly.

TPU mapping: witness evaluation, the QAP witness map (NTT pipeline) and all
five MSMs run batched on device; the final ~10 group operations per proof
(blinding algebra) run on host over the decoded MSM accumulators.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..circuit import graph as graphmod
from ..circuit import witness_host
from ..circuit.witness_eval import UnsupportedGraph, WitnessEvaluator
from ..circuit.zkey import Zkey
from ..constants import NUM_LIMBS, R
from ..ff.field import FR, FrField, encode_canonical_fast
from ..ff.fq2 import Fq2Adapter, FqAdapter
from ..hostmath import bn254
from .msm import MSM
from .qap import WitnessMapper

Proof = Tuple[object, object, object]  # (a: G1 affine, b: G2 affine, c: G1 affine)

MIN_BATCH = 4


def _eval_lane_batch() -> int:
    """Streaming chunk for the witness evaluator — deliberately LARGER than
    the MSM LANE_BATCH: the evaluator's cost is scan-step latency (~10K tiny
    sequential steps), which is nearly flat in the lane count, so wide
    chunks amortize it ~linearly while the buffer stays a few hundred MB.
    Override with ZK_EVAL_LANE_BATCH."""
    import os

    forced = os.environ.get("ZK_EVAL_LANE_BATCH")
    if forced:
        return int(forced)
    from ..ff import pallas_field as pf

    from .msm import LANE_BATCH

    return 256 if pf.available() else LANE_BATCH


def _padded_batch(b: int) -> int:
    """Pads batch sizes to powers of two so device programs compile once per
    size class (TPU compiles of the proving pipeline are expensive)."""
    n = MIN_BATCH
    while n < b:
        n *= 2
    return n


@dataclass
class PartialProof:
    """Precomputed partial proof (reference partial_proof.rs:30-43).

    mask[i] refers to assignment entry i of (instance[1:] || witness),
    i.e. the full assignment without its leading constant-1 wire.
    """

    mask: List[bool]
    partial_pi_a: object  # G1 affine
    partial_rho: object  # G1 affine
    partial_pi_b: object  # G2 affine
    partial_pi_c: object  # G1 affine


class ProverError(ValueError):
    pass


class Groth16Prover:
    # Class-level default: provers assembled via ``Groth16Prover.__new__``
    # (mesh parity helpers, dryrun tiers, tests) skip __init__ and must still
    # find the fused-group slot defined.
    _g1_group = None

    def __init__(self, zkey: Zkey, graph: graphmod.Graph, mesh=None):
        """mesh: optional jax.sharding.Mesh with ("dp", "tp") axes. When set,
        the five proving MSMs shard their base points over "tp" (cached
        per-shard window tables, all_gather + EC tree-reduce combine) and the
        proof batch axis shards over "dp" (parallel/sharded.py ShardedMSM);
        single-device results are bit-identical."""
        self.zkey = zkey
        self.graph = graph
        self.mesh = mesh
        pk = zkey.pk
        self.num_inputs = zkey.matrices.num_instance_variables
        self.n_wires = len(pk.a_query)
        try:
            self.evaluator: Optional[WitnessEvaluator] = WitnessEvaluator(graph)
        except UnsupportedGraph:
            self.evaluator = None  # exotic ops: host interpreter fallback
        self.mapper = WitnessMapper(zkey.matrices, mesh=mesh)
        if mesh is not None:
            from ..parallel.sharded import ShardedMSM

            def make(points, adapter):
                return ShardedMSM(points, adapter, mesh)
        elif self._use_host_msm():
            from .msm_host import HostMSM

            make = HostMSM
        else:
            make = MSM
        self.msm_a = make(pk.a_query, FqAdapter)
        self.msm_b1 = make(pk.b_g1_query, FqAdapter)
        self.msm_b2 = make(pk.b_g2_query, Fq2Adapter)
        self.msm_h = make(pk.h_query, FqAdapter)
        self.msm_l = make(pk.l_query, FqAdapter)
        # merge the three same-size G1 query MSMs into one fused program per
        # pass (FusedMSMGroup) — saves 2x the fixed dispatch latency and XLA
        # glue of the tunneled backend on every pass
        self._g1_group = None
        if (
            make is MSM
            and getattr(self.msm_a, "_fused", False)
            and getattr(self.msm_b1, "_fused", False)
            and getattr(self.msm_l, "_fused", False)
            and self.msm_a.n == self.msm_b1.n == self.msm_l.n
        ):
            from .msm import FusedMSMGroup

            self._g1_group = FusedMSMGroup([self.msm_a, self.msm_b1, self.msm_l])

    @staticmethod
    def _use_host_msm() -> bool:
        """MSM backend policy. On TPU: the device pipeline (the product hot
        path). On CPU-only hosts: the native C++ Pippenger — XLA:CPU takes
        minutes to compile EACH device EC program, which is unusable for
        tests and CPU serving, while the native MSM needs no compile and
        runs a depth-10 query in ~100 ms/lane. Override with
        ZK_MSM_BACKEND=device|host."""
        import os

        forced = os.environ.get("ZK_MSM_BACKEND", "auto")
        if forced == "device":
            return False
        if forced == "host":
            return True
        from ..ff import pallas_field as pf

        return not pf.available()

    # -- witness evaluation --------------------------------------------------

    def _batch_target(self, batch: int) -> int:
        """Power-of-two batch size class, at least the mesh's dp degree."""
        dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        return _padded_batch(max(batch, dp))

    def full_assignments(self, named_inputs: Dict[str, Sequence[Sequence[int]]], batch: int):
        """Returns the Montgomery assignment (16, n_wires, B) on device.
        The batch axis is padded to a power-of-two size class (the padding
        lanes replicate lane 0); callers slice back down."""
        if self.evaluator is not None:
            chunk = _eval_lane_batch() * (
                self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
            )
            if batch > chunk:  # reuse the LANE_BATCH-class compiled evaluator
                parts = []
                for lo in range(0, batch, chunk):
                    hi = min(lo + chunk, batch)
                    sub = {
                        name: [col[lo:hi] for col in cols]
                        for name, cols in named_inputs.items()
                    }
                    parts.append(self.full_assignments(sub, hi - lo))
                return jnp.concatenate(parts, axis=2)
            target = self._batch_target(batch)
            if target != batch:
                named_inputs = {
                    name: [list(col) + [col[0]] * (target - batch) for col in cols]
                    for name, cols in named_inputs.items()
                }
            buf = self.evaluator.build_input_buffer(named_inputs, target)
            out = self.evaluator.evaluate_mont(buf)
            # scrub the host-side input buffer (it holds identity-secret
            # limbs) once the device owns its copy — reference semantics:
            # iden3calc.rs:44-57 zeroizes the witness input buffer
            out.block_until_ready()
            buf.fill(0)
            return out
        cols = []
        for b in range(batch):
            single = {k: [col[b] for col in v] for k, v in named_inputs.items()}
            cols.append(witness_host.calc_witness(single, self.graph))
        flat = [cols[b][i] for i in range(self.n_wires) for b in range(batch)]
        canon = encode_canonical_fast(flat).reshape(NUM_LIMBS, self.n_wires, batch)
        return FrField.to_mont(canon)

    # -- full proving --------------------------------------------------------

    def prove_batch(
        self,
        named_inputs: Dict[str, Sequence[Sequence[int]]],
        rs: Sequence[int],
        ss: Sequence[int],
        metrics=None,
    ) -> List[Proof]:
        from ..runtime.profiling import stage_timer

        batch = len(rs)
        with stage_timer(metrics, "witness_eval"):
            assignment = self.full_assignments(named_inputs, batch)
            assignment.block_until_ready()
        return self.prove_batch_with_assignment(assignment, rs, ss, metrics=metrics)

    def prove_batch_with_assignment(self, assignment, rs, ss, metrics=None) -> List[Proof]:
        from ..runtime.profiling import stage_timer
        from .msm import LANE_BATCH

        batch = len(rs)
        # Stream big batches through the LANE_BATCH-class compiled programs —
        # QAP, from_mont and the MSMs all keep one program shape per process
        # instead of recompiling per batch size class (a b64 first round paid
        # ~150s of per-class compiles before this).
        chunk = LANE_BATCH * (
            self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        )
        if batch > chunk:
            proofs: List[Proof] = []
            for lo in range(0, batch, chunk):
                hi = min(lo + chunk, batch)
                proofs.extend(
                    self.prove_batch_with_assignment(
                        assignment[:, :, lo:hi], rs[lo:hi], ss[lo:hi], metrics=metrics
                    )
                )
            if metrics is not None:
                metrics.batch = batch
            return proofs
        target = self._batch_target(batch)
        if assignment.shape[2] < target:
            reps = jnp.repeat(
                assignment[:, :, :1], target - assignment.shape[2], axis=2
            )
            assignment = jnp.concatenate([assignment, reps], axis=2)
        if metrics is not None:
            metrics.batch = batch
        with stage_timer(metrics, "qap_witness_map") as _:
            h = self.mapper.witness_map(assignment)
            h.block_until_ready()
        from ..ff import pallas_field as pf

        from_mont = (
            (lambda x: pf.mont_from("fr", x)) if pf.available() else FrField.from_mont
        )
        with stage_timer(metrics, "from_mont"):
            z_canon = from_mont(assignment)
            h_canon = from_mont(h)
            h_canon.block_until_ready()
        if self._g1_group is not None:
            with stage_timer(metrics, "msm_ab1l"):
                l_aux = from_mont(assignment[:, self.num_inputs :])
                acc_a, acc_b1, acc_l = self._g1_group([z_canon, z_canon, l_aux])
                a_pts = self.msm_a.to_affine_ints(acc_a)
                b1_pts = self.msm_b1.to_affine_ints(acc_b1)
                l_pts = self.msm_l.to_affine_ints(acc_l)
            with stage_timer(metrics, "msm_b2"):
                b2_pts = self.msm_b2.to_affine_ints(self.msm_b2(z_canon))
            with stage_timer(metrics, "msm_h"):
                h_pts = self.msm_h.to_affine_ints(self.msm_h(h_canon))
        else:
            with stage_timer(metrics, "msm_a"):
                a_pts = self.msm_a.to_affine_ints(self.msm_a(z_canon))
            with stage_timer(metrics, "msm_b1"):
                b1_pts = self.msm_b1.to_affine_ints(self.msm_b1(z_canon))
            with stage_timer(metrics, "msm_b2"):
                b2_pts = self.msm_b2.to_affine_ints(self.msm_b2(z_canon))
            with stage_timer(metrics, "msm_l"):
                l_aux = from_mont(assignment[:, self.num_inputs :])
                l_pts = self.msm_l.to_affine_ints(self.msm_l(l_aux))
            with stage_timer(metrics, "msm_h"):
                h_pts = self.msm_h.to_affine_ints(self.msm_h(h_canon))

        pk = self.zkey.pk
        t_assembly = stage_timer(metrics, "host_assembly")
        t_assembly.__enter__()
        from ..runtime import native

        if native.assemble_available():
            # one native call for the whole batch: fixed-base window tables
            # for alpha/beta1/delta1/delta2 + Straus chains, threaded over
            # proofs (native/pairing.cpp rln_groth16_assemble_batch)
            proofs = native.groth16_assemble_batch_native(
                pk, a_pts[:batch], b1_pts[:batch], b2_pts[:batch],
                l_pts[:batch], h_pts[:batch], rs, ss,
            )
        else:
            proofs = [
                self._assemble(
                    pk, rs[b], ss[b], a_pts[b], b1_pts[b], b2_pts[b],
                    l_pts[b], h_pts[b],
                )
                for b in range(batch)
            ]
        t_assembly.__exit__(None, None, None)
        return proofs

    @staticmethod
    def _assemble(pk, r, s, a_pt, b1_pt, b2_pt, l_pt, h_pt) -> Proof:
        """Per-proof blinding algebra (ark-groth16 semantics; reference math
        partial_proof.rs:237-268). Uses the native small-n linear
        combinations when the library is built (~4x the Python bigint
        path); the Python path is the bit-exact fallback."""
        from ..runtime import native

        r, s = r % R, s % R
        if native.pairing_available():
            g_a = native.g1_msm_native(
                [pk.vk.alpha_g1, a_pt, pk.delta_g1], [1, 1, r]
            )
            g1_b = (
                native.g1_msm_native([pk.beta_g1, b1_pt, pk.delta_g1], [1, 1, s])
                if r != 0
                else None
            )
            g2_b = native.g2_msm_native(
                [pk.vk.beta_g2, b2_pt, pk.vk.delta_g2], [1, 1, s]
            )
            g_c = native.g1_msm_native(
                [g_a, g1_b, pk.delta_g1, l_pt, h_pt],
                [s, r, (R - r * s % R) % R, 1, 1],
            )
            return (g_a, g2_b, g_c)
        g_a = bn254.G1.add(pk.vk.alpha_g1, a_pt)
        g_a = bn254.G1.add(g_a, bn254.G1.mul(pk.delta_g1, r))
        if r != 0:
            g1_b = bn254.G1.add(pk.beta_g1, b1_pt)
            g1_b = bn254.G1.add(g1_b, bn254.G1.mul(pk.delta_g1, s))
        else:
            g1_b = None
        g2_b = bn254.G2.add(pk.vk.beta_g2, b2_pt)
        g2_b = bn254.G2.add(g2_b, bn254.G2.mul(pk.vk.delta_g2, s))
        g_c = bn254.G1.add(bn254.G1.mul(g_a, s), bn254.G1.mul(g1_b, r))
        g_c = bn254.G1.add(g_c, bn254.G1.neg(bn254.G1.mul(pk.delta_g1, r * s % R)))
        g_c = bn254.G1.add(g_c, l_pt)
        g_c = bn254.G1.add(g_c, h_pt)
        return (g_a, g2_b, g_c)

    # -- partial / finish ----------------------------------------------------

    def _shifted_mask(self, mask: Sequence[bool]) -> np.ndarray:
        """PartialProof mask (len n_wires-1) -> per-wire mask incl. wire 0."""
        if len(mask) != self.n_wires - 1:
            raise ProverError(
                f"mask length {len(mask)} != {self.n_wires - 1} assignment entries"
            )
        return np.concatenate([[True], np.asarray(mask, dtype=bool)])

    def prove_partial(self, partial_values: Sequence[Optional[int]]) -> PartialProof:
        """partial_values: assignment entries (instance[1:] || witness), None =
        unknown (reference PartialAssignment, partial_proof.rs:17-28)."""
        mask = [v is not None for v in partial_values]
        wire_mask = self._shifted_mask(mask)
        z = [1] + [0 if v is None else int(v) for v in partial_values]
        z_canon = np.repeat(
            encode_canonical_fast(z).reshape(NUM_LIMBS, self.n_wires, 1),
            self._batch_target(1),
            axis=2,
        )
        m = wire_mask[:, None]
        a_pt = self.msm_a.to_affine_ints(self.msm_a(z_canon, mask=m))[0]
        b1_pt = self.msm_b1.to_affine_ints(self.msm_b1(z_canon, mask=m))[0]
        b2_pt = self.msm_b2.to_affine_ints(self.msm_b2(z_canon, mask=m))[0]
        aux = z_canon[:, self.num_inputs :]
        l_pt = self.msm_l.to_affine_ints(self.msm_l(aux, mask=m[self.num_inputs :]))[0]
        pk = self.zkey.pk
        # alpha/beta offsets are folded in at prove_partial time
        # (partial_proof.rs:159-170); note a_query[0] (wire 0) is included in
        # the masked MSM above since wire 0 is always "known".
        pi_a = bn254.G1.add(pk.vk.alpha_g1, a_pt)
        rho = bn254.G1.add(pk.beta_g1, b1_pt)
        pi_b = bn254.G2.add(pk.vk.beta_g2, b2_pt)
        return PartialProof(
            mask=mask, partial_pi_a=pi_a, partial_rho=rho, partial_pi_b=pi_b, partial_pi_c=l_pt
        )

    def finish_proof(
        self,
        partial: PartialProof,
        assignment,  # (16, n_wires, 1) Montgomery device array
        r: int,
        s: int,
    ) -> Proof:
        wire_known = self._shifted_mask(partial.mask)
        # complement mask: unknown wires only; wire 0 was covered by partial
        m = (~wire_known)[:, None]
        fb = self._batch_target(1)
        if assignment.shape[2] < fb:
            reps = jnp.repeat(
                assignment[:, :, :1], fb - assignment.shape[2], axis=2
            )
            assignment = jnp.concatenate([assignment, reps], axis=2)
        h = self.mapper.witness_map(assignment)
        z_canon = FrField.from_mont(assignment)
        h_canon = FrField.from_mont(h)
        a_rem = self.msm_a.to_affine_ints(self.msm_a(z_canon, mask=m))[0]
        b1_rem = self.msm_b1.to_affine_ints(self.msm_b1(z_canon, mask=m))[0]
        b2_rem = self.msm_b2.to_affine_ints(self.msm_b2(z_canon, mask=m))[0]
        aux = z_canon[:, self.num_inputs :]
        l_rem = self.msm_l.to_affine_ints(self.msm_l(aux, mask=m[self.num_inputs :]))[0]
        h_acc = self.msm_h.to_affine_ints(self.msm_h(h_canon))[0]

        pk = self.zkey.pk
        r %= R
        s %= R
        g_a = bn254.G1.add(partial.partial_pi_a, a_rem)
        g_a = bn254.G1.add(g_a, bn254.G1.mul(pk.delta_g1, r))
        if r != 0:
            g1_b = bn254.G1.add(partial.partial_rho, b1_rem)
            g1_b = bn254.G1.add(g1_b, bn254.G1.mul(pk.delta_g1, s))
        else:
            g1_b = None
        g2_b = bn254.G2.add(partial.partial_pi_b, b2_rem)
        g2_b = bn254.G2.add(g2_b, bn254.G2.mul(pk.vk.delta_g2, s))
        l_acc = bn254.G1.add(partial.partial_pi_c, l_rem)
        g_c = bn254.G1.add(bn254.G1.mul(g_a, s), bn254.G1.mul(g1_b, r))
        g_c = bn254.G1.add(g_c, bn254.G1.neg(bn254.G1.mul(pk.delta_g1, r * s % R)))
        g_c = bn254.G1.add(g_c, l_acc)
        g_c = bn254.G1.add(g_c, h_acc)
        return (g_a, g2_b, g_c)
