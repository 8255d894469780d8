"""Profiling and observability for the proving pipeline.

The reference has no in-product instrumentation (criterion benches only —
SURVEY.md §5); here tracing is first-class:

  * stage_timer / PipelineMetrics: wall-clock per pipeline stage with
    device sync, aggregated into per-batch reports (proofs/sec, stage
    breakdown) — the structured-metrics surface.
  * trace(): context manager around jax.profiler for TensorBoard-viewable
    device traces.
  * speed_of_light(): analytic roofline for the core kernels on a chip
    spec — mont-muls per proof vs the VPU's integer throughput — used to
    report achieved-vs-ceiling in benchmarks.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

# Rough per-op costs of the current kernels (u32 multiplies per operation)
MONT_MUL_U32_MULTS = 650
# complete projective add (RCB15 Alg 7): 12M + cheap b3 muls
EC_ADD_MONT_MULS = 12
POSEIDON_T3_MONT_MULS = 18 * 65


@dataclass
class ChipSpec:
    name: str = "tpu-v5e"
    # effective u32 multiply throughput of the VPU (ops/s); the VPU does
    # 8x128 lanes; int32 multiply is a multi-pass op — this is the
    # conservative planning number, not the marketing flops.
    u32_mul_per_sec: float = 2.0e12


@dataclass
class PipelineMetrics:
    stages: Dict[str, float] = field(default_factory=dict)
    batch: int = 0

    def record(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    def report(self) -> dict:
        total = sum(self.stages.values())
        out = {
            "batch": self.batch,
            "total_s": round(total, 4),
            "proofs_per_sec": round(self.batch / total, 3) if total else None,
            "stages": {k: round(v, 4) for k, v in sorted(self.stages.items())},
        }
        return out

    def dumps(self) -> str:
        return json.dumps(self.report())


@contextlib.contextmanager
def stage_timer(metrics: Optional[PipelineMetrics], name: str, sync=None):
    """Times a stage; pass a device array (or list) as `sync` to block on it."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            for arr in sync if isinstance(sync, (list, tuple)) else [sync]:
                try:
                    arr.block_until_ready()
                except AttributeError:
                    pass
        if metrics is not None:
            metrics.record(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/zerokit_tpu_trace"):
    """Captures a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def msm_mont_muls(n_points: int, n_windows: int = 32) -> int:
    """Montgomery multiplies per proof for one G1 MSM under the up-sweep +
    Fenwick-query formulation: per window ~n tree adds + 14*255 masked
    prefix-query adds + 255 reduce adds + 8 doublings."""
    per_window = n_points + 14 * 255 + 2 * 255 + 8
    return n_windows * per_window * EC_ADD_MONT_MULS


def proof_cost_mont_muls(
    n_wires: int = 5844, domain: int = 8192, graph_nodes: int = 23414
) -> dict:
    """Analytic per-proof cost breakdown (Montgomery multiplies)."""
    witness = graph_nodes * 2
    ntt = 9 * domain * (domain.bit_length() - 1) // 2 + 3 * domain
    msm_g1 = 3 * msm_mont_muls(domain)  # a, b1, l (padded to the domain size)
    msm_h = msm_mont_muls(domain)
    msm_g2 = 3 * msm_mont_muls(domain)  # Fq2 ~ 3x Fq muls
    total = witness + ntt + msm_g1 + msm_h + msm_g2
    return {
        "witness": witness,
        "ntt": ntt,
        "msm_g1": msm_g1,
        "msm_h": msm_h,
        "msm_g2": msm_g2,
        "total": total,
    }


def speed_of_light(chip: ChipSpec = ChipSpec(), **kwargs) -> dict:
    """Ceiling proofs/sec per chip if the VPU only did the required mults."""
    cost = proof_cost_mont_muls(**kwargs)
    u32 = cost["total"] * MONT_MUL_U32_MULTS
    return {
        "chip": chip.name,
        "mont_muls_per_proof": cost["total"],
        "u32_mults_per_proof": u32,
        "ceiling_proofs_per_sec": round(chip.u32_mul_per_sec / u32, 2),
        "breakdown": cost,
    }
