"""Host-side MSM backend: native C++ Pippenger (pure-Python fallback).

Role: the Groth16 prover's MSM backend on CPU-only hosts. Compiling the
device MSM pipeline under XLA:CPU costs minutes PER PROGRAM (the limb
chains choke LLVM), which made every real-circuit end-to-end test blow its
budget; the native Pippenger (native/pairing.cpp, ark-ec VariableBaseMSM
semantics — reference rln/src/partial_proof.rs:98-104) runs a depth-10
query MSM in ~100 ms per lane with zero compile cost. On TPU the device
pipeline (groth16/msm.py, msm_fused.py) remains the backend — that is the
product hot path; this module is the portability/testing path, exactly as
the reference's rayon MSM is its CPU path.

Interface-compatible with MSM: __call__(scalars, mask) returns an opaque
accumulator token and to_affine_ints() finalizes to host affine points.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ff.field import decode_canonical_fast
from ..ff.fq2 import FqAdapter
from ..hostmath import bn254


class HostMSM:
    def __init__(self, points, adapter, n_windows: int = 32, c_bits: int = 8):
        self.adapter = adapter
        self.points = list(points)
        self.n_real = len(self.points)
        self.lane_batch = 1 << 30  # no chunking needed on host

    def __call__(self, scalars_canon, mask: Optional[object] = None):
        """scalars_canon: (16, n_real, B) canonical limbs (device or host
        array). Returns the list of per-lane host affine points."""
        arr = np.asarray(scalars_canon)
        if arr.shape[1] != self.n_real:
            raise ValueError(f"expected {self.n_real} scalars, got {arr.shape[1]}")
        batch = arr.shape[2]
        mask_np = None if mask is None else np.broadcast_to(
            np.asarray(mask, dtype=bool), (self.n_real, batch)
        )
        flat = decode_canonical_fast(arr.reshape(16, self.n_real * batch))
        from ..runtime import native

        use_native = native.pairing_available()
        out = []
        for b in range(batch):
            scal = [int(flat[i * batch + b]) for i in range(self.n_real)]
            if mask_np is not None:
                scal = [s if mask_np[i, b] else 0 for i, s in enumerate(scal)]
            if use_native:
                if self.adapter is FqAdapter:
                    got = native.g1_msm_native(self.points, scal)
                else:
                    got = native.g2_msm_native(self.points, scal)
                out.append(got)
            else:
                grp = bn254.G1 if self.adapter is FqAdapter else bn254.G2
                out.append(grp.msm(self.points, scal))
        return out

    def to_affine_ints(self, token):
        return token
