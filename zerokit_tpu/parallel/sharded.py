"""Multi-chip sharding for the proving pipeline (mesh + collectives).

The reference has no distributed backend (rayon shared-memory only —
SURVEY.md §2d); this layer is designed TPU-first:

  * mesh axes: "dp" (data parallel — proofs) x "tp" (tensor parallel —
    MSM points / NTT domain).
  * MSM: points and scalars shard over "tp"; each device runs the windowed
    bucket accumulation on its shard (groth16/msm.py msm_accumulate), and
    the D partial projective accumulators are combined with an all_gather over
    "tp" followed by a local log-depth tree of EC adds. EC addition is not a
    ring sum, so psum does not apply; the gather moves only (16*C*3*B) words.
  * batch (dp) sharding is communication-free: witness evaluation, the QAP
    witness map, and per-proof MSM accumulators are independent per proof.

Tested against the single-device path on a virtual 8-device CPU mesh; the
same code drives real ICI meshes on TPU pods.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ff.fq2 import Fq2Adapter, FqAdapter
from ..groth16.msm import msm_accumulate
from ..groth16.curve import CurveOps, best_curve_ops


def make_mesh(tp: int = 1, dp: Optional[int] = None, devices=None) -> Mesh:
    """Creates a ("dp", "tp") mesh from the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _tree_reduce_points(cv: CurveOps, gathered):
    """gathered: (D, 16, C, 3, B) projective partials -> (16, C, 3, B)."""
    arr = jnp.moveaxis(gathered, 0, -1)  # (16, C, 3, B, D) — D as a batch dim
    d = arr.shape[-1]
    while d > 1:
        half = d // 2
        combined = cv.add(arr[..., :half], arr[..., half : 2 * half])
        if d % 2:
            combined = jnp.concatenate([combined, arr[..., 2 * half :]], axis=-1)
        arr = combined
        d = arr.shape[-1]
    return arr[..., 0]


def sharded_msm(
    adapter,
    points: jnp.ndarray,
    scalars: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tp",
):
    """Tensor-parallel MSM: points (16,C,2,n) and scalars (16,n,B) shard on n.

    Returns replicated projective accumulators (16, C, 3, B). n must divide
    evenly by the axis size (pad with infinity points / zero scalars upstream
    if needed).
    """
    cv = best_curve_ops(adapter)

    def local(points_shard, scalars_shard):
        acc = msm_accumulate(adapter, points_shard, scalars_shard)
        gathered = jax.lax.all_gather(acc, axis)  # (D, 16, C, 3, B)
        return _tree_reduce_points(cv, gathered)

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, None, axis), P(None, axis, None)),
        out_specs=P(),
        check_rep=False,
    )
    return fn(points, scalars)


def pad_points_for_sharding(points: list, shards: int) -> list:
    """Pads a base-point list with infinity so len divides the shard count."""
    rem = len(points) % shards
    if rem:
        points = list(points) + [None] * (shards - rem)
    return points


def shard_batch(x: jnp.ndarray, mesh: Mesh, batch_axis: int):
    """Places an array with the batch dimension sharded over "dp"."""
    spec = [None] * x.ndim
    spec[batch_axis] = "dp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
