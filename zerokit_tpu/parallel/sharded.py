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


# ---------------------------------------------------------------------------
# ShardedMSM: production tensor-parallel MSM with cached per-shard tables
# ---------------------------------------------------------------------------


class _ShardedPrims:
    """shard_map-wrapped MSM primitives (same interface as msm._prims).

    Every pipeline array keeps its leading shard axis S = |tp| sharded over
    the mesh "tp" axis and (for batch-carrying arrays) its trailing batch
    axis sharded over "dp". The bodies are the SAME loop-free programs as
    the single-device path (groth16/msm.py _*_body), so each primitive
    compiles once as one small SPMD program.
    """

    # rank -> last axis is a batch axis? (table-building arrays carry points
    # on the last axis instead and are never dp-sharded)
    _BATCH_PRIMS = {
        "sort", "counts", "mixed_step", "hs_step", "excl_shift", "qgather",
        "finish", "shard_reduce",
    }

    def __init__(self, adapter, mesh: Mesh, dp_batch: bool):
        from ..groth16 import msm as m

        self.adapter = adapter
        self.mesh = mesh
        self.b = "dp" if dp_batch and "dp" in mesh.axis_names else None
        self.cv = best_curve_ops(adapter)
        self.m = m
        self._built = {}

    def _spec(self, rank: int, batch_last: bool):
        if rank == 0:
            return P()
        names = ["tp"] + [None] * (rank - 1)
        if batch_last and rank >= 2:
            names[-1] = self.b
        return P(*names)

    def _smap(self, key, body, kinds, out_kinds, args):
        """kinds/out_kinds: 'b' batch-last, 'n' points-last, 's' scalar."""
        from jax.experimental.shard_map import shard_map

        ranks = tuple(getattr(a, "ndim", 0) for a in args)
        cache_key = (key, ranks)
        fn = self._built.get(cache_key)
        if fn is None:
            in_specs = tuple(
                self._spec(r, k == "b") for k, r in zip(kinds, ranks)
            )
            def infer_out(res):
                return res
            # out ranks are determined by tracing lazily: use eval_shape
            out_shapes = jax.eval_shape(body, *args)
            flat, tree = jax.tree_util.tree_flatten(out_shapes)
            out_specs = tree.unflatten(
                [self._spec(s.ndim, k == "b") for s, k in zip(flat, out_kinds)]
            )
            fn = jax.jit(
                shard_map(
                    body,
                    mesh=self.mesh,
                    in_specs=in_specs,
                    out_specs=out_specs,
                    check_rep=False,
                )
            )
            self._built[cache_key] = fn
        return fn(*args)

    # -- prims dict interface (mirrors msm._prims) ---------------------------

    def __getitem__(self, name):
        m, cv = self.m, self.cv

        if name == "sort":
            def build(n):
                def call(t, d):
                    body = lambda tt, dd: m._sort_gather_body(
                        self.adapter, tt[0], dd[0], n
                    )[None]
                    return self._smap("sort%d" % n, body, "nb", "b", (t, d))
                return call
            return build
        if name == "counts":
            def build(nb):
                body = lambda d: m._counts_body(d[0], nb)[None]
                return lambda d: self._smap("counts%d" % nb, body, "b", "b", (d,))
            return build
        if name == "promote":
            def call(aff):
                kind = "b" if aff.ndim == 7 else "n"
                body = lambda a: cv.from_affine(a[0])[None]
                return self._smap("promote", body, kind, kind, (aff,))
            return call
        if name == "mixed_step":
            body = lambda p, bl, j: m._mixed_step_body(cv, p[0], bl[0], j)[None]
            return lambda p, bl, j: self._smap(
                "mixed_step", body, "bbs", "b", (p, bl, j)
            )
        if name == "hs_step":
            def build(axis):
                body = lambda a, sh: m._hs_step_body(cv, a[0], sh, axis)[None]
                return lambda a, sh: self._smap(
                    "hs%d" % axis, body, "bs", "b", (a, sh)
                )
            return build
        if name == "excl_shift":
            def build(axis):
                body = lambda a: m._excl_shift_body(cv, a[0], axis)[None]
                return lambda a: self._smap("excl%d" % axis, body, "b", "b", (a,))
            return build
        if name == "qgather":
            def build(k, n, nb):
                def call(fine, coarse, counts):
                    body = lambda f, c, ct: tuple(
                        x[None]
                        for x in m._qgather_body(cv, f[0], c[0], ct[0], k, n, nb)
                    )
                    return self._smap(
                        "qgather%d_%d_%d" % (k, n, nb), body, "bbb", "bb",
                        (fine, coarse, counts),
                    )
                return call
            return build
        if name == "finish":
            def build(cb):
                body = lambda sq, st: m._finish_body(cv, sq[0], st[0], cb)[None]
                return lambda sq, st: self._smap(
                    "finish%d" % cb, body, "bb", "b", (sq, st)
                )
            return build
        if name == "doublek":
            def build(cb):
                body = lambda p: m._double8_body(cv, p[0], cb)[None]
                return lambda p: self._smap("doublek%d" % cb, body, "n", "n", (p,))
            return build
        if name == "to_affine":
            body = lambda p: cv.to_affine(p[0])[None]
            return lambda p: self._smap("to_affine", body, "n", "n", (p,))
        if name == "shard_reduce":
            def body(win):  # local (1,16,C,3,Bl) -> (16,C,3,Bl) tp-replicated
                gathered = jax.lax.all_gather(win[0], "tp")  # (S,16,C,3,Bl)
                return _tree_reduce_points(cv, gathered)

            def call(win):
                from jax.experimental.shard_map import shard_map

                fn = self._built.get("shard_reduce")
                if fn is None:
                    fn = jax.jit(
                        shard_map(
                            body,
                            mesh=self.mesh,
                            in_specs=(self._spec(win.ndim, True),),
                            out_specs=P(None, None, None, self.b),
                            check_rep=False,
                        )
                    )
                    self._built["shard_reduce"] = fn
                return fn(win)
            return call
        raise KeyError(name)


@functools.lru_cache(maxsize=None)
def _sharded_prims(adapter, mesh: Mesh, dp_batch: bool) -> _ShardedPrims:
    return _ShardedPrims(adapter, mesh, dp_batch)


class ShardedMSM:
    """Tensor-parallel MSM over one fixed base set, mesh-resident tables.

    Drop-in for groth16.msm.MSM when proving over a mesh: the base points
    shard over the mesh's "tp" axis (each shard holds n/tp points and its
    own window tables, built once on device), scalar batches shard over
    "dp", and the per-shard accumulators combine with an all_gather over
    "tp" + EC tree reduction (the only communication — 16*C*3*B words).
    Reuses the exact single-device pipeline (groth16/msm.py msm_pipeline)
    through shard_map-wrapped primitives.
    """

    def __init__(
        self,
        points,
        adapter,
        mesh: Mesh,
        dp_batch: bool = True,
        n_windows=None,
        c_bits=None,
    ):
        from ..groth16.msm import C_BITS, K_BLOCK, N_WINDOWS, encode_affine_points

        self.adapter = adapter
        self.curve = CurveOps(adapter)
        self.mesh = mesh
        self.n_windows = n_windows or N_WINDOWS
        self.c_bits = c_bits or C_BITS
        self.tp = mesh.shape["tp"]
        self.dp = mesh.shape.get("dp", 1) if dp_batch else 1
        self.n_real = len(points)
        gran = self.tp * K_BLOCK
        pad_to = max(gran, -(-len(points) // gran) * gran)
        points = list(points) + [None] * (pad_to - len(points))
        self.n = pad_to
        self.n_loc = pad_to // self.tp
        enc = encode_affine_points(points, adapter)  # (16, C, 2, n)
        enc = np.moveaxis(
            enc.reshape(enc.shape[:3] + (self.tp, self.n_loc)), 3, 0
        )  # (S, 16, C, 2, n_loc)
        self.prims = _sharded_prims(adapter, mesh, dp_batch)
        self.points = jax.device_put(
            jnp.asarray(np.ascontiguousarray(enc)), NamedSharding(mesh, P("tp"))
        )
        self._tables = None

    def tables(self):
        if self._tables is None:
            from ..groth16.msm import build_window_tables, tables_to_aos_s

            t = build_window_tables(
                self.prims, self.points, self.n_windows, self.c_bits
            )
            self._tables = tables_to_aos_s(self.adapter, t)  # (S, W*n_loc, K)
        return self._tables

    def __call__(self, scalars_canon, mask=None):
        """scalars_canon: (16, n_real, B) canonical limbs (B % dp == 0).
        Returns projective accumulators (16, C, 3, B), replicated over tp and
        sharded over dp."""
        from ..ff.field import NUM_LIMBS, U32
        from ..groth16 import msm as m

        if scalars_canon.shape[1] != self.n_real:
            raise ValueError(
                f"expected {self.n_real} scalars, got {scalars_canon.shape[1]}"
            )
        scalars = jnp.asarray(scalars_canon)
        batch = scalars.shape[2]
        if mask is not None:
            scalars = jnp.where(jnp.asarray(mask)[None], scalars, 0)
        if self.n != self.n_real:
            pad = jnp.zeros((NUM_LIMBS, self.n - self.n_real, batch), dtype=U32)
            scalars = jnp.concatenate([scalars, pad], axis=1)
        # stream big batches through fixed-shape compiled programs (see
        # groth16/msm.py LANE_BATCH): chunk size is per-device lanes x dp
        from ..groth16.msm import LANE_BATCH

        b0 = LANE_BATCH * self.dp
        if batch <= b0:
            return self._pipeline_pass(scalars)
        chunks = []
        for lo in range(0, batch, b0):
            hi = min(lo + b0, batch)
            piece = scalars[:, :, lo:hi]
            if hi - lo < b0:
                reps = jnp.repeat(piece[:, :, :1], b0 - (hi - lo), axis=2)
                piece = jnp.concatenate([piece, reps], axis=2)
                chunks.append(self._pipeline_pass(piece)[:, :, :, : hi - lo])
            else:
                chunks.append(self._pipeline_pass(piece))
        return jnp.concatenate(chunks, axis=3)

    def _pipeline_pass(self, scalars):
        from ..ff.field import NUM_LIMBS
        from ..groth16 import msm as m

        batch = scalars.shape[2]
        b = "dp" if self.dp > 1 else None
        # (16, n, B) -> (S, 16, n_loc, B) sharded over ("tp", batch over "dp")
        sh = jnp.moveaxis(scalars.reshape(NUM_LIMBS, self.tp, self.n_loc, batch), 1, 0)
        sh = jax.device_put(sh, NamedSharding(self.mesh, P("tp", None, None, b)))
        digits = m.digits_for_windows(sh, self.n_windows, self.c_bits)
        group = m._window_group(
            max(1, batch // self.dp), self.adapter.components, self.n_windows
        )
        return m.msm_pipeline(
            self.prims, self.tables(), digits, self.n_loc, group, self.c_bits
        )

    def to_affine_ints(self, acc):
        from ..groth16.msm import MSM

        return MSM.to_affine_ints(self, acc)
