"""Batched short-Weierstrass (a = 0) complete projective group laws for TPU.

Replaces ark-ec's G1/G2 arithmetic used by the reference's MSMs
(rln/src/partial_proof.rs:98-104 via VariableBaseMSM). One generic
implementation parameterized by a field adapter (ff/fq2.py) serves both
G1 (over Fq) and G2 (over Fq2).

Formulas: Renes-Costello-Batina 2015 ("Complete addition formulas for prime
order elliptic curves"), a = 0 specializations — Algorithm 7 (add, 12M),
Algorithm 8 (mixed add, 11M), Algorithm 9 (double, 6M+2S). Complete means
EXCEPTION-FREE: identity operands, P == Q and P == -Q all flow through the
same straight-line code, so the branchless-select zoo (and the full double()
the old Jacobian path evaluated inside every add) disappears. This is the
natural TPU formulation: one fused arithmetic pipeline, no data-dependent
paths, ~40% fewer field multiplies per EC add than branchless Jacobian.

Point layout: homogeneous projective (X, Y, Z) as one array
(16, C, 3, *batch); the identity is (0, 1, 0) (one in Montgomery form).
Affine points are (16, C, 2, *batch) with (0, 0) as the infinity sentinel
(matching the zkey's encoding of padded/infinity points). Mixed addition is
complete in its projective operand; the affine operand carries one select
for the (0, 0) sentinel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class CurveOps:
    def __init__(self, fq):
        self.fq = fq  # field adapter (FqAdapter / Fq2Adapter)

    # -- constructors -------------------------------------------------------

    def _one(self, like):
        """Field one (Montgomery) broadcast to `like`'s shape (16, C, *b)."""
        from ..ff.field import FQ
        from ..constants import NUM_LIMBS

        one = np.zeros((NUM_LIMBS, self.fq.components), dtype=np.uint32)
        one[:, 0] = FQ.one_mont
        c = jnp.asarray(one).reshape((NUM_LIMBS, self.fq.components) + (1,) * (like.ndim - 2))
        return jnp.broadcast_to(c, like.shape)

    def identity_like(self, p):
        """The neutral element (0, 1, 0) shaped like p (16, C, 3, *b)."""
        x = jnp.zeros_like(p[:, :, 0])
        return jnp.stack([x, self._one(x), x], axis=2)

    def from_affine(self, aff):
        """aff (16, C, 2, *b) -> projective; (0, 0) sentinel -> (0, 1, 0)."""
        x = aff[:, :, 0]
        y = aff[:, :, 1]
        inf = self.fq.is_zero(x) & self.fq.is_zero(y)
        one = self._one(x)
        y = jnp.where(inf[None, None], one, y)
        z = jnp.where(inf[None, None], jnp.zeros_like(x), one)
        return jnp.stack([x, y, z], axis=2)

    # backwards-compatible alias (one_mont arg ignored; kept for callers)
    def jac_from_affine(self, aff, one_mont=None):
        return self.from_affine(aff)

    def is_infinity(self, p):
        return self.fq.is_zero(p[:, :, 2])

    # -- group law (RCB15, a = 0, complete) ----------------------------------

    def add(self, p, q):
        """Complete projective addition (RCB15 Algorithm 7): 12M + 2 b3-muls,
        no exceptional cases."""
        fq = self.fq
        x1, y1, z1 = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        x2, y2, z2 = q[:, :, 0], q[:, :, 1], q[:, :, 2]
        t0 = fq.mul(x1, x2)
        t1 = fq.mul(y1, y2)
        t2 = fq.mul(z1, z2)
        t3 = fq.mul(fq.add(x1, y1), fq.add(x2, y2))
        t3 = fq.sub(t3, fq.add(t0, t1))  # x1y2 + x2y1
        t4 = fq.mul(fq.add(y1, z1), fq.add(y2, z2))
        t4 = fq.sub(t4, fq.add(t1, t2))  # y1z2 + y2z1
        ty = fq.mul(fq.add(x1, z1), fq.add(x2, z2))
        ty = fq.sub(ty, fq.add(t0, t2))  # x1z2 + x2z1
        t0 = fq.add(fq.add(t0, t0), t0)  # 3 x1x2
        t2 = self.fq.b3_mul(t2)
        z3 = fq.add(t1, t2)
        t1 = fq.sub(t1, t2)
        ty = self.fq.b3_mul(ty)
        x3 = fq.sub(fq.mul(t3, t1), fq.mul(t4, ty))
        y3 = fq.add(fq.mul(t1, z3), fq.mul(ty, t0))
        z3 = fq.add(fq.mul(z3, t4), fq.mul(t0, t3))
        return jnp.stack([x3, y3, z3], axis=2)

    def add_mixed(self, p, q_aff, one_mont=None):
        """p (projective) + q (affine (16,C,2,*b)); RCB15 Algorithm 8 (11M).
        Complete in p; the affine (0, 0) infinity sentinel is handled with
        one select."""
        fq = self.fq
        x1, y1, z1 = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        x2 = q_aff[:, :, 0]
        y2 = q_aff[:, :, 1]
        t0 = fq.mul(x1, x2)
        t1 = fq.mul(y1, y2)
        t3 = fq.mul(fq.add(x1, y1), fq.add(x2, y2))
        t3 = fq.sub(t3, fq.add(t0, t1))  # x1y2 + x2y1
        t4 = fq.add(fq.mul(x2, z1), x1)  # x1 + x2z1
        t5 = fq.add(fq.mul(y2, z1), y1)  # y1 + y2z1
        t0 = fq.add(fq.add(t0, t0), t0)  # 3 x1x2
        t2 = self.fq.b3_mul(z1)
        z3 = fq.add(t1, t2)
        t1 = fq.sub(t1, t2)
        ty = self.fq.b3_mul(t4)
        x3 = fq.sub(fq.mul(t3, t1), fq.mul(t5, ty))
        y3 = fq.add(fq.mul(t1, z3), fq.mul(ty, t0))
        z3 = fq.add(fq.mul(z3, t5), fq.mul(t0, t3))
        out = jnp.stack([x3, y3, z3], axis=2)
        q_inf = fq.is_zero(x2) & fq.is_zero(y2)
        return jnp.where(q_inf[None, None, None], p, out)

    def double(self, p):
        """Complete projective doubling (RCB15 Algorithm 9): 6M + 2S."""
        fq = self.fq
        x, y, z = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        t0 = fq.sqr(y)
        z3 = fq.add(t0, t0)
        z3 = fq.add(z3, z3)
        z3 = fq.add(z3, z3)  # 8 y^2
        t1 = fq.mul(y, z)
        t2 = self.fq.b3_mul(fq.sqr(z))
        x3 = fq.mul(t2, z3)
        y3 = fq.add(t0, t2)
        z3 = fq.mul(t1, z3)
        t1 = fq.add(t2, t2)
        t2 = fq.add(t1, t2)
        t0 = fq.sub(t0, t2)
        y3 = fq.add(fq.mul(t0, y3), x3)
        t1 = fq.mul(x, y)
        x3 = fq.mul(t0, t1)
        x3 = fq.add(x3, x3)
        return jnp.stack([x3, y3, z3], axis=2)

    def neg(self, p):
        """-P: negate Y. Identity (0, y, 0) stays a valid identity since any
        (0, lambda, 0), lambda != 0, represents the neutral element."""
        return jnp.stack([p[:, :, 0], self.fq.neg(p[:, :, 1]), p[:, :, 2]], axis=2)

    # -- conversions --------------------------------------------------------

    def to_affine(self, p):
        """Batched projective -> affine; identity -> (0, 0) sentinel."""
        fq = self.fq
        zinv = fq.inv(p[:, :, 2])  # inv(0) = 0 => identity maps to (0, 0)
        x = fq.mul(p[:, :, 0], zinv)
        y = fq.mul(p[:, :, 1], zinv)
        return jnp.stack([x, y], axis=2)

    def scalar_mul_bits(self, p, bits: np.ndarray):
        """p * k with k's bits (LSB-first, host array). Batched double-and-add."""
        import jax

        bits_arr = jnp.asarray(bits, dtype=jnp.uint32)

        def body(carry, bit):
            acc, base = carry
            new_acc = self.add(acc, base)
            acc = self.fq.select(bit != 0, new_acc, acc)
            base = self.double(base)
            return (acc, base), None

        acc0 = self.identity_like(p)
        (acc, _), _ = jax.lax.scan(body, (acc0, p), bits_arr)
        return acc


class PallasCurveOps(CurveOps):
    """CurveOps whose hot group laws run as Pallas TPU kernels.

    The full RCB formula (12 Montgomery multiplies and all their temporaries)
    executes inside one kernel with every intermediate in VMEM — measured
    ~12x the throughput of the XLA formulation on the same chip, which spills
    the ~1500-op elementwise chain to HBM. Cheap ops (neg, from_affine,
    to_affine, selects) stay on the XLA path.
    """

    def add(self, p, q):
        from ..ff import pallas_field as pf

        return pf.ec_op("add", self.fq.components, p, q)

    def add_mixed(self, p, q_aff, one_mont=None):
        from ..ff import pallas_field as pf

        return pf.ec_op("add_mixed", self.fq.components, p, q_aff)

    def double(self, p):
        from ..ff import pallas_field as pf

        return pf.ec_op("double", self.fq.components, p)


def best_curve_ops(fq) -> CurveOps:
    """Pallas-backed group laws on TPU; portable XLA fallback elsewhere."""
    from ..ff import pallas_field as pf

    return PallasCurveOps(fq) if pf.available() else CurveOps(fq)
