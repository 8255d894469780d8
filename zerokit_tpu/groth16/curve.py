"""Batched short-Weierstrass (a = 0) Jacobian group laws for TPU.

Replaces ark-ec's G1/G2 arithmetic used by the reference's MSMs
(rln/src/partial_proof.rs:98-104 via VariableBaseMSM). One generic
implementation parameterized by a field adapter (ff/fq2.py) serves both
G1 (over Fq) and G2 (over Fq2).

Point layout: Jacobian (X, Y, Z) as a single array (16, C, 3, *batch);
affine points are (16, C, 2, *batch). Infinity is encoded Z = 0, and all
formulas are branchless: every edge case (either operand at infinity,
P == Q, P == -Q) is resolved with selects so the same compiled code serves
bucket accumulation where equal/infinity operands routinely occur.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


class CurveOps:
    def __init__(self, fq):
        self.fq = fq  # field adapter

    # -- constructors -------------------------------------------------------

    def jac_from_affine(self, aff, one_mont):
        """aff: (16, C, 2, *b); one_mont: (16, C, 1?, ...) broadcastable ones.
        Affine (0, 0) is treated as infinity (Z = 0)."""
        x = aff[:, :, 0]
        y = aff[:, :, 1]
        inf = self.fq.is_zero(x) & self.fq.is_zero(y)
        z = jnp.where(inf[None, None], jnp.zeros_like(x), jnp.broadcast_to(one_mont, x.shape))
        return jnp.stack([x, y, z], axis=2)

    def infinity_like(self, shape_ref):
        return jnp.zeros_like(shape_ref)

    def is_infinity(self, p):
        return self.fq.is_zero(p[:, :, 2])

    # -- group law ----------------------------------------------------------

    def double(self, p):
        """dbl-2009-l, a=0. Handles infinity and Y=0 via Z3 = 0 naturally."""
        fq = self.fq
        x1, y1, z1 = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        a = fq.sqr(x1)
        b = fq.sqr(y1)
        c = fq.sqr(b)
        t = fq.sqr(fq.add(x1, b))
        d = fq.sub(fq.sub(t, a), c)
        d = fq.add(d, d)
        e = fq.add(fq.add(a, a), a)
        f = fq.sqr(e)
        x3 = fq.sub(f, fq.add(d, d))
        c8 = fq.add(c, c)
        c8 = fq.add(c8, c8)
        c8 = fq.add(c8, c8)
        y3 = fq.sub(fq.mul(e, fq.sub(d, x3)), c8)
        yz = fq.mul(y1, z1)
        z3 = fq.add(yz, yz)
        return jnp.stack([x3, y3, z3], axis=2)

    def add(self, p, q):
        """Full branchless Jacobian addition (add-2007-bl + edge selects)."""
        fq = self.fq
        x1, y1, z1 = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        x2, y2, z2 = q[:, :, 0], q[:, :, 1], q[:, :, 2]
        z1z1 = fq.sqr(z1)
        z2z2 = fq.sqr(z2)
        u1 = fq.mul(x1, z2z2)
        u2 = fq.mul(x2, z1z1)
        s1 = fq.mul(fq.mul(y1, z2), z2z2)
        s2 = fq.mul(fq.mul(y2, z1), z1z1)
        h = fq.sub(u2, u1)
        i = fq.sqr(fq.add(h, h))
        j = fq.mul(h, i)
        r = fq.sub(s2, s1)
        r = fq.add(r, r)
        v = fq.mul(u1, i)
        x3 = fq.sub(fq.sub(fq.sqr(r), j), fq.add(v, v))
        s1j = fq.mul(s1, j)
        y3 = fq.sub(fq.mul(r, fq.sub(v, x3)), fq.add(s1j, s1j))
        zz = fq.sub(fq.sub(fq.sqr(fq.add(z1, z2)), z1z1), z2z2)
        z3 = fq.mul(zz, h)
        added = jnp.stack([x3, y3, z3], axis=2)

        p_inf = fq.is_zero(z1)
        q_inf = fq.is_zero(z2)
        h_zero = fq.is_zero(h)
        r_zero = fq.is_zero(r)
        dbl = self.double(p)
        # same x: same y -> double, else P + (-P) = infinity
        out = fq.select(h_zero & r_zero, dbl[:, :, 0:3].reshape(dbl.shape), added)
        out = fq.select(h_zero & ~r_zero & ~p_inf & ~q_inf, jnp.zeros_like(out), out)
        out = fq.select(p_inf, q, out)
        out = fq.select(q_inf & ~p_inf, p, out)
        return out

    def add_mixed(self, p, q_aff, one_mont):
        """p (Jacobian) + q (affine, (16,C,2,*b)). Branchless via madd-2007-bl."""
        fq = self.fq
        x1, y1, z1 = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        x2 = q_aff[:, :, 0]
        y2 = q_aff[:, :, 1]
        z1z1 = fq.sqr(z1)
        u2 = fq.mul(x2, z1z1)
        s2 = fq.mul(fq.mul(y2, z1), z1z1)
        h = fq.sub(u2, x1)
        hh = fq.sqr(h)
        i = fq.add(hh, hh)
        i = fq.add(i, i)
        j = fq.mul(h, i)
        r = fq.sub(s2, y1)
        r = fq.add(r, r)
        v = fq.mul(x1, i)
        x3 = fq.sub(fq.sub(fq.sqr(r), j), fq.add(v, v))
        y1j = fq.mul(y1, j)
        y3 = fq.sub(fq.mul(r, fq.sub(v, x3)), fq.add(y1j, y1j))
        z3 = fq.sub(fq.sub(fq.sqr(fq.add(z1, h)), z1z1), hh)
        added = jnp.stack([x3, y3, z3], axis=2)

        p_inf = fq.is_zero(z1)
        q_inf = fq.is_zero(x2) & fq.is_zero(y2)
        h_zero = fq.is_zero(h)
        r_zero = fq.is_zero(r)
        dbl = self.double(p)
        out = fq.select(h_zero & r_zero & ~p_inf, dbl, added)
        out = fq.select(h_zero & ~r_zero & ~p_inf, jnp.zeros_like(out), out)
        q_jac = self.jac_from_affine(q_aff, one_mont)
        out = fq.select(p_inf, q_jac, out)
        out = fq.select(q_inf, p, out)
        return out

    # -- conversions --------------------------------------------------------

    def to_affine(self, p):
        """Batched Jacobian -> affine; infinity -> (0, 0)."""
        fq = self.fq
        z = p[:, :, 2]
        zinv = fq.inv(z)  # inv(0) = 0 => infinity maps to (0, 0) naturally
        zinv2 = fq.sqr(zinv)
        zinv3 = fq.mul(zinv2, zinv)
        x = fq.mul(p[:, :, 0], zinv2)
        y = fq.mul(p[:, :, 1], zinv3)
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

        acc0 = jnp.zeros_like(p)
        (acc, _), _ = jax.lax.scan(body, (acc0, p), bits_arr)
        return acc
