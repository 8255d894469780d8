"""Fq and Fq2 "field adapters" with a common interface for curve formulas.

Curve group laws (groth16/curve.py) are written once against this interface
and instantiated for G1 (base field Fq) and G2 (quadratic extension
Fq2 = Fq[u]/(u^2+1), matching ark-bn254).

Array convention: an element is (16, C, *batch) where C = 1 for Fq and 2 for
Fq2 (c0, c1 components). All values are in Montgomery form.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .field import FQ, FqField
from ..constants import B_G2, Q


class FqAdapter:
    components = 1
    spec = FQ

    @staticmethod
    def encode(vals) -> np.ndarray:
        """list of ints -> (16, 1, N)."""
        return np.asarray(FQ.encode(list(vals)))[:, None, :]

    @staticmethod
    def decode(arr):
        return [int(v) for v in FQ.decode(np.asarray(arr)[:, 0])]

    @staticmethod
    def add(a, b):
        return FqField.add(a, b)

    @staticmethod
    def sub(a, b):
        return FqField.sub(a, b)

    @staticmethod
    def neg(a):
        return FqField.neg(a)

    @staticmethod
    def mul(a, b):
        return FqField.mul(a, b)

    @staticmethod
    def sqr(a):
        return FqField.sqr(a)

    @staticmethod
    def inv(a):
        return FqField.inv(a)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(0, 1))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(0, 1))

    @staticmethod
    def select(cond, a, b):
        return jnp.where(jnp.asarray(cond)[None, None], a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def b3_mul(a):
        """a * 3b for G1 (b = 3): a * 9 = 8a + a, pure additions."""
        d = FqField.add(a, a)
        d = FqField.add(d, d)
        d = FqField.add(d, d)
        return FqField.add(d, a)


class Fq2Adapter:
    components = 2
    spec = FQ

    @staticmethod
    def encode(vals) -> np.ndarray:
        """list of (c0, c1) pairs -> (16, 2, N)."""
        c0 = [v[0] for v in vals]
        c1 = [v[1] for v in vals]
        enc0 = np.asarray(FQ.encode(c0))
        enc1 = np.asarray(FQ.encode(c1))
        return np.stack([enc0, enc1], axis=1)

    @staticmethod
    def decode(arr):
        arr = np.asarray(arr)
        c0 = FQ.decode(arr[:, 0])
        c1 = FQ.decode(arr[:, 1])
        return [(int(a), int(b)) for a, b in zip(c0, c1)]

    @staticmethod
    def add(a, b):
        return FqField.add(a, b)  # componentwise; shapes broadcast over C axis

    @staticmethod
    def sub(a, b):
        return FqField.sub(a, b)

    @staticmethod
    def neg(a):
        return FqField.neg(a)

    @staticmethod
    def mul(a, b):
        # Karatsuba with u^2 = -1:
        # c0 = a0 b0 - a1 b1; c1 = (a0 + a1)(b0 + b1) - a0 b0 - a1 b1
        a0, a1 = a[:, 0], a[:, 1]
        b0, b1 = b[:, 0], b[:, 1]
        t0 = FqField.mul(a0, b0)
        t1 = FqField.mul(a1, b1)
        t2 = FqField.mul(FqField.add(a0, a1), FqField.add(b0, b1))
        c0 = FqField.sub(t0, t1)
        c1 = FqField.sub(FqField.sub(t2, t0), t1)
        return jnp.stack([c0, c1], axis=1)

    @staticmethod
    def sqr(a):
        # (a0 + a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
        a0, a1 = a[:, 0], a[:, 1]
        c0 = FqField.mul(FqField.add(a0, a1), FqField.sub(a0, a1))
        t = FqField.mul(a0, a1)
        c1 = FqField.add(t, t)
        return jnp.stack([c0, c1], axis=1)

    @staticmethod
    def inv(a):
        # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2); inv(0) = 0
        a0, a1 = a[:, 0], a[:, 1]
        norm = FqField.add(FqField.sqr(a0), FqField.sqr(a1))
        ninv = FqField.inv(norm)
        c0 = FqField.mul(a0, ninv)
        c1 = FqField.neg(FqField.mul(a1, ninv))
        return jnp.stack([c0, c1], axis=1)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(0, 1))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(0, 1))

    @staticmethod
    def select(cond, a, b):
        return jnp.where(jnp.asarray(cond)[None, None], a, b)

    @staticmethod
    def zeros_like(a):
        return jnp.zeros_like(a)

    @staticmethod
    def b3_mul(a):
        """a * 3b for G2's twist constant b = B_G2 in Fq2 (one Fq2 mul by a
        precomputed Montgomery constant)."""
        c = jnp.asarray(_B3_G2_MONT).reshape((16, 2) + (1,) * (a.ndim - 2))
        return Fq2Adapter.mul(a, jnp.broadcast_to(c, a.shape))


# 3 * B_G2 in Montgomery form, laid out (16 limbs, 2 components)
_B3_G2_MONT = np.stack(
    [
        np.asarray(FQ.encode([3 * B_G2[0] % Q])).reshape(-1),
        np.asarray(FQ.encode([3 * B_G2[1] % Q])).reshape(-1),
    ],
    axis=1,
)
