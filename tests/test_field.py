"""Limb-kernel field arithmetic vs. independent Python-int ground truth."""

import random

import numpy as np
import pytest

from zerokit_tpu.constants import Q, R
from zerokit_tpu.ff.field import FQ, FR, Field, FqField, FrField

BATCH = 64


def _rand_elems(rnd, p, n=BATCH):
    # mix of random, small, near-p values and 0/1 edge cases
    vals = [0, 1, p - 1, p - 2, 2, (p + 1) // 2]
    vals += [rnd.randrange(p) for _ in range(n - len(vals))]
    return vals[:n]


@pytest.mark.parametrize("field,spec,p", [(FrField, FR, R), (FqField, FQ, Q)])
def test_mont_mul_add_sub(field: Field, spec, p):
    rnd = random.Random(42)
    a_int = _rand_elems(rnd, p)
    b_int = _rand_elems(rnd, p)[::-1]
    a = spec.encode(a_int)
    b = spec.encode(b_int)

    got_mul = spec.decode(np.asarray(field.mul(a, b)))
    got_add = spec.decode(np.asarray(field.add(a, b)))
    got_sub = spec.decode(np.asarray(field.sub(a, b)))
    got_sqr = spec.decode(np.asarray(field.sqr(a)))
    got_neg = spec.decode(np.asarray(field.neg(a)))

    for i, (x, y) in enumerate(zip(a_int, b_int)):
        assert got_mul[i] == x * y % p, f"mul[{i}]"
        assert got_add[i] == (x + y) % p, f"add[{i}]"
        assert got_sub[i] == (x - y) % p, f"sub[{i}]"
        assert got_sqr[i] == x * x % p, f"sqr[{i}]"
        assert got_neg[i] == (-x) % p, f"neg[{i}]"


@pytest.mark.parametrize("field,spec,p", [(FrField, FR, R), (FqField, FQ, Q)])
def test_mont_roundtrip(field: Field, spec, p):
    rnd = random.Random(43)
    vals = _rand_elems(rnd, p, 16)
    canon = spec.encode(vals, mont=False)
    mont = field.to_mont(canon)
    assert list(spec.decode(np.asarray(mont))) == [v % p for v in vals]
    back = field.from_mont(mont)
    assert list(spec.decode(np.asarray(back), mont=False)) == [v % p for v in vals]


def test_inverse():
    rnd = random.Random(44)
    vals = [1, 2, R - 1] + [rnd.randrange(1, R) for _ in range(13)]
    a = FR.encode(vals)
    inv = FrField.inv(a)
    got = FR.decode(np.asarray(inv))
    for i, v in enumerate(vals):
        assert got[i] == pow(v, -1, R), f"inv[{i}]"
    # inv(0) == 0 (matches the reference's Div-by-zero semantics, graph.rs:79-85)
    z = FR.encode([0])
    assert FR.decode(np.asarray(FrField.inv(z)))[0] == 0


def test_predicates_and_select():
    vals = [0, 5, 5, 7]
    a = FR.encode(vals)
    b = FR.encode([0, 5, 6, 7])
    assert list(np.asarray(FrField.is_zero(a))) == [True, False, False, False]
    assert list(np.asarray(FrField.eq(a, b))) == [True, True, False, True]
    sel = FrField.select(np.array([True, False, True, False]), a, b)
    assert list(FR.decode(np.asarray(sel))) == [0, 5, 5, 7]


def test_canon_shift_and_lt():
    rnd = random.Random(45)
    vals = [rnd.randrange(R) for _ in range(8)]
    canon = FR.encode(vals, mont=False)
    for k in [0, 1, 7, 15, 16, 17, 100, 253]:
        got = FR.decode(np.asarray(FrField.canon_shift_right_const(canon, k)), mont=False)
        for i, v in enumerate(vals):
            assert got[i] == v >> k, f"shr[{k}][{i}]"
    other = FR.encode(vals[::-1], mont=False)
    lt = np.asarray(FrField.canon_lt(canon, other))
    for i, (x, y) in enumerate(zip(vals, vals[::-1])):
        assert bool(lt[i]) == (x < y)


def test_pow_bits():
    rnd = random.Random(46)
    vals = [rnd.randrange(R) for _ in range(4)]
    e = rnd.randrange(1 << 64)
    bits = np.array([(e >> i) & 1 for i in range(64)], dtype=np.uint32)
    a = FR.encode(vals)
    got = FR.decode(np.asarray(FrField.pow_bits(a, bits)))
    for i, v in enumerate(vals):
        assert got[i] == pow(v, e, R)
