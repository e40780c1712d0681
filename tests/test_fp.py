"""Fq/Fr Montgomery field layer vs Python ints (analogues of field_trials,
src/fields/tests.rs, and test_rsquared, src/fields/fp.rs:184-203)."""

import random

import jax
import numpy as np
import pytest

from bn_tpu import params as P
from bn_tpu.fields import fp


@pytest.fixture(scope="module", params=["Fq", "Fr"])
def spec(request):
    return fp.FQ if request.param == "Fq" else fp.FR


def test_roundtrip_montgomery(spec):
    """to_device/from_device round-trip (cf. test_rsquared, fp.rs:184-203)."""
    random.seed(7)
    xs = [random.randrange(spec.modulus) for _ in range(64)] + [0, 1, spec.modulus - 1]
    assert fp.from_device(spec, fp.to_device(spec, xs)) == xs


def test_field_ops(spec):
    random.seed(8)
    m = spec.modulus
    xs = [random.randrange(m) for _ in range(16)] + [0, 1, m - 1]
    ys = [random.randrange(m) for _ in range(16)] + [1, m - 1, m - 1]
    a, b = fp.to_device(spec, xs), fp.to_device(spec, ys)
    assert fp.from_device(spec, jax.jit(lambda a, b: fp.mul(spec, a, b))(a, b)) == [
        (x * y) % m for x, y in zip(xs, ys)
    ]
    assert fp.from_device(spec, jax.jit(lambda a, b: fp.add(spec, a, b))(a, b)) == [
        (x + y) % m for x, y in zip(xs, ys)
    ]
    assert fp.from_device(spec, jax.jit(lambda a, b: fp.sub(spec, a, b))(a, b)) == [
        (x - y) % m for x, y in zip(xs, ys)
    ]
    assert fp.from_device(spec, jax.jit(lambda a: fp.neg(spec, a))(a)) == [
        (-x) % m for x in xs
    ]
    assert fp.from_device(spec, jax.jit(lambda a: fp.sqr(spec, a))(a)) == [
        (x * x) % m for x in xs
    ]


def test_inverse(spec):
    """a * a^-1 == 1; 0 -> 0 (reference returns None: fields/mod.rs:34,
    arith.rs:281-327)."""
    random.seed(9)
    m = spec.modulus
    xs = [random.randrange(1, m) for _ in range(8)] + [0, 1, m - 1]
    a = fp.to_device(spec, xs)
    got = fp.from_device(spec, jax.jit(lambda a: fp.inv(spec, a))(a))
    assert got == [P.inv_mod(x, m) if x else 0 for x in xs]


def test_pow_fixed(spec):
    random.seed(10)
    m = spec.modulus
    xs = [random.randrange(m) for _ in range(6)]
    a = fp.to_device(spec, xs)
    for e in [1, 2, 3, 65537, m - 2]:
        got = fp.from_device(spec, jax.jit(lambda a, e=e: fp.pow_fixed(spec, a, e))(a))
        assert got == [pow(x, e, m) for x in xs]


def test_mul_small(spec):
    random.seed(11)
    m = spec.modulus
    xs = [random.randrange(m) for _ in range(6)] + [m - 1]
    a = fp.to_device(spec, xs)
    for k in [1, 2, 3, 8, 9]:
        got = fp.from_device(spec, jax.jit(lambda a, k=k: fp.mul_small(spec, a, k))(a))
        assert got == [(k * x) % m for x in xs]


def test_field_properties(spec):
    """Property-style trials mirroring field_trials (src/fields/tests.rs:4-128):
    associativity, distributivity, squaring-vs-mul, add/neg random walks."""
    random.seed(12)
    m = spec.modulus
    n = 32
    xs = [random.randrange(m) for _ in range(n)]
    ys = [random.randrange(m) for _ in range(n)]
    zs = [random.randrange(m) for _ in range(n)]
    a, b, c = (fp.to_device(spec, v) for v in (xs, ys, zs))

    mul = jax.jit(lambda a, b: fp.mul(spec, a, b))
    add = jax.jit(lambda a, b: fp.add(spec, a, b))

    # (a*b)*c == a*(b*c)
    lhs = fp.from_device(spec, mul(mul(a, b), c))
    rhs = fp.from_device(spec, mul(a, mul(b, c)))
    assert lhs == rhs
    # a*(b+c) == a*b + a*c
    lhs = fp.from_device(spec, mul(a, add(b, c)))
    rhs = fp.from_device(spec, add(mul(a, b), mul(a, c)))
    assert lhs == rhs
    # squared == self*self
    assert fp.from_device(spec, jax.jit(lambda a: fp.sqr(spec, a))(a)) == fp.from_device(
        spec, mul(a, a)
    )
