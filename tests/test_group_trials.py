"""Deep group property trials, batched TPU-style.

Mirrors the reference's generic `group_trials::<G>()`
(reference: src/groups/tests.rs:1-102, instantiated for G1/G2 at
src/groups/mod.rs:407-415): 50-wide random addition/doubling/DH trials and
the 10-round do/undo random walk with scalar inverses
(src/groups/tests.rs:42-83).  Each reference trial loop becomes a batch
axis; scalar inverses are computed host-side with Python pow (they are test
inputs, not device work).
"""

import numpy as np
import pytest

import jax

from bn_tpu import curve, oracle as O, params as P
from bn_tpu.fields import fp

N = 50

_MUL = jax.jit(curve.mul, static_argnums=0)


def _specs():
    return {"g1": curve.g1_spec(), "g2": curve.g2_spec()}


def _rand_scalars(rng, n):
    return [int.from_bytes(rng.bytes(40), "big") % P.R_SCALAR for _ in range(n)]


def _rand_points(spec, rng, n):
    """n random points as one device batch (generator times random scalars)."""
    ks = fp.to_device(fp.FR, _rand_scalars(rng, n))
    return _MUL(spec, curve.one(spec, (n,)), ks)


def _assert_eq(spec, p, q):
    ok = np.asarray(curve.eq(spec, p, q))
    assert ok.all(), np.nonzero(~ok)


@pytest.mark.parametrize("name", ["g1", "g2"])
def test_addition_50(name):
    """(r1+r2)+r3 == r1+(r2+r3) and full cancellation
    (reference: src/groups/tests.rs:5-14)."""
    spec = _specs()[name]
    rng = np.random.default_rng(103245)
    r1 = _rand_points(spec, rng, N)
    r2 = _rand_points(spec, rng, N)
    r3 = _rand_points(spec, rng, N)
    lhs = curve.add(spec, curve.add(spec, r1, r2), r3)
    rhs = curve.add(spec, r1, curve.add(spec, r2, r3))
    _assert_eq(spec, lhs, rhs)
    undone = curve.add(
        spec,
        curve.add(
            spec, curve.add(spec, lhs, curve.neg(spec, r2)), curve.neg(spec, r3)
        ),
        curve.neg(spec, r1),
    )
    assert np.asarray(curve.is_zero(spec, undone)).all()


@pytest.mark.parametrize("name", ["g1", "g2"])
def test_doubling_50(name):
    """(r1+r2)+r1 == double(r1)+r2 and double undone by 2^-1 in Fr
    (reference: src/groups/tests.rs:16-25)."""
    spec = _specs()[name]
    rng = np.random.default_rng(191922)
    r1 = _rand_points(spec, rng, N)
    r2 = _rand_points(spec, rng, N)
    lhs = curve.add(spec, curve.add(spec, r1, r2), r1)
    rhs = curve.add(spec, curve.double(spec, r1), r2)
    _assert_eq(spec, lhs, rhs)

    ti = pow(2, P.R_SCALAR - 2, P.R_SCALAR)
    tis = fp.to_device(fp.FR, [ti] * N)
    back = _MUL(spec, curve.double(spec, r1), tis)
    _assert_eq(spec, back, r1)


@pytest.mark.parametrize("name", ["g1", "g2"])
def test_dh_50(name):
    """DH agreement over 50 random key pairs
    (reference: src/groups/tests.rs:27-40)."""
    spec = _specs()[name]
    rng = np.random.default_rng(1293)
    a_sk = _rand_scalars(rng, N)
    b_sk = _rand_scalars(rng, N)
    da = fp.to_device(fp.FR, a_sk)
    db = fp.to_device(fp.FR, b_sk)
    g = curve.one(spec, (N,))
    mul = _MUL
    a_pk = mul(spec, g, da)
    b_pk = mul(spec, g, db)
    _assert_eq(spec, mul(spec, b_pk, da), mul(spec, a_pk, db))


@pytest.mark.parametrize("name", ["g1", "g2"])
def test_random_walk_do_undo(name):
    """10 rounds of {*a, neg, +b, *c, neg, -d, double} then the exact
    inverse sequence restores the starting batch
    (reference: src/groups/tests.rs:42-83).  Scalar inverses a^-1, c^-1,
    2^-1 are host Python ints; all point work is device-batched."""
    spec = _specs()[name]
    rng = np.random.default_rng(192103)
    begin = _rand_points(spec, rng, N)

    a_int = _rand_scalars(rng, N)
    c_int = _rand_scalars(rng, N)
    b = _rand_points(spec, rng, N)
    d = _rand_points(spec, rng, N)

    mul = _MUL
    a = fp.to_device(fp.FR, a_int)
    c = fp.to_device(fp.FR, c_int)
    ai = fp.to_device(fp.FR, [pow(x, P.R_SCALAR - 2, P.R_SCALAR) for x in a_int])
    ci = fp.to_device(fp.FR, [pow(x, P.R_SCALAR - 2, P.R_SCALAR) for x in c_int])
    ti = fp.to_device(fp.FR, [pow(2, P.R_SCALAR - 2, P.R_SCALAR)] * N)

    acc = begin
    for _ in range(10):
        acc = mul(spec, acc, a)
        acc = curve.neg(spec, acc)
        acc = curve.add(spec, acc, b)
        acc = mul(spec, acc, c)
        acc = curve.neg(spec, acc)
        acc = curve.add(spec, acc, curve.neg(spec, d))
        acc = curve.double(spec, acc)

    for _ in range(10):
        acc = mul(spec, acc, ti)
        acc = curve.add(spec, acc, d)
        acc = curve.neg(spec, acc)
        acc = mul(spec, acc, ci)
        acc = curve.add(spec, acc, curve.neg(spec, b))
        acc = curve.neg(spec, acc)
        acc = mul(spec, acc, ai)

    _assert_eq(spec, acc, begin)


def test_walk_spot_vs_oracle():
    """One lane of the walk cross-checked against the exact host oracle."""
    spec = curve.g1_spec()
    rng = np.random.default_rng(7)
    k, a = _rand_scalars(rng, 2)
    p = curve.to_device(spec, [O.g1_mul(O.G1_ONE, k)])
    da = fp.to_device(fp.FR, [a])
    got = curve.from_device(spec, _MUL(spec, p, da))[0]
    expect = O.g1_mul(O.g1_mul(O.G1_ONE, k), a)
    assert O.g_eq(O.FQ_OPS, got, expect)
