"""G1/G2 group law differentially tested against the host oracle (analogue of
group_trials, src/groups/tests.rs, and the conversion/infinity tests,
src/groups/mod.rs:417-439, 825-832)."""

import random

import jax
import numpy as np
import pytest

from bn_tpu import curve, oracle as O, params as P
from bn_tpu.fields import fp

B = 3


def specs():
    return [
        (curve.g1_spec(), O.FQ_OPS, O.G1_ONE, O.g1_mul),
        (curve.g2_spec(), O.FQ2_OPS, O.G2_ONE, O.g2_mul),
    ]


@pytest.fixture(scope="module")
def rng():
    random.seed(55)
    return random


def rand_points(rng, omul, gone, n):
    return [omul(gone, rng.randrange(1, P.R_SCALAR)) for _ in range(n)]


@pytest.mark.parametrize("idx", [0, 1], ids=["G1", "G2"])
def test_add_double_neg(rng, idx):
    spec, F, gone, omul = specs()[idx]
    ps = rand_points(rng, omul, gone, B)
    qs = rand_points(rng, omul, gone, B)
    dp, dq = curve.to_device(spec, ps), curve.to_device(spec, qs)

    got = curve.from_device(spec, jax.jit(lambda p, q: curve.add(spec, p, q))(dp, dq))
    expect = [O.g_add(F, p, q) for p, q in zip(ps, qs)]
    for g, e in zip(got, expect):
        assert O.g_eq(F, g, e)

    got = curve.from_device(spec, jax.jit(lambda p: curve.double(spec, p))(dp))
    for g, e in zip(got, [O.g_double(F, p) for p in ps]):
        assert O.g_eq(F, g, e)

    got = curve.from_device(spec, jax.jit(lambda p: curve.neg(spec, p))(dp))
    for g, e in zip(got, [O.g_neg(F, p) for p in ps]):
        assert O.g_eq(F, g, e)


@pytest.mark.parametrize("idx", [0, 1], ids=["G1", "G2"])
def test_degenerate_add_cases(rng, idx):
    """P+P -> double, P+(-P) -> infinity, P+0 -> P, 0+P -> P (branchless
    analogue of reference src/groups/mod.rs:276-295)."""
    spec, F, gone, omul = specs()[idx]
    p = omul(gone, 1234567)
    cases_p = [p, p, p, O.g_zero(F), O.g_zero(F)]
    cases_q = [p, O.g_neg(F, p), O.g_zero(F), p, O.g_zero(F)]
    dp = curve.to_device(spec, cases_p)
    dq = curve.to_device(spec, cases_q)
    got = curve.from_device(spec, jax.jit(lambda a, b: curve.add(spec, a, b))(dp, dq))
    expect = [O.g_add(F, a, b) for a, b in zip(cases_p, cases_q)]
    for g, e in zip(got, expect):
        assert O.g_eq(F, g, e)


@pytest.mark.parametrize("idx", [0, 1], ids=["G1", "G2"])
def test_scalar_mul(rng, idx):
    spec, F, gone, omul = specs()[idx]
    ps = rand_points(rng, omul, gone, B)
    ks = [rng.randrange(P.R_SCALAR) for _ in range(B - 1)] + [0]
    dp = curve.to_device(spec, ps)
    dk = fp.to_device(fp.FR, ks)
    got = curve.from_device(spec, jax.jit(lambda p, k: curve.mul(spec, p, k))(dp, dk))
    for g, e in zip(got, [O.g_mul(F, p, k) for p, k in zip(ps, ks)]):
        assert O.g_eq(F, g, e)


@pytest.mark.parametrize("idx", [0, 1], ids=["G1", "G2"])
def test_affine_roundtrip_and_on_curve(rng, idx):
    """cf. test_affine_jacobian_conversion (src/groups/mod.rs:417-439)."""
    spec, F, gone, omul = specs()[idx]
    ps = rand_points(rng, omul, gone, B)
    dp = curve.to_device(spec, ps)
    aff = jax.jit(lambda p: curve.to_affine(spec, p))(dp)
    jac = curve.from_device(spec, curve.from_affine(spec, aff))
    for g, e in zip(jac, ps):
        assert O.g_eq(F, g, e)
    on = np.asarray(jax.jit(lambda a: curve.on_curve_affine(spec, a))(aff))
    assert on.all()


@pytest.mark.parametrize("idx", [0, 1], ids=["G1", "G2"])
def test_eq_and_zero(rng, idx):
    spec, F, gone, omul = specs()[idx]
    p = omul(gone, 333)
    p2 = O.g_double(F, p)  # different z representative after ops
    pj = O.g_add(F, p2, O.g_neg(F, p))  # == p with non-trivial z
    dz = curve.to_device(spec, [p, p, O.g_zero(F)])
    dw = curve.to_device(spec, [pj, O.g_zero(F), O.g_zero(F)])
    got = np.asarray(jax.jit(lambda a, b: curve.eq(spec, a, b))(dz, dw))
    assert list(got) == [True, False, True]
    assert list(np.asarray(curve.is_zero(spec, dz))) == [False, False, True]


def test_infinity_y_convention():
    """(0, 1, 0) and its negation (reference: src/groups/mod.rs:825-832)."""
    for spec in (curve.g1_spec(), curve.g2_spec()):
        z = curve.zero(spec, (2,))
        nz = curve.neg(spec, z)
        one = spec.field.ones((2,))
        assert np.asarray(spec.field.eq(z[1], one)).all()
        assert np.asarray(spec.field.eq(nz[1], one)).all()


def test_generator_matches_reference():
    for spec, F, gone, _ in specs():
        got = curve.from_device(spec, curve.one(spec, (1,)))[0]
        assert O.g_eq(F, got, gone)
