"""Pippenger MSM vs the naive oracle sum (new capability; BASELINE.md)."""

import random

import numpy as np
import pytest

from bn_tpu import curve, msm, oracle as O, params as P


@pytest.fixture(scope="module")
def rng():
    random.seed(66)
    return random


def test_digit_extraction(rng):
    scalars = [rng.randrange(P.R_SCALAR) for _ in range(5)] + [0, 1]
    sc16 = msm.scalars_to_u16(scalars)
    for c in (4, 13):
        digits = msm.extract_digits(sc16, c)
        for i, s in enumerate(scalars):
            rec = sum(int(digits[k, i]) << (c * k) for k in range(digits.shape[0]))
            assert rec == s


def test_schedule_covers_all_points(rng):
    scalars = [rng.randrange(P.R_SCALAR) for _ in range(50)]
    digits = msm.extract_digits(msm.scalars_to_u16(scalars), 4)
    idx = msm.build_schedule(digits, 4)
    w, nb, r = idx.shape
    for k in range(w):
        scheduled = idx[k][idx[k] != 50]
        nonzero = np.nonzero(digits[k])[0]
        assert sorted(scheduled.tolist()) == sorted(nonzero.tolist())


@pytest.mark.parametrize("n", [1, 7, 33])
def test_msm_matches_oracle(rng, n):
    pts = [O.g1_mul(O.G1_ONE, rng.randrange(1, P.R_SCALAR)) for _ in range(n)]
    scalars = [rng.randrange(P.R_SCALAR) for _ in range(n)]
    if n > 2:
        scalars[1] = 0
        scalars[2] = 1
    got = curve.from_device(curve.g1_spec(), msm.msm(pts, scalars, c=4))[0]
    expect = msm.msm_oracle(pts, scalars)
    assert O.g_eq(O.FQ_OPS, got, expect)
