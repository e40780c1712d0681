"""Differential tests of the double-width lazy-reduction layer (ops/dw.py).

The dw functions operate on plain (8, 128) uint32 register tiles — the same
objects they see inside a Pallas kernel body — so they are testable directly
under jnp on CPU, no interpreter needed.  Checked exactly against Python
ints: product columns, signed combinations, xi, and the offsetting REDC with
its fold + canonicalization path (including adversarial near-bound values).
"""

import numpy as np
import pytest

from bn_tpu import params as P
from bn_tpu.ops import dw

RNG = np.random.default_rng(20260821)
SHAPE = (8, 128)
NV = SHAPE[0] * SHAPE[1]


def _to_tiles(vals, nl=P.NLIMBS):
    """list of ints -> list of nl (8,128) uint32 tiles (16-bit limbs)."""
    assert len(vals) == NV
    out = []
    for i in range(nl):
        arr = np.asarray(
            [(v >> (P.LIMB_BITS * i)) & P.LIMB_MASK for v in vals], dtype=np.uint32
        )
        out.append(arr.reshape(SHAPE))
    return out


def _sw_to_ints(s: dw.SW):
    tiles = [np.asarray(t).reshape(-1) for t in s.limbs]
    return [
        sum(int(tiles[i][k]) << (P.LIMB_BITS * i) for i in range(P.NLIMBS))
        for k in range(NV)
    ]


def _dw_to_ints(d: dw.DW):
    tiles = [np.asarray(t).reshape(-1).astype(np.int64) for t in d.cols]
    return [
        sum(int(tiles[i][k]) << (P.LIMB_BITS * i) for i in range(dw.NCOLS))
        for k in range(NV)
    ]


def _rand_fq(n=NV, lo=0):
    vals = [lo + int.from_bytes(RNG.bytes(40), "big") % (P.Q - lo) for _ in range(n)]
    # sprinkle edge cases
    vals[0], vals[1], vals[2] = 0, 1, P.Q - 1
    vals[3] = P.Q - 2
    return vals


def test_prod_exact():
    a = _rand_fq()
    b = _rand_fq()
    pa = dw.sw(_to_tiles(a), P.Q)
    pb = dw.sw(_to_tiles(b), P.Q)
    got = _dw_to_ints(dw.prod(pa, pb))
    for g, x, y in zip(got, a, b):
        assert g == x * y


def test_sw_add_and_combinations():
    a, b, c = _rand_fq(), _rand_fq(), _rand_fq()
    sa, sb, sc = (dw.sw(_to_tiles(v), P.Q) for v in (a, b, c))
    s = dw.sw_add(sa, sb)
    assert _sw_to_ints(s) == [(x + y) for x, y in zip(a, b)]
    # signed combination: a*b - c*c + 2*(a*c)
    d = dw.add(dw.sub(dw.prod(sa, sb), dw.prod(sc, sc)), dw.dbl(dw.prod(sa, sc)))
    got = _dw_to_ints(d)
    for g, x, y, z in zip(got, a, b, c):
        assert g == x * y - z * z + 2 * x * z


def test_xi_pair():
    a, b = _rand_fq(), _rand_fq()
    sa, sb = dw.sw(_to_tiles(a), P.Q), dw.sw(_to_tiles(b), P.Q)
    p0, p1 = dw.prod(sa, sa), dw.prod(sb, sb)
    r0, r1 = dw.xi_pair(p0, p1)
    g0, g1 = _dw_to_ints(r0), _dw_to_ints(r1)
    for x, y, u, v in zip(g0, g1, a, b):
        assert x == 9 * u * u - v * v
        assert y == u * u + 9 * v * v


def _redc_ref(v):
    """Reference: v * R^-1 mod q for signed v."""
    rinv = pow(1 << 256, P.Q - 2, P.Q)
    return (v % P.Q) * rinv % P.Q


@pytest.mark.parametrize("combo", ["pos", "neg", "big"])
def test_redc_matches_reference(combo):
    q_limbs = [(P.Q >> (P.LIMB_BITS * i)) & P.LIMB_MASK for i in range(P.NLIMBS)]
    inv = (-pow(P.Q, -1, 1 << P.LIMB_BITS)) % (1 << P.LIMB_BITS)
    a, b, c, e = _rand_fq(), _rand_fq(), _rand_fq(), _rand_fq()
    sa, sb, sc, se = (dw.sw(_to_tiles(v), P.Q) for v in (a, b, c, e))
    if combo == "pos":
        d = dw.prod(sa, sb)
        expect = [x * y for x, y in zip(a, b)]
    elif combo == "neg":
        # aa - bb (the Karatsuba c0 shape: can be as low as -q^2)
        d = dw.sub(dw.prod(sa, sb), dw.prod(sc, se))
        expect = [w * x - y * z for w, x, y, z in zip(a, b, c, e)]
    else:
        # large mixed combination with xi: exercises offset + fold budgets
        t0, t1 = dw.xi_pair(dw.prod(sa, sb), dw.prod(sc, se))
        d = dw.sub(dw.smul(t0, 3), dw.dbl(t1))
        expect = [
            3 * (9 * w * x - y * z) - 2 * (w * x + 9 * y * z)
            for w, x, y, z in zip(a, b, c, e)
        ]
    out = dw.redc(d, q_limbs, inv)
    got = _sw_to_ints(out)
    for g, v in zip(got, expect):
        assert g == _redc_ref(v)
        assert 0 <= g < P.Q


def test_redc_adversarial_max():
    """Push values to the interval-arithmetic edges: (q-1)^2 products summed
    to the largest combination the budget asserts allow."""
    q_limbs = [(P.Q >> (P.LIMB_BITS * i)) & P.LIMB_MASK for i in range(P.NLIMBS)]
    inv = (-pow(P.Q, -1, 1 << P.LIMB_BITS)) % (1 << P.LIMB_BITS)
    vals = [P.Q - 1] * NV
    s = dw.sw(_to_tiles(vals), P.Q)
    p = dw.prod(s, s)
    # 5*p - 4*p = p but with wide intermediate bounds
    d = dw.sub(dw.smul(p, 5), dw.smul(dw.from_sw(s), 4))
    expect = 5 * (P.Q - 1) ** 2 - 4 * (P.Q - 1)
    out = dw.redc(d, q_limbs, inv)
    for g in _sw_to_ints(out):
        assert g == _redc_ref(expect)
