"""Fused Pallas TPU kernels for whole tower operations (Fq6/Fq12 level).

Round-1 kernels (ops/mont_pallas.py) fused up to Fq2; every Fq12-level op
still issued dozens of separate modular add/sub/xi pallas calls, each a full
HBM round trip of Fq12-sized tensors.  These kernels keep the ENTIRE tower
formula in registers/VMEM: one kernel per Fq12 multiply / square /
mul_by_024 / cyclotomic square, and one kernel per Miller-ladder step
(doubling / mixed-addition, including the line-coefficient emission), so the
pairing's hot loops touch HBM only for their true inputs and outputs.

Formulas mirror bn_tpu/fields/tower.py (reference: src/fields/fq6.rs,
fq12.rs; src/groups/mod.rs:591-634) which pin the golden vectors.

In-kernel value representation:
    Fq   = python list of NLIMBS (8,128)-uint32 register tiles
    Fq2  = [Fq, Fq]
    Fq6  = [Fq2, Fq2, Fq2]
    Fq12 = [Fq6, Fq6]
Tensor layout matches ops/mont_pallas: logical (..., *struct, L, B) packed by
pure reshape to (lead, *struct, L, nb, 8, 128); grid walks (lead, nb).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bn_tpu.params import NLIMBS
from bn_tpu.ops.mont_pallas import (
    BLOCK_B,
    LANES,
    SUBLANES,
    _k_add,
    _k_mont_mul,
    _k_neg,
    _k_small,
    _k_sub,
)

U32 = jnp.uint32


# ---------------------------------------------------------------------------
# in-kernel tower algebra (lists of register tiles; q/inv are numpy consts)
# ---------------------------------------------------------------------------


def _k2_add(a, b, q):
    return [_k_add(a[0], b[0], q), _k_add(a[1], b[1], q)]


def _k2_sub(a, b, q):
    return [_k_sub(a[0], b[0], q), _k_sub(a[1], b[1], q)]


def _k2_neg(a, q):
    return [_k_neg(a[0], q), _k_neg(a[1], q)]


def _k2_dbl(a, q):
    return _k2_add(a, a, q)


def _k2_mul(a, b, q, inv):
    """Karatsuba Fq2 product (reference: src/fields/fq2.rs:139-155)."""
    aa = _k_mont_mul(a[0], b[0], q, inv)
    bb = _k_mont_mul(a[1], b[1], q, inv)
    cc = _k_mont_mul(_k_add(a[0], a[1], q), _k_add(b[0], b[1], q), q, inv)
    return [_k_sub(aa, bb, q), _k_sub(_k_sub(cc, aa, q), bb, q)]


def _k2_sq(a, q, inv):
    """Complex squaring (reference: src/fields/fq2.rs:112-123)."""
    p0 = _k_mont_mul(_k_add(a[0], a[1], q), _k_sub(a[0], a[1], q), q, inv)
    p1 = _k_mont_mul(a[0], a[1], q, inv)
    return [p0, _k_add(p1, p1, q)]


def _k2_xi(a, q):
    """xi = 9+u multiply: (9 c0 - c1, c0 + 9 c1)."""
    n0 = _k_small(a[0], 9, q)
    n1 = _k_small(a[1], 9, q)
    return [_k_sub(n0, a[1], q), _k_add(n1, a[0], q)]


def _k2_scale_fq(a, k, q, inv):
    """Multiply both Fq components by an Fq element k."""
    return [_k_mont_mul(a[0], k, q, inv), _k_mont_mul(a[1], k, q, inv)]


def _k2_small(a, n: int, q):
    return [_k_small(a[0], n, q), _k_small(a[1], n, q)]


def _k6_add(a, b, q):
    return [_k2_add(x, y, q) for x, y in zip(a, b)]


def _k6_sub(a, b, q):
    return [_k2_sub(x, y, q) for x, y in zip(a, b)]


def _k6_nr(a, q):
    """v * a (reference: src/fields/fq6.rs:59-65)."""
    return [_k2_xi(a[2], q), a[0], a[1]]


def _k6_mul(a, b, q, inv):
    """Karatsuba Fq6 product (reference: src/fields/fq6.rs:144-158)."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    aa = _k2_mul(a0, b0, q, inv)
    bb = _k2_mul(a1, b1, q, inv)
    cc = _k2_mul(a2, b2, q, inv)
    t12 = _k2_mul(_k2_add(a1, a2, q), _k2_add(b1, b2, q), q, inv)
    t01 = _k2_mul(_k2_add(a0, a1, q), _k2_add(b0, b1, q), q, inv)
    t02 = _k2_mul(_k2_add(a0, a2, q), _k2_add(b0, b2, q), q, inv)
    r0 = _k2_add(_k2_xi(_k2_sub(_k2_sub(t12, bb, q), cc, q), q), aa, q)
    r1 = _k2_add(_k2_sub(_k2_sub(t01, aa, q), bb, q), _k2_xi(cc, q), q)
    r2 = _k2_sub(_k2_add(_k2_sub(t02, aa, q), bb, q), cc, q)
    return [r0, r1, r2]


def _k12_mul(a, b, q, inv):
    """Karatsuba Fq12 product (reference: src/fields/fq12.rs:295-307)."""
    a0, a1 = a
    b0, b1 = b
    aa = _k6_mul(a0, b0, q, inv)
    bb = _k6_mul(a1, b1, q, inv)
    cc = _k6_mul(_k6_add(a0, a1, q), _k6_add(b0, b1, q), q, inv)
    return [
        _k6_add(_k6_nr(bb, q), aa, q),
        _k6_sub(_k6_sub(cc, aa, q), bb, q),
    ]


def _k12_sq(a, q, inv):
    """(reference: src/fields/fq12.rs:275-282)"""
    a0, a1 = a
    ab = _k6_mul(a0, a1, q, inv)
    t = _k6_mul(_k6_add(_k6_nr(a1, q), a0, q), _k6_add(a0, a1, q), q, inv)
    return [
        _k6_sub(_k6_sub(t, ab, q), _k6_nr(ab, q), q),
        _k6_add(ab, ab, q),
    ]


def _k12_mul_by_024(a, x0, x2, x4, q, inv):
    """Sparse line multiply (reference: src/fields/fq12.rs:107-176)."""
    z0, z1, z2 = a[0]
    z3, z4, z5 = a[1]

    d0 = _k2_mul(z0, x0, q, inv)
    d2 = _k2_mul(z2, x2, q, inv)
    d4 = _k2_mul(z4, x4, q, inv)
    t2a = _k2_add(z0, z4, q)
    t1a = _k2_add(z0, z2, q)
    s0 = _k2_add(_k2_add(z1, z3, q), z5, q)

    # z1 * x2
    s1 = _k2_mul(z1, x2, q, inv)
    t3 = _k2_add(s1, d4, q)
    t4 = _k2_xi(t3, q)
    nz0 = _k2_add(t4, d0, q)

    t3 = _k2_mul(z5, x4, q, inv)
    s1 = _k2_add(s1, t3, q)
    t3 = _k2_add(t3, d2, q)
    t4 = _k2_xi(t3, q)
    t3 = _k2_mul(z1, x0, q, inv)
    s1 = _k2_add(s1, t3, q)
    nz1 = _k2_add(t4, t3, q)

    t0 = _k2_add(x0, x2, q)
    t3 = _k2_sub(_k2_sub(_k2_mul(t1a, t0, q, inv), d0, q), d2, q)
    t4 = _k2_mul(z3, x4, q, inv)
    s1 = _k2_add(s1, t4, q)
    nz2 = _k2_add(t3, t4, q)

    t0 = _k2_add(z2, z4, q)
    t1 = _k2_add(x2, x4, q)
    t3 = _k2_sub(_k2_sub(_k2_mul(t0, t1, q, inv), d2, q), d4, q)
    t4 = _k2_xi(t3, q)
    t3 = _k2_mul(z3, x0, q, inv)
    s1 = _k2_add(s1, t3, q)
    nz3 = _k2_add(t4, t3, q)

    t3 = _k2_mul(z5, x2, q, inv)
    s1 = _k2_add(s1, t3, q)
    t4 = _k2_xi(t3, q)
    t0 = _k2_add(x0, x4, q)
    t3 = _k2_sub(_k2_sub(_k2_mul(t2a, t0, q, inv), d0, q), d4, q)
    nz4 = _k2_add(t4, t3, q)

    t0 = _k2_add(_k2_add(x0, x2, q), x4, q)
    t3 = _k2_mul(s0, t0, q, inv)
    nz5 = _k2_sub(t3, s1, q)

    return [[nz0, nz1, nz2], [nz3, nz4, nz5]]


def _k12_cyclo_sq(a, q, inv):
    """Granger-Scott cyclotomic squaring (reference: src/fields/fq12.rs:178-227)."""
    z0, z4, z3 = a[0]
    z2, z1, z5 = a[1]

    def gs(zu, zv):
        tmp = _k2_mul(zu, zv, q, inv)
        big = _k2_mul(
            _k2_add(zu, zv, q), _k2_add(_k2_xi(zv, q), zu, q), q, inv
        )
        t_a = _k2_sub(_k2_sub(big, tmp, q), _k2_xi(tmp, q), q)
        t_b = _k2_add(tmp, tmp, q)
        return t_a, t_b

    t0, t1 = gs(z0, z1)
    t2, t3 = gs(z2, z3)
    t4, t5 = gs(z4, z5)

    def m3_sub(t, z):  # 3t - 2z
        r = _k2_sub(t, z, q)
        r = _k2_add(r, r, q)
        return _k2_add(r, t, q)

    def m3_add(t, z):  # 3t + 2z
        r = _k2_add(t, z, q)
        r = _k2_add(r, r, q)
        return _k2_add(r, t, q)

    nz0 = m3_sub(t0, z0)
    nz1 = m3_add(t1, z1)
    nz2 = m3_add(_k2_xi(t5, q), z2)
    nz3 = m3_sub(t4, z3)
    nz4 = m3_sub(t2, z4)
    nz5 = m3_add(t3, z5)
    return [[nz0, nz4, nz3], [nz2, nz1, nz5]]


# ---------------------------------------------------------------------------
# lazy-reduction tower algebra (ops/dw.py column space; one REDC per OUTPUT
# coefficient instead of one per product — Aranha et al. 2011).  SW pairs /
# triples mirror the [Fq, Fq] / [Fq2, ...] list structure above; `_d2_*`
# operate on [DW, DW] Fq2 values.  All value bounds are tracked exactly at
# trace time by ops/dw.py and over-budget formulas fail to trace.
# ---------------------------------------------------------------------------

from bn_tpu.ops import dw as _dw


def _s2(a, hi):
    """Raw 2xL tile lists -> (SW, SW) with the given exclusive bound."""
    return [_dw.sw(a[0], hi), _dw.sw(a[1], hi)]


def _s2_add(a, b):
    return [_dw.sw_add(a[0], b[0]), _dw.sw_add(a[1], b[1])]


def _s6_add(a, b):
    return [_s2_add(x, y) for x, y in zip(a, b)]


def _d2_prod(a, b):
    """Fq2 product in column space (0 REDC).  Karatsuba (3 Fq products) when
    the pre-adds fit single-width; otherwise 4-product schoolbook — operands
    that are themselves Karatsuba sums (bound 4q) would overflow the 2^256
    pre-add budget, and in column space the schoolbook cross terms are free
    of modular adds anyway."""
    p0 = _dw.prod(a[0], b[0])
    p1 = _dw.prod(a[1], b[1])
    if a[0].hi + a[1].hi <= 1 << 256 and b[0].hi + b[1].hi <= 1 << 256:
        p01 = _dw.prod(_dw.sw_add(a[0], a[1]), _dw.sw_add(b[0], b[1]))
        c1 = _dw.sub(_dw.sub(p01, p0), p1)
    else:
        c1 = _dw.add(_dw.prod(a[0], b[1]), _dw.prod(a[1], b[0]))
    return [_dw.sub(p0, p1), c1]


def _d2_add(a, b):
    return [_dw.add(a[0], b[0]), _dw.add(a[1], b[1])]


def _d2_sub(a, b):
    return [_dw.sub(a[0], b[0]), _dw.sub(a[1], b[1])]


def _d2_dbl(a):
    return [_dw.dbl(a[0]), _dw.dbl(a[1])]


def _d2_smul(a, k):
    return [_dw.smul(a[0], k), _dw.smul(a[1], k)]


def _d2_xi(a):
    return list(_dw.xi_pair(a[0], a[1]))


def _d2_from_s2(a):
    """Montgomery-domain Fq2 -> column space (times R, so redc undoes it)."""
    return [_dw.from_sw_hi(a[0]), _dw.from_sw_hi(a[1])]


def _d2_redc(a, q, inv):
    r = [_dw.redc(a[0], q, inv), _dw.redc(a[1], q, inv)]
    return [r[0].limbs, r[1].limbs]


def _d6_prod(a, b):
    """Karatsuba Fq6 product in column space (18 Fq products, 0 REDC;
    formula of reference src/fields/fq6.rs:144-158)."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    aa = _d2_prod(a0, b0)
    bb = _d2_prod(a1, b1)
    cc = _d2_prod(a2, b2)
    t12 = _d2_prod(_s2_add(a1, a2), _s2_add(b1, b2))
    t01 = _d2_prod(_s2_add(a0, a1), _s2_add(b0, b1))
    t02 = _d2_prod(_s2_add(a0, a2), _s2_add(b0, b2))
    r0 = _d2_add(_d2_xi(_d2_sub(_d2_sub(t12, bb), cc)), aa)
    r1 = _d2_add(_d2_sub(_d2_sub(t01, aa), bb), _d2_xi(cc))
    r2 = _d2_sub(_d2_add(_d2_sub(t02, aa), bb), cc)
    return [r0, r1, r2]


def _d6_nr(a):
    """v * a on a column-space Fq6 (reference: src/fields/fq6.rs:59-65)."""
    return [_d2_xi(a[2]), a[0], a[1]]


def _d6_add(a, b):
    return [_d2_add(x, y) for x, y in zip(a, b)]


def _d6_sub(a, b):
    return [_d2_sub(x, y) for x, y in zip(a, b)]


def _d6_redc(a, q, inv):
    return [_d2_redc(c, q, inv) for c in a]


def _sw6(a, q):
    """Raw Fq6 tile struct -> SW triple (canonical inputs, bound q)."""
    q_int = 0
    for i, w in enumerate(q):
        q_int |= int(w) << (16 * i)
    return [_s2([a[c][0], a[c][1]], q_int) for c in range(3)]


def _qint(q):
    q_int = 0
    for i, w in enumerate(q):
        q_int |= int(w) << (16 * i)
    return q_int


def _k2_mul_l(a, b, q, inv):
    """Raw-tile lazy Fq2 multiply: canonical in -> canonical out, 2 REDC."""
    qi = _qint(q)
    return _d2_redc(_d2_prod(_s2(a, qi), _s2(b, qi)), q, inv)


def _k2_sq_l(a, q, inv):
    """Raw-tile lazy complex squaring: (a0+a1)(a0-a1 mod q) and 2 a0 a1,
    2 products + 2 REDC (the +q slack in the subtraction is a multiple of
    q that REDC erases)."""
    qi = _qint(q)
    s = _dw.sw_add(_dw.sw(a[0], qi), _dw.sw(a[1], qi))
    d = _dw.sw(_k_sub(a[0], a[1], q), qi)
    c0 = _dw.redc(_dw.prod(s, d), q, inv).limbs
    c1 = _dw.redc(
        _dw.dbl(_dw.prod(_dw.sw(a[0], qi), _dw.sw(a[1], qi))), q, inv
    ).limbs
    return [c0, c1]


def _k12_mul_lazy(a, b, q, inv):
    """Fq12 Karatsuba with full-tower lazy reduction: 54 products + 12 REDC
    (vs 54 products + 54 REDC for the CIOS path)."""
    a0, a1 = _sw6(a[0], q), _sw6(a[1], q)
    b0, b1 = _sw6(b[0], q), _sw6(b[1], q)
    aa = _d6_prod(a0, b0)
    bb = _d6_prod(a1, b1)
    cc = _d6_prod(_s6_add(a0, a1), _s6_add(b0, b1))
    r0 = _d6_add(_d6_nr(bb), aa)
    r1 = _d6_sub(_d6_sub(cc, aa), bb)
    return [_d6_redc(r0, q, inv), _d6_redc(r1, q, inv)]


def _k12_sq_lazy(a, q, inv):
    """Fq12 squaring, lazy: 36 products + 12 REDC
    (reference: src/fields/fq12.rs:275-282)."""
    a0, a1 = _sw6(a[0], q), _sw6(a[1], q)
    # nr(a1) as a reduced single-width operand (modular xi on canonical a1)
    nr_a1_t = _k6_nr(a[1], q)
    nr_a1 = _sw6(nr_a1_t, q)
    ab = _d6_prod(a0, a1)
    t = _d6_prod(_s6_add(a0, nr_a1), _s6_add(a0, a1))
    r0 = _d6_sub(_d6_sub(t, ab), _d6_nr(ab))
    r1 = [_d2_dbl(c) for c in ab]
    return [_d6_redc(r0, q, inv), _d6_redc(r1, q, inv)]


def _k12_mul024_lazy(f, x0, x2, x4, q, inv):
    """Sparse line multiply, lazy: 39 products + 12 REDC
    (reference: src/fields/fq12.rs:107-176)."""
    q_int = 0
    for i, w in enumerate(q):
        q_int |= int(w) << (16 * i)
    z0, z1, z2 = (_s2(f[0][c], q_int) for c in range(3))
    z3, z4, z5 = (_s2(f[1][c], q_int) for c in range(3))
    x0 = _s2(x0, q_int)
    x2 = _s2(x2, q_int)
    x4 = _s2(x4, q_int)

    d0 = _d2_prod(z0, x0)
    d2 = _d2_prod(z2, x2)
    d4 = _d2_prod(z4, x4)
    t2a = _s2_add(z0, z4)
    t1a = _s2_add(z0, z2)
    s0 = _s2_add(_s2_add(z1, z3), z5)

    z1x2 = _d2_prod(z1, x2)
    nz0 = _d2_add(_d2_xi(_d2_add(z1x2, d4)), d0)

    z5x4 = _d2_prod(z5, x4)
    z1x0 = _d2_prod(z1, x0)
    nz1 = _d2_add(_d2_xi(_d2_add(z5x4, d2)), z1x0)

    t1t0 = _d2_prod(t1a, _s2_add(x0, x2))
    z3x4 = _d2_prod(z3, x4)
    nz2 = _d2_add(_d2_sub(_d2_sub(t1t0, d0), d2), z3x4)

    z24x24 = _d2_prod(_s2_add(z2, z4), _s2_add(x2, x4))
    z3x0 = _d2_prod(z3, x0)
    nz3 = _d2_add(_d2_xi(_d2_sub(_d2_sub(z24x24, d2), d4)), z3x0)

    z5x2 = _d2_prod(z5, x2)
    t2t0 = _d2_prod(t2a, _s2_add(x0, x4))
    nz4 = _d2_add(_d2_xi(z5x2), _d2_sub(_d2_sub(t2t0, d0), d4))

    s1 = _d2_add(
        _d2_add(_d2_add(z1x2, z5x4), _d2_add(z1x0, z3x4)),
        _d2_add(z3x0, z5x2),
    )
    s0t0 = _d2_prod(s0, _s2_add(_s2_add(x0, x2), x4))
    nz5 = _d2_sub(s0t0, s1)

    return [
        [_d2_redc(nz0, q, inv), _d2_redc(nz1, q, inv), _d2_redc(nz2, q, inv)],
        [_d2_redc(nz3, q, inv), _d2_redc(nz4, q, inv), _d2_redc(nz5, q, inv)],
    ]


def _k12_cyclo_sq_lazy(a, q, inv):
    """Granger–Scott cyclotomic squaring, lazy: 18 products + 12 REDC,
    with the 3t±2z chains done in column space
    (reference: src/fields/fq12.rs:178-227)."""
    q_int = 0
    for i, w in enumerate(q):
        q_int |= int(w) << (16 * i)
    z0t, z4t, z3t = a[0]
    z2t, z1t, z5t = a[1]
    z0, z4, z3 = _s2(z0t, q_int), _s2(z4t, q_int), _s2(z3t, q_int)
    z2, z1, z5 = _s2(z2t, q_int), _s2(z1t, q_int), _s2(z5t, q_int)

    def gs(zu, zv, zv_raw):
        tmp = _d2_prod(zu, zv)
        # xi(zv) reduced via the modular kernel (canonical input)
        xiv = _s2(_k2_xi(zv_raw, q), q_int)
        big = _d2_prod(_s2_add(zu, zv), _s2_add(xiv, zu))
        t_a = _d2_sub(_d2_sub(big, tmp), _d2_xi(tmp))
        t_b = _d2_dbl(tmp)
        return t_a, t_b

    t0, t1 = gs(z0, z1, [z1t[0], z1t[1]])
    t2, t3 = gs(z2, z3, [z3t[0], z3t[1]])
    t4, t5 = gs(z4, z5, [z5t[0], z5t[1]])

    def m3_sub(t, z):  # 3t - 2z, column space
        return _d2_sub(_d2_smul(t, 3), _d2_dbl(_d2_from_s2(z)))

    def m3_add(t, z):  # 3t + 2z
        return _d2_add(_d2_smul(t, 3), _d2_dbl(_d2_from_s2(z)))

    nz0 = _d2_redc(m3_sub(t0, z0), q, inv)
    nz1 = _d2_redc(m3_add(t1, z1), q, inv)
    nz2 = _d2_redc(m3_add(_d2_xi(t5), z2), q, inv)
    nz3 = _d2_redc(m3_sub(t4, z3), q, inv)
    nz4 = _d2_redc(m3_sub(t2, z4), q, inv)
    nz5 = _d2_redc(m3_add(t3, z5), q, inv)
    return [[nz0, nz4, nz3], [nz2, nz1, nz5]]


# ---------------------------------------------------------------------------
# ref <-> register-list loading (refs are (1, *struct, L, 1, 8, 128) blocks)
# ---------------------------------------------------------------------------


def _load_fq(ref, idx=()):
    return [ref[(0,) + idx + (i, 0)] for i in range(NLIMBS)]


def _load_fq2(ref, idx=()):
    return [_load_fq(ref, idx + (c,)) for c in range(2)]


def _load_fq6(ref, idx=()):
    return [_load_fq2(ref, idx + (c,)) for c in range(3)]


def _load_fq12(ref, idx=()):
    return [_load_fq6(ref, idx + (c,)) for c in range(2)]


def _store_fq(ref, v, idx=()):
    for i in range(NLIMBS):
        ref[(0,) + idx + (i, 0)] = v[i]


def _store_fq2(ref, v, idx=()):
    for c in range(2):
        _store_fq(ref, v[c], idx + (c,))


def _store_fq6(ref, v, idx=()):
    for c in range(3):
        _store_fq2(ref, v[c], idx + (c,))


def _store_fq12(ref, v, idx=()):
    for c in range(2):
        _store_fq6(ref, v[c], idx + (c,))


def _const_fq(v_limbs):
    """A static Fq constant as per-limb uint32 scalars (broadcast in ops)."""
    return [np.uint32(int(x)) for x in v_limbs]


def _const_fq2(v2_limbs):
    return [_const_fq(v2_limbs[0]), _const_fq(v2_limbs[1])]


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _fq12_mul_body(a_ref, b_ref, o_ref, *, q, inv, lazy=True):
    op = _k12_mul_lazy if lazy else _k12_mul
    _store_fq12(o_ref, op(_load_fq12(a_ref), _load_fq12(b_ref), q, inv))


def _fq12_sq_body(a_ref, o_ref, *, q, inv, lazy=True):
    op = _k12_sq_lazy if lazy else _k12_sq
    _store_fq12(o_ref, op(_load_fq12(a_ref), q, inv))


def _fq12_cyclo_sq_body(a_ref, o_ref, *, q, inv, lazy=True):
    op = _k12_cyclo_sq_lazy if lazy else _k12_cyclo_sq
    _store_fq12(o_ref, op(_load_fq12(a_ref), q, inv))


def _tree_where(cond, x, y):
    """Elementwise select through the nested-list fq-tower structure."""
    if isinstance(x, list):
        return [_tree_where(cond, a, b) for a, b in zip(x, y)]
    return jnp.where(cond, x, y)


def _fq12_cyclo_chain_body(a_ref, o_ref, *, q, inv, lazy=True):
    """n successive Granger–Scott cyclotomic squarings in ONE pallas_call:
    the squaring count is the INNERMOST grid axis, and the running value is
    carried in the output block, which consecutive revisits keep resident
    in VMEM — no HBM round-trips between squarings, and one compiled kernel
    serves every chain length.  Used for the squaring runs of the NAF
    exp_by_neg_z ladders (the hot part of final exponentiation, reference:
    src/fields/fq12.rs:229-246)."""
    op = _k12_cyclo_sq_lazy if lazy else _k12_cyclo_sq
    k = pl.program_id(2)
    v = _tree_where(k == 0, _load_fq12(a_ref), _load_fq12(o_ref))
    _store_fq12(o_ref, op(v, q, inv))


def _fq12_mul024_body(a_ref, c_ref, o_ref, *, q, inv, lazy=True):
    """c_ref holds (ell_0, ell_vw, ell_vv) as a (3,2) struct."""
    f = _load_fq12(a_ref)
    e0 = _load_fq2(c_ref, (0,))
    evw = _load_fq2(c_ref, (1,))
    evv = _load_fq2(c_ref, (2,))
    if lazy:
        _store_fq12(o_ref, _k12_mul024_lazy(f, e0, evv, evw, q, inv))
    else:
        _store_fq12(o_ref, _k12_mul_by_024(f, e0, evv, evw, q, inv))


def _fq12_mul024_pre_body(a_ref, e0_ref, s_ref, o_ref, *, q, inv, lazy=True):
    """Sparse line multiply with PRE-SCALED coefficients: e0_ref = ell_0,
    s_ref = the (ell_vw*g1.y, ell_vv*g1.x) pair as a (2,2) struct.  The
    scaling is hoisted out of the Miller scan (ate.miller_loop) into one
    batched multiply over all 102 ladder steps."""
    f = _load_fq12(a_ref)
    e0 = _load_fq2(e0_ref)
    evw = _load_fq2(s_ref, (0,))
    evv = _load_fq2(s_ref, (1,))
    if lazy:
        _store_fq12(o_ref, _k12_mul024_lazy(f, e0, evv, evw, q, inv))
    else:
        _store_fq12(o_ref, _k12_mul_by_024(f, e0, evv, evw, q, inv))


def _k2_scale_fq_l(a, k, q, inv):
    """Lazy Fq2-by-Fq scale: 2 products + 2 REDC."""
    qi = _qint(q)
    ks = _dw.sw(k, qi)
    return [
        _dw.redc(_dw.prod(_dw.sw(a[0], qi), ks), q, inv).limbs,
        _dw.redc(_dw.prod(_dw.sw(a[1], qi), ks), q, inv).limbs,
    ]


def _miller_step_body(f_ref, c_ref, px_ref, py_ref, o_ref, *, q, inv, do_sq, lazy=True):
    """One Miller-ladder step: optional f^2, scale line coeffs by the G1
    point, sparse mul_by_024 (reference: src/groups/mod.rs:494-509)."""
    f = _load_fq12(f_ref)
    px = _load_fq(px_ref)
    py = _load_fq(py_ref)
    e0 = _load_fq2(c_ref, (0,))
    if lazy:
        if do_sq:
            f = _k12_sq_lazy(f, q, inv)
        evw = _k2_scale_fq_l(_load_fq2(c_ref, (1,)), py, q, inv)
        evv = _k2_scale_fq_l(_load_fq2(c_ref, (2,)), px, q, inv)
        _store_fq12(o_ref, _k12_mul024_lazy(f, e0, evv, evw, q, inv))
        return
    if do_sq:
        f = _k12_sq(f, q, inv)
    evw = _k2_scale_fq(_load_fq2(c_ref, (1,)), py, q, inv)
    evv = _k2_scale_fq(_load_fq2(c_ref, (2,)), px, q, inv)
    _store_fq12(o_ref, _k12_mul_by_024(f, e0, evv, evw, q, inv))


def _double_step_lazy(x, y, z, q, inv, two_inv, twist_b):
    """Lazy doubling step (reference: src/groups/mod.rs:612-634): products
    in column space, REDC per needed value, linear tails fused into the
    REDC of the defining products."""
    qi = _qint(q)
    ti = _dw.sw(
        [jnp.full((SUBLANES, LANES), v, U32) for v in _const_fq(two_inv)], qi
    )
    tb = [
        _dw.sw(
            [jnp.full((SUBLANES, LANES), v, U32) for v in _const_fq(tw)], qi
        )
        for tw in twist_b
    ]

    def s2(v):
        return _s2(v, qi)

    xs, ys, zs = s2(x), s2(y), s2(z)
    # a = x*y/2: x*y lazy, then scale by the two_inv constant
    xy = _d2_redc(_d2_prod(xs, ys), q, inv)
    a = _k2_scale_fq_l(xy, ti.limbs, q, inv)
    b = _k2_sq_l(y, q, inv)  # y^2
    c = _k2_sq_l(z, q, inv)  # z^2
    # e = (3c) * twist_b  (Karatsuba against the constant pair)
    d3 = _k2_small(c, 3, q)
    e = _d2_redc(_d2_prod(s2(d3), tb), q, inv)
    f = _k2_small(e, 3, q)
    g = _k2_scale_fq_l(_k2_add(b, f, q), ti.limbs, q, inv)
    # h = (y+z)^2 - (b+c): one REDC absorbs the subtraction
    yz = _s2_add(ys, zs)
    h_dw = _d2_sub(
        _d2_prod(yz, yz),
        _d2_add(_d2_from_s2(s2(b)), _d2_from_s2(s2(c))),
    )
    h = _d2_redc(h_dw, q, inv)
    i = _k2_sub(e, b, q)
    # ny = g^2 - 3 e^2: one REDC
    gs_, es_ = s2(g), s2(e)
    ny = _d2_redc(
        _d2_sub(_d2_prod(gs_, gs_), _d2_smul(_d2_prod(es_, es_), 3)), q, inv
    )
    nx = _k2_mul_l(a, _k2_sub(b, f, q), q, inv)
    nz = _k2_mul_l(b, h, q, inv)
    # ell_vv = 3 x^2: one REDC
    ell_vv = _d2_redc(_d2_smul(_d2_prod(xs, xs), 3), q, inv)
    return nx, ny, nz, _k2_xi(i, q), _k2_neg(h, q), ell_vv


def _double_step_body(r_ref, o_ref, c_ref, *, q, inv, two_inv, twist_b, lazy=True):
    """Miller doubling step on the running G2 point, emitting EllCoeffs
    (reference: src/groups/mod.rs:612-634).  r is a (3,2) struct (x,y,z)."""
    x = _load_fq2(r_ref, (0,))
    y = _load_fq2(r_ref, (1,))
    z = _load_fq2(r_ref, (2,))
    if lazy:
        nx, ny, nz, ell_0, ell_vw, ell_vv = _double_step_lazy(
            x, y, z, q, inv, two_inv, twist_b
        )
        _store_fq2(o_ref, nx, (0,))
        _store_fq2(o_ref, ny, (1,))
        _store_fq2(o_ref, nz, (2,))
        _store_fq2(c_ref, ell_0, (0,))
        _store_fq2(c_ref, ell_vw, (1,))
        _store_fq2(c_ref, ell_vv, (2,))
        return
    ti = _const_fq(two_inv)
    tb = _const_fq2(twist_b)

    a = _k2_scale_fq(_k2_mul(x, y, q, inv), ti, q, inv)
    b = _k2_sq(y, q, inv)
    c = _k2_sq(z, q, inv)
    d = _k2_small(c, 3, q)
    e = _k2_mul(d, tb, q, inv)
    f = _k2_small(e, 3, q)
    g = _k2_scale_fq(_k2_add(b, f, q), ti, q, inv)
    h = _k2_sub(_k2_sq(_k2_add(y, z, q), q, inv), _k2_add(b, c, q), q)
    i = _k2_sub(e, b, q)
    j = _k2_sq(x, q, inv)
    e_sq = _k2_sq(e, q, inv)

    nx = _k2_mul(a, _k2_sub(b, f, q), q, inv)
    ny = _k2_sub(_k2_sq(g, q, inv), _k2_small(e_sq, 3, q), q)
    nz = _k2_mul(b, h, q, inv)

    _store_fq2(o_ref, nx, (0,))
    _store_fq2(o_ref, ny, (1,))
    _store_fq2(o_ref, nz, (2,))
    _store_fq2(c_ref, _k2_xi(i, q), (0,))  # ell_0
    _store_fq2(c_ref, _k2_neg(h, q), (1,))  # ell_vw
    _store_fq2(c_ref, _k2_small(j, 3, q), (2,))  # ell_vv


def _madd_step_lazy(x, y, z, bx, by, q, inv):
    """Lazy mixed-addition step (reference: src/groups/mod.rs:591-610)."""
    qi = _qint(q)

    def s2(v):
        return _s2(v, qi)

    xs, ys, zs = s2(x), s2(y), s2(z)
    bxs, bys = s2(bx), s2(by)
    # d = x - z*bx, e = y - z*by: REDC absorbs the subtraction
    d = _d2_redc(
        _d2_sub(_d2_from_s2(xs), _d2_prod(zs, bxs)), q, inv
    )
    e = _d2_redc(
        _d2_sub(_d2_from_s2(ys), _d2_prod(zs, bys)), q, inv
    )
    ds, es = s2(d), s2(e)
    f = _k2_sq_l(d, q, inv)
    g = _k2_sq_l(e, q, inv)
    h = _k2_mul_l(d, f, q, inv)
    i = _k2_mul_l(x, f, q, inv)
    # j = z*g + h - 2i: one REDC
    j = _d2_redc(
        _d2_add(
            _d2_prod(zs, s2(g)),
            _d2_sub(_d2_from_s2(s2(h)), _d2_dbl(_d2_from_s2(s2(i)))),
        ),
        q,
        inv,
    )
    nx = _k2_mul_l(d, j, q, inv)
    # ny = e*(i-j) - h*y: one REDC
    ny = _d2_redc(
        _d2_sub(_d2_prod(es, s2(_k2_sub(i, j, q))), _d2_prod(s2(h), ys)),
        q,
        inv,
    )
    nz = _k2_mul_l(z, h, q, inv)
    # ell_0 = xi(e*bx - d*by): one REDC then the cheap modular xi
    ebx_dby = _d2_redc(
        _d2_sub(_d2_prod(es, bxs), _d2_prod(ds, bys)), q, inv
    )
    ell_0 = _k2_xi(ebx_dby, q)
    return nx, ny, nz, ell_0, d, _k2_neg(e, q)


def _madd_step_body(r_ref, b_ref, o_ref, c_ref, *, q, inv, lazy=True):
    """Miller mixed-addition step (reference: src/groups/mod.rs:591-610).
    b_ref is the affine base point (2,2) struct (bx, by)."""
    x = _load_fq2(r_ref, (0,))
    y = _load_fq2(r_ref, (1,))
    z = _load_fq2(r_ref, (2,))
    bx = _load_fq2(b_ref, (0,))
    by = _load_fq2(b_ref, (1,))
    if lazy:
        nx, ny, nz, ell_0, ell_vw, ell_vv = _madd_step_lazy(
            x, y, z, bx, by, q, inv
        )
        _store_fq2(o_ref, nx, (0,))
        _store_fq2(o_ref, ny, (1,))
        _store_fq2(o_ref, nz, (2,))
        _store_fq2(c_ref, ell_0, (0,))
        _store_fq2(c_ref, ell_vw, (1,))
        _store_fq2(c_ref, ell_vv, (2,))
        return

    d = _k2_sub(x, _k2_mul(z, bx, q, inv), q)
    e = _k2_sub(y, _k2_mul(z, by, q, inv), q)
    f = _k2_sq(d, q, inv)
    g = _k2_sq(e, q, inv)
    h = _k2_mul(d, f, q, inv)
    i = _k2_mul(x, f, q, inv)
    j = _k2_sub(_k2_add(_k2_mul(z, g, q, inv), h, q), _k2_add(i, i, q), q)

    nx = _k2_mul(d, j, q, inv)
    ny = _k2_sub(_k2_mul(e, _k2_sub(i, j, q), q, inv), _k2_mul(h, y, q, inv), q)
    nz = _k2_mul(z, h, q, inv)

    ell_0 = _k2_xi(
        _k2_sub(_k2_mul(e, bx, q, inv), _k2_mul(d, by, q, inv), q), q
    )
    _store_fq2(o_ref, nx, (0,))
    _store_fq2(o_ref, ny, (1,))
    _store_fq2(o_ref, nz, (2,))
    _store_fq2(c_ref, ell_0, (0,))
    _store_fq2(c_ref, d, (1,))  # ell_vw
    _store_fq2(c_ref, _k2_neg(e, q), (2,))  # ell_vv


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

_STRUCTS = {
    "fq": (),
    "fq2": (2,),
    "fq6": (3, 2),
    "coeff": (3, 2),  # (ell_0, ell_vw, ell_vv)
    "point": (3, 2),  # (x, y, z) over Fq2
    "base": (2, 2),  # (bx, by) over Fq2
    "fq12": (2, 3, 2),
}


def _spec(struct: tuple):
    ns = len(struct)
    return pl.BlockSpec(
        (1,) + struct + (NLIMBS, 1, SUBLANES, LANES),
        lambda i, j, _ns=ns: (i,) + (0,) * _ns + (0, j, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _pack(x, struct: tuple):
    """(..., *struct, L, B) -> (lead, *struct, L, nb, 8, 128) by reshape."""
    out_shape = x.shape
    B = x.shape[-1]
    pad = (-B) % BLOCK_B
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    nb = (B + pad) // BLOCK_B
    x = x.reshape((-1,) + struct + (NLIMBS, nb, SUBLANES, LANES))
    return x, pad, out_shape


def _unpack(o, pad: int, out_shape):
    B = out_shape[-1]
    o = o.reshape(out_shape[:-1] + (B + pad,))
    return o[..., :B] if pad else o


def _lazy_default() -> bool:
    """Lazy-reduction kernels (BN_TPU_LAZY=0 restores the CIOS-per-product
    bodies; formulas identical, only the reduction schedule differs)."""
    import os

    return os.environ.get("BN_TPU_LAZY", "1") != "0"


@functools.lru_cache(maxsize=None)
def _build(kind: str, q_tuple, inv: int, extra=(), interpret: bool = False, lazy: bool = True):
    q = [np.uint32(v) for v in q_tuple]
    inv = np.uint32(inv)
    extra = dict(extra)

    if kind == "fq12_mul":
        body = functools.partial(_fq12_mul_body, q=q, inv=inv, lazy=lazy)
        ins, outs = ["fq12", "fq12"], ["fq12"]
    elif kind == "fq12_sq":
        body = functools.partial(_fq12_sq_body, q=q, inv=inv, lazy=lazy)
        ins, outs = ["fq12"], ["fq12"]
    elif kind == "fq12_cyclo_sq":
        body = functools.partial(_fq12_cyclo_sq_body, q=q, inv=inv, lazy=lazy)
        ins, outs = ["fq12"], ["fq12"]
    elif kind == "fq12_cyclo_chain":
        body = functools.partial(_fq12_cyclo_chain_body, q=q, inv=inv, lazy=lazy)
        # dedicated 3D-grid run: squaring axis innermost so consecutive
        # steps revisit (and keep in VMEM) the same value block
        spec3 = pl.BlockSpec(
            (1, 2, 3, 2, NLIMBS, 1, SUBLANES, LANES),
            lambda i, j, k: (i, 0, 0, 0, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        )

        def run_chain(a, *, n):
            lead, nb = a.shape[0], a.shape[-3]
            return pl.pallas_call(
                body,
                out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
                grid=(lead, nb, n),
                in_specs=[spec3],
                out_specs=spec3,
                interpret=interpret,
            )(a)

        return jax.jit(run_chain, static_argnames=("n",))
    elif kind == "fq12_mul024":
        body = functools.partial(_fq12_mul024_body, q=q, inv=inv, lazy=lazy)
        ins, outs = ["fq12", "coeff"], ["fq12"]
    elif kind == "fq12_mul024_pre":
        body = functools.partial(_fq12_mul024_pre_body, q=q, inv=inv, lazy=lazy)
        ins, outs = ["fq12", "fq2", "base"], ["fq12"]
    elif kind in ("miller_sq_step", "miller_step"):
        body = functools.partial(
            _miller_step_body,
            q=q,
            inv=inv,
            do_sq=(kind == "miller_sq_step"),
            lazy=lazy,
        )
        ins, outs = ["fq12", "coeff", "fq", "fq"], ["fq12"]
    elif kind == "double_step":
        body = functools.partial(
            _double_step_body,
            q=q,
            inv=inv,
            two_inv=extra["two_inv"],
            twist_b=extra["twist_b"],
            lazy=lazy,
        )
        ins, outs = ["point"], ["point", "coeff"]
    elif kind == "madd_step":
        body = functools.partial(_madd_step_body, q=q, inv=inv, lazy=lazy)
        ins, outs = ["point", "base"], ["point", "coeff"]
    else:  # pragma: no cover
        raise ValueError(kind)

    def run(*ops):
        lead = ops[0].shape[0]
        nb = ops[0].shape[-3]
        out_shape = [
            jax.ShapeDtypeStruct(
                (lead,) + _STRUCTS[s] + (NLIMBS, nb, SUBLANES, LANES), U32
            )
            for s in outs
        ]
        res = pl.pallas_call(
            body,
            out_shape=out_shape if len(outs) > 1 else out_shape[0],
            grid=(lead, nb),
            in_specs=[_spec(_STRUCTS[s]) for s in ins],
            out_specs=[_spec(_STRUCTS[s]) for s in outs]
            if len(outs) > 1
            else _spec(_STRUCTS[outs[0]]),
            interpret=interpret,
        )(*ops)
        return res

    return jax.jit(run)


def _call(kind, ops, structs, q_limbs, inv, extra=()):
    from bn_tpu.ops.backend import interpret_mode

    packed = []
    pad = 0
    out_shape = None
    for x, s in zip(ops, structs):
        xp, pad, osh = _pack(x, _STRUCTS[s])
        packed.append(xp)
        if out_shape is None:
            out_shape = osh
    run = _build(
        kind,
        tuple(int(v) for v in q_limbs),
        int(inv),
        extra,
        interpret_mode(),
        _lazy_default(),
    )
    return run(*packed), pad, out_shape


# ---------------------------------------------------------------------------
# public entry points (operate on logical (..., *struct, L, B) tensors)
# ---------------------------------------------------------------------------


def fq12_mul(a, b, q_limbs, inv):
    out_shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, out_shape)
    b = jnp.broadcast_to(b, out_shape)
    o, pad, osh = _call("fq12_mul", (a, b), ("fq12", "fq12"), q_limbs, inv)
    return _unpack(o, pad, osh)


def fq12_sq(a, q_limbs, inv):
    o, pad, osh = _call("fq12_sq", (a,), ("fq12",), q_limbs, inv)
    return _unpack(o, pad, osh)


def fq12_cyclo_sq(a, q_limbs, inv):
    o, pad, osh = _call("fq12_cyclo_sq", (a,), ("fq12",), q_limbs, inv)
    return _unpack(o, pad, osh)


def fq12_cyclo_sq_chain(a, n: int, q_limbs, inv):
    """a^(2^n) in the cyclotomic subgroup: ONE pallas_call whose innermost
    grid axis runs the n squarings with the value VMEM-resident throughout
    (one kernel build for every n)."""
    assert n >= 1
    from bn_tpu.ops.backend import interpret_mode

    ap, pad, osh = _pack(a, _STRUCTS["fq12"])
    run = _build(
        "fq12_cyclo_chain",
        tuple(int(v) for v in q_limbs),
        int(inv),
        (),
        interpret_mode(),
        _lazy_default(),
    )
    return _unpack(run(ap, n=n), pad, osh)


def fq12_mul024(f, coeff, q_limbs, inv):
    """coeff: (..., 3, 2, L, B) = (ell_0, ell_vw, ell_vv) already scaled."""
    o, pad, osh = _call(
        "fq12_mul024", (f, coeff), ("fq12", "coeff"), q_limbs, inv
    )
    return _unpack(o, pad, osh)


def fq12_mul024_pre(f, ell0, scaled, q_limbs, inv):
    """ell0: (..., 2, L, B); scaled: (..., 2, 2, L, B) = (ell_vw*y, ell_vv*x)."""
    o, pad, osh = _call(
        "fq12_mul024_pre",
        (f, ell0, scaled),
        ("fq12", "fq2", "base"),
        q_limbs,
        inv,
    )
    return _unpack(o, pad, osh)


def miller_step(f, coeff, px, py, q_limbs, inv, do_sq: bool):
    """Fused Miller-ladder step: optional squaring + G1-scaled line multiply."""
    kind = "miller_sq_step" if do_sq else "miller_step"
    o, pad, osh = _call(
        kind, (f, coeff, px, py), ("fq12", "coeff", "fq", "fq"), q_limbs, inv
    )
    return _unpack(o, pad, osh)


def double_step(r, q_limbs, inv, two_inv, twist_b):
    """r: (..., 3, 2, L, B) Jacobian-projective G2 point -> (r', coeffs).

    two_inv: L-tuple Montgomery limbs; twist_b: 2xL-tuple (Fq2)."""
    extra = (("two_inv", tuple(two_inv)), ("twist_b", (tuple(twist_b[0]), tuple(twist_b[1]))))
    (ro, co), pad, osh = _call("double_step", (r,), ("point",), q_limbs, inv, extra)
    return _unpack(ro, pad, osh), _unpack(co, pad, osh)


def madd_step(r, base, q_limbs, inv):
    """Mixed-addition step: r (3,2 struct), base (2,2 struct) -> (r', coeffs)."""
    (ro, co), pad, osh = _call(
        "madd_step", (r, base), ("point", "base"), q_limbs, inv
    )
    co_shape = osh  # same (..., 3, 2, L, B) struct as r
    return _unpack(ro, pad, osh), _unpack(co, pad, co_shape)
