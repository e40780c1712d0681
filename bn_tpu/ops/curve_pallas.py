"""Fused Pallas kernels for the whole Jacobian group law.

curve.py's generic law runs each base-field op as its own device op; at MSM
batch widths (10^6 lanes) that costs a full HBM round trip of (L, B) tensors
per op — a Jacobian add is ~22 multiplies and ~15 linear ops, i.e. ~70 tensor
round trips.  These kernels keep the ENTIRE add / double formula (including
the branchless degenerate handling) in registers/VMEM: one kernel, reading
the input points once and writing the result once.

Generic over the base field exactly like curve.py: a tiny in-kernel adapter
(_FqK / _Fq2K) exposes the op set the formulas need, implemented on the
lazy column-space layer (ops/dw.py) with the same fused-REDC combinations as
the tower kernels.  Formulas mirror curve.py (reference:
src/groups/mod.rs:228-312) which pins the golden vectors; masks reproduce
the reference's degenerate semantics (P+∞, ∞+Q, P+P→double, P−P→∞,
infinity convention (0,1,0)).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bn_tpu.params import NLIMBS
from bn_tpu.ops import dw as _dw
from bn_tpu.ops.mont_pallas import (
    BLOCK_B,
    LANES,
    SUBLANES,
    _k_add,
    _k_neg,
    _k_small,
    _k_sub,
)
from bn_tpu.ops.tower_pallas import (
    _STRUCTS,
    _d2_add,
    _d2_dbl,
    _d2_from_s2,
    _d2_prod,
    _d2_redc,
    _d2_smul,
    _d2_sub,
    _k2_add,
    _k2_mul_l,
    _k2_neg,
    _k2_small,
    _k2_sq_l,
    _k2_sub,
    _pack,
    _qint,
    _s2,
    _s2_add,
    _spec,
    _unpack,
)

U32 = jnp.uint32


class _FqK:
    """In-kernel Fq adapter: values are L-lists of (8,128) u32 tiles."""

    struct = ()

    def __init__(self, q, inv):
        self.q, self.inv = q, inv
        self.qi = _qint(q)

    # linear ops (modular)
    def add(self, a, b):
        return _k_add(a, b, self.q)

    def sub(self, a, b):
        return _k_sub(a, b, self.q)

    def neg(self, a):
        return _k_neg(a, self.q)

    def small(self, a, k):
        return _k_small(a, k, self.q)

    # products (lazy, fused REDC)
    def _s(self, a):
        return _dw.sw(a, self.qi)

    def mul(self, a, b):
        return _dw.redc(_dw.prod(self._s(a), self._s(b)), self.q, self.inv).limbs

    def sq(self, a):
        return self.mul(a, a)

    def sq2_sub2(self, a, b, c, d):
        """(a+b)^2 - c - d, one REDC (a+b kept single-width unreduced)."""
        s = _dw.sw_add(self._s(a), self._s(b))
        t = _dw.sub(
            _dw.sub(_dw.prod(s, s), _dw.from_sw_hi(self._s(c))),
            _dw.from_sw_hi(self._s(d)),
        )
        return _dw.redc(t, self.q, self.inv).limbs

    def sq2_sub2_dbl(self, a, b, c, d):
        """2*((a+b)^2 - c - d), one REDC."""
        s = _dw.sw_add(self._s(a), self._s(b))
        t = _dw.sub(
            _dw.sub(_dw.prod(s, s), _dw.from_sw_hi(self._s(c))),
            _dw.from_sw_hi(self._s(d)),
        )
        return _dw.redc(_dw.dbl(t), self.q, self.inv).limbs

    def sq_subk(self, a, c, k):
        """a^2 - k*c, one REDC."""
        t = _dw.sub(
            _dw.prod(self._s(a), self._s(a)),
            _dw.smul(_dw.from_sw_hi(self._s(c)), k),
        )
        return _dw.redc(t, self.q, self.inv).limbs

    def mul_subk_hi(self, a, b, c, k):
        """a*b - k*c (c already reduced), one REDC."""
        t = _dw.sub(
            _dw.prod(self._s(a), self._s(b)),
            _dw.smul(_dw.from_sw_hi(self._s(c)), k),
        )
        return _dw.redc(t, self.q, self.inv).limbs

    def mul_msubk(self, a, b, c, d, k):
        """a*b - k*(c*d), one REDC."""
        t = _dw.sub(
            _dw.prod(self._s(a), self._s(b)),
            _dw.smul(_dw.prod(self._s(c), self._s(d)), k),
        )
        return _dw.redc(t, self.q, self.inv).limbs

    # masks: (8,128) bool tiles
    def is_zero(self, a):
        nz = a[0]
        for t in a[1:]:
            nz = nz | t
        return nz == 0

    def eq(self, a, b):
        m = a[0] == b[0]
        for x, y in zip(a[1:], b[1:]):
            m = m & (x == y)
        return m

    def select(self, mask, a, b):
        return [jnp.where(mask, x, y) for x, y in zip(a, b)]

    def zeros(self, like):
        z = jnp.zeros_like(like[0])
        return [z] * NLIMBS

    def ones(self):
        from bn_tpu.fields import fp

        return [
            jnp.full((SUBLANES, LANES), np.uint32(int(v)), U32)
            for v in np.asarray(fp.FQ.one_const).reshape(-1)
        ]


class _Fq2K:
    """In-kernel Fq2 adapter: values are [Fq, Fq] pairs."""

    struct = (2,)

    def __init__(self, q, inv):
        self.q, self.inv = q, inv
        self.qi = _qint(q)
        self._fq = _FqK(q, inv)

    def add(self, a, b):
        return _k2_add(a, b, self.q)

    def sub(self, a, b):
        return _k2_sub(a, b, self.q)

    def neg(self, a):
        return _k2_neg(a, self.q)

    def small(self, a, k):
        return _k2_small(a, k, self.q)

    def _s(self, a):
        return _s2(a, self.qi)

    def mul(self, a, b):
        return _k2_mul_l(a, b, self.q, self.inv)

    def sq(self, a):
        return _k2_sq_l(a, self.q, self.inv)

    def sq2_sub2(self, a, b, c, d):
        s = _s2_add(self._s(a), self._s(b))
        t = _d2_sub(
            _d2_sub(_d2_prod(s, s), _d2_from_s2(self._s(c))),
            _d2_from_s2(self._s(d)),
        )
        return _d2_redc(t, self.q, self.inv)

    def sq2_sub2_dbl(self, a, b, c, d):
        s = _s2_add(self._s(a), self._s(b))
        t = _d2_sub(
            _d2_sub(_d2_prod(s, s), _d2_from_s2(self._s(c))),
            _d2_from_s2(self._s(d)),
        )
        return _d2_redc(_d2_dbl(t), self.q, self.inv)

    def sq_subk(self, a, c, k):
        sa = self._s(a)
        t = _d2_sub(_d2_prod(sa, sa), _d2_smul(_d2_from_s2(self._s(c)), k))
        return _d2_redc(t, self.q, self.inv)

    def mul_subk_hi(self, a, b, c, k):
        t = _d2_sub(
            _d2_prod(self._s(a), self._s(b)),
            _d2_smul(_d2_from_s2(self._s(c)), k),
        )
        return _d2_redc(t, self.q, self.inv)

    def mul_msubk(self, a, b, c, d, k):
        t = _d2_sub(
            _d2_prod(self._s(a), self._s(b)),
            _d2_smul(_d2_prod(self._s(c), self._s(d)), k),
        )
        return _d2_redc(t, self.q, self.inv)

    def is_zero(self, a):
        return self._fq.is_zero(a[0] + a[1])

    def eq(self, a, b):
        return self._fq.eq(a[0], b[0]) & self._fq.eq(a[1], b[1])

    def select(self, mask, a, b):
        return [self._fq.select(mask, x, y) for x, y in zip(a, b)]

    def zeros(self, like):
        return [self._fq.zeros(like[0]), self._fq.zeros(like[0])]

    def ones(self):
        z = [jnp.zeros((SUBLANES, LANES), U32)] * NLIMBS
        return [self._fq.ones(), z]


# ---------------------------------------------------------------------------
# formulas (mirror curve.py exactly; reference: src/groups/mod.rs:228-312)
# ---------------------------------------------------------------------------


def _point_double(F, x, y, z):
    """dbl-2009-l; safe at infinity (z3 = 2yz = 0)."""
    a = F.sq(x)
    b = F.sq(y)
    yz = F.mul(y, z)
    c = F.sq(b)
    # d = 2*((x+b)^2 - a - c), one REDC
    d = F.sq2_sub2_dbl(x, b, a, c)
    e = F.small(a, 3)
    x3 = F.sq_subk(e, d, 2)  # e^2 - 2d
    # y3 = e*(d - x3) - 8c, one REDC
    y3 = F.mul_subk_hi(e, F.sub(d, x3), c, 8)
    z3 = F.add(yz, yz)
    return x3, y3, z3


def _point_add(F, p, q):
    """2007-bl with branchless degenerate handling."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    p_inf = F.is_zero(z1)
    q_inf = F.is_zero(z2)

    z1s = F.sq(z1)
    z2s = F.sq(z2)
    u1 = F.mul(x1, z2s)
    u2 = F.mul(x2, z1s)
    z1c = F.mul(z1, z1s)
    z2c = F.mul(z2, z2s)
    s1 = F.mul(y1, z2c)
    s2 = F.mul(y2, z1c)

    do_double = F.eq(u1, u2) & F.eq(s1, s2)

    h = F.sub(u2, u1)
    ss = F.sub(s2, s1)
    hh = F.add(h, h)
    i = F.sq(hh)
    j = F.mul(h, i)
    v = F.mul(u1, i)
    r = F.add(ss, ss)
    # x3 = r^2 - j - 2v: fold j into the squaring REDC
    rsq_j = F.sq_subk(r, j, 1)
    x3 = F.sub(rsq_j, F.add(v, v))
    # y3 = r*(v - x3) - 2*(s1*j), one REDC
    y3 = F.mul_msubk(r, F.sub(v, x3), s1, j, 2)
    # z3 = ((z1+z2)^2 - z1s - z2s) * h
    t = F.sq2_sub2(z1, z2, z1s, z2s)
    z3 = F.mul(t, h)

    dx, dy, dz = _point_double(F, x1, y1, z1)
    x3 = F.select(do_double, dx, x3)
    y3 = F.select(do_double, dy, y3)
    z3 = F.select(do_double, dz, z3)

    x3 = F.select(q_inf, x1, F.select(p_inf, x2, x3))
    y3 = F.select(q_inf, y1, F.select(p_inf, y2, y3))
    z3 = F.select(q_inf, z1, F.select(p_inf, z2, z3))
    return x3, y3, z3


# ---------------------------------------------------------------------------
# kernel bodies + wrappers
# ---------------------------------------------------------------------------


def _load_coord(ref, F):
    if F.struct == ():
        return [ref[0, i, 0] for i in range(NLIMBS)]
    return [[ref[0, j, i, 0] for i in range(NLIMBS)] for j in range(2)]


def _store_coord(ref, F, v):
    if F.struct == ():
        for i in range(NLIMBS):
            ref[0, i, 0] = v[i]
    else:
        for j in range(2):
            for i in range(NLIMBS):
                ref[0, j, i, 0] = v[j][i]


def _add_body(x1, y1, z1, x2, y2, z2, ox, oy, oz, *, mkF):
    F = mkF()
    p = [_load_coord(r, F) for r in (x1, y1, z1)]
    q = [_load_coord(r, F) for r in (x2, y2, z2)]
    rx, ry, rz = _point_add(F, p, q)
    _store_coord(ox, F, rx)
    _store_coord(oy, F, ry)
    _store_coord(oz, F, rz)


def _double_body(x1, y1, z1, ox, oy, oz, *, mkF):
    F = mkF()
    x, y, z = (_load_coord(r, F) for r in (x1, y1, z1))
    rx, ry, rz = _point_double(F, x, y, z)
    _store_coord(ox, F, rx)
    _store_coord(oy, F, ry)
    _store_coord(oz, F, rz)


@functools.lru_cache(maxsize=None)
def _build(kind: str, fq2: bool, q_tuple, inv: int, interpret: bool):
    q = [np.uint32(v) for v in q_tuple]
    inv_c = np.uint32(inv)
    mkF = (lambda: _Fq2K(q, inv_c)) if fq2 else (lambda: _FqK(q, inv_c))
    fstruct = (2,) if fq2 else ()
    if kind == "add":
        body = functools.partial(_add_body, mkF=mkF)
        n_in = 6
    else:
        body = functools.partial(_double_body, mkF=mkF)
        n_in = 3

    def run(*ops):
        lead = ops[0].shape[0]
        nb = ops[0].shape[-3]
        spec = _spec(fstruct)
        shape = jax.ShapeDtypeStruct(ops[0].shape, U32)
        return pl.pallas_call(
            body,
            out_shape=[shape, shape, shape],
            grid=(lead, nb),
            in_specs=[spec] * n_in,
            out_specs=[spec] * 3,
            interpret=interpret,
        )(*ops)

    return jax.jit(run)


def _call(kind, spec_name, coords, q_limbs, inv):
    """coords: flat list of (..., [2,] L, B) coordinate tensors.  Each is
    packed by PURE RESHAPE (no coord stacking — stacking would copy the
    full operands around every kernel call)."""
    from bn_tpu.ops.backend import interpret_mode

    fq2 = spec_name == "G2"
    fstruct = (2,) if fq2 else ()
    packed = []
    pad = 0
    osh = None
    for x in coords:
        xp, pad, osh = _pack(x, fstruct)
        packed.append(xp)
    run = _build(
        kind, fq2, tuple(int(v) for v in q_limbs), int(inv), interpret_mode()
    )
    out = run(*packed)
    return tuple(_unpack(o, pad, osh) for o in out)


def point_add(spec_name, p, q, q_limbs, inv):
    """Fused Jacobian add over (x, y, z) coordinate tensors (..., [2,] L, B)."""
    shapes = jnp.broadcast_shapes(*(t.shape for t in (*p, *q)))
    coords = [jnp.broadcast_to(t, shapes) for t in (*p, *q)]
    return _call("add", spec_name, coords, q_limbs, inv)


def point_double(spec_name, p, q_limbs, inv):
    shapes = jnp.broadcast_shapes(*(t.shape for t in p))
    coords = [jnp.broadcast_to(t, shapes) for t in p]
    return _call("double", spec_name, coords, q_limbs, inv)
