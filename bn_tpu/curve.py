"""G1/G2 Jacobian curve groups over batched limb tensors, fully branchless.

The reference's generic `G<P>` (src/groups/mod.rs:27-46) instantiates one set
of Jacobian formulas over Fq (G1) and Fq2 (G2).  Here the same genericity is
achieved with duck-typed base-field *views* (FqView / Fq2View) exposing a
uniform tensor op API; points are (x, y, z) tuples of base tensors with batch
axis last.

Every data-dependent branch of the reference — infinity passthrough, the
add-equals-double fallback (src/groups/mod.rs:276-295), the scalar ladder's
found_one skip (src/groups/mod.rs:250-270) — becomes a mask/select, so the
whole group law jit-compiles to straight-line vector code (SURVEY.md §7
'hard parts' #3).  The infinity convention (0, 1, 0) matches
test_y_at_point_at_infinity (src/groups/mod.rs:825-832).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from bn_tpu import oracle as O
from bn_tpu import params as P
from bn_tpu.fields import fp, tower


# ---------------------------------------------------------------------------
# base-field views
# ---------------------------------------------------------------------------


class FqView:
    """Fq tensor ops: shapes (..., L, B), masks (..., B)."""

    struct_ndim = 0  # structure axes between batch dims and (L, B)

    @staticmethod
    def add(a, b):
        return fp.add(fp.FQ, a, b)

    @staticmethod
    def sub(a, b):
        return fp.sub(fp.FQ, a, b)

    @staticmethod
    def neg(a):
        return fp.neg(fp.FQ, a)

    @staticmethod
    def mul(a, b):
        return fp.mul(fp.FQ, a, b)

    @staticmethod
    def mul_many(pairs):
        return fp.mul_many(fp.FQ, pairs)

    @staticmethod
    def sq(a):
        return fp.sqr(fp.FQ, a)

    @staticmethod
    def inv(a):
        return fp.inv(fp.FQ, a)

    @staticmethod
    def mul_small(a, k):
        return fp.mul_small(fp.FQ, a, k)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-2,))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(-2,))

    @staticmethod
    def zeros(batch_shape):
        return fp.zeros(fp.FQ, batch_shape)

    @staticmethod
    def ones(batch_shape):
        return fp.ones(fp.FQ, batch_shape)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[..., None, :], a, b)


class Fq2View:
    """Fq2 tensor ops: shapes (..., 2, L, B), masks (..., B)."""

    struct_ndim = 1

    add = staticmethod(tower.add)
    sub = staticmethod(tower.sub)
    neg = staticmethod(tower.neg)
    mul = staticmethod(tower.fq2_mul)
    sq = staticmethod(tower.fq2_sq)
    inv = staticmethod(tower.fq2_inv)

    @staticmethod
    def mul_many(pairs):
        lhs, rhs = jax.lax.optimization_barrier(
            (jnp.stack([p[0] for p in pairs]), jnp.stack([p[1] for p in pairs]))
        )
        res = tower.fq2_mul(lhs, rhs)
        return [res[i] for i in range(len(pairs))]

    @staticmethod
    def mul_small(a, k):
        return fp.mul_small(fp.FQ, a, k)

    @staticmethod
    def is_zero(a):
        return jnp.all(a == 0, axis=(-3, -2))

    @staticmethod
    def eq(a, b):
        return jnp.all(a == b, axis=(-3, -2))

    @staticmethod
    def zeros(batch_shape):
        return tower.zeros2(batch_shape)

    @staticmethod
    def ones(batch_shape):
        return tower.ones2(batch_shape)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[..., None, None, :], a, b)


# ---------------------------------------------------------------------------
# curve specs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    name: str
    field: Any
    b_const: np.ndarray  # device-broadcastable Montgomery constant
    gen_affine: tuple  # host-side oracle affine point

    def b_bcast(self, like):
        return jnp.broadcast_to(jnp.asarray(self.b_const, jnp.uint32), like.shape)


@functools.lru_cache(maxsize=None)
def g1_spec() -> CurveSpec:
    b = P.int_to_limbs(P.to_mont(P.B_COEFF, P.Q)).reshape(P.NLIMBS, 1)
    return CurveSpec("G1", FqView, b, O.G1_ONE[:2])


@functools.lru_cache(maxsize=None)
def g2_spec() -> CurveSpec:
    tb = O.twist_b()
    b = np.stack(
        [
            P.int_to_limbs(P.to_mont(tb[0], P.Q)).reshape(P.NLIMBS, 1),
            P.int_to_limbs(P.to_mont(tb[1], P.Q)).reshape(P.NLIMBS, 1),
        ]
    )
    return CurveSpec("G2", Fq2View, b, (O.G2_GEN_X, O.G2_GEN_Y))


# ---------------------------------------------------------------------------
# group law (branchless)
# ---------------------------------------------------------------------------


def zero(spec: CurveSpec, batch_shape):
    """Point at infinity (0, 1, 0) (reference: src/groups/mod.rs:208-214)."""
    F = spec.field
    return (F.zeros(batch_shape), F.ones(batch_shape), F.zeros(batch_shape))


def one(spec: CurveSpec, batch_shape):
    """The generator, broadcast over the batch."""
    F = spec.field
    if spec.name == "G1":
        x = fp.to_device(fp.FQ, [spec.gen_affine[0]] * batch_shape[-1])
        y = fp.to_device(fp.FQ, [spec.gen_affine[1]] * batch_shape[-1])
    else:
        x = tower.fq2_to_device([spec.gen_affine[0]] * batch_shape[-1])
        y = tower.fq2_to_device([spec.gen_affine[1]] * batch_shape[-1])
    return (x, y, F.ones(batch_shape))


def is_zero(spec: CurveSpec, p):
    return spec.field.is_zero(p[2])


def _use_curve_kernels() -> bool:
    """Fused whole-formula add/double Pallas kernels (ops/curve_pallas):
    one kernel per group op instead of ~70 per-field-op HBM round trips.
    BN_TPU_CURVE_KERNELS=0 falls back to the per-op path."""
    import os

    from bn_tpu.ops.backend import use_pallas

    return use_pallas() and os.environ.get("BN_TPU_CURVE_KERNELS", "1") != "0"


def double(spec: CurveSpec, p):
    """dbl-2009-l (reference: src/groups/mod.rs:228-247).  Safe at infinity
    (z3 = 2yz = 0 keeps the point at infinity)."""
    if _use_curve_kernels():
        from bn_tpu.ops import curve_pallas

        return curve_pallas.point_double(spec.name, p, fp.FQ.m_limbs, fp.FQ.inv)
    F = spec.field
    x, y, z = p
    a, b, yz = F.mul_many([(x, x), (y, y), (y, z)])
    c, xb2 = F.mul_many([(b, b), (F.add(x, b), F.add(x, b))])
    d = F.sub(F.sub(xb2, a), c)
    d = F.add(d, d)
    e = F.mul_small(a, 3)
    f = F.sq(e)
    x3 = F.sub(f, F.add(d, d))
    eight_c = F.mul_small(c, 8)
    ed = F.mul(e, F.sub(d, x3))
    return (x3, F.sub(ed, eight_c), F.add(yz, yz))


def add(spec: CurveSpec, p, q):
    """2007-bl mixed-Jacobian add with branchless degenerate handling
    (reference: src/groups/mod.rs:272-312)."""
    if _use_curve_kernels():
        from bn_tpu.ops import curve_pallas

        return curve_pallas.point_add(spec.name, p, q, fp.FQ.m_limbs, fp.FQ.inv)
    F = spec.field
    x1, y1, z1 = p
    x2, y2, z2 = q
    p_inf = is_zero(spec, p)
    q_inf = is_zero(spec, q)

    z1s, z2s = F.mul_many([(z1, z1), (z2, z2)])
    u1, u2, z1c, z2c = F.mul_many(
        [(x1, z2s), (x2, z1s), (z1, z1s), (z2, z2s)]
    )
    s1, s2 = F.mul_many([(y1, z2c), (y2, z1c)])

    same_x = F.eq(u1, u2)
    same_y = F.eq(s1, s2)
    do_double = same_x & same_y

    h = F.sub(u2, u1)
    ss = F.sub(s2, s1)
    hh = F.add(h, h)
    i = F.sq(hh)
    j, v = F.mul_many([(h, i), (u1, i)])
    r = F.add(ss, ss)
    s1j, rsq, zz = F.mul_many([(s1, j), (r, r), (F.add(z1, z2), F.add(z1, z2))])
    x3 = F.sub(F.sub(rsq, j), F.add(v, v))
    rv = F.mul(r, F.sub(v, x3))
    y3 = F.sub(rv, F.add(s1j, s1j))
    z3 = F.mul(F.sub(F.sub(zz, z1s), z2s), h)
    # NB when same_x & !same_y (p = -q): h = 0 -> z3 = 0, point at infinity,
    # automatically correct.

    dx, dy, dz = double(spec, p)
    x3 = F.select(do_double, dx, x3)
    y3 = F.select(do_double, dy, y3)
    z3 = F.select(do_double, dz, z3)

    # infinity passthrough
    x3 = F.select(q_inf, x1, F.select(p_inf, x2, x3))
    y3 = F.select(q_inf, y1, F.select(p_inf, y2, y3))
    z3 = F.select(q_inf, z1, F.select(p_inf, z2, z3))
    return (x3, y3, z3)


def neg(spec: CurveSpec, p):
    """(reference: src/groups/mod.rs:314-328); negating infinity keeps y=1."""
    F = spec.field
    inf = is_zero(spec, p)
    return (p[0], F.select(inf, p[1], F.neg(p[1])), p[2])


def eq(spec: CurveSpec, p, q):
    """Cross-multiplied Jacobian equality (reference: src/groups/mod.rs:83-109)."""
    F = spec.field
    z1s, z2s = F.mul_many([(p[2], p[2]), (q[2], q[2])])
    z1c, z2c = F.mul_many([(p[2], z1s), (q[2], z2s)])
    a, b, c, d = F.mul_many(
        [(p[0], z2s), (q[0], z1s), (p[1], z2c), (q[1], z1c)]
    )
    both_inf = is_zero(spec, p) & is_zero(spec, q)
    one_inf = is_zero(spec, p) ^ is_zero(spec, q)
    same = F.eq(a, b) & F.eq(c, d)
    return both_inf | (same & ~one_inf)


def scalar_bits(fr_mont):
    """Device-side MSB-first bits (256, ..., B) of Montgomery-form Fr scalars.

    Converts out of Montgomery form by multiplying with literal 1 (the same
    trick as reference From<Fp> for U256, src/fields/fp.rs:15-22)."""
    one_lit = np.zeros((P.NLIMBS, 1), dtype=np.uint32)
    one_lit[0, 0] = 1
    canon = fp.mul(
        fp.FR, fr_mont, jnp.broadcast_to(jnp.asarray(one_lit), fr_mont.shape)
    )
    shifts = jnp.arange(P.LIMB_BITS, dtype=jnp.uint32)
    # (..., L, 16, B): bit j of limb i
    bits = (canon[..., :, None, :] >> shifts[:, None]) & 1
    # LSB-first flatten then reverse to MSB-first; limb axis is -3
    flat = bits.reshape(bits.shape[:-3] + (P.NLIMBS * P.LIMB_BITS,) + bits.shape[-1:])
    flat = jnp.flip(flat, axis=-2)
    return jnp.moveaxis(flat, -2, 0)


def mul(spec: CurveSpec, p, fr_mont):
    """Branchless double-and-add scalar multiplication
    (reference: src/groups/mod.rs:250-270): 256 ladder steps under lax.scan;
    the reference's found_one skip is unnecessary since doubling infinity is
    a no-op."""
    F = spec.field
    bits = scalar_bits(fr_mont)
    batch_shape = p[0].shape[: p[0].ndim - 2 - F.struct_ndim] + p[0].shape[-1:]
    res = zero(spec, batch_shape)

    def body(res, bit):
        res = double(spec, res)
        radd = add(spec, res, p)
        mask = bit != 0
        res = tuple(
            F.select(mask, ra, r) for ra, r in zip(radd, res)
        )
        return res, None

    res, _ = jax.lax.scan(body, res, bits)
    return res


def to_affine(spec: CurveSpec, p):
    """Normalize to affine via one Fermat inversion; infinity maps to (0, 0)
    (callers mask on is_zero; reference returns None, src/groups/mod.rs:112-131)."""
    F = spec.field
    zinv = F.inv(p[2])
    zinv2 = F.sq(zinv)
    zinv3 = F.mul(zinv2, zinv)
    x, y = F.mul_many([(p[0], zinv2), (p[1], zinv3)])
    return (x, y)


def from_affine(spec: CurveSpec, a, inf_mask=None):
    """Affine -> Jacobian with z=1 (z=0 where inf_mask)."""
    F = spec.field
    batch_shape = a[0].shape[: a[0].ndim - 2 - F.struct_ndim] + a[0].shape[-1:]
    z = F.ones(batch_shape)
    if inf_mask is not None:
        z = F.select(inf_mask, F.zeros(batch_shape), z)
    return (a[0], a[1], z)


def on_curve_affine(spec: CurveSpec, a):
    """y^2 == x^3 + b (reference: src/groups/mod.rs:184)."""
    F = spec.field
    x, y = a
    y2, x2 = F.mul_many([(y, y), (x, x)])
    x3 = F.mul(x2, x)
    return F.eq(y2, F.add(x3, spec.b_bcast(x3)))


# host conversion -----------------------------------------------------------


def to_device(spec: CurveSpec, points):
    """Host oracle Jacobian points -> device tensors."""
    if spec.name == "G1":
        conv = lambda vs: fp.to_device(fp.FQ, vs)
    else:
        conv = tower.fq2_to_device
    xs = conv([pt[0] for pt in points])
    ys = conv([pt[1] for pt in points])
    zs = conv([pt[2] for pt in points])
    return (xs, ys, zs)


def from_device(spec: CurveSpec, p):
    """Device tensors -> host oracle Jacobian points."""
    if spec.name == "G1":
        xs = fp.from_device(fp.FQ, np.asarray(p[0]))
        ys = fp.from_device(fp.FQ, np.asarray(p[1]))
        zs = fp.from_device(fp.FQ, np.asarray(p[2]))
    else:
        xs = tower.fq2_from_device(np.asarray(p[0]))
        ys = tower.fq2_from_device(np.asarray(p[1]))
        zs = tower.fq2_from_device(np.asarray(p[2]))
    return list(zip(xs, ys, zs))
