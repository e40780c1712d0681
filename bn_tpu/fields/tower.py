"""The Fq2 / Fq6 / Fq12 extension tower over batched limb tensors.

Tensor layout (structure axes lead, batch axis last — SURVEY.md §7):
    Fq   : (..., L, B)
    Fq2  : (..., 2, L, B)      Fq2  = Fq[u]/(u^2+1)
    Fq6  : (..., 3, 2, L, B)   Fq6  = Fq2[v]/(v^3-xi), xi = 9+u
    Fq12 : (..., 2, 3, 2, L, B) Fq12 = Fq6[w]/(w^2-v)

Design rule: every multiplication Karatsuba tree is FLATTENED — the
independent base-field products of a tower op are stacked along a new leading
axis and dispatched as ONE Montgomery-multiply call.  An Fq12 multiply is a
single 54-wide mont_mul; mul_by_024 a single 39-wide one.  This keeps traced
programs tiny (one kernel instantiation per tower op) and feeds the TPU VPU
maximal lane-parallel batches.

Formulas mirror the reference crate (reference: src/fields/fq2.rs, fq6.rs,
fq12.rs) because those pin the golden vectors; addition/negation work on whole
tower tensors in one shot since the modular limb kernels broadcast over
structure axes.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp
import jax

from bn_tpu import params as P
from bn_tpu import oracle as O
from bn_tpu.fields import fp

FQ = fp.FQ

# ---------------------------------------------------------------------------
# packing / component access
# ---------------------------------------------------------------------------


def c2(a, i):
    return a[..., i, :, :]


def pack2(x0, x1):
    return jnp.stack((x0, x1), axis=-3)


def c6(a, i):
    return a[..., i, :, :, :]


def pack6(x0, x1, x2):
    return jnp.stack((x0, x1, x2), axis=-4)


def c12(a, i):
    return a[..., i, :, :, :, :]


def pack12(x0, x1):
    return jnp.stack((x0, x1), axis=-5)


def bstack(xs):
    """jnp.stack + optimization_barrier.

    Works around an XLA:TPU miscompile: fusing slice->stack->slice chains of
    tower tensors into multiply operands produces wrong values at large batch
    (deterministic, batch >= 1024).  Materializing every stacked operand
    bundle is correct and nearly free (the operands feed kernels that
    materialize anyway).  See tests/test_tower.py::test_fq12_mul_slice_stack_regression.
    """
    return jax.lax.optimization_barrier(jnp.stack(xs))


# generic (tower-shape-agnostic) linear ops
def add(a, b):
    return fp.add(FQ, a, b)


def sub(a, b):
    return fp.sub(FQ, a, b)


def neg(a):
    return fp.neg(FQ, a)


def double(a):
    return fp.add(FQ, a, a)


# ---------------------------------------------------------------------------
# constants (Montgomery form, broadcastable)
# ---------------------------------------------------------------------------


def _fq_const(v: int) -> np.ndarray:
    return P.int_to_limbs(P.to_mont(v % P.Q, P.Q)).reshape(P.NLIMBS, 1)


def _fq2_const(t) -> np.ndarray:
    return np.stack([_fq_const(t[0]), _fq_const(t[1])])  # (2, L, 1)


@functools.lru_cache(maxsize=None)
def _frob_consts():
    """Montgomery-form Frobenius gamma tables, derived in oracle.frob_coeffs
    and verified against the reference's hardcoded limbs
    (src/fields/fq6.rs:5-40, src/fields/fq12.rs:7-24)."""
    fq6_c1, fq6_c2, fq12_c1 = O.frob_coeffs()
    return (
        tuple(_fq2_const(t) for t in fq6_c1),
        tuple(_fq2_const(t) for t in fq6_c2),
        tuple(_fq2_const(t) for t in fq12_c1),
    )


def zeros2(batch_shape):
    return fp.zeros(FQ, tuple(batch_shape[:-1]) + (2, batch_shape[-1]))


def ones2(batch_shape):
    z = fp.zeros(FQ, batch_shape)
    return pack2(fp.ones(FQ, batch_shape), z)


def ones6(batch_shape):
    return pack6(
        ones2(batch_shape), zeros2(batch_shape), zeros2(batch_shape)
    )


def ones12(batch_shape):
    z6 = fp.zeros(FQ, tuple(batch_shape[:-1]) + (3, 2, batch_shape[-1]))
    return pack12(ones6(batch_shape), z6)


def zeros12(batch_shape):
    return fp.zeros(FQ, tuple(batch_shape[:-1]) + (2, 3, 2, batch_shape[-1]))


# ---------------------------------------------------------------------------
# Fq2   (reference: src/fields/fq2.rs)
# ---------------------------------------------------------------------------


def fq2_mul(a, b):
    """Karatsuba: 3 Fq products (reference: src/fields/fq2.rs:139-155).

    On TPU this is ONE fused Pallas kernel (products + modular pre-adds and
    post-subs in registers); the jnp path stacks the 3 products into a single
    mont_mul call."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops.mont_pallas import fq2_mul_pallas

        out_shape = jnp.broadcast_shapes(a.shape, b.shape)
        a, b = jax.lax.optimization_barrier(
            (jnp.broadcast_to(a, out_shape), jnp.broadcast_to(b, out_shape))
        )
        return fq2_mul_pallas(a, b, FQ.m_limbs, FQ.inv)
    a0, a1 = c2(a, 0), c2(a, 1)
    b0, b1 = c2(b, 0), c2(b, 1)
    sa = fp.add(FQ, a0, a1)
    sb = fp.add(FQ, b0, b1)
    aa, bb, cc = fp.mul_many(FQ, [(a0, b0), (a1, b1), (sa, sb)])
    return pack2(fp.sub(FQ, aa, bb), fp.sub(FQ, fp.sub(FQ, cc, aa), bb))


def fq2_sq(a):
    """Complex squaring: (a0+a1)(a0-a1), 2*a0*a1
    (reference: src/fields/fq2.rs:112-123).  One fused kernel on TPU."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops.mont_pallas import fq2_sq_pallas

        return fq2_sq_pallas(a, FQ.m_limbs, FQ.inv)
    a0, a1 = c2(a, 0), c2(a, 1)
    t0 = fp.add(FQ, a0, a1)
    t1 = fp.sub(FQ, a0, a1)
    p0, p1 = fp.mul_many(FQ, [(t0, t1), (a0, a1)])
    return pack2(p0, fp.add(FQ, p1, p1))


def fq2_scale_fq(a, k):
    """Multiply both components by an Fq element k (one stacked mul)."""
    kb = jnp.broadcast_to(k[..., None, :, :], a.shape) if k.ndim < a.ndim else k
    return fp.mul(FQ, a, kb)


def fq2_mul_by_xi(a):
    """Multiply by xi = 9 + u without a full product:
    (9*c0 - c1, c0 + 9*c1) via shift-and-add doubling chains.
    One fused kernel on TPU."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops.mont_pallas import fq2_xi_pallas

        return fq2_xi_pallas(a, FQ.m_limbs)
    nine = fp.mul_small(FQ, a, 9)  # both components at once
    n0, n1 = c2(nine, 0), c2(nine, 1)
    return pack2(fp.sub(FQ, n0, c2(a, 1)), fp.add(FQ, n1, c2(a, 0)))


def fq2_conj(a):
    return pack2(c2(a, 0), fp.neg(FQ, c2(a, 1)))


def fq2_frob(a, power: int):
    return a if power % 2 == 0 else fq2_conj(a)


def fq2_inv(a):
    """Algorithm 8 (reference: src/fields/fq2.rs:125-136); one Fermat chain."""
    a0, a1 = c2(a, 0), c2(a, 1)
    s0, s1 = fp.mul_many(FQ, [(a0, a0), (a1, a1)])
    t = fp.inv(FQ, fp.add(FQ, s0, s1))
    p0, p1 = fp.mul_many(FQ, [(a0, t), (a1, t)])
    return pack2(p0, fp.neg(FQ, p1))


def fq2_mul_const(a, const_np):
    """Multiply by a static Fq2 constant (Montgomery (2, L, 1) numpy)."""
    k = jnp.broadcast_to(jnp.asarray(const_np, dtype=jnp.uint32), a.shape)
    return fq2_mul(a, k)


# ---------------------------------------------------------------------------
# Fq6   (reference: src/fields/fq6.rs)
# ---------------------------------------------------------------------------


def fq6_mul_by_nonresidue(a):
    """v * a: rotate components and xi-multiply the wrapped one
    (reference: src/fields/fq6.rs:59-65)."""
    return pack6(fq2_mul_by_xi(c6(a, 2)), c6(a, 0), c6(a, 1))


def fq6_mul(a, b):
    """Karatsuba: 6 Fq2 products = 18 Fq products, one stacked mont_mul
    (reference: src/fields/fq6.rs:144-158)."""
    a0, a1, a2 = (c6(a, i) for i in range(3))
    b0, b1, b2 = (c6(b, i) for i in range(3))
    # stack the six independent Fq2 multiplications
    lhs = bstack([a0, a1, a2, add(a1, a2), add(a0, a1), add(a0, a2)])
    rhs = bstack([b0, b1, b2, add(b1, b2), add(b0, b1), add(b0, b2)])
    p = fq2_mul(lhs, rhs)
    aa, bb, cc, t12, t01, t02 = (p[i] for i in range(6))
    r0 = add(fq2_mul_by_xi(sub(sub(t12, bb), cc)), aa)
    r1 = add(sub(sub(t01, aa), bb), fq2_mul_by_xi(cc))
    r2 = sub(add(sub(t02, aa), bb), cc)
    return pack6(r0, r1, r2)


def fq6_sq(a):
    """CH-SQR2 (reference: src/fields/fq6.rs:113-127): 5 Fq2 products."""
    a0, a1, a2 = (c6(a, i) for i in range(3))
    d = add(sub(a0, a1), a2)
    lhs = bstack([a0, a0, d, a1, a2])
    rhs = bstack([a0, a1, d, a2, a2])
    p = fq2_mul(lhs, rhs)
    s0, ab, s2, bc, s4 = (p[i] for i in range(5))
    s1 = add(ab, ab)
    s3 = add(bc, bc)
    return pack6(
        add(s0, fq2_mul_by_xi(s3)),
        add(s1, fq2_mul_by_xi(s4)),
        sub(sub(add(add(s1, s2), s3), s0), s4),
    )


def fq6_scale_fq2(a, k):
    """Multiply all three Fq2 components by one Fq2 element (stacked)."""
    kb = jnp.broadcast_to(k[..., None, :, :, :], a.shape)
    return fq2_mul(a, kb)


def fq6_inv(a):
    """Norm-based inversion (reference: src/fields/fq6.rs:129-141)."""
    a0, a1, a2 = (c6(a, i) for i in range(3))
    xi_a2 = fq2_mul_by_xi(a2)
    lhs = bstack([a0, a1, a2, a0, a1, a0])
    rhs = bstack([a0, xi_a2, a2, a1, a1, a2])
    p = fq2_mul(lhs, rhs)
    s_a0, a1xa2, s_a2, a0a1, s_a1, a0a2 = (p[i] for i in range(6))
    k0 = sub(s_a0, a1xa2)
    k1 = sub(fq2_mul_by_xi(s_a2), a0a1)
    k2 = sub(s_a1, a0a2)
    lhs = bstack([a2, a1, a0])
    rhs = bstack([k1, k2, k0])
    p = fq2_mul(lhs, rhs)
    norm = add(fq2_mul_by_xi(add(p[0], p[1])), p[2])
    t = fq2_inv(norm)
    tb = jnp.broadcast_to(t, (3,) + t.shape)
    p = fq2_mul(tb, bstack([k0, k1, k2]))
    return pack6(p[0], p[1], p[2])


def fq6_frob(a, power: int):
    """(reference: src/fields/fq6.rs:75-81)"""
    c1t, c2t, _ = _frob_consts()
    x0 = fq2_frob(c6(a, 0), power)
    x1 = fq2_mul_const(fq2_frob(c6(a, 1), power), c1t[power % 6])
    x2 = fq2_mul_const(fq2_frob(c6(a, 2), power), c2t[power % 6])
    return pack6(x0, x1, x2)


def fq6_neg(a):
    return neg(a)


# ---------------------------------------------------------------------------
# Fq12   (reference: src/fields/fq12.rs)
# ---------------------------------------------------------------------------


def fq12_mul(a, b):
    """Karatsuba: 3 Fq6 products = 54 Fq products, one stacked mont_mul
    (reference: src/fields/fq12.rs:295-307).  On TPU this is ONE fused
    Pallas kernel — every intermediate stays in registers/VMEM."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops import tower_pallas as twp

        return twp.fq12_mul(a, b, FQ.m_limbs, FQ.inv)
    a0, a1 = c12(a, 0), c12(a, 1)
    b0, b1 = c12(b, 0), c12(b, 1)
    lhs = bstack([a0, a1, add(a0, a1)])
    rhs = bstack([b0, b1, add(b0, b1)])
    p = fq6_mul(lhs, rhs)
    aa, bb, cc = p[0], p[1], p[2]
    return pack12(
        add(fq6_mul_by_nonresidue(bb), aa), sub(sub(cc, aa), bb)
    )


def fq12_sq(a):
    """(reference: src/fields/fq12.rs:275-282): 2 Fq6 products.
    One fused Pallas kernel on TPU."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops import tower_pallas as twp

        return twp.fq12_sq(a, FQ.m_limbs, FQ.inv)
    a0, a1 = c12(a, 0), c12(a, 1)
    ab_l = bstack([a0, add(fq6_mul_by_nonresidue(a1), a0)])
    ab_r = bstack([a1, add(a0, a1)])
    p = fq6_mul(ab_l, ab_r)
    ab, t = p[0], p[1]
    return pack12(
        sub(sub(t, ab), fq6_mul_by_nonresidue(ab)), add(ab, ab)
    )


def fq12_inv(a):
    """(reference: src/fields/fq12.rs:284-292)"""
    a0, a1 = c12(a, 0), c12(a, 1)
    p = fq6_mul(bstack([a0, a1]), bstack([a0, a1]))
    t = fq6_inv(sub(p[0], fq6_mul_by_nonresidue(p[1])))
    tb = jnp.broadcast_to(t, (2,) + t.shape)
    p = fq6_mul(bstack([a0, a1]), tb)
    return pack12(p[0], fq6_neg(p[1]))


def fq12_conj(a):
    """Unitary inverse (reference: src/fields/fq12.rs:103-105)."""
    return pack12(c12(a, 0), neg(c12(a, 1)))


def fq12_frob(a, power: int):
    """(reference: src/fields/fq12.rs:90-95)"""
    _, _, c12t = _frob_consts()
    x0 = fq6_frob(c12(a, 0), power)
    x1 = fq6_frob(c12(a, 1), power)
    # scale all three Fq2 components of x1 by the gamma constant
    g = jnp.asarray(c12t[power % 12], dtype=jnp.uint32)
    gb = jnp.broadcast_to(g, x1.shape)
    x1 = fq2_mul(x1, gb)
    return pack12(x0, x1)


def fq12_mul_by_024_prescaled(a, ell_0, scaled):
    """fq12_mul_by_024 taking the G1-scaled pair as one (2, 2, L, B) tensor
    (scaled[0] = ell_vw*y, scaled[1] = ell_vv*x), so the Miller scan can
    feed pre-scaled coefficient slices without a per-step restack."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops import tower_pallas as twp

        return twp.fq12_mul024_pre(a, ell_0, scaled, FQ.m_limbs, FQ.inv)
    s = jax.lax.optimization_barrier(scaled)  # see bstack
    return fq12_mul_by_024(a, ell_0, s[..., 0, :, :, :], s[..., 1, :, :, :])


def fq12_mul_by_024(a, ell_0, ell_vw, ell_vv):
    """Sparse line multiply: 13 Fq2 products = 39 Fq products, one stacked
    mont_mul (reference: src/fields/fq12.rs:107-176).  One fused Pallas
    kernel on TPU."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops import tower_pallas as twp

        coeff = bstack([ell_0, ell_vw, ell_vv])
        # coeff leading stack axis becomes the (3,) struct axis: move it
        # in front of the (2, L, B) tail it already has
        return twp.fq12_mul024(a, coeff, FQ.m_limbs, FQ.inv)
    z0, z1, z2 = (c6(c12(a, 0), i) for i in range(3))
    z3, z4, z5 = (c6(c12(a, 1), i) for i in range(3))
    x0, x2, x4 = ell_0, ell_vv, ell_vw

    t2a = add(z0, z4)
    t1a = add(z0, z2)
    s0 = add(add(z1, z3), z5)
    x02 = add(x0, x2)
    x24 = add(x2, x4)
    x04 = add(x0, x4)
    x024 = add(x02, x4)
    z24 = add(z2, z4)

    lhs = bstack([z0, z2, z4, z1, z5, z1, t1a, z3, z24, z3, z5, t2a, s0])
    rhs = bstack([x0, x2, x4, x2, x4, x0, x02, x4, x24, x0, x2, x04, x024])
    p = fq2_mul(lhs, rhs)
    (d0, d2, d4, z1x2, z5x4, z1x0, t1t0, z3x4, z24x24, z3x0, z5x2, t2t0,
     s0t0) = (p[i] for i in range(13))

    s1 = z1x2
    t3 = add(s1, d4)
    nz0 = add(fq2_mul_by_xi(t3), d0)

    t3 = z5x4
    s1 = add(s1, t3)
    t3 = add(t3, d2)
    t4 = fq2_mul_by_xi(t3)
    s1 = add(s1, z1x0)
    nz1 = add(t4, z1x0)

    t3 = sub(sub(t1t0, d0), d2)
    s1 = add(s1, z3x4)
    nz2 = add(t3, z3x4)

    t3 = sub(sub(z24x24, d2), d4)
    t4 = fq2_mul_by_xi(t3)
    s1 = add(s1, z3x0)
    nz3 = add(t4, z3x0)

    s1 = add(s1, z5x2)
    t4 = fq2_mul_by_xi(z5x2)
    t3 = sub(sub(t2t0, d0), d4)
    nz4 = add(t4, t3)

    nz5 = sub(s0t0, s1)

    return pack12(pack6(nz0, nz1, nz2), pack6(nz3, nz4, nz5))


def fq12_cyclotomic_sq(a):
    """Granger–Scott (reference: src/fields/fq12.rs:178-227):
    6 Fq2 products, one stacked mont_mul.  One fused Pallas kernel on TPU."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        from bn_tpu.ops import tower_pallas as twp

        return twp.fq12_cyclo_sq(a, FQ.m_limbs, FQ.inv)
    z0, z4, z3 = (c6(c12(a, 0), i) for i in range(3))
    z2, z1, z5 = (c6(c12(a, 1), i) for i in range(3))

    pairs_u = bstack([z0, z2, z4])
    pairs_v = bstack([z1, z3, z5])
    xi_v = fq2_mul_by_xi(pairs_v)
    lhs = bstack([pairs_u, add(pairs_u, pairs_v)])
    rhs = bstack([pairs_v, add(xi_v, pairs_u)])
    p = fq2_mul(lhs, rhs)  # (2, 3, ..., 2, L, B)
    tmp, big = p[0], p[1]
    t_a = sub(sub(big, tmp), fq2_mul_by_xi(tmp))  # (3, ..., 2, L, B)
    t_b = add(tmp, tmp)

    t0, t2, t4 = t_a[0], t_a[1], t_a[2]
    t1, t3, t5 = t_b[0], t_b[1], t_b[2]

    def m3_sub(t, z):  # 3t - 2z
        r = sub(t, z)
        r = add(r, r)
        return add(r, t)

    def m3_add(t, z):  # 3t + 2z
        r = add(t, z)
        r = add(r, r)
        return add(r, t)

    nz0 = m3_sub(t0, z0)
    nz1 = m3_add(t1, z1)
    tmp2 = fq2_mul_by_xi(t5)
    nz2 = m3_add(tmp2, z2)
    nz3 = m3_sub(t4, z3)
    nz4 = m3_sub(t2, z4)
    nz5 = m3_add(t3, z5)

    return pack12(pack6(nz0, nz4, nz3), pack6(nz2, nz1, nz5))


def fq12_cyclotomic_pow_z(a):
    """a^z for the fixed BN parameter z (reference: src/fields/fq12.rs:229-246).

    The exponent is a compile-time constant, so the scan dispatches each
    step's multiply with lax.cond on the static bit — set bits pay the
    fq12_mul, clear bits only the cyclotomic squaring (no wasted multiplies,
    unlike a select ladder)."""
    bits = P.bits_msb_first(P.Z_BN)
    res = a

    def body(res, bit):
        res = fq12_cyclotomic_sq(res)
        res = jax.lax.cond(bit != 0, lambda r: fq12_mul(r, a), lambda r: r, res)
        return res, None

    res, _ = jax.lax.scan(body, res, jnp.asarray(bits[1:], dtype=jnp.uint32))
    return res


def fq12_exp_by_neg_z(a):
    """(reference: src/fields/fq12.rs:97-101)"""
    return fq12_conj(fq12_cyclotomic_pow_z(a))


@functools.lru_cache(maxsize=None)
def _z_naf():
    """Non-adjacent form of the BN parameter z, MSB first: 63 digits,
    24 nonzero (vs 28 set bits in binary) — each -1 costs only a free
    conjugate for cyclotomic-subgroup elements."""
    n = P.Z_BN
    naf = []
    while n:
        if n & 1:
            d = 2 - (n % 4)
            naf.append(d)
            n -= d
        else:
            naf.append(0)
        n >>= 1
    return tuple(reversed(naf))


def _cyclo_sq_run(res, n: int):
    """n successive cyclotomic squarings; one grid-chained kernel call on
    the Pallas path (the chain length is a grid axis, not a kernel build)."""
    import os

    from bn_tpu.ops.backend import use_pallas

    if use_pallas() and n >= 2 and os.environ.get("BN_TPU_CYCLO_CHAIN", "1") != "0":
        from bn_tpu.ops import tower_pallas as twp

        return twp.fq12_cyclo_sq_chain(res, n, FQ.m_limbs, FQ.inv)
    for _ in range(n):
        res = fq12_cyclotomic_sq(res)
    return res


def _exp_by_neg_z_cyclotomic(a):
    """exp_by_neg_z for a PROVABLY cyclotomic input (the final-exp hard
    chunk): NAF ladder with a^-1 = conj(a), unrolled straight-line on the
    Pallas path (each op is one fused kernel call, with squaring RUNS fused
    into chain kernels).  Mathematically equal to the reference's binary
    ladder (src/fields/fq12.rs:97-101, 229-246); pinned by the same golden
    vectors through final_exponentiation."""
    naf = _z_naf()
    a_conj = fq12_conj(a)
    assert naf[0] == 1
    res = a
    pending = 0
    for d in naf[1:]:
        pending += 1
        if d:
            res = _cyclo_sq_run(res, pending)
            pending = 0
            res = fq12_mul(res, a if d == 1 else a_conj)
    if pending:
        res = _cyclo_sq_run(res, pending)
    return fq12_conj(res)


# ---------------------------------------------------------------------------
# final exponentiation (reference: src/fields/fq12.rs:41-88)
#
# The easy chunk + Fuentes-et-al. hard chunk is a ~300-step straight-line
# program over Fq12 built from four op kinds (mul, cyclotomic square,
# Frobenius, conjugate).  Tracing it inline instantiates each op's full limb
# expansion per use (~280k HLO lines — the dominant compile cost of the whole
# pairing).  Instead the chain is assembled host-side into a static
# instruction tape and executed as a lax.scan over a small register file, so
# every op kind compiles exactly ONCE.  The math (and hence the golden
# vectors) is identical to the reference's a..v chain.
# ---------------------------------------------------------------------------

_OP_MUL, _OP_CYCLO, _OP_FROB, _OP_CONJ = 0, 1, 2, 3


@functools.lru_cache(maxsize=None)
def _final_exp_tape():
    """Assemble the final-exp tape and linear-scan register allocation.

    Returns (op, dst, s1, s2, aux) int32 arrays plus (n_regs, out_reg).
    SSA inputs: 0 = f (the Miller output), 1 = f^-1.
    """
    ops = []  # (kind, dst_ssa, src1_ssa, src2_ssa, aux_power)
    counter = [2]

    def emit(kind, s1, s2=0, aux=0):
        d = counter[0]
        counter[0] += 1
        ops.append((kind, d, s1, s2, aux))
        return d

    f_in, b_in = 0, 1
    # easy chunk (reference: fq12.rs:41-52)
    a = emit(_OP_CONJ, f_in)
    c = emit(_OP_MUL, a, b_in)
    d = emit(_OP_FROB, c, aux=2)
    s = emit(_OP_MUL, d, c)

    def expz(x):
        """exp_by_neg_z = cyclotomic_pow(z) then conjugate
        (reference: fq12.rs:97-101, 229-246)."""
        res = x
        for bit in P.bits_msb_first(P.Z_BN)[1:]:
            res = emit(_OP_CYCLO, res)
            if bit:
                res = emit(_OP_MUL, res, x)
        return emit(_OP_CONJ, res)

    # hard chunk: the reference's a..v chain (fq12.rs:54-84)
    a2 = expz(s)
    b2 = emit(_OP_CYCLO, a2)
    c2 = emit(_OP_CYCLO, b2)
    d2 = emit(_OP_MUL, c2, b2)
    e2 = expz(d2)
    f2 = emit(_OP_CYCLO, e2)
    g2 = expz(f2)
    h2 = emit(_OP_CONJ, d2)
    i2 = emit(_OP_CONJ, g2)
    j2 = emit(_OP_MUL, i2, e2)
    k2 = emit(_OP_MUL, j2, h2)
    l2 = emit(_OP_MUL, k2, b2)
    m2 = emit(_OP_MUL, k2, e2)
    n2 = emit(_OP_MUL, s, m2)
    o2 = emit(_OP_FROB, l2, aux=1)
    p2 = emit(_OP_MUL, o2, n2)
    q2 = emit(_OP_FROB, k2, aux=2)
    r2 = emit(_OP_MUL, q2, p2)
    s2_ = emit(_OP_CONJ, s)
    t2 = emit(_OP_MUL, s2_, l2)
    u2 = emit(_OP_FROB, t2, aux=3)
    v2 = emit(_OP_MUL, u2, r2)

    # linear-scan register allocation over SSA ids
    last_use = {f_in: -1, b_in: -1}
    for i, (_, dst, s1, s2, _aux) in enumerate(ops):
        last_use[s1] = i
        last_use[s2] = i
        last_use.setdefault(dst, i)  # dead dsts freed immediately
    last_use[v2] = len(ops)  # output stays live

    reg_of = {f_in: 0, b_in: 1}
    free: list = []
    n_regs = 2
    tape = []
    for i, (kind, dst, s1, s2, aux) in enumerate(ops):
        r1, r2r = reg_of[s1], reg_of[s2] if s2 in reg_of else 0
        # free sources whose last use is this instruction (allows dst reuse)
        for src in {s1, s2} & set(reg_of):
            if last_use.get(src) == i and src != dst:
                free.append(reg_of.pop(src))
        if free:
            rd = free.pop()
        else:
            rd = n_regs
            n_regs += 1
        reg_of[dst] = rd
        tape.append((kind, rd, r1, r2r, aux))

    arr = np.asarray(tape, dtype=np.int32)
    return arr, n_regs, reg_of[v2]


@functools.lru_cache(maxsize=None)
def _frob_mult_stack():
    """Per-power Fq2 multiplier tensors M with M[i][j] = the gamma constant
    that Frobenius applies to coefficient (i, j) of an Fq12, so that
    frob_p(a) = fq2_mul(conj^p(a), M[p]).  Stacked over powers 0..3:
    (4, 2, 3, 2, L, 1) Montgomery-form numpy."""
    out = []
    for p in range(4):
        g6c1, g6c2, g12 = (t[p] for t in O.frob_coeffs())
        row0 = [(1, 0), g6c1, g6c2]
        row1 = [g12, O.fq2_mul(g6c1, g12), O.fq2_mul(g6c2, g12)]
        out.append(
            np.stack(
                [
                    np.stack([_fq2_const(v) for v in row0]),
                    np.stack([_fq2_const(v) for v in row1]),
                ]
            )
        )
    return np.stack(out)


def _conj_components(a):
    """Apply the Fq2 conjugate to every Fq2 coefficient of a tower tensor
    (the coefficient action of an odd-power Frobenius)."""
    c0 = a[..., 0:1, :, :]
    c1 = fp.neg(FQ, a[..., 1:2, :, :])
    return jnp.concatenate([c0, c1], axis=-3)


def fq12_frob_traced(a, power):
    """fq12_frob for a TRACED power in {0..3}: one gather + one fq2_mul."""
    m = jnp.take(jnp.asarray(_frob_mult_stack(), jnp.uint32), power, axis=0)
    a_ = jnp.where((power % 2) == 1, _conj_components(a), a)
    return fq2_mul(a_, jnp.broadcast_to(m, a.shape))


def _final_exp_straight(f):
    """Straight-line final exponentiation (reference: src/fields/fq12.rs:41-88).

    On the Pallas path every Fq12 op below is ONE fused kernel call, so the
    traced program is small (3 scanned exp_by_neg_z ladders + ~26 calls) and
    there is no register-file VM in the way: no per-step gathers, no scan
    carry copies of an (n_regs, 2, 3, 2, L, B) buffer — which is what made
    the tape executor memory-bound on TPU (~73 ms/8192 vs ~28 ms compute).
    """
    binv = fq12_inv(f)
    # easy chunk (reference: fq12.rs:41-52)
    a = fq12_conj(f)
    c = fq12_mul(a, binv)
    d = fq12_frob(c, 2)
    s = fq12_mul(d, c)
    # hard chunk: the reference's a..v chain (fq12.rs:54-84).  All inputs
    # to exp_by_neg_z here are cyclotomic (s = (f^(q^6-1))^(q^2+1) and its
    # cyclotomic closures), so the NAF ladder's conj-as-inverse is valid.
    a2 = _exp_by_neg_z_cyclotomic(s)
    b2 = fq12_cyclotomic_sq(a2)
    c2 = fq12_cyclotomic_sq(b2)
    d2 = fq12_mul(c2, b2)
    e2 = _exp_by_neg_z_cyclotomic(d2)
    f2 = fq12_cyclotomic_sq(e2)
    g2 = _exp_by_neg_z_cyclotomic(f2)
    h2 = fq12_conj(d2)
    i2 = fq12_conj(g2)
    j2 = fq12_mul(i2, e2)
    k2 = fq12_mul(j2, h2)
    l2 = fq12_mul(k2, b2)
    m2 = fq12_mul(k2, e2)
    n2 = fq12_mul(s, m2)
    o2 = fq12_frob(l2, 1)
    p2 = fq12_mul(o2, n2)
    q2 = fq12_frob(k2, 2)
    r2 = fq12_mul(q2, p2)
    s2_ = fq12_conj(s)
    t2 = fq12_mul(s2_, l2)
    u2 = fq12_frob(t2, 3)
    return fq12_mul(u2, r2)


def final_exponentiation(f):
    """Easy chunk + Fuentes-et-al. hard chunk
    (reference: src/fields/fq12.rs:41-88).

    Pallas path: straight-line fused kernels (see _final_exp_straight).
    jnp path: static-tape VM — inlining the ~300-op chain through the jnp
    limb expansion produces a ~280k-HLO program, so each op kind must
    compile exactly once."""
    from bn_tpu.ops.backend import use_pallas

    if use_pallas():
        return _final_exp_straight(f)
    tape, n_regs, out_reg = _final_exp_tape()
    binv = fq12_inv(f)
    zero = zeros12(f.shape[:-5] + f.shape[-1:])
    regs = jnp.stack([f, binv] + [zero] * (n_regs - 2))

    def body(regs, ins):
        kind, dst, s1, s2, aux = ins
        x = jnp.take(regs, s1, axis=0)
        y = jnp.take(regs, s2, axis=0)
        val = jax.lax.switch(
            kind,
            [
                lambda: fq12_mul(x, y),
                lambda: fq12_cyclotomic_sq(x),
                lambda: fq12_frob_traced(x, aux),
                lambda: fq12_conj(x),
            ],
        )
        regs = jax.lax.dynamic_update_index_in_dim(regs, val, dst, axis=0)
        return regs, None

    regs, _ = jax.lax.scan(body, regs, jnp.asarray(tape))
    return regs[out_reg]


def fq12_pow_fr(a, scalar_bits):
    """a^e for device-side 256 exponent bits (..., 256, B) uint32 MSB-first;
    branchless ladder (replaces reference FieldElement::pow,
    src/fields/mod.rs:35-46)."""

    one = ones12(a.shape[:-5] + a.shape[-1:])

    def body(res, bit):
        res = fq12_sq(res)
        res_mul = fq12_mul(res, a)
        res = jnp.where((bit != 0)[..., None, None, None, None, :], res_mul, res)
        return res, None

    res, _ = jax.lax.scan(body, one, jnp.moveaxis(scalar_bits, -2, 0))
    return res


# ---------------------------------------------------------------------------
# host <-> device conversion for tower elements
# ---------------------------------------------------------------------------


def fq2_to_device(vals):
    """vals: list of oracle Fq2 tuples -> (2, L, B)."""
    return jnp.stack(
        [
            fp.to_device(FQ, [v[0] for v in vals]),
            fp.to_device(FQ, [v[1] for v in vals]),
        ]
    )


def fq2_from_device(arr):
    arr = np.asarray(arr)
    c0s = fp.from_device(FQ, arr[..., 0, :, :].reshape(P.NLIMBS, -1))
    c1s = fp.from_device(FQ, arr[..., 1, :, :].reshape(P.NLIMBS, -1))
    return list(zip(c0s, c1s))


def fq6_to_device(vals):
    return bstack([fq2_to_device([v[i] for v in vals]) for i in range(3)])


def fq12_to_device(vals):
    return bstack([fq6_to_device([v[i] for v in vals]) for i in range(2)])


def fq12_from_device(arr):
    arr = np.asarray(arr)
    B = arr.shape[-1]
    out = []
    for b in range(B):
        el = tuple(
            tuple(
                (
                    P.from_mont(P.limbs_to_int(arr[i, j, 0, :, b]), P.Q),
                    P.from_mont(P.limbs_to_int(arr[i, j, 1, :, b]), P.Q),
                )
                for j in range(3)
            )
            for i in range(2)
        )
        out.append(el)
    return out
