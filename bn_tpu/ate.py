"""Batched optimal ate pairing: G2 precompute, Miller loop, final exponentiation.

TPU-native re-design of the reference engine (reference: src/groups/mod.rs:
441-771).  The 65-bit ate ladder's schedule is STATIC (a fixed property of
6z+2), so it is precompiled host-side into a 102-slot step list
(params.miller_schedule) and executed as a `lax.scan` whose per-step kind
(doubling vs mixed-addition) is a scanned flag dispatched with `lax.cond` —
no data-dependent control flow ever reaches the device.

Everything operates on batches: precompute carries the running G2 point
(2, L, B) through the scan and emits the (102, 3, 2, L, B) line-coefficient
tensor; the Miller loop replays it against a batch of G1 points; infinite
inputs are masked to Gt::one at the end (reference: src/groups/mod.rs:764-771).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from bn_tpu import curve, oracle as O, params as P
from bn_tpu.fields import fp, tower

FQ = fp.FQ


def _use_fused_ladder() -> bool:
    """Fused one-kernel-per-step PRECOMPUTE ladder (tower_pallas double/madd
    kernels) on the Pallas backend; BN_TPU_FUSED_LADDER=0 falls back to the
    per-op kernels while keeping the rest of the Pallas path.

    Measured on v5e (B=8192): fused precompute 23.3 ms vs 33.7 ms unfused."""
    import os

    from bn_tpu.ops.backend import use_pallas

    return use_pallas() and os.environ.get("BN_TPU_FUSED_LADDER", "1") != "0"


def _use_fused_miller() -> bool:
    """Whole-step Miller kernel (f^2 + scale + mul_by_024 in ONE kernel).

    Default OFF: the mega-kernel's register pressure makes it SLOWER than
    the per-Fq12-op fused kernels (measured on v5e at B=8192: 47.9 ms vs
    42.8 ms for the 102-step loop).  BN_TPU_FUSED_MILLER=1 re-enables it."""
    import os

    from bn_tpu.ops.backend import use_pallas

    return use_pallas() and os.environ.get("BN_TPU_FUSED_MILLER", "0") == "1"


@functools.lru_cache(maxsize=None)
def _consts():
    two_inv = P.int_to_limbs(P.to_mont(P.TWO_INV, P.Q)).reshape(P.NLIMBS, 1)
    tb = O.twist_b()
    twist_b = tower._fq2_const(tb)
    mulq_x, mulq_y = O.twist_frob_coeffs()
    return {
        "two_inv": two_inv,
        "twist_b": twist_b,
        "mulq_x": tower._fq2_const(mulq_x),
        "mulq_y": tower._fq2_const(mulq_y),
    }


def _scale_two_inv(a):
    c = _consts()["two_inv"]
    return fp.mul(FQ, a, jnp.broadcast_to(jnp.asarray(c, jnp.uint32), a.shape))


def _doubling_step(r):
    """(reference: src/groups/mod.rs:612-634)"""
    x, y, z = r
    t = tower
    p = t.fq2_mul(
        tower.bstack([x, y, z, x, t.add(y, z)]),
        tower.bstack([y, y, z, x, t.add(y, z)]),
    )
    xy, b, c, j, yz_sq = (p[i] for i in range(5))
    d = fp.mul_small(FQ, c, 3)
    e = t.fq2_mul_const(d, _consts()["twist_b"])
    f = fp.mul_small(FQ, e, 3)
    a_and_g = _scale_two_inv(tower.bstack([xy, t.add(b, f)]))
    a, g = a_and_g[0], a_and_g[1]
    h = t.sub(yz_sq, t.add(b, c))
    p = t.fq2_mul(
        tower.bstack([g, e, a, b]),
        tower.bstack([g, e, t.sub(b, f), h]),
    )
    g_sq, e_sq, nx, nz = (p[i] for i in range(4))
    ny = t.sub(g_sq, fp.mul_small(FQ, e_sq, 3))
    ell_0 = t.fq2_mul_by_xi(t.sub(e, b))
    ell_vw = t.neg(h)
    ell_vv = fp.mul_small(FQ, j, 3)
    return (nx, ny, nz), tower.bstack([ell_0, ell_vw, ell_vv])


def _mixed_addition_step(r, base):
    """(reference: src/groups/mod.rs:591-610)"""
    x, y, z = r
    bx, by = base
    t = tower
    p = t.fq2_mul(tower.bstack([z, z]), tower.bstack([bx, by]))
    d = t.sub(x, p[0])
    e = t.sub(y, p[1])
    p = t.fq2_mul(tower.bstack([d, e]), tower.bstack([d, e]))
    f, g = p[0], p[1]
    p = t.fq2_mul(tower.bstack([d, x, z]), tower.bstack([f, f, g]))
    h, i, zg = p[0], p[1], p[2]
    j = t.sub(t.add(zg, h), t.add(i, i))
    p = t.fq2_mul(
        tower.bstack([d, e, h, z, e, d]),
        tower.bstack([j, t.sub(i, j), y, h, bx, by]),
    )
    nx, ny_a, hy, nz, ebx, dby = (p[k] for k in range(6))
    ny = t.sub(ny_a, hy)
    ell_0 = t.fq2_mul_by_xi(t.sub(ebx, dby))
    ell_vv = t.neg(e)
    ell_vw = d
    return (nx, ny, nz), tower.bstack([ell_0, ell_vw, ell_vv])


def _mul_by_q(a):
    """Untwist-Frobenius-twist on affine G2 (reference: src/groups/mod.rs:550-555)."""
    t = tower
    cs = _consts()
    return (
        t.fq2_mul_const(t.fq2_conj(a[0]), cs["mulq_x"]),
        t.fq2_mul_const(t.fq2_conj(a[1]), cs["mulq_y"]),
    )


def _ladder_inputs(q_affine):
    """Shared precompute scaffolding: step flags, per-step base index, and
    the 3-slot base-point stack (Q, q1, -q2).

    The final two ladder slots add the Frobenius-twisted points q1 and -q2
    (reference: src/groups/mod.rs:578-582).  Rather than instantiating two
    extra inline addition steps (which triples the traced-program size of
    the addition formula), the scan gathers its base point per step from the
    3-slot stack: index 0 = Q for the ladder, 1 = q1, 2 = -q2."""
    flags = np.asarray(P.miller_schedule(), dtype=np.uint32)
    bx, by = q_affine
    q1 = _mul_by_q((bx, by))
    q2_ = _mul_by_q(q1)
    q2 = (q2_[0], tower.neg(q2_[1]))
    bases = jnp.stack(
        [jnp.stack([bx, by]), jnp.stack(q1), jnp.stack(q2)]
    )  # (3, 2, 2, L, B)
    base_idx = np.zeros(len(flags), dtype=np.int32)
    base_idx[-2], base_idx[-1] = 1, 2
    return flags, base_idx, bases


def _precompute_fused(q_affine):
    """Pallas path: each ladder step is ONE fused kernel (the whole doubling
    or mixed-addition formula incl. line-coefficient emission stays in
    registers/VMEM — no per-fq2-op HBM round trips)."""
    from bn_tpu.ops import tower_pallas as twp

    flags, base_idx, bases = _ladder_inputs(q_affine)
    bx, by = q_affine
    batch_shape = bx.shape[:-3] + bx.shape[-1:]
    r0 = jnp.stack([bx, by, tower.ones2(batch_shape)])  # (3, 2, L, B)

    cs = _consts()
    two_inv = tuple(int(v) for v in np.asarray(cs["two_inv"]).reshape(-1))
    tb = np.asarray(cs["twist_b"])
    twist_b = (
        tuple(int(v) for v in tb[0].reshape(-1)),
        tuple(int(v) for v in tb[1].reshape(-1)),
    )

    def body(r, xs):
        is_add, idx = xs
        bsel = jnp.take(bases, idx, axis=0)
        return jax.lax.cond(
            is_add != 0,
            lambda rr: twp.madd_step(rr, bsel, FQ.m_limbs, FQ.inv),
            lambda rr: twp.double_step(rr, FQ.m_limbs, FQ.inv, two_inv, twist_b),
            r,
        )

    _, coeffs = jax.lax.scan(
        body, r0, (jnp.asarray(flags), jnp.asarray(base_idx))
    )
    return coeffs


def precompute(q_affine):
    """Line-coefficient precompute over a batch of affine G2 points.

    Returns a (102, 3, 2, L, B) tensor of EllCoeffs in ladder order
    (reference: src/groups/mod.rs:557-588; count invariant asserted at :761).
    """
    if _use_fused_ladder():
        return _precompute_fused(q_affine)

    flags, base_idx, bases = _ladder_inputs(q_affine)
    bx, by = q_affine
    batch_shape = bx.shape[:-3] + bx.shape[-1:]
    r0 = (bx, by, tower.ones2(batch_shape))

    def body(r, xs):
        is_add, idx = xs
        bsel = jnp.take(bases, idx, axis=0)
        return jax.lax.cond(
            is_add != 0,
            lambda rr: _mixed_addition_step(rr, (bsel[0], bsel[1])),
            _doubling_step,
            r,
        )

    r, coeffs = jax.lax.scan(
        body, r0, (jnp.asarray(flags), jnp.asarray(base_idx))
    )
    return coeffs


def miller_loop(coeffs, p_affine):
    """Replay coefficients against affine G1 points
    (reference: src/groups/mod.rs:485-520)."""
    flags = np.asarray(P.miller_schedule(), dtype=np.uint32)
    px, py = p_affine
    batch_shape = px.shape[:-2] + px.shape[-1:]
    f0 = tower.ones12(batch_shape)

    if _use_fused_miller():
        # Whole-step path: one Pallas kernel per ladder step (optional f^2 +
        # G1-scaling of the line + sparse mul_by_024, all in registers).
        from bn_tpu.ops import tower_pallas as twp

        def body(f, xs):
            coeff, is_add = xs
            f = jax.lax.cond(
                is_add != 0,
                lambda g: twp.miller_step(
                    g, coeff, px, py, FQ.m_limbs, FQ.inv, False
                ),
                lambda g: twp.miller_step(
                    g, coeff, px, py, FQ.m_limbs, FQ.inv, True
                ),
                f,
            )
            return f, None

        f, _ = jax.lax.scan(body, f0, (coeffs, jnp.asarray(flags)))
        return f

    # Hoist the G1 scaling OUT of the scan: every step's (ell_vw, ell_vv)
    # is multiplied by (g1.y, g1.x) in one batched kernel over all 102
    # steps, instead of one tiny per-step multiply inside the loop
    # (semantics per step identical to the reference, src/groups/mod.rs:
    # 500-508 — the scan then consumes pre-scaled slices).
    yx = tower.bstack([py, px])  # (2, L, B)
    scaled = tower.fq2_scale_fq(
        jax.lax.optimization_barrier(coeffs[:, 1:3]), yx[None]
    )  # (102, 2, 2, L, B)

    def body(f, xs):
        ell_0, s, is_add = xs
        f = jax.lax.cond(is_add != 0, lambda g: g, tower.fq12_sq, f)
        f = tower.fq12_mul_by_024_prescaled(f, ell_0, s)
        return f, None

    f, _ = jax.lax.scan(
        body, f0, (coeffs[:, 0], scaled, jnp.asarray(flags))
    )
    return f


def pairing_batch(p_jac, q_jac):
    """Full reduced pairing over batches of Jacobian G1/G2 points; infinite
    inputs yield Gt one (reference: src/groups/mod.rs:764-771)."""
    g1s, g2s = curve.g1_spec(), curve.g2_spec()
    p_inf = curve.is_zero(g1s, p_jac)
    q_inf = curve.is_zero(g2s, q_jac)
    pa = curve.to_affine(g1s, p_jac)
    qa = curve.to_affine(g2s, q_jac)
    coeffs = precompute(qa)
    f = miller_loop(coeffs, pa)
    out = tower.final_exponentiation(f)
    ones = tower.ones12(pa[0].shape[:-2] + pa[0].shape[-1:])
    mask = (p_inf | q_inf)[..., None, None, None, None, :]
    return jnp.where(mask, ones, out)


def miller_batch(p_jac, q_jac):
    """Miller loop without final exponentiation (for products of pairings:
    multiply Miller outputs, then one shared final exponentiation)."""
    g1s, g2s = curve.g1_spec(), curve.g2_spec()
    pa = curve.to_affine(g1s, p_jac)
    qa = curve.to_affine(g2s, q_jac)
    coeffs = precompute(qa)
    return miller_loop(coeffs, pa)
