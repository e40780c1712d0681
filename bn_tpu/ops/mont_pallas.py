"""Fused Pallas TPU kernels for batched Montgomery field arithmetic.

The hot ops of the whole framework (SURVEY.md §7 'hard parts' #1): every tower
multiply funnels into the CIOS multiply kernel, and the modular add/sub/neg
kernels replace multi-pass XLA carry chains (Kogge-Stone in ops/limbs.py is
the jnp reference path) with single-pass in-register ripple carries.

Layout: logical tensors are (..., L, B) uint32 (limbs x batch).  When B is a
multiple of 1024 the wrapper is TRANSPOSE-FREE: a pure reshape to
(lead, L, nb, 8, 128) where each limb row is a full (8, 128) VPU tile, and the
grid walks (lead, nb).  (A transpose-based fallback packs small batches into
whole tiles.)  Limbs unroll in registers; the batch fills sublanes AND lanes.

The multiply runs the same word-2^16 CIOS recurrence as the reference's
mul_reduce (HAC 14.32; reference: src/arith.rs:481-503), unrolled at trace
time: every partial t[j] + a_i*b_j + c fits uint32 exactly.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bn_tpu.params import LIMB_BITS, LIMB_MASK, NLIMBS

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)

SUBLANES = 8
LANES = 128
BLOCK_B = SUBLANES * LANES  # batch elements per grid step


def _split(x):
    return x & _MASK, x >> LIMB_BITS


# ---------------------------------------------------------------------------
# in-kernel limb routines (operate on python lists of (8, 128) u32 arrays)
# ---------------------------------------------------------------------------


def _k_mont_mul(a, b, q, inv):
    """CIOS Montgomery product of two L-limb register vectors; result < q."""
    L = NLIMBS
    zero = jnp.zeros((SUBLANES, LANES), dtype=U32)
    t = [zero] * L
    t_hi = zero
    for i in range(L):
        ai = a[i]
        c = zero
        for j in range(L):
            t[j], c = _split(t[j] + ai * b[j] + c)
        t_hi, hi2 = _split(t_hi + c)

        m = (t[0] * inv) & _MASK
        _, c = _split(t[0] + m * q[0])
        for j in range(1, L):
            t[j - 1], c = _split(t[j] + m * q[j] + c)
        t[L - 1], c2 = _split(t_hi + c)
        t_hi = hi2 + c2
    return _k_cond_sub_q(t, t_hi, q)


def _k_cond_sub_q(t, t_hi, q):
    """t (< 2q, with optional overflow flag t_hi) -> t mod q."""
    L = NLIMBS
    zero = jnp.zeros((SUBLANES, LANES), dtype=U32)
    borrow = zero
    d = [None] * L
    bias = np.uint32(1 << LIMB_BITS)
    for j in range(L):
        s = bias + t[j] - q[j] - borrow
        d[j] = s & _MASK
        borrow = np.uint32(1) - (s >> LIMB_BITS)
    take_d = (borrow == 0) | (t_hi != 0)
    return [jnp.where(take_d, d[j], t[j]) for j in range(L)]


def _k_add(a, b, q):
    """(a + b) mod q via ripple carry + one conditional subtract."""
    L = NLIMBS
    c = jnp.zeros((SUBLANES, LANES), dtype=U32)
    s = [None] * L
    for j in range(L):
        t = a[j] + b[j] + c
        s[j] = t & _MASK
        c = t >> LIMB_BITS
    return _k_cond_sub_q(s, c, q)


def _k_sub(a, b, q):
    """(a - b) mod q: two's-complement ripple, add q back on borrow."""
    L = NLIMBS
    c = jnp.ones((SUBLANES, LANES), dtype=U32)
    d = [None] * L
    for j in range(L):
        t = a[j] + (_MASK - b[j]) + c
        d[j] = t & _MASK
        c = t >> LIMB_BITS
    borrowed = c == 0  # no carry-out -> a < b
    cc = jnp.zeros((SUBLANES, LANES), dtype=U32)
    r = [None] * L
    for j in range(L):
        t = d[j] + q[j] + cc
        r[j] = t & _MASK
        cc = t >> LIMB_BITS
    return [jnp.where(borrowed, r[j], d[j]) for j in range(L)]


def _k_neg(a, q):
    """(q - a) mod q with -0 = 0 (cf. U256::neg, reference src/arith.rs:266-273)."""
    L = NLIMBS
    nz = a[0]
    for j in range(1, L):
        nz = nz | a[j]
    is_zero = nz == 0
    c = jnp.ones((SUBLANES, LANES), dtype=U32)
    d = [None] * L
    for j in range(L):
        t = q[j] + (_MASK - a[j]) + c
        d[j] = t & _MASK
        c = t >> LIMB_BITS
    zero = jnp.zeros((SUBLANES, LANES), dtype=U32)
    return [jnp.where(is_zero, zero, d[j]) for j in range(L)]


# ---------------------------------------------------------------------------
# kernel bodies (refs are (1, L, 1, 8, 128) blocks)
# ---------------------------------------------------------------------------


def _load(ref):
    """Refs are (1, L, 1, 8, 128) blocks: one (8, 128) tile per limb."""
    return [ref[0, i, 0] for i in range(NLIMBS)]


def _store(ref, vals):
    for i in range(NLIMBS):
        ref[0, i, 0] = vals[i]


def _mont_body(a_ref, b_ref, o_ref, *, q, inv):
    _store(o_ref, _k_mont_mul(_load(a_ref), _load(b_ref), q, inv))


def _add_body(a_ref, b_ref, o_ref, *, q):
    _store(o_ref, _k_add(_load(a_ref), _load(b_ref), q))


def _sub_body(a_ref, b_ref, o_ref, *, q):
    _store(o_ref, _k_sub(_load(a_ref), _load(b_ref), q))


def _neg_body(a_ref, o_ref, *, q):
    _store(o_ref, _k_neg(_load(a_ref), q))


def _k2_mul_lazy(a0, a1, b0, b1, q, inv):
    """Lazy Karatsuba Fq2 product: 3 column-space products + 2 REDC (the
    CIOS body below pays 3 REDC).  Formula: src/fields/fq2.rs:139-155."""
    from bn_tpu.ops import dw as _dw

    q_int = 0
    for i, w in enumerate(q):
        q_int |= int(w) << (LIMB_BITS * i)
    sa0, sa1 = _dw.sw(a0, q_int), _dw.sw(a1, q_int)
    sb0, sb1 = _dw.sw(b0, q_int), _dw.sw(b1, q_int)
    p0 = _dw.prod(sa0, sb0)
    p1 = _dw.prod(sa1, sb1)
    p01 = _dw.prod(_dw.sw_add(sa0, sa1), _dw.sw_add(sb0, sb1))
    c0 = _dw.redc(_dw.sub(p0, p1), q, inv).limbs
    c1 = _dw.redc(_dw.sub(_dw.sub(p01, p0), p1), q, inv).limbs
    return c0, c1


def _fq2_mul_body(a_ref, b_ref, o_ref, *, q, inv, lazy=True):
    """Fused Karatsuba Fq2 multiply (reference: src/fields/fq2.rs:139-155):
    3 products + the modular pre-adds/post-subs, all in registers.
    Refs are (1, 2, L, 1, 8, 128) blocks."""
    a0 = [a_ref[0, 0, i, 0] for i in range(NLIMBS)]
    a1 = [a_ref[0, 1, i, 0] for i in range(NLIMBS)]
    b0 = [b_ref[0, 0, i, 0] for i in range(NLIMBS)]
    b1 = [b_ref[0, 1, i, 0] for i in range(NLIMBS)]
    if lazy:
        c0, c1 = _k2_mul_lazy(a0, a1, b0, b1, q, inv)
    else:
        aa = _k_mont_mul(a0, b0, q, inv)
        bb = _k_mont_mul(a1, b1, q, inv)
        cc = _k_mont_mul(_k_add(a0, a1, q), _k_add(b0, b1, q), q, inv)
        c0 = _k_sub(aa, bb, q)
        c1 = _k_sub(_k_sub(cc, aa, q), bb, q)
    for i in range(NLIMBS):
        o_ref[0, 0, i, 0] = c0[i]
        o_ref[0, 1, i, 0] = c1[i]


def _fq2_sq_body(a_ref, o_ref, *, q, inv, lazy=True):
    """Fused complex squaring (reference: src/fields/fq2.rs:112-123):
    (a0+a1)(a0-a1) and 2*a0*a1 in one kernel.  Lazy path: 2 column
    products + 2 REDC ((a0-a1 mod q) differs from a0-a1 by +q, a multiple
    of q that REDC erases)."""
    from bn_tpu.ops import dw as _dw

    a0 = [a_ref[0, 0, i, 0] for i in range(NLIMBS)]
    a1 = [a_ref[0, 1, i, 0] for i in range(NLIMBS)]
    if lazy:
        q_int = 0
        for i, w in enumerate(q):
            q_int |= int(w) << (LIMB_BITS * i)
        s = _dw.sw_add(_dw.sw(a0, q_int), _dw.sw(a1, q_int))
        d = _dw.sw(_k_sub(a0, a1, q), q_int)
        p0 = _dw.redc(_dw.prod(s, d), q, inv).limbs
        c1 = _dw.redc(_dw.dbl(_dw.prod(_dw.sw(a0, q_int), _dw.sw(a1, q_int))), q, inv).limbs
    else:
        p0 = _k_mont_mul(_k_add(a0, a1, q), _k_sub(a0, a1, q), q, inv)
        p1 = _k_mont_mul(a0, a1, q, inv)
        c1 = _k_add(p1, p1, q)
    for i in range(NLIMBS):
        o_ref[0, 0, i, 0] = p0[i]
        o_ref[0, 1, i, 0] = c1[i]


def _k_small(a, k: int, q):
    """a * k for a tiny static k via in-register doubling chain."""
    assert k >= 1
    bits = [int(c) for c in bin(k)[2:]]
    res = a
    for bit in bits[1:]:
        res = _k_add(res, res, q)
        if bit:
            res = _k_add(res, a, q)
    return res


def _fq2_xi_body(a_ref, o_ref, *, q):
    """Fused xi = 9 + u multiply: (9*c0 - c1, c0 + 9*c1)
    (reference: src/fields/fq2.rs:16-22 constants; cf. tower.fq2_mul_by_xi)."""
    a0 = [a_ref[0, 0, i, 0] for i in range(NLIMBS)]
    a1 = [a_ref[0, 1, i, 0] for i in range(NLIMBS)]
    n0 = _k_small(a0, 9, q)
    n1 = _k_small(a1, 9, q)
    c0 = _k_sub(n0, a1, q)
    c1 = _k_add(n1, a0, q)
    for i in range(NLIMBS):
        o_ref[0, 0, i, 0] = c0[i]
        o_ref[0, 1, i, 0] = c1[i]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _block_spec(struct: int):
    """BlockSpec for a (lead, struct..., L, nb, 8, 128) operand: one grid step
    sees (1, struct..., L, 1, 8, 128).  struct is the size of one leading
    structure axis (0 = none; 2 = Fq2 coefficients; 16 = pow window table)."""
    if struct == 0:
        return pl.BlockSpec(
            (1, NLIMBS, 1, SUBLANES, LANES),
            lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, struct, NLIMBS, 1, SUBLANES, LANES),
        lambda i, j: (i, 0, 0, j, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _lazy_default() -> bool:
    import os

    return os.environ.get("BN_TPU_LAZY", "1") != "0"


@functools.lru_cache(maxsize=None)
def _build_call(kind: str, q_tuple, inv: int, n_in: int, struct: int, interpret: bool = False, lazy: bool = True):
    q = [np.uint32(v) for v in q_tuple]
    bodies = {
        "mont": lambda: functools.partial(_mont_body, q=q, inv=np.uint32(inv)),
        "add": lambda: functools.partial(_add_body, q=q),
        "sub": lambda: functools.partial(_sub_body, q=q),
        "neg": lambda: functools.partial(_neg_body, q=q),
        "fq2mul": lambda: functools.partial(
            _fq2_mul_body, q=q, inv=np.uint32(inv), lazy=lazy
        ),
        "fq2sq": lambda: functools.partial(
            _fq2_sq_body, q=q, inv=np.uint32(inv), lazy=lazy
        ),
        "fq2xi": lambda: functools.partial(_fq2_xi_body, q=q),
    }
    body = bodies[kind]()

    def run(*ops):
        lead = ops[0].shape[0]
        nb = ops[0].shape[-3]
        spec = _block_spec(struct)
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(ops[0].shape, ops[0].dtype),
            grid=(lead, nb),
            in_specs=[spec] * n_in,
            out_specs=spec,
            interpret=interpret,
        )(*ops)

    return jax.jit(run)


def _pack(x, struct: int):
    """(..., [2,] L, B) -> (lead, [2,] L, nb, 8, 128) by pure reshape (B
    padded to a BLOCK_B multiple first).  Returns (packed, pad, out_shape)."""
    out_shape = x.shape
    B = x.shape[-1]
    pad = (-B) % BLOCK_B
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    Bp = B + pad
    nb = Bp // BLOCK_B
    tail = (NLIMBS, nb, SUBLANES, LANES)
    if struct:
        x = x.reshape((-1, struct) + tail)
    else:
        x = x.reshape((-1,) + tail)
    return x, pad, out_shape


def _unpack(o, pad: int, out_shape):
    B = out_shape[-1]
    o = o.reshape(out_shape[:-1] + (B + pad,))
    if pad:
        o = o[..., :B]
    return o


def _interp() -> bool:
    from bn_tpu.ops.backend import interpret_mode

    return interpret_mode()


def _binary(kind: str, a, b, m_limbs, inv: int = 0, struct: int = 0):
    out_shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, out_shape)
    b = jnp.broadcast_to(b, out_shape)
    a4, pad, _ = _pack(a, struct)
    b4, _, _ = _pack(b, struct)
    run = _build_call(kind, tuple(int(v) for v in m_limbs), int(inv), 2, struct, _interp(), _lazy_default())
    return _unpack(run(a4, b4), pad, out_shape)


def _unary(kind: str, a, m_limbs, struct: int = 0):
    a4, pad, out_shape = _pack(a, struct)
    run = _build_call(kind, tuple(int(v) for v in m_limbs), 0, 1, struct, _interp(), _lazy_default())
    return _unpack(run(a4), pad, out_shape)


def mont_mul_pallas(a, b, m_limbs: np.ndarray, inv: int, nprime_limbs=None):
    """Montgomery product a*b*R^-1 mod m; drop-in for mont_mul_jnp on TPU."""
    return _binary("mont", a, b, m_limbs, inv)


def mod_add_pallas(a, b, m_limbs: np.ndarray):
    return _binary("add", a, b, m_limbs)


def mod_sub_pallas(a, b, m_limbs: np.ndarray):
    return _binary("sub", a, b, m_limbs)


def mod_neg_pallas(a, m_limbs: np.ndarray):
    return _unary("neg", a, m_limbs)


def fq2_mul_pallas(a, b, m_limbs: np.ndarray, inv: int):
    """Fused Karatsuba Fq2 product on (..., 2, L, B) tensors."""
    return _binary("fq2mul", a, b, m_limbs, inv, struct=2)


def fq2_sq_pallas(a, m_limbs: np.ndarray, inv: int):
    a4, pad, out_shape = _pack(a, 2)
    run = _build_call("fq2sq", tuple(int(v) for v in m_limbs), int(inv), 1, 2, _interp(), _lazy_default())
    return _unpack(run(a4), pad, out_shape)


def fq2_xi_pallas(a, m_limbs: np.ndarray):
    return _unary("fq2xi", a, m_limbs, struct=2)


# ---------------------------------------------------------------------------
# fused fixed-exponent powering (Fermat inversion chains)
#
# fp.pow_fixed's windowed ladder is mathematically identical, but as jnp ops
# it dispatches ~5 tiny kernels per 4-bit digit — ~330 sequential kernel
# launches per inversion chain, which costs ~5 ms/chain at B=8192 on v5e
# while the arithmetic itself is worth ~0.4 ms.  A reduced pairing pays 3
# such chains (G1/G2 to_affine + the final-exp Fq12 inversion).  Here the
# whole ladder is ONE pallas_call: the digit axis is the innermost grid
# dimension (CHUNK digits per grid step), digits live in SMEM and index the
# 16-entry window table dynamically, and the running value is carried in the
# output block, which the consecutive revisits keep resident in VMEM — no
# HBM round-trips between chunks and, critically, no per-exponent kernel
# builds (the earlier design specialized one kernel per static digit chunk:
# ~11 distinct ~25 s Pallas traces per exponent, every process start).
# ---------------------------------------------------------------------------

_POW_WINDOW = 4
_POW_TABLE = 1 << _POW_WINDOW
_POW_CHUNK = 6  # digits per grid step: 6*(4 sq + 1 mul) = 30 muls/body


def _pow_table_body(a_ref, o_ref, *, q, inv, one_limbs):
    """o[k] = a^k (Montgomery domain), k = 0..15; o[0] = Montgomery one."""
    a = _load(a_ref)
    cur = [jnp.full((SUBLANES, LANES), w, U32) for w in one_limbs]
    for i in range(NLIMBS):
        o_ref[0, 0, i, 0] = cur[i]
    cur = a
    for k in range(1, _POW_TABLE):
        for i in range(NLIMBS):
            o_ref[0, k, i, 0] = cur[i]
        if k + 1 < _POW_TABLE:
            cur = _k_mont_mul(cur, a, q, inv)


def _pow_ladder_body(d_ref, t_ref, o_ref, *, q, inv, one_limbs):
    """One grid step = _POW_CHUNK windowed-ladder digits, all in registers.

    The running value is the OUTPUT block: grid step k reads what step k-1
    stored (consecutive steps revisit the same block, so it stays in VMEM),
    and step 0 starts from the Montgomery one.  Digits are dynamic (SMEM),
    so a d = 0 slot multiplies by table[0] = one — an exact identity in
    Montgomery form — and one compiled kernel serves every exponent."""
    k = pl.program_id(2)
    ones = [jnp.full((SUBLANES, LANES), w, U32) for w in one_limbs]
    prev = _load(o_ref)
    x = [jnp.where(k == 0, ones[i], prev[i]) for i in range(NLIMBS)]
    for s in range(_POW_CHUNK):
        d = d_ref[k * _POW_CHUNK + s]
        for _ in range(_POW_WINDOW):
            x = _k_mont_mul(x, x, q, inv)
        t = [t_ref[0, d, i, 0] for i in range(NLIMBS)]
        x = _k_mont_mul(x, t, q, inv)
    _store(o_ref, x)


@functools.lru_cache(maxsize=None)
def _build_pow_table(q_tuple, inv: int, one_tuple, interpret: bool):
    q = [np.uint32(v) for v in q_tuple]
    body = functools.partial(
        _pow_table_body,
        q=q,
        inv=np.uint32(inv),
        one_limbs=[np.uint32(v) for v in one_tuple],
    )

    def run(a):
        lead, nb = a.shape[0], a.shape[-3]
        out = jax.ShapeDtypeStruct(
            (lead, _POW_TABLE) + a.shape[1:], a.dtype
        )
        return pl.pallas_call(
            body,
            out_shape=out,
            grid=(lead, nb),
            in_specs=[_block_spec(0)],
            out_specs=_block_spec(_POW_TABLE),
            interpret=interpret,
        )(a)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _build_pow_ladder(q_tuple, inv: int, one_tuple, interpret: bool):
    q = [np.uint32(v) for v in q_tuple]
    body = functools.partial(
        _pow_ladder_body,
        q=q,
        inv=np.uint32(inv),
        one_limbs=[np.uint32(v) for v in one_tuple],
    )
    # 3D-grid specs: digit-chunk axis k is INNERMOST, so consecutive steps
    # revisit the same (lead, nb) blocks and the carry stays in VMEM.
    val_spec = pl.BlockSpec(
        (1, NLIMBS, 1, SUBLANES, LANES),
        lambda i, j, k: (i, 0, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tab_spec = pl.BlockSpec(
        (1, _POW_TABLE, NLIMBS, 1, SUBLANES, LANES),
        lambda i, j, k: (i, 0, 0, j, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def run(d, t, *, n_chunks):
        lead, nb = t.shape[0], t.shape[-3]
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(
                (lead, NLIMBS, nb, SUBLANES, LANES), t.dtype
            ),
            grid=(lead, nb, n_chunks),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                tab_spec,
            ],
            out_specs=val_spec,
            interpret=interpret,
        )(d, t)

    return jax.jit(run, static_argnames=("n_chunks",))


def pow_fixed_pallas(a, e: int, m_limbs, inv: int, one_limbs):
    """a^e for a compile-time exponent (Montgomery domain), grid-fused.

    Drop-in for the jnp windowed ladder in fp.pow_fixed (same window size,
    same digit schedule, exact arithmetic — bit-identical results).  The
    digit string is front-padded with zeros to a _POW_CHUNK multiple; the
    ladder starts from one, so leading zero digits are exact no-ops."""
    assert e > 0
    nd = (e.bit_length() + _POW_WINDOW - 1) // _POW_WINDOW
    digits = [
        (e >> (i * _POW_WINDOW)) & (_POW_TABLE - 1)
        for i in range(nd - 1, -1, -1)
    ]
    digits = [0] * ((-len(digits)) % _POW_CHUNK) + digits
    n_chunks = len(digits) // _POW_CHUNK

    q_tuple = tuple(int(v) for v in m_limbs)
    one_tuple = tuple(int(v) for v in np.asarray(one_limbs).reshape(-1))
    interp = _interp()

    a4, pad, out_shape = _pack(a, 0)
    table = _build_pow_table(q_tuple, int(inv), one_tuple, interp)(a4)
    x = _build_pow_ladder(q_tuple, int(inv), one_tuple, interp)(
        jnp.asarray(digits, dtype=jnp.int32), table, n_chunks=n_chunks
    )
    return _unpack(x, pad, out_shape)
