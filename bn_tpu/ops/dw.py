"""Double-width lazy-reduction arithmetic for Pallas kernel bodies.

The CIOS kernel (ops/mont_pallas._k_mont_mul) pays a Montgomery reduction
(REDC) per Fq product: 512 u32 multiplies per product.  But tower-field
formulas (Fq6/Fq12 Karatsuba, mul_by_024, cyclotomic squaring) combine MANY
products linearly before the result is next used multiplicatively — so the
REDC can be deferred to once per OUTPUT coefficient instead of once per
product (lazy reduction a la Aranha et al., "Faster Explicit Formulas for
Computing Pairings over Ordinary Curves", EUROCRYPT 2011).  An Fq12 multiply
drops from 54 products + 54 REDC to 54 products + 12 REDC.

Representation inside a kernel body:

  SW  (single-width): 16 u32 register tiles, 16-bit limbs; exact value
      bound tracked as a Python int (`hi`, value < hi <= 2^256).  SW values
      are valid product operands (limbs < 2^16).
  DW  (double-width): 32 SIGNED i32 register tiles, "column" k holding a
      partial sum of 16-bit-aligned contributions; value = sum(col_k 2^16k),
      exact.  Products accumulate lo/hi halves into columns WITHOUT carry
      propagation; adds/subs are 32 plain i32 ops (no carries, no mod).

Every DW op does exact interval arithmetic on Python-int bounds at trace
time (`lo`, `hi`) plus a conservative per-column magnitude bound
(`col_mag`), and `redc()` asserts the final budget: columns fit i32, the
offset-shifted value is nonnegative, and the 512-bit total fits the fold
path.  Overflow is therefore statically impossible — any formula change
that would break a bound fails at trace time, not silently on device.

The REDC here follows the same word-by-word recurrence as the reference's
mul_reduce (HAC 14.32; reference: src/arith.rs:481-503), operating directly
in column space.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from bn_tpu.params import LIMB_BITS, LIMB_MASK, NLIMBS

U32 = jnp.uint32
I32 = jnp.int32
_MASK = np.uint32(LIMB_MASK)
_MASK_I = np.int32(LIMB_MASK)

NCOLS = 2 * NLIMBS
# i32 column headroom: product lo/hi contributions are < 2^16; budgets below
# keep accumulated |col| under this (asserted); the REDC scatter adds at most
# 2*NLIMBS*2^16 + 2^16 more, keeping every column strictly inside i32.
_COL_BUDGET = 1 << 30


def _i32(x):
    return jax.lax.bitcast_convert_type(x, I32)


def _u32(x):
    return jax.lax.bitcast_convert_type(x, U32)


@dataclasses.dataclass
class SW:
    """Single-width value: list of NLIMBS u32 tiles, 16-bit limbs; 0 <= value < hi."""

    limbs: list
    hi: int  # exclusive upper bound (Python int), <= 2^256

    def __post_init__(self):
        assert self.hi <= 1 << 256, hex(self.hi)


@dataclasses.dataclass
class DW:
    """Double-width signed column value; lo <= value <= hi (Python ints)."""

    cols: list  # NCOLS i32 tiles
    lo: int
    hi: int
    col_mag: int  # bound on |col_k| for every k

    def __post_init__(self):
        assert self.col_mag < _COL_BUDGET, self.col_mag


def sw(limbs, hi: int) -> SW:
    return SW(list(limbs), hi)


def sw_add(a: SW, b: SW) -> SW:
    """Ripple add WITHOUT modular correction (for Karatsuba pre-adds).

    Requires a.hi + b.hi <= 2^256 so the carry-out is provably zero."""
    hi = a.hi + b.hi
    assert hi <= 1 << 256, "sw_add overflow"
    c = None
    out = []
    for j in range(NLIMBS):
        t = a.limbs[j] + b.limbs[j] if c is None else a.limbs[j] + b.limbs[j] + c
        out.append(t & _MASK)
        c = t >> LIMB_BITS
    return SW(out, hi)


def prod(a: SW, b: SW) -> DW:
    """Exact 512-bit product into signed columns (256 muls, no reduction)."""
    cols = [None] * NCOLS
    for i in range(NLIMBS):
        ai = a.limbs[i]
        for j in range(NLIMBS):
            p = ai * b.limbs[j]
            lo = _i32(p & _MASK)
            hic = _i32(p >> LIMB_BITS)
            k = i + j
            cols[k] = lo if cols[k] is None else cols[k] + lo
            cols[k + 1] = hic if cols[k + 1] is None else cols[k + 1] + hic
    zero = jnp.zeros_like(cols[0])
    cols = [c if c is not None else zero for c in cols]
    return DW(cols, 0, (a.hi - 1) * (b.hi - 1), 2 * NLIMBS * (1 << LIMB_BITS))


def from_sw(a: SW) -> DW:
    """Embed a single-width value into column space at its face value.

    NOTE: redc() divides by R, so combining this with product terms gives
    the embedded value an extra R^-1 — only correct for non-Montgomery
    bookkeeping.  To mix a Montgomery-domain value with deferred products,
    use from_sw_hi (the value times R), which redc() maps back to itself."""
    zero = jnp.zeros_like(_i32(a.limbs[0]))
    cols = [_i32(x) for x in a.limbs] + [zero] * NLIMBS
    return DW(cols, 0, a.hi, 1 << LIMB_BITS)


def from_sw_hi(a: SW) -> DW:
    """Embed a*R into column space: redc(from_sw_hi(a) + prods) ==
    a + redc(prods) mod q — the way to add an already-reduced Montgomery
    value into a deferred-product accumulation."""
    zero = jnp.zeros_like(_i32(a.limbs[0]))
    cols = [zero] * NLIMBS + [_i32(x) for x in a.limbs]
    return DW(cols, 0, a.hi << 256, 1 << LIMB_BITS)


def add(a: DW, b: DW) -> DW:
    return DW(
        [x + y for x, y in zip(a.cols, b.cols)],
        a.lo + b.lo,
        a.hi + b.hi,
        a.col_mag + b.col_mag,
    )


def sub(a: DW, b: DW) -> DW:
    return DW(
        [x - y for x, y in zip(a.cols, b.cols)],
        a.lo - b.hi,
        a.hi - b.lo,
        a.col_mag + b.col_mag,
    )


def dbl(a: DW) -> DW:
    return DW([x + x for x in a.cols], 2 * a.lo, 2 * a.hi, 2 * a.col_mag)


def smul(a: DW, k: int) -> DW:
    """Multiply by a small static positive integer (columnwise)."""
    assert 1 <= k < 64
    kc = np.int32(k)
    return DW([x * kc for x in a.cols], k * a.lo, k * a.hi, k * a.col_mag)


def neg(a: DW) -> DW:
    return DW([-x for x in a.cols], -a.hi, -a.lo, a.col_mag)


def xi_pair(c0: DW, c1: DW) -> tuple:
    """Multiply the Fq2 value (c0, c1) by xi = 9 + u in column space:
    (9 c0 - c1, c0 + 9 c1)  (reference: src/fields/fq2.rs:16-22)."""
    return sub(smul(c0, 9), c1), add(c0, smul(c1, 9))


@functools.lru_cache(maxsize=None)
def _redc_consts(q_tuple):
    """(c256 limbs, [0,q,2q,3q] select tables) for the fold/canonical path."""
    q = 0
    for i, w in enumerate(q_tuple):
        q |= int(w) << (LIMB_BITS * i)
    c256 = (1 << 256) % q
    c256_l = [np.uint32((c256 >> (LIMB_BITS * i)) & LIMB_MASK) for i in range(NLIMBS)]
    kq = []
    for k in range(4):
        kq.append(
            [np.uint32(((k * q) >> (LIMB_BITS * i)) & LIMB_MASK) for i in range(NLIMBS)]
        )
    return c256_l, kq, q


def redc(a: DW, q, inv) -> SW:
    """Montgomery-reduce an exact column value to canonical a*R^-1 mod q.

    Handles signed inputs by adding a static multiple of q*2^256 (congruent
    to 0 after division by R), chosen from the trace-time lower bound; all
    budgets are asserted at trace time."""
    from bn_tpu.ops.mont_pallas import _k_cond_sub_q

    q_tuple = tuple(int(v) for v in q)
    c256_l, kq, q_int = _redc_consts(q_tuple)
    qR = q_int << 256

    # offset: smallest k with a.lo + k*qR >= 0
    k_off = 0 if a.lo >= 0 else (-a.lo + qR - 1) // qR
    off = k_off * qR
    t_hi_bound = a.hi + off
    assert a.lo + off >= 0
    # total must fit the 33-limb resolve + 3-round fold path:
    # out = T'/R < T/R + q; the top limb t32 must stay <= 255 so that
    # t32*c256 ripples with < 2^24 per-limb products and three fold rounds
    # provably clear every carry: c256 = 0.0549*2^256, so
    # t32<=255 -> v1 < 15*2^256 -> c1<=14 -> v2 < 1.77*2^256 -> c2<=1
    # -> v3 < (0.77+0.055)*2^256 < 2^256 -> 0.
    assert t_hi_bound < (1 << 520), hex(t_hi_bound)
    assert (t_hi_bound // (1 << 256) + q_int) >> 256 <= 255, "fold budget"

    cols = list(a.cols)
    if k_off:
        for i in range(NCOLS):
            if i == NCOLS - 1:
                # top column absorbs everything above bit 512 (offset can
                # reach 2^520; the excess stays well inside i32)
                w = np.int32(off >> (LIMB_BITS * i))
            else:
                w = np.int32((off >> (LIMB_BITS * i)) & LIMB_MASK)
            if int(w):
                cols[i] = cols[i] + w
    # the REDC scatter below adds at most 2*NLIMBS lo/hi parts per column;
    # the top offset column can additionally hold up to 2^24
    assert (
        a.col_mag + (1 << 24) + 2 * NLIMBS * (1 << LIMB_BITS) < 1 << 31
    )

    # word-by-word Montgomery: resolve column i, pick m_i, scatter m_i*q
    inv = np.uint32(int(inv))
    carry = None  # i32
    for i in range(NLIMBS):
        s = cols[i] if carry is None else cols[i] + carry
        ti = s & _MASK_I  # nonneg low 16 bits
        carry = s >> LIMB_BITS  # arithmetic shift: exact signed carry
        m = (_u32(ti) * inv) & _MASK
        # j = 0: combines with the just-resolved limb (sum is 0 mod 2^16)
        p = m * np.uint32(q_tuple[0])
        carry = carry + _i32((_u32(ti) + (p & _MASK)) >> LIMB_BITS)
        cols[i + 1] = cols[i + 1] + _i32(p >> LIMB_BITS)
        for j in range(1, NLIMBS):
            p = m * np.uint32(q_tuple[j])
            cols[i + j] = cols[i + j] + _i32(p & _MASK)
            cols[i + j + 1] = cols[i + j + 1] + _i32(p >> LIMB_BITS)

    # resolve the high half -> 16 limbs + small nonnegative top carry t32
    out = []
    for k in range(NLIMBS, NCOLS):
        s = cols[k] + carry
        out.append(_u32(s & _MASK_I))
        carry = s >> LIMB_BITS
    mult = _u32(carry)  # t32: 0..31 by the fold-budget assert

    # fold mult*2^256 via c256 = 2^256 mod q; three rounds clear all carries
    # (mult<=31 -> carry<=2 -> carry<=1 -> 0), leaving value < 2^256
    for _round in range(3):
        c = None
        for j in range(NLIMBS):
            t = (
                out[j] + mult * c256_l[j]
                if c is None
                else out[j] + mult * c256_l[j] + c
            )
            out[j] = t & _MASK
            c = t >> LIMB_BITS
        mult = c

    # canonicalize: subtract f(top2)*q (top2 = bits 254..255), then 2 cond-subs
    top2 = out[NLIMBS - 1] >> (LIMB_BITS - 2)
    is1 = (top2 == 1).astype(U32)
    is2 = (top2 == 2).astype(U32)
    is3 = (top2 == 3).astype(U32)
    borrow = None
    d = []
    bias = np.uint32(1 << LIMB_BITS)
    for j in range(NLIMBS):
        sub_j = is1 * kq[1][j] + is2 * kq[2][j] + is3 * kq[3][j]
        s = bias + out[j] - sub_j if borrow is None else bias + out[j] - sub_j - borrow
        d.append(s & _MASK)
        borrow = np.uint32(1) - (s >> LIMB_BITS)
    # f(top2) = top2 <= floor(v/q) always, so no borrow remains
    zero = jnp.zeros_like(d[0])
    d = _k_cond_sub_q(d, zero, [np.uint32(v) for v in q_tuple])
    d = _k_cond_sub_q(d, zero, [np.uint32(v) for v in q_tuple])
    return SW(d, q_int)
