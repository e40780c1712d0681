"""Batched 256-bit modular limb arithmetic on (..., L, B) uint32 tensors.

This is the TPU-native analogue of the reference's u64 limb kernels
(reference: src/arith.rs:397-503): field elements are columns of L=16 16-bit
limbs stored in uint32, with the batch axis last (mapped to TPU vector lanes).
All operations are branchless (masks/selects instead of the reference's
data-dependent branches, cf. SURVEY.md §7) and vectorize over any leading
batch/structure axes.

Two structural choices keep both traced-program size and VPU work small:

 1. Multiplication is a single outer product contracted against a static
    anti-diagonal one-hot tensor (1-D convolution as einsum -> one XLA dot),
    followed by separated Montgomery REDC — not the reference's interleaved
    O(L^2)-step CIOS (src/arith.rs:481-503).

 2. Carry/borrow propagation is whole-tensor Kogge–Stone carry-lookahead
    over the limb axis: two ripple passes collapse multi-bit column sums to
    binary carries, then a log2(L)-round generate/propagate prefix resolves
    them — ~40 HLO ops per chain instead of O(L) sliced scalar steps.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp

from bn_tpu.params import LIMB_BITS, LIMB_MASK, NLIMBS

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)


def const_limbs(x_limbs: np.ndarray) -> np.ndarray:
    """Shape a host-side (L,) limb vector for broadcasting against (..., L, B)."""
    return x_limbs.reshape(NLIMBS, 1).astype(np.uint32)


# ---------------------------------------------------------------------------
# Kogge–Stone carry resolution
# ---------------------------------------------------------------------------


def _shift_up(x, d):
    """Shift limbs towards the most-significant end (limb axis -2), zero fill."""
    pad = jnp.zeros(x.shape[:-2] + (d,) + x.shape[-1:], x.dtype)
    return jnp.concatenate([pad, x[..., :-d, :]], axis=-2)


def resolve_carries(cols, extra: int = 1):
    """Normalize unnormalized columns to 16-bit limbs.

    cols: (..., C, B) uint32, entries < 2^27.  Appends `extra` zero columns at
    the top to absorb overflow, then:
      pass 1+2: ripple (x & mask) + shift(x >> 16) — entries become <= 2^16
      Kogge–Stone: binary generate/propagate prefix resolves remaining carries
    Returns (..., C+extra, B) fully normalized limbs (< 2^16).  The appended
    top limbs carry the overflow (e.g. [-1] is the carry-out when extra=1).
    """
    if extra:
        pad = jnp.zeros(cols.shape[:-2] + (extra,) + cols.shape[-1:], cols.dtype)
        cols = jnp.concatenate([cols, pad], axis=-2)
    x = (cols & _MASK) + _shift_up(cols >> LIMB_BITS, 1)
    x = (x & _MASK) + _shift_up(x >> LIMB_BITS, 1)
    # x entries <= 2^16: binary carries remain
    g = x >> LIMB_BITS  # generate (0/1)
    s = x & _MASK
    p = s == _MASK  # propagate
    n = x.shape[-2]
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d)).astype(U32)
        p = p & _shift_up(p, d)
        d *= 2
    c = _shift_up(g, 1)
    return (s + c) & _MASK


def add_limbs(a, b):
    """a + b with full carry propagation; returns (sum (..., L, B), carry (..., B))."""
    r = resolve_carries(a + b, extra=1)
    return r[..., :-1, :], r[..., -1, :]


def _complement(b):
    """Per-limb ones' complement (limbs < 2^16): mask - b."""
    return _MASK - b


def sub_limbs(a, b):
    """a - b; returns (diff (..., L, B), borrow (..., B)) with borrow in {0,1}.

    Two's-complement: a + ~b + 1; carry-out 1 means a >= b.
    """
    cols = a + _complement(b)
    cols = jnp.concatenate([(cols[..., :1, :] + 1), cols[..., 1:, :]], axis=-2)
    r = resolve_carries(cols, extra=1)
    return r[..., :-1, :], np.uint32(1) - r[..., -1, :]


def geq(a, b):
    """a >= b as a (..., B) bool mask (cf. U256::cmp, src/arith.rs:161-174)."""
    _, borrow = sub_limbs(a, b)
    return borrow == 0


def select(mask, a, b):
    """Elementwise select over limb tensors; mask has shape (..., B)."""
    return jnp.where(mask[..., None, :], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=-2)


def eq(a, b):
    return jnp.all(a == b, axis=-2)


# ---------------------------------------------------------------------------
# modular add / sub / neg (cf. U256::add/sub/neg, src/arith.rs:237-273)
# ---------------------------------------------------------------------------


def _bcast_const(c, like):
    return jnp.broadcast_to(jnp.asarray(c, dtype=U32), like.shape)


def mod_add(a, b, m_const):
    """(a + b) mod m via dual evaluation: s = a+b and s2 = a+b+(2^256-m);
    the second's carry-out says whether a+b >= m (then s2 = a+b-m)."""
    mc = np.asarray(m_const).reshape(-1)
    rminusm = ((1 << 256) - int(sum(int(v) << (16 * i) for i, v in enumerate(mc))))
    from bn_tpu import params as _P

    rm_const = _P.int_to_limbs(rminusm % (1 << 256)).reshape(NLIMBS, 1)
    s = resolve_carries(a + b, extra=0)  # a+b < 2m < 2^256: no carry out
    s2cols = a + b + _bcast_const(rm_const, a)
    s2 = resolve_carries(s2cols, extra=1)
    overflow = s2[..., -1, :] != 0
    return select(overflow, s2[..., :-1, :], s)


def mod_sub(a, b, m_const):
    """(a - b) mod m: d = a-b (two's complement) and d2 = a-b+m; select on
    the borrow."""
    compl = _complement(b)
    cols1 = a + compl
    cols1 = jnp.concatenate([(cols1[..., :1, :] + 1), cols1[..., 1:, :]], axis=-2)
    r1 = resolve_carries(cols1, extra=1)
    cols2 = cols1 + _bcast_const(np.asarray(m_const).reshape(NLIMBS, 1), a)
    r2 = resolve_carries(cols2, extra=1)
    borrow = r1[..., -1, :] == 0  # no carry-out -> a < b
    return select(borrow, r2[..., :-1, :], r1[..., :-1, :])


def mod_neg(a, m_const):
    m = _bcast_const(np.asarray(m_const).reshape(NLIMBS, 1), a)
    d, _ = sub_limbs(m, a)
    # -0 = 0 (cf. U256::neg, src/arith.rs:266-273)
    return select(is_zero(a), a, d)


def mod_double(a, m_const):
    return mod_add(a, a, m_const)


# ---------------------------------------------------------------------------
# Montgomery multiplication (convolution + separated REDC at word 2^16)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _conv_tensor(la: int, lb: int):
    """W[s, k, i, j]: one-hot anti-diagonal tensors for the lo (i+j==k) and
    hi (i+j+1==k) halves of 32-bit limb products."""
    n = la + lb
    w = np.zeros((2, n, la, lb), dtype=np.uint32)
    for i in range(la):
        for j in range(lb):
            w[0, i + j, i, j] = 1
            w[1, i + j + 1, i, j] = 1
    return w


def limb_conv(a, b):
    """Unnormalized product columns of two limb tensors.

    a: (..., La, B), b: (..., Lb, B) with limbs < 2^16.  Returns
    (..., La+Lb, B) uint32 columns, each < 2^22.
    """
    la, lb = a.shape[-2], b.shape[-2]
    w = jnp.asarray(_conv_tensor(la, lb))
    p = a[..., :, None, :] * b[..., None, :, :]  # (..., La, Lb, B)
    lo = p & _MASK
    hi = p >> LIMB_BITS
    return jnp.einsum("kij,...ijb->...kb", w[0], lo) + jnp.einsum(
        "kij,...ijb->...kb", w[1], hi
    )


def mont_mul_jnp(a, b, m_limbs: np.ndarray, inv: int, nprime_limbs: np.ndarray = None):
    """Montgomery product a*b*R^-1 mod m, R = 2^256.  Result < m.

    a, b: (..., L, B) uint32 limbs in [0, m).  m_limbs: host (L,) limbs of m.
    nprime_limbs: host (L,) limbs of -m^-1 mod 2^256 (derived if omitted).

    Separated REDC: T = a*b; mu = (T mod R)*N' mod R; res = (T + mu*m)/R,
    then one conditional subtract (result < 2m).  Same mathematics as the
    reference's mul_reduce (HAC 14.32, src/arith.rs:481-503), restructured
    so the heavy contraction is one dot per conv and carries resolve in
    log-depth.
    """
    L = NLIMBS
    assert a.shape[-2] == L and b.shape[-2] == L
    if nprime_limbs is None:
        from bn_tpu import params as _P

        m_int = _P.limbs_to_int(m_limbs)
        nprime_limbs = _P.int_to_limbs((-_P.inv_mod(m_int, _P.R_MONT)) % _P.R_MONT)

    m_bcast = np.asarray(m_limbs).reshape(L, 1)
    np_bcast = np.asarray(nprime_limbs).reshape(L, 1)

    # 1. full product columns (2L), entries < 2^21
    t_cols = limb_conv(a, b)

    # 2. low half normalized exactly (carry absorbed into column L)
    t_low_n = resolve_carries(t_cols[..., :L, :], extra=1)
    t_low, c16 = t_low_n[..., :L, :], t_low_n[..., L, :]

    # 3. mu = (T mod R) * N' mod R  (only low L columns; carries stay inside)
    mu_cols = limb_conv(t_low, _bcast_const(np_bcast, t_low))[..., :L, :]
    mu = resolve_carries(mu_cols, extra=0)

    # 4. U = mu * m
    u_cols = limb_conv(mu, _bcast_const(m_bcast, mu))

    # 5. (T + U) / R: the low halves sum to 0 mod R; recover their carry-out
    s_low = resolve_carries(t_low + u_cols[..., :L, :], extra=1)
    c_s = s_low[..., L, :]
    hi_cols = t_cols[..., L:, :] + u_cols[..., L:, :]
    hi_cols = jnp.concatenate(
        [hi_cols[..., :1, :] + (c16 + c_s)[..., None, :], hi_cols[..., 1:, :]],
        axis=-2,
    )
    res_n = resolve_carries(hi_cols, extra=1)
    res, c_out = res_n[..., :L, :], res_n[..., L, :]

    # 6. result < 2m -> one conditional subtract (c_out provably 0)
    d, borrow = sub_limbs(res, _bcast_const(m_bcast, res))
    return select((borrow == 0) | (c_out != 0), d, res)
