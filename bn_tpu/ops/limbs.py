"""Batched 256-bit modular limb arithmetic on (..., L, B) uint32 tensors.

This is the TPU-native analogue of the reference's u64 limb kernels
(reference: src/arith.rs:397-503): field elements are columns of L=16 16-bit
limbs stored in uint32, with the batch axis last (mapped to TPU vector lanes).
All operations are branchless (masks/selects instead of the reference's
data-dependent branches, cf. SURVEY.md §7) and vectorize over any leading
batch/structure axes.

Montgomery multiplication follows CIOS (the same HAC 14.32 family as the
reference's mul_reduce, src/arith.rs:481-503) at word size 2^16 so that every
partial sum t[j] + a_i*b_j + c fits exactly in uint32.

Two interchangeable implementations are provided:
  - the pure-jnp path here (reference semantics, runs everywhere), and
  - a fused Pallas TPU kernel (bn_tpu.ops.mont_pallas), selected via
    bn_tpu.ops.backend.
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
# carry / borrow chains
# ---------------------------------------------------------------------------


def _split(s):
    return s & _MASK, s >> LIMB_BITS


def add_limbs(a, b):
    """a + b with full carry propagation; returns (sum_limbs, carry_out).

    a, b: (..., L, B) with limbs < 2^16.  carry_out: (..., B).
    """
    outs = []
    c = jnp.zeros(a.shape[:-2] + a.shape[-1:], dtype=U32)
    for i in range(a.shape[-2]):
        lo, c = _split(a[..., i, :] + b[..., i, :] + c)
        outs.append(lo)
    return jnp.stack(outs, axis=-2), c


def sub_limbs(a, b):
    """a - b with borrow propagation; returns (diff_limbs, borrow_out).

    borrow_out is 1 (uint32) iff a < b.  Mirrors sbb (src/arith.rs:419-439)
    but at 16-bit words using the +2^16 bias trick.
    """
    outs = []
    borrow = jnp.zeros(a.shape[:-2] + a.shape[-1:], dtype=U32)
    bias = np.uint32(1 << LIMB_BITS)
    for i in range(a.shape[-2]):
        t = bias + a[..., i, :] - b[..., i, :] - borrow
        outs.append(t & _MASK)
        borrow = np.uint32(1) - (t >> LIMB_BITS)
    return jnp.stack(outs, axis=-2), borrow


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


def mod_add(a, b, m_const):
    s, _ = add_limbs(a, b)  # carry always 0: a, b < m < 2^255
    d, borrow = sub_limbs(s, jnp.asarray(m_const, dtype=U32))
    return select(borrow == 0, d, s)


def mod_sub(a, b, m_const):
    d, borrow = sub_limbs(a, b)
    # if a < b, add back the modulus (the add's carry cancels the borrow)
    d2, _ = add_limbs(d, jnp.broadcast_to(jnp.asarray(m_const, dtype=U32), d.shape))
    return select(borrow != 0, d2, d)


def mod_neg(a, m_const):
    m = jnp.broadcast_to(jnp.asarray(m_const, dtype=U32), a.shape)
    d, _ = sub_limbs(m, a)
    # -0 = 0 (cf. U256::neg, src/arith.rs:266-273)
    return select(is_zero(a), a, d)


def mod_double(a, m_const):
    return mod_add(a, a, m_const)


# ---------------------------------------------------------------------------
# Montgomery multiplication (convolution + separated REDC at word 2^16)
# ---------------------------------------------------------------------------
#
# Rather than the reference's interleaved CIOS (src/arith.rs:481-503), which
# unrolls to O(L^2) sequential MAC steps, we compute limb products as a single
# outer product contracted against a static anti-diagonal one-hot tensor (a
# 1-D convolution phrased as einsum — maps to one XLA dot), followed by short
# carry-propagation chains.  Column sums stay < 2^22 because each 32-bit
# product is split into 16-bit halves before contraction, so everything is
# exact in uint32/int32 (and in f32 on the MXU: < 2^24).


@np.errstate(over="ignore")
def _conv_tensor(la: int, lb: int) -> np.ndarray:
    """W[k, i, j] one-hot tensors for lo (i+j==k) and hi (i+j+1==k) halves,
    combined as a (2, la+lb, la, lb) float-free uint32 tensor."""
    n = la + lb
    w = np.zeros((2, n, la, lb), dtype=np.uint32)
    for i in range(la):
        for j in range(lb):
            w[0, i + j, i, j] = 1
            w[1, i + j + 1, i, j] = 1
    return w


@functools.lru_cache(maxsize=None)
def _conv_tensor_cached(la: int, lb: int):
    return _conv_tensor(la, lb)


def limb_conv(a, b):
    """Unnormalized product columns of two limb tensors.

    a: (..., La, B), b: (..., Lb, B) with limbs < 2^16.  Returns
    (..., La+Lb, B) uint32 columns, each < 2^22 (sum of <= 2*min(La,Lb)
    halves of 16 bits).
    """
    la, lb = a.shape[-2], b.shape[-2]
    w = jnp.asarray(_conv_tensor_cached(la, lb))
    p = a[..., :, None, :] * b[..., None, :, :]  # (..., La, Lb, B) full 32-bit
    lo = p & _MASK
    hi = p >> LIMB_BITS
    cols = jnp.einsum("kij,...ijb->...kb", w[0], lo) + jnp.einsum(
        "kij,...ijb->...kb", w[1], hi
    )
    return cols


def carry_chain(cols, n_out: int, carry_in=None):
    """Propagate carries through unnormalized columns (each < 2^27).

    Returns (limbs (..., n_out, B) each < 2^16, carry_out (..., B)).
    Columns beyond cols.shape[-2] are treated as zero.
    """
    ncols = cols.shape[-2]
    assert n_out <= ncols
    outs = []
    c = carry_in
    for k in range(n_out):
        t = cols[..., k, :]
        if c is not None:
            t = t + c
        outs.append(t & _MASK)
        c = t >> LIMB_BITS
    return jnp.stack(outs, axis=-2), c


def mont_mul_jnp(a, b, m_limbs: np.ndarray, inv: int, nprime_limbs: np.ndarray = None):
    """Montgomery product a*b*R^-1 mod m, R = 2^256.  Result < m.

    a, b: (..., L, B) uint32 limbs in [0, m).  m_limbs: host (L,) limbs of m.
    nprime_limbs: host (L,) limbs of -m^-1 mod 2^256 (derived if omitted).

    Separated REDC: T = a*b; m_ = (T mod R)*N' mod R; res = (T + m_*m)/R,
    then one conditional subtract (result < 2m).  Same mathematics as the
    reference's mul_reduce (HAC 14.32, src/arith.rs:481-503), restructured
    so the heavy contraction is a single dot and the sequential carry chains
    total ~4L steps instead of ~2L^2 MACs.
    """
    L = NLIMBS
    assert a.shape[-2] == L and b.shape[-2] == L
    if nprime_limbs is None:
        from bn_tpu import params as _P

        m_int = _P.limbs_to_int(m_limbs)
        nprime_limbs = _P.int_to_limbs((-_P.inv_mod(m_int, _P.R_MONT)) % _P.R_MONT)

    m_bcast = jnp.asarray(m_limbs.reshape(L, 1), dtype=U32)
    np_bcast = jnp.asarray(nprime_limbs.reshape(L, 1), dtype=U32)

    # 1. full product columns (2L of them)
    t_cols = limb_conv(a, b)

    # 2. normalize the low half (needed exactly, for step 3)
    t_low, c16 = carry_chain(t_cols[..., :L, :], L)

    # 3. m_ = (T mod R) * N' mod R
    m_cols = limb_conv(t_low, jnp.broadcast_to(np_bcast, t_low.shape))
    m_, _ = carry_chain(m_cols[..., :L, :], L)  # carry out dropped: mod R

    # 4. U = m_ * m
    u_cols = limb_conv(m_, jnp.broadcast_to(m_bcast, m_.shape))

    # 5. (T + U) / R: low halves sum to 0 mod R; recover their carry-out
    _, c_s = carry_chain(t_low + u_cols[..., :L, :], L)
    hi_cols = t_cols[..., L:, :] + u_cols[..., L:, :]
    res, c_out = carry_chain(hi_cols, L, carry_in=c16 + c_s)

    # 6. result < 2m -> one conditional subtract (c_out provably 0: 2m < 2^255)
    d, borrow = sub_limbs(res, jnp.broadcast_to(m_bcast, res.shape))
    return select((borrow == 0) | (c_out != 0), d, res)
