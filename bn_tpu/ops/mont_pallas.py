"""Fused Pallas TPU kernel for batched Montgomery multiplication.

The hot op of the whole framework (SURVEY.md §7 'hard parts' #1): every tower
multiply funnels into one call of this kernel over a wide stacked batch.

Layout: logical tensors are (..., L, B) uint32 (limbs × batch).  The wrapper
flattens every leading axis into the batch, pads to a block multiple, and
reshapes to (L, nblk, 8, 128) so that inside the kernel each limb is a full
(8, 128) VPU tile — limbs unroll in registers, the batch fills sublanes AND
lanes.  The kernel runs the same word-2^16 CIOS recurrence as the reference's
mul_reduce (HAC 14.32; reference: src/arith.rs:481-503), unrolled at trace
time: every partial t[j] + a_i*b_j + c fits uint32 exactly.

One kernel instantiation serves every call site (the grid only varies in
length), so XLA sees a single custom call per tower op.
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


def _mont_kernel(a_ref, b_ref, out_ref, *, q, inv):
    """CIOS over registers; refs are (L, 1, 8, 128), each limb an (8, 128) tile."""
    L = NLIMBS
    a = [a_ref[i, 0] for i in range(L)]
    b = [b_ref[i, 0] for i in range(L)]
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

    # conditional subtract: res - q with borrow chain
    borrow = zero
    d = [None] * L
    bias = np.uint32(1 << LIMB_BITS)
    for j in range(L):
        s = bias + t[j] - q[j] - borrow
        d[j] = s & _MASK
        borrow = np.uint32(1) - (s >> LIMB_BITS)
    take_d = (borrow == 0) | (t_hi != 0)
    for j in range(L):
        out_ref[j, 0] = jnp.where(take_d, d[j], t[j])


@functools.lru_cache(maxsize=None)
def _kernel_for(q_tuple, inv):
    q = [np.uint32(v) for v in q_tuple]
    body = functools.partial(_mont_kernel, q=q, inv=np.uint32(inv))

    @jax.jit
    def run(a4, b4):
        nblk = a4.shape[1]
        spec = pl.BlockSpec(
            (NLIMBS, 1, SUBLANES, LANES),
            lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct(a4.shape, a4.dtype),
            grid=(nblk,),
            in_specs=[spec, spec],
            out_specs=spec,
        )(a4, b4)

    return run


def mont_mul_pallas(a, b, m_limbs: np.ndarray, inv: int, nprime_limbs=None):
    """Drop-in replacement for mont_mul_jnp on TPU."""
    out_shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, out_shape)
    b = jnp.broadcast_to(b, out_shape)
    L = NLIMBS
    assert out_shape[-2] == L

    B = out_shape[-1]
    # flatten leading axes into the batch: (..., L, B) -> (L, prod(lead)*B)
    a2 = jnp.moveaxis(a.reshape((-1, L, B)), 1, 0).reshape(L, -1)
    b2 = jnp.moveaxis(b.reshape((-1, L, B)), 1, 0).reshape(L, -1)
    total = a2.shape[1]
    pad = (-total) % BLOCK_B
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
    nblk = a2.shape[1] // BLOCK_B
    a4 = a2.reshape(L, nblk, SUBLANES, LANES)
    b4 = b2.reshape(L, nblk, SUBLANES, LANES)

    run = _kernel_for(tuple(int(v) for v in m_limbs), int(inv))
    o4 = run(a4, b4)

    o2 = o4.reshape(L, -1)
    if pad:
        o2 = o2[:, :total]
    return jnp.moveaxis(o2.reshape(L, -1, B), 0, 1).reshape(out_shape)
