"""Limb engine vs exact Python-int arithmetic (analogue of the reference's
arith.rs inline tests, src/arith.rs:505-666)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bn_tpu import params as P
from bn_tpu.ops import limbs as L

Q = P.Q
QL = P.int_to_limbs(Q)
QC = L.const_limbs(QL)
RINV = P.inv_mod(P.R_MONT, Q)


def dev(ints):
    return jnp.asarray(P.ints_to_limbs(ints))


def host(arr):
    return P.limbs_to_ints(np.asarray(arr))


@pytest.fixture(scope="module")
def rng():
    random.seed(1234)
    return random


def test_add_sub_neg(rng):
    xs = [rng.randrange(Q) for _ in range(16)] + [0, 1, Q - 1, Q - 2]
    ys = [rng.randrange(Q) for _ in range(16)] + [0, Q - 1, Q - 1, 1]
    a, b = dev(xs), dev(ys)
    assert host(jax.jit(lambda a, b: L.mod_add(a, b, QC))(a, b)) == [
        (x + y) % Q for x, y in zip(xs, ys)
    ]
    assert host(jax.jit(lambda a, b: L.mod_sub(a, b, QC))(a, b)) == [
        (x - y) % Q for x, y in zip(xs, ys)
    ]
    assert host(jax.jit(lambda a: L.mod_neg(a, QC))(a)) == [(-x) % Q for x in xs]


def test_geq_eq_iszero(rng):
    xs = [rng.randrange(Q) for _ in range(8)] + [0, 5, Q - 1]
    ys = [rng.randrange(Q) for _ in range(8)] + [0, 5, 0]
    a, b = dev(xs), dev(ys)
    assert list(np.asarray(jax.jit(L.geq)(a, b))) == [x >= y for x, y in zip(xs, ys)]
    assert list(np.asarray(jax.jit(L.eq)(a, b))) == [x == y for x, y in zip(xs, ys)]
    assert list(np.asarray(jax.jit(L.is_zero)(a))) == [x == 0 for x in xs]


def test_mont_mul(rng):
    xs = [rng.randrange(Q) for _ in range(32)] + [0, 1, Q - 1, Q - 1]
    ys = [rng.randrange(Q) for _ in range(32)] + [0, Q - 1, Q - 1, 1]
    a, b = dev(xs), dev(ys)
    got = host(jax.jit(lambda a, b: L.mont_mul_jnp(a, b, QL, P.FQ_INV))(a, b))
    assert got == [(x * y * RINV) % Q for x, y in zip(xs, ys)]


def test_mont_mul_leading_axes(rng):
    xs = [rng.randrange(Q) for _ in range(4)]
    ys = [rng.randrange(Q) for _ in range(4)]
    a = jnp.stack([dev(xs), dev(ys)])
    b = jnp.stack([dev(ys), dev(xs)])
    got = np.asarray(jax.jit(lambda a, b: L.mont_mul_jnp(a, b, QL, P.FQ_INV))(a, b))
    expect = [(x * y * RINV) % Q for x, y in zip(xs, ys)]
    assert P.limbs_to_ints(got[0]) == expect
    assert P.limbs_to_ints(got[1]) == expect


def test_resolve_carries_extremes():
    # all-max columns exercise full propagate chains
    cols = jnp.full((4, 3), 0x3FFFFFF, dtype=jnp.uint32)  # 2^26-1 < 2^27
    out = np.asarray(L.resolve_carries(cols, extra=2))
    vals = P.limbs_to_int(out[:, 0])
    expect = sum((0x3FFFFFF) << (16 * i) for i in range(4))
    assert vals == expect


def test_divrem_edge_vectors():
    """Host-side 512/256 divrem edge cases (reference: src/arith.rs:519-666)."""
    # q as a 512-bit value: 1*q + 0
    c1, c0 = divmod(Q, Q)
    assert (c1, c0) == (1, 0)
    # q^2 - 1 = (q-1) q + (q-1); q^2 -> quotient == q (invalid as U256 result)
    c1, c0 = divmod(Q * Q - 1, Q)
    assert c1 == Q - 1 and c0 == Q - 1
    c1, c0 = divmod(Q * Q - 2, Q)
    assert c1 == Q - 1 and c0 == Q - 2
    # all-ones 512-bit value: remainder matches the reference vector
    allones = (1 << 512) - 1
    assert allones % Q == P.u64x4_to_int(
        [0xF32CFC5B538AFA88, 0xB5E71911D44501FB, 0x47AB1EFF0A417FF6, 0x06D89F71CAB8351F]
    )
    assert (Q * Q) % Q == 0
    assert (Q * Q + 1) % Q == 1
