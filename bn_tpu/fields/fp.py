"""Prime fields Fq and Fr in Montgomery form over batched limb tensors.

TPU-native analogue of the reference's `field_impl!` macro
(reference: src/fields/fp.rs:9-177).  A field element batch is a (..., L, B)
uint32 tensor in Montgomery form (R = 2^256), so device values are
bit-identical to the reference's internal representation.

Division/inversion uses Fermat exponentiation a^(m-2) with a fixed windowed
schedule rather than the reference's branchy binary EEA (src/arith.rs:281-327)
— branchless and batchable, per SURVEY.md §7's design stance.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from bn_tpu import params as P
from bn_tpu.ops import limbs as lb
from bn_tpu.ops.backend import get_mont_mul, use_pallas


@dataclasses.dataclass(frozen=True)
class FpSpec:
    """Static per-field constants (host side)."""

    name: str
    modulus: int
    inv: int  # -modulus^-1 mod 2^16
    r1: int  # R mod m (Montgomery one)
    r2: int  # R^2 mod m
    r3: int  # R^3 mod m

    @functools.cached_property
    def m_limbs(self) -> np.ndarray:
        return P.int_to_limbs(self.modulus)

    @functools.cached_property
    def m_const(self) -> np.ndarray:
        return lb.const_limbs(self.m_limbs)

    @functools.cached_property
    def one_const(self) -> np.ndarray:
        """Montgomery one (= R mod m), shaped (L, 1) for broadcasting."""
        return lb.const_limbs(P.int_to_limbs(self.r1))

    @functools.cached_property
    def r2_const(self) -> np.ndarray:
        return lb.const_limbs(P.int_to_limbs(self.r2))


FQ = FpSpec("Fq", P.Q, P.FQ_INV, P.FQ_R1, P.FQ_R2, P.FQ_R3)
FR = FpSpec("Fr", P.R_SCALAR, P.FR_INV, P.FR_R1, P.FR_R2, P.FR_R3)


# ---------------------------------------------------------------------------
# device ops (Montgomery domain)
# ---------------------------------------------------------------------------


def add(spec: FpSpec, a, b):
    if use_pallas():
        from bn_tpu.ops.mont_pallas import mod_add_pallas

        return mod_add_pallas(a, b, spec.m_limbs)
    return lb.mod_add(a, b, spec.m_const)


def sub(spec: FpSpec, a, b):
    if use_pallas():
        from bn_tpu.ops.mont_pallas import mod_sub_pallas

        return mod_sub_pallas(a, b, spec.m_limbs)
    return lb.mod_sub(a, b, spec.m_const)


def neg(spec: FpSpec, a):
    if use_pallas():
        from bn_tpu.ops.mont_pallas import mod_neg_pallas

        return mod_neg_pallas(a, spec.m_limbs)
    return lb.mod_neg(a, spec.m_const)


def double(spec: FpSpec, a):
    return add(spec, a, a)


def mul(spec: FpSpec, a, b):
    # optimization_barrier works around an XLA:TPU miscompile observed when a
    # stack of slices of a larger tower tensor is fused directly into the
    # multiply's operand reshapes (wrong products at batch >= 1024; verified
    # deterministic and fixed by materializing operands — see tests/test_tower.py
    # ::test_fq12_mul_slice_stack_regression).
    a, b = jax.lax.optimization_barrier((a, b))
    return get_mont_mul()(a, b, spec.m_limbs, spec.inv)


def sqr(spec: FpSpec, a):
    return mul(spec, a, a)


def mul_many(spec: FpSpec, pairs):
    """Compute many independent Fq products with ONE mont_mul call site.

    pairs: list of (a, b) tensors of identical shape (..., L, B).  Stacking
    the operands keeps the traced program small (one kernel instantiation)
    and feeds the VPU a wide batch — the core trace/throughput trick of this
    framework (SURVEY.md §7 'hard parts' #2).
    """
    if len(pairs) == 1:
        return [mul(spec, *pairs[0])]
    a = jnp.stack([p[0] for p in pairs])
    b = jnp.stack([p[1] for p in pairs])
    a, b = jax.lax.optimization_barrier((a, b))
    c = mul(spec, a, b)
    return [c[i] for i in range(len(pairs))]


def zeros(spec: FpSpec, batch_shape) -> jnp.ndarray:
    return jnp.zeros(tuple(batch_shape[:-1]) + (P.NLIMBS, batch_shape[-1]), dtype=jnp.uint32)


def ones(spec: FpSpec, batch_shape) -> jnp.ndarray:
    one = jnp.asarray(spec.one_const, dtype=jnp.uint32)
    return jnp.broadcast_to(
        one, tuple(batch_shape[:-1]) + (P.NLIMBS, batch_shape[-1])
    ).copy()


def mul_small(spec: FpSpec, a, k: int):
    """Multiply by a small positive integer via double-and-add on mod ops
    (used for the 3x / 8x / 9x constants in curve and tower formulas)."""
    assert k >= 1
    bits = P.bits_msb_first(k)
    res = a
    for bit in bits[1:]:
        res = double(spec, res)
        if bit:
            res = add(spec, res, a)
    return res


# ---------------------------------------------------------------------------
# fixed-exponent powering and Fermat inversion
# ---------------------------------------------------------------------------

_WINDOW = 4


@functools.lru_cache(maxsize=None)
def _digit_schedule(e: int):
    """Big-endian base-16 digits of e, leading zeros stripped."""
    assert e > 0
    digits = []
    nd = (e.bit_length() + _WINDOW - 1) // _WINDOW
    for i in range(nd - 1, -1, -1):
        digits.append((e >> (i * _WINDOW)) & (2**_WINDOW - 1))
    return np.asarray(digits, dtype=np.int32)


def pow_fixed(spec: FpSpec, a, e: int):
    """a^e (Montgomery domain) for a compile-time exponent e.

    Windowed square-and-multiply: res = res^16 * table[d].  Because the
    Montgomery one is a true multiplicative identity under mont_mul, the
    d = 0 slot needs no special-casing (no select).  Replaces the reference's
    branchy FieldElement::pow (src/fields/mod.rs:35-46) with a branchless,
    scan-compiled ladder.
    """
    if e == 0:
        return ones(spec, a.shape[:-2] + a.shape[-1:])
    import os

    if (
        use_pallas()
        and e.bit_length() > 3 * _WINDOW
        and os.environ.get("BN_TPU_POW_FUSED", "1") != "0"
    ):
        # Fused chunked ladder: ~330 sequential tiny kernels (5 per digit)
        # become ~12, with all intermediates in registers — same windowed
        # schedule, bit-identical results (see mont_pallas.pow_fixed_pallas).
        from bn_tpu.ops.mont_pallas import pow_fixed_pallas

        return pow_fixed_pallas(a, e, spec.m_limbs, spec.inv, spec.one_const)
    digits = _digit_schedule(e)
    one = ones(spec, a.shape[:-2] + a.shape[-1:])

    # table[k] = a^k, table[0] = one; built under a scan so the traced
    # program holds ONE multiply instead of 14 (compile-time, not runtime)
    def _tstep(prev, _):
        nxt = mul(spec, prev, a)
        return nxt, nxt

    _, tail = jax.lax.scan(_tstep, one, None, length=2**_WINDOW - 1)
    table = jnp.concatenate([one[None], tail], axis=0)  # (16, ..., L, B)

    res = table[digits[0]]

    def body(res, d):
        res = sqr(spec, res)
        res = sqr(spec, res)
        res = sqr(spec, res)
        res = sqr(spec, res)
        res = mul(spec, res, jnp.take(table, d, axis=0))
        return res, None

    if len(digits) > 1:
        res, _ = jax.lax.scan(body, res, jnp.asarray(digits[1:]))
    return res


def inv(spec: FpSpec, a):
    """Multiplicative inverse by Fermat: a^(m-2).  Maps 0 -> 0.

    Replaces the reference's per-element binary EEA (src/arith.rs:281-327),
    which is divergent and TPU-hostile (SURVEY.md §7).  Montgomery batch
    inversion is intentionally not used: one Fermat chain is fully parallel
    across the batch, while the Montgomery trick serializes across it.
    """
    return pow_fixed(spec, a, spec.modulus - 2)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def to_device(spec: FpSpec, values) -> jnp.ndarray:
    """Pack canonical ints into Montgomery-form (L, B) limbs."""
    monts = [P.to_mont(v % spec.modulus, spec.modulus) for v in values]
    return jnp.asarray(P.ints_to_limbs(monts))


def from_device(spec: FpSpec, arr) -> list:
    """Unpack Montgomery-form (L, B) limbs into canonical ints."""
    arr = np.asarray(arr)
    return [P.from_mont(v, spec.modulus) for v in P.limbs_to_ints(arr)]
