"""Public API: Fr, G1, G2, Gt, pairing — the reference crate's surface
(reference: src/lib.rs), batch-first.

Every object wraps a device limb tensor with the batch axis last; singleton
use is just batch 1.  Operators dispatch to jitted batched kernels, so
`G1.one(8192) * Fr.random(rng, 8192)` is one fused device program.

Host-side ingestion (from_str / interpret / serialization) uses exact Python
ints, mirroring where the reference converts at the Montgomery boundary
(src/fields/fp.rs:15-74).
"""

from __future__ import annotations

import functools
import random as _random

import numpy as np

import jax
import jax.numpy as jnp

from bn_tpu import ate as _pairing_mod, curve, oracle as O, params as P
from bn_tpu import serialization as _ser
from bn_tpu.fields import fp, tower


def _rng(seed_or_rng):
    if isinstance(seed_or_rng, _random.Random):
        return seed_or_rng
    return _random.Random(seed_or_rng)


@functools.lru_cache(maxsize=None)
def _jit(fn_name):
    table = {
        "fr_add": lambda a, b: fp.add(fp.FR, a, b),
        "fr_sub": lambda a, b: fp.sub(fp.FR, a, b),
        "fr_mul": lambda a, b: fp.mul(fp.FR, a, b),
        "fr_neg": lambda a: fp.neg(fp.FR, a),
        "fr_inv": lambda a: fp.inv(fp.FR, a),
        "g1_add": lambda p, q: curve.add(curve.g1_spec(), p, q),
        "g2_add": lambda p, q: curve.add(curve.g2_spec(), p, q),
        "g1_neg": lambda p: curve.neg(curve.g1_spec(), p),
        "g2_neg": lambda p: curve.neg(curve.g2_spec(), p),
        "g1_mul": lambda p, k: curve.mul(curve.g1_spec(), p, k),
        "g2_mul": lambda p, k: curve.mul(curve.g2_spec(), p, k),
        "g1_eq": lambda p, q: curve.eq(curve.g1_spec(), p, q),
        "g2_eq": lambda p, q: curve.eq(curve.g2_spec(), p, q),
        "g1_norm": lambda p: curve.to_affine(curve.g1_spec(), p),
        "g2_norm": lambda p: curve.to_affine(curve.g2_spec(), p),
        "gt_mul": tower.fq12_mul,
        "gt_inv": tower.fq12_inv,
        "pairing": _pairing_mod.pairing_batch,
        "fr_pow": _fr_pow_impl,
        "gt_pow": _gt_pow_impl,
    }
    return jax.jit(table[fn_name])


def _fr_pow_impl(a, e_mont):
    bits = curve.scalar_bits(e_mont)
    one = fp.ones(fp.FR, a.shape[:-2] + a.shape[-1:])

    def body(res, bit):
        res = fp.sqr(fp.FR, res)
        res_mul = fp.mul(fp.FR, res, a)
        return jnp.where((bit != 0)[..., None, :], res_mul, res), None

    res, _ = jax.lax.scan(body, one, bits)
    return res


def _gt_pow_impl(a, e_mont):
    bits = curve.scalar_bits(e_mont)
    return tower.fq12_pow_fr(a, jnp.moveaxis(bits, 0, -2))


class Fr:
    """Scalar field element batch (reference: src/lib.rs:15-54)."""

    def __init__(self, dev):
        self.dev = dev

    @property
    def batch(self):
        return self.dev.shape[-1]

    # constructors ---------------------------------------------------------
    @classmethod
    def zero(cls, n=1):
        return cls(fp.zeros(fp.FR, (n,)))

    @classmethod
    def one(cls, n=1):
        return cls(fp.ones(fp.FR, (n,)))

    @classmethod
    def random(cls, rng, n=1):
        """Uniform mod r via 512-bit reduction (reference: U256::random,
        src/arith.rs:194-198)."""
        r = _rng(rng)
        return cls.from_ints([r.getrandbits(512) % P.R_SCALAR for _ in range(n)])

    @classmethod
    def from_ints(cls, vals):
        return cls(fp.to_device(fp.FR, vals))

    @classmethod
    def from_str(cls, s: str, n=1):
        """Decimal parse (reference: src/fields/fp.rs:39-59); None on junk."""
        if not s or any(c not in "0123456789" for c in s):
            return None
        return cls.from_ints([int(s) % P.R_SCALAR] * n)

    @classmethod
    def interpret(cls, buf: bytes):
        """64 big-endian bytes -> mod-r reduction (reference: fp.rs:72-74)."""
        assert len(buf) == 64
        return cls.from_ints([int.from_bytes(buf, "big") % P.R_SCALAR])

    # ops ------------------------------------------------------------------
    def __add__(self, o):
        return Fr(_jit("fr_add")(self.dev, o.dev))

    def __sub__(self, o):
        return Fr(_jit("fr_sub")(self.dev, o.dev))

    def __mul__(self, o):
        return Fr(_jit("fr_mul")(self.dev, o.dev))

    def __neg__(self):
        return Fr(_jit("fr_neg")(self.dev))

    def inverse(self):
        """None-free batched inverse: zeros map to zero (the reference
        returns None per element, src/lib.rs:25)."""
        return Fr(_jit("fr_inv")(self.dev))

    def pow(self, e: "Fr"):
        return Fr(_jit("fr_pow")(self.dev, e.dev))

    def is_zero(self):
        return np.asarray(jnp.all(self.dev == 0, axis=-2))

    def __eq__(self, o):
        return isinstance(o, Fr) and bool(np.asarray(self.dev == o.dev).all())

    # host I/O -------------------------------------------------------------
    def to_ints(self):
        return fp.from_device(fp.FR, self.dev)

    def to_bytes(self):
        from bn_tpu.utils import native

        if native.available():
            flat = native.fp_encode_batch(
                np.asarray(self.dev).T, native.FIELD_FR
            )
            return [flat[i * 32 : (i + 1) * 32] for i in range(self.batch)]
        return [_ser.encode_fr(v) for v in self.to_ints()]

    @classmethod
    def from_bytes(cls, bufs):
        from bn_tpu.utils import native

        if native.available():
            rows = native.fp_decode_batch(b"".join(bufs), native.FIELD_FR)
            return cls(jnp.asarray(rows.T))
        return cls.from_ints([_ser.decode_fr(b) for b in bufs])


class _GroupBase:
    _spec_fn = None
    _prefix = ""
    _ops = None

    def __init__(self, dev):
        self.dev = dev  # (x, y, z) tuple of limb tensors

    @property
    def batch(self):
        return self.dev[0].shape[-1]

    @classmethod
    def zero(cls, n=1):
        return cls(curve.zero(cls._spec_fn(), (n,)))

    @classmethod
    def one(cls, n=1):
        return cls(curve.one(cls._spec_fn(), (n,)))

    @classmethod
    def random(cls, rng, n=1):
        """one() * Fr::random (reference: src/groups/mod.rs:220-222)."""
        return cls.one(n) * Fr.random(rng, n)

    def __add__(self, o):
        return type(self)(_jit(self._prefix + "_add")(self.dev, o.dev))

    def __sub__(self, o):
        return self + (-o)

    def __neg__(self):
        return type(self)(_jit(self._prefix + "_neg")(self.dev))

    def __mul__(self, k: Fr):
        return type(self)(_jit(self._prefix + "_mul")(self.dev, k.dev))

    def double(self):
        spec = self._spec_fn()
        return type(self)(jax.jit(lambda p: curve.double(spec, p))(self.dev))

    def is_zero(self):
        return np.asarray(curve.is_zero(self._spec_fn(), self.dev))

    def eq(self, o):
        return np.asarray(_jit(self._prefix + "_eq")(self.dev, o.dev))

    def __eq__(self, o):
        return isinstance(o, type(self)) and bool(self.eq(o).all())

    def normalize(self):
        """Affine-normalize in place semantics (z -> 1; infinity unchanged),
        like reference Group::normalize (src/lib.rs:88-95)."""
        spec = self._spec_fn()
        aff = _jit(self._prefix + "_norm")(self.dev)
        inf = curve.is_zero(spec, self.dev)
        p = curve.from_affine(spec, aff, inf_mask=inf)
        # keep the (0,1,0) infinity convention
        F = spec.field
        batch_shape = aff[0].shape[: aff[0].ndim - 2 - F.struct_ndim] + aff[0].shape[-1:]
        y = F.select(inf, F.ones(batch_shape), p[1])
        x = F.select(inf, F.zeros(batch_shape), p[0])
        return type(self)((x, y, p[2]))

    # host I/O -------------------------------------------------------------
    def to_oracle(self):
        return curve.from_device(self._spec_fn(), self.dev)

    @classmethod
    def from_oracle(cls, points):
        return cls(curve.to_device(cls._spec_fn(), points))


class G1(_GroupBase):
    _spec_fn = staticmethod(curve.g1_spec)
    _prefix = "g1"

    def to_bytes(self):
        return [_ser.encode_g1(p) for p in self.to_oracle()]

    @classmethod
    def from_bytes(cls, bufs):
        return cls.from_oracle([_ser.decode_g1(b) for b in bufs])


class G2(_GroupBase):
    _spec_fn = staticmethod(curve.g2_spec)
    _prefix = "g2"

    def to_bytes(self):
        return [_ser.encode_g2(p) for p in self.to_oracle()]

    @classmethod
    def from_bytes(cls, bufs):
        return cls.from_oracle([_ser.decode_g2(b) for b in bufs])


class Gt:
    """Target group element batch (reference: src/lib.rs:165-179 — one/pow/
    inverse/mul only; deliberately no serialization, zero, or random)."""

    def __init__(self, dev):
        self.dev = dev

    @property
    def batch(self):
        return self.dev.shape[-1]

    @classmethod
    def one(cls, n=1):
        return cls(tower.ones12((n,)))

    def __mul__(self, o):
        return Gt(_jit("gt_mul")(self.dev, o.dev))

    def pow(self, e: Fr):
        return Gt(_jit("gt_pow")(self.dev, e.dev))

    def inverse(self):
        return Gt(_jit("gt_inv")(self.dev))

    def __eq__(self, o):
        return isinstance(o, Gt) and bool(np.asarray(self.dev == o.dev).all())

    def to_oracle(self):
        return tower.fq12_from_device(self.dev)


def pairing(p: G1, q: G2) -> Gt:
    """Batched reduced optimal-ate pairing (reference: src/lib.rs:181-183)."""
    return Gt(_jit("pairing")(p.dev, q.dev))


def pairing_batch(p_dev, q_dev):
    """Functional entry on raw device tensors."""
    return _jit("pairing")(p_dev, q_dev)
