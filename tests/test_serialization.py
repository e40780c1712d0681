"""Wire-format round-trips and rejection paths — regenerating the semantics
of the reference's tests/serialization.rs (not mounted upstream; behavior
pinned by the decode paths: src/fields/fp.rs:32-36, src/fields/fq2.rs:40-53,
src/groups/mod.rs:143-205)."""

import random

import pytest

from bn_tpu import oracle as O
from bn_tpu import params as P
from bn_tpu import serialization as S


def test_fr_roundtrip_and_reject():
    random.seed(1)
    for v in [0, 1, P.R_SCALAR - 1] + [random.randrange(P.R_SCALAR) for _ in range(8)]:
        assert S.decode_fr(S.encode_fr(v)) == v
    with pytest.raises(S.DecodeError):
        S.decode_fr(P.R_SCALAR.to_bytes(32, "big"))
    with pytest.raises(S.DecodeError):
        S.decode_fr(((1 << 256) - 1).to_bytes(32, "big"))


def test_fq2_packing():
    """Fq2 packs as the single U512 c1*q + c0 (reference: fq2.rs:31-53)."""
    random.seed(2)
    for _ in range(8):
        v = (random.randrange(P.Q), random.randrange(P.Q))
        enc = S.encode_fq2(v)
        assert len(enc) == 64
        assert int.from_bytes(enc, "big") == v[1] * P.Q + v[0]
        assert S.decode_fq2(enc) == v
    with pytest.raises(S.DecodeError):
        S.decode_fq2((P.Q * P.Q).to_bytes(64, "big"))
    # q^2 - 1 is valid (c1 = q-1, c0 = q-1)
    assert S.decode_fq2((P.Q * P.Q - 1).to_bytes(64, "big")) == (P.Q - 1, P.Q - 1)


def test_g1_roundtrip():
    random.seed(3)
    for k in [1, 2, random.randrange(P.R_SCALAR)]:
        p = O.g1_mul(O.G1_ONE, k)
        enc = S.encode_g1(p)
        assert enc[0] == 4 and len(enc) == 65
        assert O.g_eq(O.FQ_OPS, S.decode_g1(enc), p)
    z = O.g_zero(O.FQ_OPS)
    assert S.encode_g1(z) == b"\x00"
    assert O.g_is_zero(O.FQ_OPS, S.decode_g1(b"\x00"))


def test_g2_roundtrip():
    random.seed(4)
    p = O.g2_mul(O.G2_ONE, random.randrange(P.R_SCALAR))
    enc = S.encode_g2(p)
    assert enc[0] == 4 and len(enc) == 129
    assert O.g_eq(O.FQ2_OPS, S.decode_g2(enc), p)
    assert S.encode_g2(O.g_zero(O.FQ2_OPS)) == b"\x00"


def test_g1_rejects():
    with pytest.raises(S.DecodeError):
        S.decode_g1(bytes([7]) + bytes(64))  # bad tag
    # off-curve point: x=0, y=1 -> 1 != 0 + 3
    with pytest.raises(S.DecodeError):
        S.decode_g1(bytes([4]) + (0).to_bytes(32, "big") + (1).to_bytes(32, "big"))
    # non-canonical coordinate (>= q)
    with pytest.raises(S.DecodeError):
        S.decode_g1(bytes([4]) + P.Q.to_bytes(32, "big") + (2).to_bytes(32, "big"))


def test_g2_rejects_off_curve_and_out_of_subgroup():
    """The consensus-critical G2 check_order path (reference:
    src/groups/mod.rs:186-195, 399): an on-curve E'(Fq2) point outside the
    r-order subgroup must be rejected on decode."""
    # Hensel-style point search: walk x candidates, solve y^2 = x^3 + b' with
    # a real Fq2 square root (norm/complex method). E'(Fq2) has order r * c2
    # with cofactor c2 = 2q - r > 1, so a generic curve point is out of the
    # subgroup with overwhelming probability.
    found = None
    for i in range(1, 200):
        x = (i, 1)
        rhs = O.fq2_add(O.fq2_mul(O.fq2_sq(x), x), O.twist_b())
        y = O.fq2_sqrt(rhs)
        if y is None:
            continue
        assert O.fq2_sq(y) == rhs
        if not O.g2_in_subgroup((x, y)):
            found = (x, y)
            break
    assert found is not None, "no out-of-subgroup point found in 200 candidates"
    x, y = found
    assert O.g2_on_curve((x, y))
    with pytest.raises(S.DecodeError):
        S.decode_g2(bytes([4]) + S.encode_fq2(x) + S.encode_fq2(y))
    # off-curve reject
    with pytest.raises(S.DecodeError):
        S.decode_g2(bytes([4]) + S.encode_fq2((0, 0)) + S.encode_fq2((1, 1)))
