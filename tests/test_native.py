"""C++ host codec vs the Python-int reference paths."""

import random

import numpy as np
import pytest

from bn_tpu import params as P
from bn_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable (no toolchain)"
)


def test_fp_decode_encode_roundtrip():
    random.seed(21)
    for field, m in ((native.FIELD_FQ, P.Q), (native.FIELD_FR, P.R_SCALAR)):
        xs = [random.randrange(m) for _ in range(64)] + [0, 1, m - 1]
        data = b"".join(v.to_bytes(32, "big") for v in xs)
        rows = native.fp_decode_batch(data, field)
        expect = np.stack([P.int_to_limbs(P.to_mont(v, m)) for v in xs])
        assert np.array_equal(rows, expect)
        assert native.fp_encode_batch(rows, field) == data


def test_fp_decode_rejects():
    with pytest.raises(ValueError):
        native.fp_decode_batch(P.Q.to_bytes(32, "big"), native.FIELD_FQ)
    with pytest.raises(ValueError):
        native.fp_decode_batch(
            ((1 << 256) - 1).to_bytes(32, "big"), native.FIELD_FR
        )


def test_fq2_roundtrip_and_reject():
    random.seed(22)
    pairs = [(random.randrange(P.Q), random.randrange(P.Q)) for _ in range(32)]
    pairs += [(0, 0), (P.Q - 1, P.Q - 1)]
    data = b"".join((c1 * P.Q + c0).to_bytes(64, "big") for c0, c1 in pairs)
    rows = native.fq2_decode_batch(data)
    exp0 = np.stack([P.int_to_limbs(P.to_mont(c0, P.Q)) for c0, _ in pairs])
    exp1 = np.stack([P.int_to_limbs(P.to_mont(c1, P.Q)) for _, c1 in pairs])
    assert np.array_equal(rows[:, :16], exp0)
    assert np.array_equal(rows[:, 16:], exp1)
    assert native.fq2_encode_batch(rows) == data
    with pytest.raises(ValueError):
        native.fq2_decode_batch((P.Q * P.Q).to_bytes(64, "big"))


def test_interpret_matches_python():
    random.seed(23)
    bufs = [random.getrandbits(512).to_bytes(64, "big") for _ in range(16)]
    rows = native.fp_interpret_batch(b"".join(bufs), native.FIELD_FR)
    expect = np.stack(
        [
            P.int_to_limbs(
                P.to_mont(int.from_bytes(b, "big") % P.R_SCALAR, P.R_SCALAR)
            )
            for b in bufs
        ]
    )
    assert np.array_equal(rows, expect)
