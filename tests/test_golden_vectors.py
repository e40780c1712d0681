"""Device pipeline vs the reference's LITERAL golden vectors.

tests/vectors_g2_precomp.py holds the full G2Precomp vector transcribed
verbatim from /root/reference/src/groups/mod.rs:637-762 — the affine Q plus
all 102 EllCoeffs as decimal integers.  This pins the device-side ladder
directly to the reference's published numbers (not just transitively through
the host oracle).
"""

import jax
import numpy as np

from bn_tpu import ate, oracle as O
from bn_tpu.fields import tower as T

import vectors_g2_precomp as V


def test_device_precompute_matches_reference_literals():
    g2 = O.g2_mul(O.G2_ONE, V.SCALAR)
    qa = O.g_to_affine(O.FQ2_OPS, g2)

    # the affine Q of the precomp struct (reference: groups/mod.rs:644-654)
    assert qa[0] == V.Q_X
    assert qa[1] == V.Q_Y

    dq = (T.fq2_to_device([qa[0]]), T.fq2_to_device([qa[1]]))
    coeffs = np.asarray(jax.jit(ate.precompute)(dq))
    assert coeffs.shape[0] == 102 == len(V.COEFFS)

    for k, (e0, evw, evv) in enumerate(V.COEFFS):
        got = tuple(T.fq2_from_device(coeffs[k, ci])[0] for ci in range(3))
        assert got == (e0, evw, evv), f"coeff {k}"


def test_device_precompute_batch_lane_independence():
    """The vector lane stays bit-identical when other batch lanes differ
    (guards against cross-lane contamination in the packed layout)."""
    g2 = O.g2_mul(O.G2_ONE, V.SCALAR)
    other = O.g2_mul(O.G2_ONE, 12345)
    qa = O.g_to_affine(O.FQ2_OPS, g2)
    qb = O.g_to_affine(O.FQ2_OPS, other)
    dq = (
        T.fq2_to_device([qb[0], qa[0], qb[0]]),
        T.fq2_to_device([qb[1], qa[1], qb[1]]),
    )
    coeffs = np.asarray(jax.jit(ate.precompute)(dq))
    for k in (0, 57, 100, 101):
        got = tuple(T.fq2_from_device(coeffs[k, ci])[1] for ci in range(3))
        assert got == V.COEFFS[k], f"coeff {k}"
