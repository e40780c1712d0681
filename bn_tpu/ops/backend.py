"""Montgomery-multiply backend selection: pure-jnp reference vs Pallas kernel.

The jnp path (bn_tpu.ops.limbs.mont_mul_jnp) runs on any backend and is the
semantic reference; the Pallas path (bn_tpu.ops.mont_pallas) is the fused TPU
kernel.  Default: Pallas on TPU, jnp elsewhere.  Override with
set_backend('jnp'|'pallas'|'pallas-interpret') or BN_TPU_BACKEND env var.
'pallas-interpret' runs every Pallas kernel through the interpreter
(pallas_call(interpret=True)) so kernel formulas are testable off-hardware.
"""

from __future__ import annotations

import os

_BACKEND = None  # resolved lazily

_VALID = ("jnp", "pallas", "pallas-interpret")


def _default_backend() -> str:
    env = os.environ.get("BN_TPU_BACKEND")
    if env in _VALID:
        return env
    try:
        import jax

        if jax.default_backend() == "tpu":
            return "pallas"
    except Exception:  # pragma: no cover
        pass
    return "jnp"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in _VALID, name
    _BACKEND = name


def get_backend() -> str:
    global _BACKEND
    if _BACKEND is None:
        _BACKEND = _default_backend()
    return _BACKEND


def get_mont_mul():
    if use_pallas():
        from bn_tpu.ops.mont_pallas import mont_mul_pallas

        return mont_mul_pallas
    from bn_tpu.ops.limbs import mont_mul_jnp

    return mont_mul_jnp


def use_pallas() -> bool:
    """True when the fused TPU kernels (mont mul, modular add/sub/neg,
    Karatsuba fq2 mul) should be used instead of the jnp reference path."""
    return get_backend() in ("pallas", "pallas-interpret")


def interpret_mode() -> bool:
    """True when Pallas kernels should run under the interpreter (CPU)."""
    return get_backend() == "pallas-interpret"
