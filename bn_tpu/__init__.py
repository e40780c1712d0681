"""bn_tpu — a TPU-native BN254 (alt_bn128) pairing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust `bn`
crate (zcash-hackworks/bn): Fr/Fq Montgomery arithmetic over batched 16-bit
limb tensors, the Fq2/Fq6/Fq12 tower, G1/G2 Jacobian groups, the optimal ate
pairing, validated serialization, Pippenger MSM, and multi-chip sharding over
`jax.sharding.Mesh`.

Public API mirrors the reference crate's surface (reference: src/lib.rs):
    Fr, G1, G2, Gt, pairing
plus batch-first entry points in `bn_tpu.api`.
"""

__version__ = "0.1.0"

try:  # full API needs jax; params/oracle alone do not
    from bn_tpu.api import G1, G2, Fr, Gt, pairing, pairing_batch  # noqa: F401
except ImportError:  # pragma: no cover - during incremental bootstrap
    pass
