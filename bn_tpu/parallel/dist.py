"""Multi-chip scaling: batch sharding over a device Mesh + Gt/bucket
collective reductions over ICI.

The reference has no parallelism of any kind (SURVEY.md §2); this module IS
the distributed dimension of the framework, built the TPU way: a 1-D 'data'
mesh, `jax.sharding.NamedSharding` on the trailing batch axis of every limb
tensor, XLA-inserted collectives under `shard_map` (no hand-written
transport).  Gt products reduce with a log-depth fq12 fold locally, then an
all_gather + fold across the mesh (Fq12 multiplication is associative and
commutative, cf. the shootout accumulation pattern, shootout/main.rs:11-16).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

from bn_tpu.fields import tower
from bn_tpu.pairing import pairing_batch

DATA_AXIS = "data"


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_spec(ndim: int) -> PS:
    """PartitionSpec sharding only the trailing batch axis."""
    return PS(*([None] * (ndim - 1) + [DATA_AXIS]))


def point_specs(point) -> tuple:
    return tuple(batch_spec(c.ndim) for c in point)


def shard_point(mesh: Mesh, point):
    return tuple(
        jax.device_put(c, NamedSharding(mesh, batch_spec(c.ndim))) for c in point
    )


# ---------------------------------------------------------------------------
# Gt product reduction
# ---------------------------------------------------------------------------


def fq12_fold_product(a):
    """Product of a batch of Fq12 along the trailing axis via log-depth
    pairwise folding; returns batch-1 tensor."""
    b = a.shape[-1]
    # pad to a power of two with Montgomery ones
    p2 = 1 << (b - 1).bit_length()
    if p2 != b:
        ones = tower.ones12(a.shape[:-6] + (p2 - b,))
        a = jnp.concatenate([a, ones], axis=-1)
        b = p2
    while b > 1:
        h = b // 2
        a = tower.fq12_mul(a[..., :h], a[..., h:])
        b = h
    return a


# ---------------------------------------------------------------------------
# sharded pipelines
# ---------------------------------------------------------------------------


def sharded_pairing(mesh: Mesh, p, q):
    """Pure data-parallel batched pairing: the batch axis is sharded over the
    mesh and XLA partitions the whole pipeline (no collectives needed)."""
    p = shard_point(mesh, p)
    q = shard_point(mesh, q)
    out_spec = NamedSharding(mesh, batch_spec(5))  # Gt: (2, 3, 2, L, B)
    f = jax.jit(pairing_batch, out_shardings=out_spec)
    return f(p, q)


@functools.lru_cache(maxsize=None)
def _sharded_pairing_product_fn(mesh: Mesh, pdim: tuple, qdim: tuple):
    def local(p, q):
        gt = pairing_batch(p, q)
        local_prod = fq12_fold_product(gt)  # (..., 1) per device
        gathered = jax.lax.all_gather(local_prod, DATA_AXIS, axis=len(gt.shape) - 1, tiled=True)
        return fq12_fold_product(gathered)

    in_specs = (
        tuple(batch_spec(n) for n in pdim),
        tuple(batch_spec(n) for n in qdim),
    )
    # every device returns the full product (replicated)
    out_specs = PS(*([None] * 5))
    return jax.jit(
        shard_map(local, mesh, in_specs=in_specs, out_specs=out_specs)
    )


def sharded_pairing_product(mesh: Mesh, p, q):
    """The flagship multi-chip step: shard (G1, G2) pair batches over the
    mesh, pair locally, reduce the Gt product across devices over ICI.

    Mirrors the shootout workload's accumulation (shootout/main.rs:5-29) at
    pod scale; the cross-device reduction is an all_gather + log-fold (Fq12
    products commute)."""
    p = shard_point(mesh, p)
    q = shard_point(mesh, q)
    fn = _sharded_pairing_product_fn(
        mesh, tuple(c.ndim for c in p), tuple(c.ndim for c in q)
    )
    return fn(p, q)
