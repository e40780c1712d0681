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

    def shard_map(f, mesh, in_specs, out_specs, check_vma=True):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_vma
        )

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs, check_vma=True):
        return _shard_map_old(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=check_vma
        )

from bn_tpu import curve
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


def point_fold_sum(spec, p):
    """Sum of a batch of Jacobian points along the trailing axis via
    log-depth pairwise folding; returns a batch-1 point."""
    b = p[0].shape[-1]
    p2 = 1 << (b - 1).bit_length()
    if p2 != b:
        inf = curve.zero(spec, p[0].shape[:- 2 - spec.field.struct_ndim] + (p2 - b,))
        p = tuple(jnp.concatenate([c, i], axis=-1) for c, i in zip(p, inf))
        b = p2
    while b > 1:
        h = b // 2
        p = curve.add(
            spec,
            tuple(c[..., :h] for c in p),
            tuple(c[..., h:] for c in p),
        )
        b = h
    return p


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
        shard_map(
            local,
            mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            # the pairing scans carry constants (Montgomery ones for z0/f0)
            # that start unvarying while the point inputs vary over the mesh;
            # vma typing rejects that mix even though the math is shard-local
            # (same rationale as _sharded_msm_fn below).
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def _sharded_msm_fn(mesh: Mesh, c: int):
    from bn_tpu.msm import _msm_core

    spec = curve.g1_spec()

    def local(px, py, pz, idx):
        # local views carry a leading shard axis of length 1
        part = _msm_core(px[0], py[0], pz[0], idx[0], c)
        # gather all per-device partial sums, reduce with the point monoid
        gathered = tuple(
            jax.lax.all_gather(t, DATA_AXIS, axis=1, tiled=True) for t in part
        )
        return point_fold_sum(spec, gathered)

    shard = PS(DATA_AXIS)
    return jax.jit(
        shard_map(
            local,
            mesh,
            in_specs=(shard, shard, shard, shard),
            out_specs=(PS(), PS(), PS()),
            # constants built inside the local MSM (bucket accumulators,
            # fold padding) are replicated while the inputs vary over the
            # mesh; vma typing rejects that mix even though the math is
            # shard-local, so opt out of the check here.
            check_vma=False,
        )
    )


def sharded_msm(mesh: Mesh, points, scalars, c: int = None):
    """Multi-chip Pippenger MSM: points/scalars are split into contiguous
    shards, every device runs a full local MSM over its shard, and the
    per-device Jacobian partial sums reduce over ICI with a log-depth
    point-addition fold (MSM is a sum, so shard-and-add is exact).

    Embarrassingly parallel up to the final log(n_dev) adds, hence the
    >90% scaling target of BASELINE.md."""
    from bn_tpu import msm as _msm

    if c is None:
        c = _msm.DEFAULT_C
    n_dev = mesh.devices.size
    n = len(scalars)
    assert n >= n_dev, "need at least one point per device"
    bounds = [(n * i) // n_dev for i in range(n_dev + 1)]

    pxs, pys, pzs, idxs = [], [], [], []
    r_max = 1
    shards = []
    for d in range(n_dev):
        lo, hi = bounds[d], bounds[d + 1]
        px, py, pz = _msm.host_points_to_affine_arrays(points[lo:hi])
        digits = _msm.extract_digits(_msm.scalars_to_u16(scalars[lo:hi]), c)
        shards.append((px, py, pz, digits, hi - lo))

    # one shared schedule width so the stacked idx tensor is rectangular
    scheds = []
    for px, py, pz, digits, ns in shards:
        sched = _msm.build_schedule(digits, c)
        scheds.append(sched)
        r_max = max(r_max, sched.shape[-1])
    n_max = max(hi - lo for lo, hi in zip(bounds[:-1], bounds[1:]))
    for (px, py, pz, digits, ns), sched in zip(shards, scheds):
        pad_r = r_max - sched.shape[-1]
        sched = np.pad(sched, ((0, 0), (0, 0), (0, pad_r)), constant_values=ns)
        # pad the point arrays to a common length; the pad slots replicate the
        # appended infinity (index >= ns maps to infinity after clipping)
        pad_n = n_max - ns
        sched = np.where(sched >= ns, n_max, sched)
        pxs.append(jnp.pad(px, ((0, 0), (0, pad_n))))
        pys.append(jnp.pad(py, ((0, 0), (0, pad_n))))
        pzs.append(jnp.pad(pz, ((0, 0), (0, pad_n))))
        idxs.append(sched)

    shard_sharding = NamedSharding(mesh, PS(DATA_AXIS))
    px = jax.device_put(jnp.stack(pxs), shard_sharding)
    py = jax.device_put(jnp.stack(pys), shard_sharding)
    pz = jax.device_put(jnp.stack(pzs), shard_sharding)
    idx = jax.device_put(jnp.asarray(np.stack(idxs)), shard_sharding)
    return _sharded_msm_fn(mesh, c)(px, py, pz, idx)


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
