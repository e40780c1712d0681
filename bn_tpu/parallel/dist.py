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
from bn_tpu.ate import pairing_batch

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


def _fold_strides(width: int) -> np.ndarray:
    s, out = width // 2, []
    while s >= 1:
        out.append(s)
        s //= 2
    return np.asarray(out, dtype=np.int32)


def fq12_fold_product(a, width: int = 1024):
    """Product of a batch of Fq12 along the trailing axis; returns batch-1.

    Two scans keep the traced program at TWO fq12_mul instantiations
    regardless of batch size (compile-time critical for the CPU-mesh dryrun):
      1. reshape to (G, W) rows and scan-accumulate the G rows (total work B);
      2. log-fold the remaining W lanes with a roll-by-stride scan
         (slot 0 ends up holding the full product)."""
    b = a.shape[-1]
    p2 = 1 << (b - 1).bit_length()
    if p2 != b:
        ones = tower.ones12(a.shape[:-6] + (p2 - b,))
        a = jnp.concatenate([a, ones], axis=-1)
    w = min(p2, width)
    g = p2 // w
    rows = jnp.moveaxis(a.reshape(a.shape[:-1] + (g, w)), -2, 0)

    def acc(carry, row):
        return tower.fq12_mul(carry, row), None

    x, _ = jax.lax.scan(acc, tower.ones12(a.shape[:-6] + (w,)), rows)
    if w == 1:
        return x

    def fold(y, s):
        return tower.fq12_mul(y, jnp.roll(y, -s, axis=-1)), None

    x, _ = jax.lax.scan(fold, x, jnp.asarray(_fold_strides(w)))
    return x[..., :1]


def point_fold_sum(spec, p, width: int = 1024):
    """Sum of a batch of Jacobian points along the trailing axis; returns a
    batch-1 point.  Same two-scan structure as fq12_fold_product (TWO
    curve.add instantiations in the traced program)."""
    b = p[0].shape[-1]
    p2 = 1 << (b - 1).bit_length()
    lead = p[0].shape[: -2 - spec.field.struct_ndim]
    if p2 != b:
        inf = curve.zero(spec, lead + (p2 - b,))
        p = tuple(jnp.concatenate([c, i], axis=-1) for c, i in zip(p, inf))
    w = min(p2, width)
    g = p2 // w
    rows = tuple(
        jnp.moveaxis(c.reshape(c.shape[:-1] + (g, w)), -2, 0) for c in p
    )

    def acc(carry, row):
        return curve.add(spec, carry, row), None

    x, _ = jax.lax.scan(acc, curve.zero(spec, lead + (w,)), rows)
    if w == 1:
        return x

    def fold(y, s):
        rolled = tuple(jnp.roll(c, -s, axis=-1) for c in y)
        return curve.add(spec, y, rolled), None

    x, _ = jax.lax.scan(fold, x, jnp.asarray(_fold_strides(w)))
    return tuple(c[..., :1] for c in x)


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
def _sharded_fold_fn(mesh: Mesh):
    """Tiny shard_map program: per-device Gt partial product, all_gather of
    the n_dev partials over ICI, replicated final fold.  Kept separate from
    the pairing pjit so the huge pairing program is compiled exactly once in
    its data-parallel form (a single shard_map closure wrapping pairing+fold
    made XLA:CPU compile times blow past the driver budget in rounds 1-2)."""

    def local(gt):
        part = fq12_fold_product(gt)  # (..., 1) per device
        gathered = jax.lax.all_gather(part, DATA_AXIS, axis=4, tiled=True)
        return fq12_fold_product(gathered)

    return jax.jit(
        shard_map(
            local,
            mesh,
            in_specs=batch_spec(5),
            # every device returns the full product (replicated)
            out_specs=PS(*([None] * 5)),
            # the fold's Montgomery-one padding is mesh-unvarying while gt
            # varies; vma typing rejects the mix though the math is local
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

    n_dev = mesh.devices.size
    n = len(scalars)
    if c is None:
        c = _msm.auto_c(max(1, n // n_dev))
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
    pod scale.  Two programs: (1) the data-parallel batched pairing under
    pjit (XLA partitions it; zero collectives), (2) a tiny shard_map doing
    per-device partial products + an all_gather + replicated fold."""
    gt = sharded_pairing(mesh, p, q)
    with mesh:
        return _sharded_fold_fn(mesh)(gt)
