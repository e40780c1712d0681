"""Pippenger multi-scalar multiplication, TPU-shaped.

A new capability beyond the reference crate (implied by the north star,
BASELINE.md): computes sum_i s_i * P_i for large point sets.

TPU design (SURVEY.md §7 'hard parts' #5): bucket accumulation is
restructured from scatter-adds (TPU-hostile) into a fixed-length gather
schedule — the host bins point indices per (window, bucket) with numpy, pads
every bucket's list to the max occupancy R, and the device replays R rounds
of `buckets += gather(points, idx[:, r])` with ALL windows × buckets batched
on the vector lanes (one (w*2^c)-wide branchless Jacobian add per round).
Bucket weighting uses the classic suffix-sum identity sum_j j*A_j =
sum_j suffix_j, computed with `lax.associative_scan` over the bucket axis
using the point-add monoid; windows combine by Horner doubling.

Multi-chip: shard points, full local MSM per device, log-fold the partials
(bn_tpu.parallel.dist.sharded_msm) — embarrassingly parallel, >90% scaling.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from bn_tpu import curve, params as P
from bn_tpu.fields import fp

DEFAULT_C = 16  # window size in bits for 2^20-class inputs
# Window-size balance: the TOP window only ranges over the scalar's leftover
# high bits, and its bucket load is n / 2^(256 mod' c) — for c=13 the 20th
# window spans just 7 effective bits of the 254-bit Fr scalars, so its 128
# live buckets each hold ~n/128 digits and the occupancy-capped schedule
# degenerates into ~n/(128*r_cap) serial spill rounds (measured: 53 rounds,
# 223 s at n=2^20).  c=16 divides 256 exactly; the top window then spans the
# scalars' remaining ~13.8 bits and stays load-balanced with the rest.


def auto_c(n: int) -> int:
    """Window size matched to the input size.

    A fixed c=16 sizes the bucket accumulator at 16*2^16 ≈ 1M lanes
    (~200 MB across 3 Jacobian coords) and runs the 16-round shift-scan
    bucket reduce over all of them — ~6x the memory/reduce work a small
    MSM needs.  Scale c with n (classic Pippenger balance: accumulation
    ~n*256/c adds vs reduction ~2^c adds per window), keeping the
    even-divisor-of-256 choices that leave the top window load-balanced."""
    if n >= 1 << 19:
        return 16
    for c in (13, 11, 9, 7, 5):
        if n >= 1 << (c + 3):
            return c
    return 4


# ---------------------------------------------------------------------------
# host-side schedule construction
# ---------------------------------------------------------------------------


def scalars_to_u16(scalars) -> np.ndarray:
    """Pack canonical scalars into a (N, 16) uint16 limb matrix."""
    buf = b"".join(
        (int(s) % P.R_SCALAR).to_bytes(32, "little") for s in scalars
    )
    return np.frombuffer(buf, dtype="<u2").reshape(len(scalars), 16).copy()


def extract_digits(sc16: np.ndarray, c: int) -> np.ndarray:
    """(N, 16) uint16 scalars -> (w, N) int32 window digits."""
    n = sc16.shape[0]
    nbits = 256
    w = (nbits + c - 1) // c
    bits = np.unpackbits(
        sc16.view(np.uint8).reshape(n, 32), axis=1, bitorder="little"
    )  # (N, 256) little-endian bits
    digits = np.zeros((w, n), dtype=np.int32)
    for k in range(w):
        lo = k * c
        hi = min(lo + c, nbits)
        seg = bits[:, lo:hi].astype(np.int32)
        weights = (1 << np.arange(hi - lo)).astype(np.int32)
        digits[k] = seg @ weights
    return digits


def build_schedule(digits: np.ndarray, c: int, r_cap: int | None = None):
    """Per-(window, bucket) padded index lists.

    Returns idx (w, 2^c, R) int32 where entry N means 'no point' (maps to an
    appended point at infinity), with R the max bucket occupancy (capped at
    r_cap when given — use build_schedule_capped to recover the spill).
    """
    idx, _, _ = build_schedule_capped(digits, c, r_cap)
    return idx


def build_schedule_capped(digits: np.ndarray, c: int, r_cap: int | None):
    """Like build_schedule but with a bounded R: bucket entries beyond
    r_cap are NOT scheduled; instead they are returned as a leftover digit
    matrix (same shape as `digits`, zero where scheduled) for a further
    spill round.  Bounds device memory and compile size against skewed /
    adversarial scalar distributions (a uniform load never spills: R
    concentrates around N/2^c).

    Returns (idx, leftover_digits, has_leftover)."""
    w, n = digits.shape
    nb = 1 << c
    counts = np.zeros((w, nb), dtype=np.int64)
    for k in range(w):
        counts[k] = np.bincount(digits[k], minlength=nb)
    r_true = int(counts[:, 1:].max()) if nb > 1 else 0  # bucket 0 is dead weight
    r_max = max(1, r_true if r_cap is None else min(r_true, r_cap))
    idx = np.full((w, nb, r_max), n, dtype=np.int32)
    leftover = np.zeros_like(digits)
    for k in range(w):
        order = np.argsort(digits[k], kind="stable")
        d_sorted = digits[k][order]
        offsets = np.zeros(nb, dtype=np.int64)
        offsets[1:] = np.cumsum(counts[k])[:-1]
        rank = np.arange(n, dtype=np.int64) - offsets[d_sorted]
        keep = (d_sorted != 0) & (rank < r_max)
        idx[k, d_sorted[keep], rank[keep]] = order[keep].astype(np.int32)
        spill = (d_sorted != 0) & (rank >= r_max)
        if spill.any():
            leftover[k, order[spill]] = d_sorted[spill]
    return idx, leftover, bool(leftover.any())


def default_r_cap(n: int, c: int) -> int:
    """Bucket-occupancy cap: mean + 6 sigma of the uniform (Poisson-ish)
    load, so uniform inputs virtually never spill while adversarial ones
    are processed in bounded-size rounds."""
    mean = max(1.0, n / float(1 << c))
    return int(mean + 6.0 * mean**0.5 + 16)


# ---------------------------------------------------------------------------
# device-side accumulation
# ---------------------------------------------------------------------------


def _accumulate_rounds(px, py, pz, idx, acc):
    """Replay the gather schedule: acc (w*nb batch of Jacobian points)
    += R rounds of gathered point adds.  Unjitted (callers jit)."""
    spec = curve.g1_spec()
    w, nb, r_rounds = idx.shape
    flat = idx.reshape(w * nb, r_rounds)

    def round_body(acc, ids):
        gp = (
            jnp.take(px, ids, axis=-1),
            jnp.take(py, ids, axis=-1),
            jnp.take(pz, ids, axis=-1),
        )
        return curve.add(spec, acc, gp), None

    acc, _ = jax.lax.scan(round_body, acc, jnp.moveaxis(flat, -1, 0))
    return acc


def _msm_core(px, py, pz, idx, c: int):
    """px/py/pz: (L, N+1) affine-with-infinity G1 coords (z in {1, 0});
    idx: (w, 2^c, R) int32.  Returns a batch-1 Jacobian G1 point.

    Unjitted core so bn_tpu.parallel.dist can call it inside shard_map."""
    spec = curve.g1_spec()
    w, nb, _ = idx.shape
    acc = curve.zero(spec, (w * nb,))
    acc = _accumulate_rounds(px, py, pz, idx, acc)
    return _bucket_reduce(acc, c, w, nb)


def _bucket_reduce(acc, c: int, w: int, nb: int):
    """Weight buckets by index and combine windows (Horner)."""
    spec = curve.g1_spec()

    # bucket weighting: sum_j j*A_j = sum_{j>=1} suffix_j.  Split the batch
    # axis into (w, L, nb) with the bucket axis trailing (limb axis stays -2).
    def split_axes(t):
        return jnp.moveaxis(t.reshape(P.NLIMBS, w, nb), 0, 1)

    buckets = tuple(split_axes(t) for t in acc)
    # reverse so suffix sums become prefix sums
    rev = tuple(jnp.flip(t, -1) for t in buckets)

    def shift_scan(pt):
        """Inclusive prefix scan with the point-add monoid via log-depth
        shifts (half the op applications of lax.associative_scan, which
        matters: each application traces a full Jacobian add)."""
        x, y, z = pt
        d = 1
        while d < nb:
            # shift in points at infinity (identity of the monoid)
            def sh(t, fill):
                pad = jnp.broadcast_to(fill[..., None], t.shape[:-1] + (d,))
                return jnp.concatenate([pad, t[..., :-d]], axis=-1)

            zero_fq = jnp.zeros(x.shape[:-1], dtype=x.dtype)
            one_fq = jnp.broadcast_to(
                jnp.asarray(fp.FQ.one_const.reshape(-1), dtype=jnp.uint32),
                x.shape[:-1],
            )
            shifted = (sh(x, zero_fq), sh(y, one_fq), sh(z, zero_fq))
            x, y, z = curve.add(spec, (x, y, z), shifted)
            d *= 2
        return (x, y, z)

    suf = shift_scan(rev)
    # suf[..., i] = suffix_{nb-1-i}; sum over suffix_j for j >= 1 is the
    # (nb-1)-prefix total, i.e. element nb-2 of a second inclusive scan
    total = shift_scan(suf)
    wsums = tuple(t[..., nb - 2] for t in total)  # (w, L) per coord

    # Horner over windows: R = ((W_{w-1} * 2^c) + W_{w-2}) * 2^c + ...
    def win(k):
        # batch-1 point for window index k (traced k)
        return tuple(
            jax.lax.dynamic_index_in_dim(t, k, axis=0, keepdims=False)[..., None]
            for t in wsums
        )

    def horner_body(res, k):
        res = jax.lax.fori_loop(0, c, lambda _, r: curve.double(spec, r), res)
        res = curve.add(spec, res, win(k))
        return res, None

    res = tuple(t[..., None] for t in tuple(wsums[i][w - 1] for i in range(3)))
    res, _ = jax.lax.scan(horner_body, res, jnp.arange(w - 2, -1, -1))
    return res


def _accumulate_window(px, py, pz, idx, acc, w0, nb: int):
    """Accumulate one spill round into a single window's 2^c acc lanes.

    w0 is a TRACED window index (dynamic slice), so every spill round —
    whatever window it lands on — reuses one compiled program."""
    start = w0 * nb
    sub = tuple(
        jax.lax.dynamic_slice_in_dim(t, start, nb, axis=-1) for t in acc
    )
    sub = _accumulate_rounds(px, py, pz, idx, sub)
    return tuple(
        jax.lax.dynamic_update_slice_in_dim(t, s, start, axis=-1)
        for t, s in zip(acc, sub)
    )


_msm_device = jax.jit(_msm_core, static_argnames=("c",))
_accumulate_device = jax.jit(_accumulate_rounds, donate_argnums=(4,))
_accumulate_window_device = jax.jit(
    _accumulate_window, donate_argnums=(4,), static_argnames=("nb",)
)
_reduce_device = jax.jit(_bucket_reduce, static_argnames=("c", "w", "nb"))


def host_points_to_affine_arrays(points):
    """Host oracle points -> (px, py, pz) device arrays with an appended
    point at infinity in the last slot (index N encodes 'no point')."""
    from bn_tpu import oracle as O

    aff = []
    for p in points:
        if len(p) == 3:
            a = O.g_to_affine(O.FQ_OPS, p)
            assert a is not None, "infinity input points not supported"
        else:
            a = p
        aff.append(a)
    n = len(aff)
    xs = [a[0] for a in aff] + [0]
    ys = [a[1] for a in aff] + [0]
    px = fp.to_device(fp.FQ, xs)
    py = fp.to_device(fp.FQ, ys)
    one = fp.ones(fp.FQ, (1,))
    pz = jnp.concatenate(
        [jnp.broadcast_to(one, (P.NLIMBS, n)), fp.zeros(fp.FQ, (1,))], axis=-1
    )
    return px, py, pz


def msm(points, scalars, c: int | None = None, r_cap: int | None = None):
    """Multi-scalar multiplication over G1.

    points: list of host oracle Jacobian/affine points, or device affine
    tensors; scalars: list of ints.  Returns a batch-1 device Jacobian point.

    The window size c defaults to auto_c(n) — scaled to the input so small
    MSMs don't pay a 2^16-bucket accumulator.  Bucket occupancy per
    accumulation round is capped at r_cap (default: mean + 6 sigma of the
    uniform load); skewed scalar distributions spill into further bounded
    rounds instead of inflating the schedule tensor, so device memory and
    compiled program size are input-independent."""
    n = len(scalars)
    assert n >= 1
    if c is None:
        c = auto_c(n)
    px, py, pz = host_points_to_affine_arrays(points)
    if r_cap is None:
        r_cap = default_r_cap(n, c)

    rounds = build_rounds(scalars, c, r_cap)
    return msm_run(px, py, pz, rounds, c)


def build_rounds(scalars, c: int, r_cap: int):
    """Host-side: full bounded-occupancy schedule.

    Returns (first_idx, spills): first_idx is the (w, 2^c, R<=r_cap) main
    schedule; spills is a list of (window, idx(1, 2^c, r_cap)) rounds for
    buckets whose occupancy exceeded the cap.  Spills are WINDOW-LOCAL:
    overload is concentrated (a skewed input, or a window whose digit range
    is narrower than 2^c), so re-running the full (w, 2^c) grid per spill
    round would multiply the work w-fold for nothing — each spill round
    instead touches one window's 2^c lanes, and all spill rounds share one
    padded shape so the device function compiles exactly once."""
    digits = extract_digits(scalars_to_u16(scalars), c)
    n_inf = digits.shape[1]  # index n encodes 'no point'
    first, leftover, more = build_schedule_capped(digits, c, r_cap)
    spills = []
    while more:
        more = False
        for wk in range(digits.shape[0]):
            if not leftover[wk].any():
                continue
            idx, left_wk, more_wk = build_schedule_capped(
                leftover[wk : wk + 1], c, r_cap
            )
            if idx.shape[-1] < r_cap:
                pad = np.full(
                    (1, idx.shape[1], r_cap - idx.shape[-1]), n_inf, np.int32
                )
                idx = np.concatenate([idx, pad], axis=-1)
            spills.append((wk, idx))
            leftover[wk] = left_wk[0]
            more = more or more_wk
    return first, spills


def msm_run(px, py, pz, rounds, c: int):
    """Device-side: execute a prebuilt (first, spills) schedule."""
    first, spills = rounds
    if not spills:
        # common case: one fused accumulate+reduce call
        return _msm_device(px, py, pz, jnp.asarray(first), c)
    spec = curve.g1_spec()
    w, nb = first.shape[0], 1 << c
    acc = curve.zero(spec, (w * nb,))
    acc = _accumulate_device(px, py, pz, jnp.asarray(first), acc)
    for wk, idx in spills:
        acc = _accumulate_window_device(
            px, py, pz, jnp.asarray(idx), acc, jnp.int32(wk), nb
        )
    return _reduce_device(acc, c, w, nb)


def msm_oracle(points, scalars):
    """Host-side exact reference for testing."""
    from bn_tpu import oracle as O

    acc = O.g_zero(O.FQ_OPS)
    for p, s in zip(points, scalars):
        acc = O.g_add(O.FQ_OPS, acc, O.g1_mul(p, s))
    return acc
