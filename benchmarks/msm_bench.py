"""G1 MSM wall-clock at 2^20 points on the local device (BASELINE.md item).

Points are generated ON DEVICE (P_i = k_i * G via one batched ladder), so the
benchmark scales to 2^20 without host-side bigint work, and the result has an
EXACT host oracle: sum_i s_i * (k_i * G) = (sum_i s_i * k_i mod r) * G — one
Python modular dot product plus a single oracle scalar mul.

Timing honesty matches bench.py: the result fetch (one Jacobian point,
~200 bytes) sits inside the timing window because block_until_ready does not
block through this box's TPU tunnel.

Run: python benchmarks/msm_bench.py [--n LOG2N] [--c WINDOW]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(log2n: int, c: int):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bn_tpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    import jax.numpy as jnp
    import numpy as np

    from bn_tpu import curve, msm, oracle as O, params as P
    from bn_tpu.fields import fp

    n = 1 << log2n
    rng = np.random.default_rng(20260820)
    ks = [int.from_bytes(rng.bytes(40), "big") % P.R_SCALAR or 1 for _ in range(n)]
    ss = [int.from_bytes(rng.bytes(40), "big") % P.R_SCALAR for _ in range(n)]

    spec = curve.g1_spec()

    @jax.jit
    def make_points(k):
        pts = curve.mul(spec, curve.one(spec, (k.shape[-1],)), k)
        ax, ay = curve.to_affine(spec, pts)
        # append the infinity slot (index n encodes 'no point')
        z = fp.zeros(fp.FQ, (1,))
        px = jnp.concatenate([ax, z], axis=-1)
        py = jnp.concatenate([ay, z], axis=-1)
        pz = jnp.concatenate(
            [fp.ones(fp.FQ, (k.shape[-1],)), z], axis=-1
        )
        return px, py, pz

    t0 = time.perf_counter()
    kdev = fp.to_device(fp.FR, ks)
    px, py, pz = make_points(kdev)
    px, py, pz = (np.asarray(t) for t in (px, py, pz))  # force + cache host-side
    t_points = time.perf_counter() - t0
    print(f"point generation ({n} lanes): {t_points:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    r_cap = msm.default_r_cap(n, c)
    rounds = msm.build_rounds(ss, c, r_cap)
    first, spills = rounds
    t_sched = time.perf_counter() - t0
    print(
        f"schedule: R={first.shape[-1]} (cap {r_cap}), "
        f"{len(spills)} window-local spill round(s), {t_sched:.1f}s",
        file=sys.stderr,
    )

    pxd, pyd, pzd = (jnp.asarray(t) for t in (px, py, pz))
    # compile + warmup (fetch: block_until_ready is a no-op on the tunnel)
    res = msm.msm_run(pxd, pyd, pzd, rounds, c)
    _ = tuple(np.asarray(t) for t in res)

    t0 = time.perf_counter()
    res = msm.msm_run(pxd, pyd, pzd, rounds, c)
    res_h = tuple(np.asarray(t) for t in res)  # tiny fetch forces execution
    dt = time.perf_counter() - t0

    # exact oracle: sum s_i * k_i mod r, one scalar mul on the host
    e = 0
    for s, k in zip(ss, ks):
        e += s * k
    expect = O.g1_mul(O.G1_ONE, e % P.R_SCALAR)
    got = curve.from_device(spec, res)[0]
    ok = O.g_eq(O.FQ_OPS, got, expect)

    print(
        json.dumps(
            {
                "metric": "g1_msm_wall_clock",
                "value": round(dt, 3),
                "unit": "s",
                "n_points": n,
                "window_c": c,
                "rounds_R": int(first.shape[-1]),
                "spill_rounds": len(spills),
                "points_per_sec": round(n / dt, 1),
                "oracle_exact": bool(ok),
                "schedule_build_s": round(t_sched, 3),
            }
        )
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None, help="log2 of point count")
    ap.add_argument("--c", type=int, default=16)
    args = ap.parse_args()
    import jax

    log2n = args.n if args.n is not None else (20 if jax.default_backend() == "tpu" else 8)
    main(log2n, args.c)
