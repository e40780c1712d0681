"""Per-stage pairing profile with tunnel-proof timing.

Times each pipeline stage (precompute / miller / final_exp / full pairing)
as a DEPENDENT on-device scan whose iterations are chained through an
optimization_barrier and reduced to a 4-byte checksum — the same honesty
protocol as bench.py — so the axon tunnel's ~28 ms + slow bulk fetch cannot
pollute per-stage numbers (benchmarks/kernel_bench.py fetches full outputs,
which costs ~225 ms/call at B=8192 and swamps the kernel time).

Run: python benchmarks/stage_profile.py [--batch N] [--iters K] [--stages a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bn_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--stages",
        type=str,
        default="precompute,miller,final_exp,pairing",
    )
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    from bn_tpu import curve, oracle as O, params as P
    from bn_tpu.fields import fp, tower
    from bn_tpu import ate

    on_tpu = jax.default_backend() == "tpu"
    B = args.batch or (8192 if on_tpu else 32)
    iters = args.iters
    stages = set(args.stages.split(","))
    print(f"# backend={jax.default_backend()} batch={B} iters={iters} "
          f"fused={ate._use_fused_ladder()}", flush=True)

    # inputs: 8 distinct pairs tiled to B (cheap host-side prep)
    ks1 = [100 + k for k in range(8)]
    ks2 = [200 + k for k in range(8)]
    p8 = curve.to_device(curve.g1_spec(), [O.g1_mul(O.G1_ONE, k) for k in ks1])
    q8 = curve.to_device(curve.g2_spec(), [O.g2_mul(O.G2_ONE, k) for k in ks2])
    rep = B // 8
    p = tuple(jnp.tile(np.asarray(c), (1,) * (c.ndim - 1) + (rep,)) for c in p8)
    q = tuple(jnp.tile(np.asarray(c), (1,) * (c.ndim - 1) + (rep,)) for c in q8)
    pa = jax.jit(lambda pp: curve.to_affine(curve.g1_spec(), pp))(p)
    qa = jax.jit(lambda qq: curve.to_affine(curve.g2_spec(), qq))(q)
    coeffs0 = jax.jit(ate.precompute)(qa)
    f0 = jax.jit(ate.miller_loop)(coeffs0, pa)

    def timed_scan(fn, *xs):
        """Scan `iters` dependent applications of fn(*xs); fetch one u32."""

        @jax.jit
        def run(*xs):
            def body(acc, _):
                xs_, acc_ = jax.lax.optimization_barrier((xs, acc))
                out = fn(*xs_)
                leaves = jax.tree_util.tree_leaves(out)
                s = acc_
                for l in leaves:
                    s = s + jnp.sum(l.astype(jnp.uint32))
                return s, None

            acc, _ = jax.lax.scan(body, jnp.uint32(0), None, length=iters)
            return acc

        t0 = time.perf_counter()
        np.asarray(run(*xs))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(*xs))
        dt = (time.perf_counter() - t0) / iters
        return dt, t_compile

    def report(name, fn, *xs):
        dt, tc = timed_scan(fn, *xs)
        print(
            json.dumps(
                {
                    "stage": name,
                    "ms_per_call": round(dt * 1e3, 2),
                    "elems_per_sec": round(B / dt, 1),
                    "compile_s": round(tc, 1),
                }
            ),
            flush=True,
        )

    if "fq12_inv" in stages:
        report("fq12_inv", tower.fq12_inv, f0)
    if "fq_inv" in stages:
        report("fq_inv", lambda x: fp.inv(fp.FQ, x), f0[0, 0, 0])
    if "expz" in stages:
        report("expz", tower.fq12_exp_by_neg_z, f0)
    if "cyclo64" in stages:

        def cyclo_chain(x):
            def body(r, _):
                return tower.fq12_cyclotomic_sq(r), None

            r, _ = jax.lax.scan(body, x, None, length=64)
            return r

        report("cyclo64", cyclo_chain, f0)
    if "fq12mul64" in stages:

        def mul_chain(x):
            def body(r, _):
                return tower.fq12_mul(r, x), None

            r, _ = jax.lax.scan(body, x, None, length=64)
            return r

        report("fq12mul64", mul_chain, f0)
    if "fq12sq64" in stages:

        def sq_chain(x):
            def body(r, _):
                return tower.fq12_sq(r), None

            r, _ = jax.lax.scan(body, x, None, length=64)
            return r

        report("fq12sq64", sq_chain, f0)
    if "precompute" in stages:
        report("precompute", ate.precompute, qa)
    if "miller" in stages:
        report("miller", ate.miller_loop, coeffs0, pa)
    if "final_exp" in stages:
        report("final_exp", tower.final_exponentiation, f0)
    if "pairing" in stages:
        report("pairing", ate.pairing_batch, p, q)


if __name__ == "__main__":
    main()
