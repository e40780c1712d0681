"""Microbenchmarks of the hot compute stages on the live device.

Times each stage with an honest host fetch (np.asarray) per measurement —
block_until_ready is a no-op on the axon tunnel — and reports per-stage
throughput so optimization effort lands where the time actually goes.

NOTE: the per-call fetch costs ~28 ms + bulk-transfer time through the
tunnel, which SWAMPS sub-100ms stages at large batches.  For per-stage
numbers free of that pollution use benchmarks/stage_profile.py (dependent
checksum-scan timing, 4-byte fetch).  This file remains useful for chained
kernel micro-rates (--chain amortizes the fetch).

Stages:
  mont       : raw Pallas Montgomery-multiply chain (the innermost kernel)
  mod_add    : modular add chain (XLA elementwise path)
  fq2_mul    : Karatsuba Fq2 multiply chain
  fq12_sq    : full Fq12 squaring chain
  precompute : G2 line-coefficient ladder
  miller     : Miller loop given coefficients
  final_exp  : final exponentiation
  pairing    : everything fused

Run: python benchmarks/kernel_bench.py [--batch N] [--stages a,b,c]
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
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chain", type=int, default=64, help="ops per timed program")
    ap.add_argument("--stages", type=str, default="mont,mod_add,fq2_mul,fq12_sq,precompute,miller,final_exp,pairing")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    import importlib

    from bn_tpu import curve, oracle as O, params as P
    from bn_tpu.fields import fp, tower

    PR = importlib.import_module("bn_tpu.ate")

    on_tpu = jax.default_backend() == "tpu"
    B = args.batch or (8192 if on_tpu else 32)
    K = args.chain
    stages = set(args.stages.split(","))
    print(f"# backend={jax.default_backend()} batch={B} chain={K}", flush=True)

    rng = np.random.default_rng(7)

    def rand_fq(shape_lead=()):
        n = int(np.prod(shape_lead, dtype=int)) * B if shape_lead else B
        vals = [int.from_bytes(rng.bytes(40), "big") % P.Q for _ in range(n)]
        arr = fp.to_device(fp.FQ, vals)  # (L, n)
        return arr.reshape(shape_lead + (P.NLIMBS, B)) if shape_lead else arr

    def timeit(name, fn, *xs, work_per_call=1):
        """fn is jitted; returns per-elem-op seconds. Fetches output honestly."""
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(*xs)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.iters
        rate = work_per_call * B / dt
        print(
            json.dumps(
                {
                    "stage": name,
                    "sec_per_call": round(dt, 6),
                    "elem_ops_per_sec": round(rate, 1),
                    "compile_s": round(t_compile, 1),
                }
            ),
            flush=True,
        )
        return dt

    # ---- raw Montgomery multiply chain (stacked width 1) ----
    if "mont" in stages:
        a = rand_fq()
        b = rand_fq()

        def mont_chain(a, b):
            def body(x, _):
                return fp.mul(fp.FQ, x, b), None
            y, _ = jax.lax.scan(body, a, None, length=K)
            return y

        timeit("mont_chain", mont_chain, a, b, work_per_call=K)

    if "mod_add" in stages:
        a = rand_fq()
        b = rand_fq()

        def add_chain(a, b):
            def body(x, _):
                return fp.add(fp.FQ, x, b), None
            y, _ = jax.lax.scan(body, a, None, length=K)
            return y

        timeit("mod_add_chain", add_chain, a, b, work_per_call=K)

    if "fq2_mul" in stages:
        a2 = rand_fq((2,))
        b2 = rand_fq((2,))

        def fq2_chain(a, b):
            def body(x, _):
                return tower.fq2_mul(x, b), None
            y, _ = jax.lax.scan(body, a, None, length=K)
            return y

        timeit("fq2_mul_chain", fq2_chain, a2, b2, work_per_call=K)

    if "fq12_sq" in stages:
        a12 = rand_fq((2, 3, 2))

        def fq12_chain(a):
            def body(x, _):
                return tower.fq12_sq(x), None
            y, _ = jax.lax.scan(body, a, None, length=K)
            return y

        timeit("fq12_sq_chain", fq12_chain, a12, work_per_call=K)

    # ---- pairing pipeline stages at batch B ----
    if stages & {"precompute", "miller", "final_exp", "pairing"}:
        ks1 = [100 + k for k in range(8)]
        ks2 = [200 + k for k in range(8)]
        p8 = curve.to_device(curve.g1_spec(), [O.g1_mul(O.G1_ONE, k) for k in ks1])
        q8 = curve.to_device(curve.g2_spec(), [O.g2_mul(O.G2_ONE, k) for k in ks2])
        rep = B // 8
        p = tuple(jnp.tile(np.asarray(c), (1,) * (c.ndim - 1) + (rep,)) for c in p8)
        q = tuple(jnp.tile(np.asarray(c), (1,) * (c.ndim - 1) + (rep,)) for c in q8)

        pa = jax.jit(lambda pp: curve.to_affine(curve.g1_spec(), pp))(p)
        qa = jax.jit(lambda qq: curve.to_affine(curve.g2_spec(), qq))(q)
        pa = tuple(jnp.asarray(np.asarray(c)) for c in pa)
        qa = tuple(jnp.asarray(np.asarray(c)) for c in qa)

        if "precompute" in stages:
            timeit("precompute", PR.precompute, qa)
        coeffs = jax.jit(PR.precompute)(qa)
        coeffs = jnp.asarray(np.asarray(coeffs))
        if "miller" in stages:
            timeit("miller_loop", PR.miller_loop, coeffs, pa)
        f = jax.jit(PR.miller_loop)(coeffs, pa)
        f = jnp.asarray(np.asarray(f))
        if "final_exp" in stages:
            timeit("final_exp", tower.final_exponentiation, f)
        if "pairing" in stages:
            timeit("pairing", PR.pairing_batch, p, q)


if __name__ == "__main__":
    main()
