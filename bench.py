"""Headline benchmark: batched BN254 reduced pairings on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference crate's shootout rate of
~95.8 pairings/sec (single CPU core, BASELINE.md).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bn_tpu_jax_cache")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    import numpy as np

    from bn_tpu import curve, params as P
    from bn_tpu.fields import fp
    from bn_tpu.pairing import pairing_batch

    on_tpu = jax.default_backend() == "tpu"
    B = int(os.environ.get("BN_BENCH_BATCH", 8192 if on_tpu else 32))

    # Random-ish inputs without host-side scalar muls: derive points on device
    # by multiplying the generators by random Fr scalars.
    rng = np.random.default_rng(42)
    ks1 = [int.from_bytes(rng.bytes(64), "big") % P.R_SCALAR for _ in range(B)]
    ks2 = [int.from_bytes(rng.bytes(64), "big") % P.R_SCALAR for _ in range(B)]
    k1 = fp.to_device(fp.FR, ks1)
    k2 = fp.to_device(fp.FR, ks2)
    g1s, g2s = curve.g1_spec(), curve.g2_spec()

    @jax.jit
    def make_inputs(k1, k2):
        p = curve.mul(g1s, curve.one(g1s, (k1.shape[-1],)), k1)
        q = curve.mul(g2s, curve.one(g2s, (k2.shape[-1],)), k2)
        return p, q

    p, q = jax.block_until_ready(make_inputs(k1, k2))

    fn = jax.jit(pairing_batch)
    # compile + warmup
    out = jax.block_until_ready(fn(p, q))

    iters = int(os.environ.get("BN_BENCH_ITERS", 3))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(p, q)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    rate = B / dt
    baseline = 95.8  # reference shootout rate (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "bn254_pairings_per_sec",
                "value": round(rate, 2),
                "unit": "pairings/s",
                "vs_baseline": round(rate / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
