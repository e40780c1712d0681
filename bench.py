"""Headline benchmark: batched BN254 reduced pairings on the local device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference crate's shootout rate of
~95.8 pairings/sec (single CPU core, BASELINE.md).

Honesty rules: the timed function's output is fetched to the host every
iteration (so asynchronous dispatch or a broken block_until_ready cannot
fake a rate), and a sample of lanes is verified bit-exactly against the
pure-Python oracle before any number is reported.
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

    from bn_tpu import curve, oracle as O, params as P
    from bn_tpu.fields import fp, tower
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
    # compile + warmup; fetch to host so timing below can't be dispatch-only
    out_h = np.asarray(fn(p, q))

    # correctness gate: a sample of lanes must match the exact host oracle
    # bit-for-bit (Montgomery-form limbs) before any rate is reported.
    sample = [0, 1, B // 2, B - 1][: min(4, B)]
    got = tower.fq12_from_device(out_h[..., sample])
    for j, i in enumerate(sample):
        expect = O.pairing(O.g1_mul(O.G1_ONE, ks1[i]), O.g2_mul(O.G2_ONE, ks2[i]))
        if got[j] != expect:
            print(
                json.dumps(
                    {
                        "metric": "bn254_pairings_per_sec",
                        "value": 0.0,
                        "unit": "pairings/s",
                        "vs_baseline": 0.0,
                        "error": f"lane {i} mismatch vs oracle",
                    }
                )
            )
            sys.exit(1)

    iters = int(os.environ.get("BN_BENCH_ITERS", 3))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(p, q)
        np.asarray(out)  # force device->host sync each iteration
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
                "batch": B,
                "verified_lanes": len(sample),
            }
        )
    )


if __name__ == "__main__":
    main()
