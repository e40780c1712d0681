"""On-device correctness spot check: run the full pairing pipeline on the
real TPU and compare against the exact host oracle.  Run this before trusting
any benchmark number (guards against miscompiles that tests on the CPU
backend cannot see)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bn_tpu_jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    from bn_tpu import curve, oracle as O
    from bn_tpu.fields import tower
    from bn_tpu.ate import pairing_batch

    B = 8
    ks1 = [100 + k for k in range(B)]
    ks2 = [200 + k for k in range(B)]
    p = curve.to_device(curve.g1_spec(), [O.g1_mul(O.G1_ONE, k) for k in ks1])
    q = curve.to_device(curve.g2_spec(), [O.g2_mul(O.G2_ONE, k) for k in ks2])

    fn = jax.jit(pairing_batch)
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(p, q))
    print(f"compile+run (B={B}): {time.perf_counter() - t0:.2f}s")

    got = tower.fq12_from_device(np.asarray(out))
    ok = 0
    for i in range(B):
        expect = O.pairing(O.g1_mul(O.G1_ONE, ks1[i]), O.g2_mul(O.G2_ONE, ks2[i]))
        if got[i] == expect:
            ok += 1
        else:
            print(f"MISMATCH at {i}")
    print(f"{ok}/{B} pairings bit-exact vs oracle")

    # time a couple of real executions at a bigger batch
    for B2 in (1024, 4096):
        p2 = tuple(np.repeat(np.asarray(c), B2 // B, axis=-1) for c in p)
        q2 = tuple(np.repeat(np.asarray(c), B2 // B, axis=-1) for c in q)
        out = jax.block_until_ready(fn(p2, q2))  # compile for this shape
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(p2, q2)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"B={B2}: {dt*1e3:.1f} ms/batch -> {B2/dt:,.0f} pairings/s")
        # verify one lane of the big batch too
        g0 = tower.fq12_from_device(np.asarray(out)[..., :1])[0]
        e0 = O.pairing(O.g1_mul(O.G1_ONE, ks1[0]), O.g2_mul(O.G2_ONE, ks2[0]))
        print("  lane0 exact:", g0 == e0)


if __name__ == "__main__":
    main()
