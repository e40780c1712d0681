"""The reference's 16-microbenchmark suite, batched (reference: benches/api.rs).

Each benchmark mirrors a reference `#[bench]` by name; values are reported as
per-element ns (amortized across the batch) plus batch throughput — the
TPU-native analogue of the reference's per-op numbers.

Run: python benchmarks/api_bench.py [--batch N] [--json]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, *args, iters=5):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run(batch: int, as_json: bool):
    import jax

    from bn_tpu import Fr, G1, G2, pairing
    from bn_tpu.api import _jit

    results = {}

    fr_a, fr_b = Fr.random(1, batch), Fr.random(2, batch)
    g1_a, g1_b = G1.random(3, batch), G1.random(4, batch)
    g2_a, g2_b = G2.random(5, batch), G2.random(6, batch)

    # serialization (host codec; measured per element)
    g1n = g1_a  # random points are unnormalized (Jacobian from ladder)
    t0 = time.perf_counter()
    enc = g1n.to_bytes()
    results["g1_serialization"] = (time.perf_counter() - t0) / batch
    g1norm = g1_a.normalize()
    t0 = time.perf_counter()
    enc1 = g1norm.to_bytes()
    results["g1_serialization_normalized"] = (time.perf_counter() - t0) / batch
    t0 = time.perf_counter()
    G1.from_bytes(enc1)
    results["g1_deserialization"] = (time.perf_counter() - t0) / batch

    t0 = time.perf_counter()
    enc2 = g2_a.to_bytes()
    results["g2_serialization"] = (time.perf_counter() - t0) / batch
    g2norm = g2_a.normalize()
    t0 = time.perf_counter()
    enc2n = g2norm.to_bytes()
    results["g2_serialization_normalized"] = (time.perf_counter() - t0) / batch
    t0 = time.perf_counter()
    G2.from_bytes(enc2n)
    results["g2_deserialization"] = (time.perf_counter() - t0) / batch

    # field ops
    results["fr_addition"] = _timeit(_jit("fr_add"), fr_a.dev, fr_b.dev) / batch
    results["fr_subtraction"] = _timeit(_jit("fr_sub"), fr_a.dev, fr_b.dev) / batch
    results["fr_multiplication"] = _timeit(_jit("fr_mul"), fr_a.dev, fr_b.dev) / batch
    results["fr_inverses"] = _timeit(_jit("fr_inv"), fr_a.dev) / batch

    # group ops
    results["g1_addition"] = _timeit(_jit("g1_add"), g1_a.dev, g1_b.dev) / batch
    results["g1_subtraction"] = (
        _timeit(lambda a, b: _jit("g1_add")(a, _jit("g1_neg")(b)), g1_a.dev, g1_b.dev)
        / batch
    )
    results["g1_scalar_multiplication"] = (
        _timeit(_jit("g1_mul"), g1_a.dev, fr_a.dev) / batch
    )
    results["g2_addition"] = _timeit(_jit("g2_add"), g2_a.dev, g2_b.dev) / batch
    results["g2_subtraction"] = (
        _timeit(lambda a, b: _jit("g2_add")(a, _jit("g2_neg")(b)), g2_a.dev, g2_b.dev)
        / batch
    )
    results["g2_scalar_multiplication"] = (
        _timeit(_jit("g2_mul"), g2_a.dev, fr_a.dev) / batch
    )

    # Gt ops (built from two pairings, like the reference)
    gt1 = pairing(g1_a, g2_a)
    gt2 = pairing(g1_b, g2_b)
    results["fq12_scalar_multiplication"] = (
        _timeit(_jit("gt_mul"), gt1.dev, gt2.dev) / batch
    )
    results["fq12_exponentiation"] = _timeit(_jit("gt_pow"), gt1.dev, fr_a.dev) / batch

    # the headline op
    results["perform_pairing"] = _timeit(_jit("pairing"), g1_a.dev, g2_a.dev) / batch

    if as_json:
        print(json.dumps({k: v * 1e9 for k, v in results.items()}))
    else:
        print(f"# batch={batch}, backend={jax.default_backend()}")
        print(f"{'benchmark':36s} {'ns/elem':>12s} {'elems/s':>14s}")
        for k, v in results.items():
            print(f"{k:36s} {v * 1e9:12.1f} {1 / v:14.0f}")
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    import jax

    batch = args.batch or (8192 if jax.default_backend() == "tpu" else 16)
    run(batch, args.json)
