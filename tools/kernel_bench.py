"""Per-kernel speed-report harness (the TestBench analog, reference
test/TestBench.cpp:98-271: every primitive is timed against its C
reference and reported as a table).

Times each registered kernel on the current JAX backend (median wall of
--iters runs after warmup, block_until_ready) and prints one JSON line
per kernel: {kernel, shape, ms, items_per_s, backend}. Pairs of
implementations (jnp vs pallas) additionally report the speedup.

Usage:
    python tools/kernel_bench.py [--quick] [--iters 9]
    X265TPU_PLATFORM=cpu python tools/kernel_bench.py --quick
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import x265_tpu  # noqa: F401  (X265TPU_PLATFORM hook must run before
#                               any jax.devices() — a dead TPU tunnel
#                               hangs backend init otherwise)


def _time(fn, iters):
    import jax
    for _ in range(2):                       # warmup / compile
        jax.block_until_ready(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def build_cases(quick: bool):
    import jax.numpy as jnp
    from x265_tpu.engine.me import satd8_batched, _int_search
    from x265_tpu.models.residual import (fwd_transform_b, quantize_b,
                                          rdoq_b, dequantize_b)
    from x265_tpu.ops.pallas_kernels import (HAVE_PALLAS, satd_pallas,
                                             sad_sweep_pallas)

    rng = np.random.default_rng(7)
    N = 1024 if quick else 8192
    a = jnp.asarray(rng.integers(0, 256, (N, 16, 16)).astype(np.int32))
    b = jnp.asarray(rng.integers(0, 256, (N, 16, 16)).astype(np.int32))

    H, W = (288, 352) if quick else (720, 1280)
    R = 8 if quick else 16
    cur = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    refp = jnp.asarray(rng.integers(0, 256,
                                    (H + 2 * R, W + 2 * R)).astype(np.int32))
    mvcost = jnp.zeros(((2 * R + 1) ** 2,), jnp.float32)

    M = 2048 if quick else 16384
    resi = jnp.asarray(rng.integers(-255, 256, (M, 16, 16)).astype(np.int32))
    qp = jnp.full((M,), 30, jnp.int32)

    cases = [
        ("satd_16x16/jnp", f"[{N},16,16]", N,
         lambda: satd8_batched(a, b)),
        ("sad_sweep/jnp", f"{W}x{H} R{R}", (2 * R + 1) ** 2,
         lambda: _int_search(cur, refp, mvcost, 16, R)),
        ("dct16/batched", f"[{M},16,16]", M,
         lambda: fwd_transform_b(resi, 16, False, 8)),
        ("quant16/batched", f"[{M},16,16]", M,
         lambda: quantize_b(fwd_transform_b(resi, 16, False, 8),
                            qp, 16, False, 8)),
        ("rdoq16/batched", f"[{M},16,16]", M,
         lambda: rdoq_b(fwd_transform_b(resi, 16, False, 8),
                        quantize_b(fwd_transform_b(resi, 16, False, 8),
                                   qp, 16, False, 8), qp, 16, 8)),
        ("dequant16/batched", f"[{M},16,16]", M,
         lambda: dequantize_b(quantize_b(
             fwd_transform_b(resi, 16, False, 8), qp, 16, False, 8),
             qp, 16, 8)),
    ]
    if HAVE_PALLAS:
        import jax
        interp = jax.devices()[0].platform != "tpu"
        cases += [
            ("satd_16x16/pallas", f"[{N},16,16]", N,
             lambda: satd_pallas(a, b, interpret=interp)),
            ("sad_sweep/pallas", f"{W}x{H} R{R}", (2 * R + 1) ** 2,
             lambda: sad_sweep_pallas(cur, refp, 16, R,
                                      interpret=interp)),
        ]
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-pallas", action="store_true",
                    help="skip pallas cases (interpret mode is slow off-TPU)")
    args = ap.parse_args()

    import jax
    backend = jax.devices()[0].platform
    results = {}
    for name, shape, items, fn in build_cases(args.quick):
        if args.no_pallas and "/pallas" in name:
            continue
        print(f"[kernel_bench] {name} ...", file=sys.stderr, flush=True)
        try:
            ms = _time(fn, args.iters) * 1000.0
        except Exception as e:         # report, keep the table going
            print(json.dumps({"kernel": name, "error": str(e)[:200]}))
            continue
        results[name] = ms
        print(json.dumps({
            "kernel": name, "shape": shape, "ms": round(ms, 3),
            "items_per_s": round(items / (ms / 1000.0)),
            "backend": backend}))
    for base in ("satd_16x16", "sad_sweep"):
        j, p = results.get(f"{base}/jnp"), results.get(f"{base}/pallas")
        if j and p:
            print(json.dumps({"kernel": f"{base}/speedup_pallas_vs_jnp",
                              "x": round(j / p, 2), "backend": backend}))


if __name__ == "__main__":
    main()
