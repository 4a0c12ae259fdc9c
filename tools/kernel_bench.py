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


# v5e single-chip roofline (public spec): ~197 bf16 TFLOP/s /
# ~394 int8 TOP/s on the MXU, ~819 GB/s HBM
PEAK_BW_GBPS = 819.0
PEAK_I8_TOPS = 394.0


def _force(r):
    """Force execution with a tiny download: on the tunneled device
    block_until_ready can return before the work runs (measured), so a
    reduction + np.asarray is the only honest fence."""
    import jax.numpy as jnp
    import jax
    leaves = jax.tree_util.tree_leaves(r)
    return np.asarray(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))


def _time(fn, iters):
    for _ in range(2):                       # warmup / compile
        _force(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn())
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
        if not interp:
            # the PRODUCTION Pallas MC kernels (default-on for TPU since
            # r5) vs the XLA gather twin they replaced
            import os as _os
            import jax.numpy as jnp
            from x265_tpu.models.inter_residual import (_mc_gather,
                                                        _LUMA_FILT)
            Hm, Wm, pad = (288, 352, 80) if quick else (1088, 1920, 80)
            NL = 4096 if quick else 40800
            pl_ = jnp.asarray(rng.integers(
                0, 255, (2, Hm + 2 * pad, Wm + 2 * pad)).astype(np.int16))
            ridx = jnp.asarray(rng.integers(0, 2, NL).astype(np.int32))
            x0 = jnp.asarray(rng.integers(0, Wm - 16, NL).astype(np.int32))
            y0 = jnp.asarray(rng.integers(0, Hm - 16, NL).astype(np.int32))
            mvx = jnp.asarray(rng.integers(-228, 228, NL).astype(np.int32))
            mvy = jnp.asarray(rng.integers(-228, 228, NL).astype(np.int32))
            fl = jnp.asarray(_LUMA_FILT)
            # useful bytes: every lane reads a 23x23 i16 window + writes
            # 16x16 i32 (padding DMA overhead not counted as useful)
            mc_bytes = NL * (23 * 23 * 2 + 16 * 16 * 4)

            def mc_jit(flag):
                # trace once under the right gate value; the jit object
                # caches the traced graph for all later calls
                old = _os.environ.get("X265TPU_PALLAS_MC")
                _os.environ["X265TPU_PALLAS_MC"] = flag
                try:
                    f = jax.jit(lambda *a: _mc_gather(
                        *a, filt=fl, fb=2, n=16, taps=8, pad=pad, bd=8))
                    f(pl_, ridx, x0, y0, mvx, mvy)   # trace now
                finally:
                    if old is None:
                        _os.environ.pop("X265TPU_PALLAS_MC", None)
                    else:
                        _os.environ["X265TPU_PALLAS_MC"] = old
                return f
            f1, f0 = mc_jit("1"), mc_jit("0")
            cases += [
                ("mc_gather16/pallas", f"[{NL}]x23x23", NL,
                 lambda: f1(pl_, ridx, x0, y0, mvx, mvy), mc_bytes),
                ("mc_gather16/jnp", f"[{NL}]x23x23", NL,
                 lambda: f0(pl_, ridx, x0, y0, mvx, mvy), mc_bytes),
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
    for case in build_cases(args.quick):
        name, shape, items, fn = case[:4]
        nbytes = case[4] if len(case) > 4 else None
        if args.no_pallas and "/pallas" in name:
            continue
        print(f"[kernel_bench] {name} ...", file=sys.stderr, flush=True)
        try:
            ms = _time(fn, args.iters) * 1000.0
        except Exception as e:         # report, keep the table going
            print(json.dumps({"kernel": name, "error": str(e)[:200]}))
            continue
        results[name] = ms
        rec = {"kernel": name, "shape": shape, "ms": round(ms, 3),
               "items_per_s": round(items / (ms / 1000.0)),
               "backend": backend}
        if nbytes:
            gbps = nbytes / (ms / 1000.0) / 1e9
            rec["useful_gbps"] = round(gbps, 1)
            rec["pct_peak_bw"] = round(100.0 * gbps / PEAK_BW_GBPS, 1)
        print(json.dumps(rec))
    for base in ("satd_16x16", "sad_sweep", "mc_gather16"):
        j, p = results.get(f"{base}/jnp"), results.get(f"{base}/pallas")
        if j and p:
            print(json.dumps({"kernel": f"{base}/speedup_pallas_vs_jnp",
                              "x": round(j / p, 2), "backend": backend}))


if __name__ == "__main__":
    main()
