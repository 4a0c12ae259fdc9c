"""Quality harness: PSNR measurement + Bjontegaard BD-rate.

Both encoders' streams are decoded by the same independent decoder
(libde265) and measured by the same PSNR code, so cross-encoder deltas
are apples-to-apples (the BASELINE.json metric: "BD-rate vs x265 at
matched PSNR").
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np


def global_psnr(src_frames, dec_frames, bit_depth: int = 8):
    """Global PSNR from mean MSE over the sequence (x265 convention,
    encoder.cpp printSummary): returns (psnr_y, psnr_u, psnr_v, psnr_yuv)
    where yuv weights 6:1:1 on MSE."""
    peak = float((1 << bit_depth) - 1)
    n = min(len(src_frames), len(dec_frames))
    assert n > 0
    mse = np.zeros(3)
    for i in range(n):
        for c in range(3):
            a = np.asarray(src_frames[i][c], dtype=np.float64)
            b = np.asarray(dec_frames[i][c], dtype=np.float64)
            assert a.shape == b.shape, (i, c, a.shape, b.shape)
            mse[c] += float(np.mean((a - b) ** 2))
    mse /= n

    def p(m):
        return 99.99 if m <= 1e-12 else 10.0 * math.log10(peak * peak / m)

    myuv = (6.0 * mse[0] + mse[1] + mse[2]) / 8.0
    return p(mse[0]), p(mse[1]), p(mse[2]), p(myuv)


def measure_stream(stream: bytes, src_frames, fps: float,
                   bit_depth: int = 8):
    """Decode with libde265 and measure -> dict(kbps, psnr_y, psnr_yuv)."""
    from x265_tpu.decoder import de265
    dec = de265.decode(stream)
    assert len(dec) >= len(src_frames), (len(dec), len(src_frames))
    py, pu, pv, pyuv = global_psnr(src_frames, dec, bit_depth)
    kbps = len(stream) * 8 * fps / len(src_frames) / 1000.0
    return {"kbps": kbps, "psnr_y": py, "psnr_u": pu, "psnr_v": pv,
            "psnr_yuv": pyuv}


def bd_rate(ref_points: Sequence[Tuple[float, float]],
            test_points: Sequence[Tuple[float, float]]) -> float:
    """Bjontegaard delta-rate in percent (negative = test saves bits).

    points: [(kbps, psnr)] with >= 4 entries each. Classic method: cubic
    fit of log(rate) as a function of psnr, integrate over the
    overlapping psnr interval, convert the mean log-rate delta back to a
    percentage.
    """
    def prep(pts):
        pts = sorted(pts, key=lambda t: t[1])
        rate = np.log([p[0] for p in pts])
        psnr = np.array([p[1] for p in pts])
        return psnr, rate

    p1, r1 = prep(ref_points)
    p2, r2 = prep(test_points)
    lo = max(p1.min(), p2.min())
    hi = min(p1.max(), p2.max())
    if hi <= lo:
        raise ValueError("no overlapping quality interval for BD-rate")
    c1 = np.polyfit(p1, r1, min(3, len(p1) - 1))
    c2 = np.polyfit(p2, r2, min(3, len(p2) - 1))
    i1 = np.polyint(c1)
    i2 = np.polyint(c2)
    int1 = np.polyval(i1, hi) - np.polyval(i1, lo)
    int2 = np.polyval(i2, hi) - np.polyval(i2, lo)
    avg_diff = (int2 - int1) / (hi - lo)
    return float((math.exp(avg_diff) - 1.0) * 100.0)
