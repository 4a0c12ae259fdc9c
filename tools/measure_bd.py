#!/usr/bin/env python3
"""Off-driver BD-rate measurement vs the x265 reference binary.

Round-3 VERDICT item #5: the bench's in-budget proxy (384x224 crop, 16
frames) needs a committed full-resolution confirmation.  This tool runs
outside any driver budget: encode the named clips at a CRF ladder with
BOTH encoders (ours and .refbuild8/x265 at the matched preset), decode
both through the same libde265 + PSNR harness (tools/quality.py), and
write a JSON report with per-clip BD-rate (negative = we save bits).

Usage:
  python3 tools/measure_bd.py --out QUALITY_r04.json          # full 720p
  python3 tools/measure_bd.py --crop --frames 16 --quick      # fast proxy

x265 reference invocation mirrors bench.py's bd_proxy stage
(regression-tests methodology: identical input, matched preset/CRF,
PSNR-YUV 6:1:1, Bjontegaard over >= 4 points; 3 points fall back to a
piecewise log-rate delta for --quick runs).
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_clips import frames_of                      # noqa: E402
from tools.quality import bd_rate, global_psnr              # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
X265_BIN = os.path.join(REPO, ".refbuild8", "x265")


def crop_clip(frames, W, H, yy=248, xx=448):
    return [(f[0][yy:yy + H, xx:xx + W],
             f[1][yy // 2:(yy + H) // 2, xx // 2:(xx + W) // 2],
             f[2][yy // 2:(yy + H) // 2, xx // 2:(xx + W) // 2])
            for f in frames]


def x265_points(src, W, H, crfs, preset, log):
    from x265_tpu.decoder import de265
    from x265_tpu.io.y4m import VideoInfo, write_y4m
    y4m = tempfile.mktemp(suffix=".y4m")
    write_y4m(y4m, src, VideoInfo(W, H, 25, 1))
    pts = []
    try:
        for crf in crfs:
            out = tempfile.mktemp(suffix=".hevc")
            t0 = time.time()
            subprocess.run(
                [X265_BIN, "--input", y4m, "--output", out,
                 "--preset", preset, "--crf", str(crf), "--log-level",
                 "none"], check=True, capture_output=True)
            stream = open(out, "rb").read()
            os.unlink(out)
            dec = de265.decode(stream)
            psnr = global_psnr(src, dec)[3]
            kbps = len(stream) * 8 * 25.0 / len(src) / 1000.0
            pts.append((kbps, psnr))
            log(f"  x265 crf{crf}: {kbps:.0f} kbps {psnr:.2f} dB "
                f"({time.time()-t0:.0f}s)")
    finally:
        os.unlink(y4m)
    return pts


def our_points(src, W, H, crfs, preset, log):
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.api.params import param_default_preset, param_parse
    from x265_tpu.decoder import de265
    pts = []
    for crf in crfs:
        p = param_default_preset(preset)
        p.width, p.height = W, H
        param_parse(p, "crf", str(crf))
        p.fps_num, p.fps_den = 25, 1
        t0 = time.time()
        stream = Encoder(p).encode(src)
        dec = de265.decode(stream)
        psnr = global_psnr(src, dec)[3]
        kbps = len(stream) * 8 * 25.0 / len(src) / 1000.0
        pts.append((kbps, psnr))
        log(f"  ours crf{crf}: {kbps:.0f} kbps {psnr:.2f} dB "
            f"({time.time()-t0:.0f}s)")
    return pts


def bd_or_delta(refpts, testpts):
    """BD-rate when >= 4 points; mean pairwise log-rate delta at matched
    quality (linear interp on the ref curve) for 3-point quick runs."""
    if len(refpts) >= 4 and len(testpts) >= 4:
        return round(bd_rate(refpts, testpts), 1)
    # piecewise: interpolate ref log-rate at each test psnr
    rp = sorted(refpts, key=lambda t: t[1])
    rx = [p for _, p in rp]
    ry = [np.log(k) for k, _ in rp]
    deltas = []
    for (k, p) in testpts:
        if rx[0] <= p <= rx[-1]:
            deltas.append(np.log(k) - np.interp(p, rx, ry))
    if not deltas:
        return None
    return round(float((np.exp(np.mean(deltas)) - 1.0) * 100.0), 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", default="pan720,zoom720")
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--crfs", default="25,28,31,34")
    ap.add_argument("--crop", action="store_true",
                    help="384x224 crop (CPU-feasible proxy)")
    ap.add_argument("--quick", action="store_true",
                    help="3 CRF points (piecewise delta, not true BD)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    def log(msg):
        print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)

    T0 = time.time()
    crfs = [int(c) for c in args.crfs.split(",")]
    if args.quick:
        crfs = crfs[:3] if len(crfs) > 3 else crfs
    report = {"preset": args.preset, "frames": args.frames,
              "crfs": crfs, "crop": bool(args.crop), "clips": {}}
    for clip in args.clips.split(","):
        frames = [tuple(np.asarray(x) for x in f)
                  for f in frames_of(clip)][:args.frames]
        if args.crop:
            W, H = 384, 224
            src = crop_clip(frames, W, H)
        else:
            H, W = frames[0][0].shape
            src = frames
        log(f"{clip}: {W}x{H} x{len(src)} frames, crfs {crfs}")
        refpts = x265_points(src, W, H, crfs, args.preset, log)
        ours = our_points(src, W, H, crfs, args.preset, log)
        bd = bd_or_delta(refpts, ours)
        log(f"{clip}: BD-rate {bd}% vs x265 {args.preset}")
        report["clips"][clip] = {
            "bd_rate_pct": bd,
            "x265_points": [[round(k, 1), round(p, 3)] for k, p in refpts],
            "our_points": [[round(k, 1), round(p, 3)] for k, p in ours]}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        log(f"wrote {args.out}")
    print(json.dumps({c: v["bd_rate_pct"]
                      for c, v in report["clips"].items()}))


if __name__ == "__main__":
    main()
