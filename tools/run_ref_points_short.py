"""Generate SHORT-PREFIX x265 reference operating points for bench.py.

The driver runs bench.py under a hard timeout; round 2's bench timed out
because it encoded full 50-frame clips at every CRF point. The time-boxed
bench therefore encodes short clip prefixes — and BD-rate is only
meaningful when both encoders see the *identical* frames, so this script
measures the reference x265 binary on exactly those prefixes and stores
the points in bench_refpoints_short.json (committed; re-run only when
tools/make_clips.py or the prefix lengths change).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_clips import frames_of  # noqa: E402
from tools.quality import measure_stream  # noqa: E402
from x265_tpu.io.y4m import VideoInfo, write_y4m  # noqa: E402

X265 = os.path.join(os.path.dirname(__file__), "..", ".refbuild8", "x265")
CRFS = [22, 27, 32, 37]
FPS = 25.0
# (clip, prefix length) pairs the time-boxed bench encodes
BD_PREFIX = [("pan720", 16)]
PRIMARY_PREFIX = [("crowd1080", 32)]   # full clip (VERDICT r4 weak #5)


def write_prefix(name: str, n: int, path: str):
    frames = frames_of(name)[:n]
    h, w = frames[0][0].shape
    write_y4m(path, ((y.astype(np.uint8), cb.astype(np.uint8),
                      cr.astype(np.uint8)) for (y, cb, cr) in frames),
              VideoInfo(w, h, 25, 1))
    return frames


import numpy as np  # noqa: E402


def run_x265(clip_path, preset, out_path, extra=()):
    t0 = time.time()
    subprocess.run([X265, "--preset", preset, "--psnr", clip_path,
                    "-o", out_path, *extra],
                   check=True, capture_output=True)
    return time.time() - t0


def main():
    points = {}
    for name, n in BD_PREFIX:
        clip = f"/tmp/{name}_p{n}.y4m"
        src = write_prefix(name, n, clip)
        for crf in CRFS:
            out = f"/tmp/ref_{name}_p{n}_medium_{crf}.hevc"
            dt = run_x265(clip, "medium", out, ("--crf", str(crf)))
            stream = open(out, "rb").read()
            m = measure_stream(stream, src, FPS)
            m["fps_encode"] = n / dt
            points[f"{name}_p{n}/medium/crf{crf}"] = m
            print(f"{name}[:{n}] medium crf{crf}: {m['kbps']:.0f} kbps "
                  f"{m['psnr_yuv']:.2f} dB ({m['fps_encode']:.2f} fps)",
                  flush=True)
    for name, n in PRIMARY_PREFIX:
        clip = f"/tmp/{name}_p{n}.y4m"
        write_prefix(name, n, clip)
        out = f"/tmp/ref_{name}_p{n}_medium.hevc"
        # ABR at the same bitrate the bench's primary config uses
        dt = run_x265(clip, "medium", out, ("--bitrate", "4000"))
        points[f"{name}_p{n}/medium/abr4000"] = {"fps_encode": n / dt}
        print(f"{name}[:{n}] medium abr4000: {n / dt:.2f} fps", flush=True)

    dst = os.path.join(os.path.dirname(__file__), "..",
                       "bench_refpoints_short.json")
    with open(dst, "w") as f:
        json.dump({"crfs": CRFS,
                   "bd_prefix": {c: n for c, n in BD_PREFIX},
                   "primary_prefix": {c: n for c, n in PRIMARY_PREFIX},
                   "x265_build": "8bit noasm single-thread-pool",
                   "points": points}, f, indent=1)
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
