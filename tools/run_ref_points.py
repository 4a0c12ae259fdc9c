"""Generate the x265 reference operating points for the BD-rate bench.

Runs the in-repo reference x265 CLI binary (.refbuild8, built from
/root/reference with ENABLE_ASSEMBLY=OFF — the only build this single-core
box supports) over the deterministic harness clips at 4 CRF points x
{ultrafast, medium}, measures each stream with the same libde265+PSNR
harness used for x265_tpu, and stores everything in bench_refpoints.json.

bench.py consumes the stored points at round-end bench time so the
(slow, CPU-bound) reference side never runs on the bench clock. Re-run
this script only if tools/make_clips.py changes.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_clips import CLIPS, frames_of, write_clip  # noqa: E402
from tools.quality import measure_stream  # noqa: E402

X265 = os.path.join(os.path.dirname(__file__), "..", ".refbuild8", "x265")
CRFS = [22, 27, 32, 37]
PRESETS = ["ultrafast", "medium"]
BD_CLIPS = ["pan720", "zoom720", "cutfade720"]
FPS = 25.0


def run_x265(clip_path: str, preset: str, crf: int, out_path: str,
             extra=()) -> float:
    t0 = time.time()
    subprocess.run(
        [X265, "--preset", preset, "--crf", str(crf), "--psnr",
         clip_path, "-o", out_path, *extra],
        check=True, capture_output=True)
    return time.time() - t0


def main():
    outdir = "/tmp/clips"
    os.makedirs(outdir, exist_ok=True)
    points = {}
    for name in BD_CLIPS:
        clip = os.path.join(outdir, name + ".y4m")
        if not os.path.exists(clip):
            write_clip(name, clip)
        src = frames_of(name)
        for preset in PRESETS:
            for crf in CRFS:
                out = f"/tmp/ref_{name}_{preset}_{crf}.hevc"
                dt = run_x265(clip, preset, crf, out)
                with open(out, "rb") as f:
                    stream = f.read()
                m = measure_stream(stream, src, FPS)
                m["fps_encode"] = len(src) / dt
                points[f"{name}/{preset}/crf{crf}"] = m
                print(f"{name} {preset} crf{crf}: {m['kbps']:.0f} kbps "
                      f"{m['psnr_yuv']:.2f} dB  ({m['fps_encode']:.2f} fps)",
                      flush=True)
    # 1080p medium speed reference (single point, for fps context)
    clip = os.path.join(outdir, "crowd1080.y4m")
    if not os.path.exists(clip):
        write_clip("crowd1080", clip)
    out = "/tmp/ref_crowd1080_medium.hevc"
    dt = run_x265(clip, "medium", 27, out)
    n = CLIPS["crowd1080"][3]
    points["crowd1080/medium/crf27"] = {"fps_encode": n / dt}
    print(f"crowd1080 medium: {n / dt:.2f} fps", flush=True)

    dst = os.path.join(os.path.dirname(__file__), "..",
                       "bench_refpoints.json")
    with open(dst, "w") as f:
        json.dump({"crfs": CRFS, "presets": PRESETS, "clips": BD_CLIPS,
                   "frames": {c: CLIPS[c][3] for c in CLIPS},
                   "x265_build": "8bit noasm single-thread-pool",
                   "points": points}, f, indent=1)
    print("wrote", dst)


if __name__ == "__main__":
    main()
