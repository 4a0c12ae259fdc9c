"""Benchmark suite: fps on the three ladder configs + BD-rate vs x265.

Prints ONE JSON line (the driver contract):
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N,
   "extras": {...}}

Primary metric: 1080p medium ABR fps on one chip — the BASELINE.json
north-star config (#3). vs_baseline is measured against the reference
x265 binary (8-bit build, same machine, 1 CPU core) on the identical
clip/config: 2.63 fps (bench_refpoints.json crowd1080/medium). The
extras carry the round-1 continuity config (720p all-intra lossless vs
the published 3.02 fps, doc/reST/lossless.rst:25-27), 720p CQP IPPP fps,
and BD-rate (PSNR-YUV) vs the x265 binary at 4 CRF points per clip
(negative = we need fewer bits at matched quality).

Progress goes to stderr; stdout carries only the JSON line.
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def encode_fps(frames, p, warm=12):
    """Best-of-2 fps over the clip (first run warms compiles on `warm`
    frames — enough to reach steady-state B-frame/ref-count shapes)."""
    from x265_tpu.api.encoder import Encoder
    Encoder(p.copy()).encode(frames[:min(warm, len(frames))])
    best = 0.0
    stream = b""
    for _ in range(2):
        enc = Encoder(p.copy())
        t0 = time.time()
        stream = enc.encode(frames)
        dt = time.time() - t0
        best = max(best, len(frames) / dt)
    return best, stream


def main():
    from x265_tpu.api.params import param_default_preset, param_parse
    from tools.make_clips import frames_of
    from tools.quality import bd_rate, measure_stream

    here = os.path.dirname(os.path.abspath(__file__))
    refpoints = json.load(open(os.path.join(here, "bench_refpoints.json")))
    extras = {}

    log("loading clips...")
    crowd = [tuple(np.asarray(x) for x in f) for f in frames_of("crowd1080")]
    pan = [tuple(np.asarray(x) for x in f) for f in frames_of("pan720")]

    # --- config 3 (north star): 1080p medium ABR ---
    p = param_default_preset("medium")
    p.width, p.height = 1920, 1080
    param_parse(p, "bitrate", "4000")
    p.fps_num, p.fps_den = 25, 1
    fps_1080, _ = encode_fps(crowd, p)
    ref_1080 = refpoints["points"]["crowd1080/medium/crf27"]["fps_encode"]
    log(f"1080p medium ABR: {fps_1080:.2f} fps (x265 same-box: "
        f"{ref_1080:.2f})")

    # --- config 1 continuity: 720p all-intra lossless (published 3.02) ---
    p = param_default_preset("ultrafast")
    p.width, p.height = 1280, 720
    param_parse(p, "lossless")
    param_parse(p, "keyint", "1")
    fps_ll, _ = encode_fps(pan[:24], p)
    extras["720p_allintra_lossless_fps"] = round(fps_ll, 2)
    extras["720p_allintra_lossless_vs_published_3.02"] = round(
        fps_ll / 3.02, 2)
    log(f"720p all-intra lossless: {fps_ll:.2f} fps ({fps_ll/3.02:.2f}x "
        "published)")

    # --- config 2: 720p CQP IPPP ultrafast ---
    p = param_default_preset("ultrafast")
    p.width, p.height = 1280, 720
    param_parse(p, "qp", "30")
    p.bframes = 0
    p.ref = 1
    fps_cqp, _ = encode_fps(pan[:24], p)
    extras["720p_cqp_ippp_fps"] = round(fps_cqp, 2)
    log(f"720p CQP IPPP: {fps_cqp:.2f} fps")

    # --- BD-rate vs x265 (medium, PSNR-YUV, 4 CRF points) ---
    crfs = refpoints["crfs"]
    bd_clips = (["pan720", "cutfade720", "zoom720"]
                if os.environ.get("BENCH_FULL") else ["pan720"])
    bds = {}
    for clip in bd_clips:
        src = [tuple(np.asarray(x) for x in f) for f in frames_of(clip)]
        pts = []
        for crf in crfs:
            p = param_default_preset("medium")
            p.width, p.height = 1280, 720
            param_parse(p, "crf", str(crf))
            p.fps_num, p.fps_den = 25, 1
            from x265_tpu.api.encoder import Encoder
            enc = Encoder(p)
            stream = enc.encode(src)
            m = measure_stream(stream, src, 25.0)
            pts.append((m["kbps"], m["psnr_yuv"]))
            log(f"  {clip} crf{crf}: {m['kbps']:.0f} kbps "
                f"{m['psnr_yuv']:.2f} dB")
        refpts = [(refpoints["points"][f"{clip}/medium/crf{c}"]["kbps"],
                   refpoints["points"][f"{clip}/medium/crf{c}"]["psnr_yuv"])
                  for c in crfs]
        try:
            bds[clip] = round(bd_rate(refpts, pts), 1)
        except ValueError:
            bds[clip] = None
        log(f"BD-rate {clip} medium: {bds[clip]}%")
    extras["bd_rate_medium_vs_x265_pct"] = bds

    out = {
        "metric": "1080p medium ABR encode fps (1 chip, e2e)",
        "value": round(fps_1080, 3),
        "unit": "fps",
        "vs_baseline": round(fps_1080 / ref_1080, 3),
        "extras": extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
