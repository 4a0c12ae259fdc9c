#!/usr/bin/env python3
"""Per-frame encode diagnostics on the pan-crop proxy clip: frame
types, QPs, bits vs the x265 binary — for chasing RC/slicetype
anomalies (e.g. a higher-CRF point spending MORE bits)."""
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_clips import frames_of                      # noqa: E402
from tools.measure_bd import crop_clip, X265_BIN            # noqa: E402


def main():
    crf = sys.argv[1] if len(sys.argv) > 1 else "34"
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    W, H = 384, 224
    src = crop_clip([tuple(np.asarray(x) for x in f)
                     for f in frames_of("pan720")][:N], W, H)
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.api.params import param_default_preset, param_parse
    p = param_default_preset("medium")
    p.width, p.height = W, H
    param_parse(p, "crf", crf)
    p.fps_num, p.fps_den = 25, 1
    p.csv_log_level = 2
    enc = Encoder(p)
    stream = enc.encode(src)
    print(f"ours crf{crf}: {len(stream)} bytes")
    for st in enc.frame_stats:
        extra = ""
        for k in ("cu_inter_pct", "avg_cu_size"):
            if k in st:
                extra += f" {k}={st[k]}"
        print(f"  poc={st['poc']:3d} {st['type']} qp={st['qp']:2d} "
              f"bits={st['bits']:7d}{extra}")
    # x265 for comparison (csv log)
    from x265_tpu.io.y4m import VideoInfo, write_y4m
    y4m = tempfile.mktemp(suffix=".y4m")
    write_y4m(y4m, src, VideoInfo(W, H, 25, 1))
    out = tempfile.mktemp(suffix=".hevc")
    csv = tempfile.mktemp(suffix=".csv")
    subprocess.run([X265_BIN, "--input", y4m, "--output", out,
                    "--preset", "medium", "--crf", crf,
                    "--csv", csv, "--csv-log-level", "1",
                    "--log-level", "none"], check=True)
    print(f"x265 crf{crf}: {os.path.getsize(out)} bytes")
    import csv as csvmod
    with open(csv) as f:
        rd = csvmod.DictReader(f)
        for row in rd:
            ty = (row.get(" Slice type") or row.get("Slice type")
                  or "?").strip()
            qp = (row.get(" QP") or row.get("QP") or "?").strip()
            bits = (row.get(" Bits") or row.get("Bits") or "?").strip()
            poc = (row.get(" POC") or row.get("POC") or "?").strip()
            print(f"  poc={poc:>3s} {ty} qp={qp} bits={bits}")
    for f_ in (y4m, out, csv):
        os.unlink(f_)


if __name__ == "__main__":
    main()
