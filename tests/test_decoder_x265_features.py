"""Decoder breadth vs reference x265 streams (SURVEY §4 verification
strategy: the in-repo decoder must match the independent system decoder
libde265 on streams from the reference encoder).

Round-3 features under test: WPP substream parsing (entry points +
context sync, spec 9.3.1; x265 frameencoder.cpp serializeSubstreams),
scaling lists (7.3.4/7.4.5; scalinglist.cpp), sub-CTB quantization
groups (8.6.1 qPY_PRED left/above averaging; x265 --qg-size).
"""
import os
import subprocess

import numpy as np
import pytest

from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.decoder import de265

X265_BIN = "/root/repo/.refbuild8/x265"

pytestmark = pytest.mark.skipif(
    not os.path.exists(X265_BIN) or not de265.available(),
    reason="reference x265 binary or libde265 not present")


def _frames(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    out = []
    base = rng.integers(16, 235, (h + 32, w + 32), np.uint8)
    for i in range(n):
        y = base[i:i + h, 2 * i:2 * i + w].copy()
        y[h // 4:h // 2, w // 8:w // 2] = rng.integers(
            0, 255, (h // 2 - h // 4, w // 2 - w // 8), np.uint8)
        cb = ((np.mgrid[0:h // 2, 0:w // 2][1] + 3 * i) % 200 + 20).astype(np.uint8)
        cr = np.full((h // 2, w // 2), 128, np.uint8)
        out.append((y, cb, cr))
    return out


def _x265_stream(tmp_path, frames, w, h, args):
    from x265_tpu.io.y4m import write_y4m, VideoInfo
    y4m = tmp_path / "in.y4m"
    hevc = tmp_path / "out.hevc"
    write_y4m(str(y4m), frames, VideoInfo(w, h, 25, 1))
    subprocess.run([X265_BIN, "--input", str(y4m), "--output", str(hevc),
                    "--frames", str(len(frames)), "--log-level", "0"] + args,
                   check=True, capture_output=True)
    return hevc.read_bytes()


def _assert_matches_de265(data):
    ours = HEVCDecoder().decode(data)
    ref = de265.decode(data)
    assert len(ours) == len(ref)
    for i, (a, b) in enumerate(zip(ours, ref)):
        for plane, pb in zip(("y", "cb", "cr"), b):
            pa = getattr(a, plane).astype(np.int32)
            pb = np.asarray(pb).astype(np.int32)
            assert np.array_equal(pa, pb), (
                f"frame {i} plane {plane}: maxdiff "
                f"{np.abs(pa - pb).max()} at "
                f"{np.unravel_index(np.abs(pa - pb).argmax(), pa.shape)}")
    return ours


def test_wpp_intra_stream(tmp_path):
    """WPP all-intra: ≥2 CTU rows → entry points + context sync."""
    frames = _frames(192, 128, 2)
    data = _x265_stream(tmp_path, frames, 192, 128,
                        ["--preset", "superfast", "--wpp", "--keyint", "1",
                         "--qp", "30", "--no-sao"])
    _assert_matches_de265(data)


def test_wpp_inter_stream(tmp_path):
    """WPP P/B stream at medium defaults (WPP+AQ/dqp+SAO+deblock)."""
    frames = _frames(192, 128, 5)
    data = _x265_stream(tmp_path, frames, 192, 128,
                        ["--preset", "medium", "--wpp", "--crf", "30"])
    _assert_matches_de265(data)


def test_scaling_list_stream(tmp_path):
    """Default (Table 7-5/7-6) scaling lists signalled in the SPS."""
    frames = _frames(128, 96, 2)
    data = _x265_stream(tmp_path, frames, 128, 96,
                        ["--preset", "superfast", "--no-wpp", "--keyint", "1",
                         "--qp", "27", "--scaling-list", "default"])
    _assert_matches_de265(data)


def test_qg_size_stream(tmp_path):
    """Sub-CTB quantization groups: AQ dqp with --qg-size 32 exercises the
    8.6.1 left/above qPY_PRED averaging (not just prev-QG)."""
    frames = _frames(192, 128, 3)
    data = _x265_stream(tmp_path, frames, 192, 128,
                        ["--preset", "superfast", "--no-wpp",
                         "--aq-mode", "2", "--aq-strength", "1.5",
                         "--qg-size", "32", "--crf", "28"])
    _assert_matches_de265(data)


def test_wpp_scaling_qg_combo(tmp_path):
    """Everything at once: WPP + scaling lists + sub-CTB QGs + SAO."""
    frames = _frames(192, 128, 3)
    data = _x265_stream(tmp_path, frames, 192, 128,
                        ["--preset", "medium", "--wpp", "--crf", "26",
                         "--scaling-list", "default", "--qg-size", "32"])
    _assert_matches_de265(data)


def test_nxn_intra_oracle_conformance(tmp_path):
    """PART_NxN intra 8x8 CUs (7.3.8.5 two-loop mode syntax + forced RQT
    split, 7.3.8.8): force every other 8x8 CU to NxN with varied per-PB
    modes through the oracle writer; the stream must decode identically
    in the in-repo decoder and libde265 (exercises z-scan/parse-order MPM
    availability inside the CU)."""
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.api.params import RC_CQP, param_default_preset

    w, h = 96, 64
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.qp, p.rc_mode = 30, RC_CQP
    p.keyint, p.bframes = 1, 0
    enc = Encoder(p)
    enc.use_native = False           # oracle writer carries NxN
    orig = enc._intra_decisions

    def patched(y):
        dec = orig(y)
        dec.cu_log2_map[:] = 3       # all-8x8 quadtree
        h8, w8 = dec.cu_log2_map.shape
        dec.nxn8 = (np.indices((h8, w8)).sum(0) % 2 == 0)
        m4 = np.repeat(np.repeat(dec.luma_mode8, 2, 0), 2, 1)
        m4[::2, 1::2] = (m4[::2, 1::2] + 7) % 35   # vary PB modes
        m4[1::2, ::2] = (m4[1::2, ::2] + 19) % 35
        dec.luma_mode4 = m4
        dec.chroma_mode8 = None      # DM chroma (derived from PB0)
        return dec

    enc._intra_decisions = patched
    frames = _frames(w, h, 2)
    stream = enc.encode(frames)
    pics = _assert_matches_de265(stream)
    assert len(pics) == 2
