"""Main10 (10-bit) tests — BASELINE config #4 ladder start.

Arbiters: libde265 (decodes Main10 fine once called with proper ctypes
prototypes), lossless bit-exactness, and the reference x265 binary built
with HIGH_BIT_DEPTH (.refbuild10) whose streams our decoder must decode
identically to libde265."""
import os
import subprocess

import numpy as np
import pytest

from x265_tpu.decoder import de265
from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset, param_parse
from x265_tpu.decoder.decoder import HEVCDecoder


def _clip10(w=96, h=64, n=4, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (512 + 300 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(int)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, i * 2, 1) +
                    rng.integers(-20, 20, (h, w)), 0, 1023).astype(np.uint16)
        cb = np.clip(480 + 100 * np.sin(xx[::2, ::2] / 9.0),
                     0, 1023).astype(np.uint16)
        cr = np.clip(520 + 100 * np.cos(yy[::2, ::2] / 7.0) + i,
                     0, 1023).astype(np.uint16)
        out.append((y, cb, cr))
    return out


def test_main10_lossless_bit_exact():
    frames = _clip10()
    p = param_default_preset("medium")
    p.width, p.height, p.bit_depth = 96, 64, 10
    param_parse(p, "lossless")
    p.bframes = 2
    stream = Encoder(p).encode(frames)
    ours = HEVCDecoder().decode(stream)
    assert len(ours) == 4
    for i, o in enumerate(ours):
        assert np.array_equal(o.y, frames[i][0].astype(np.int32)), i
        assert np.array_equal(o.cb, frames[i][1].astype(np.int32)), i
        assert np.array_equal(o.cr, frames[i][2].astype(np.int32)), i


def test_main10_cqp_full_stack():
    """CQP with B frames, AQ, deblock, SAO at 10 bits: encoder closed-loop
    recon must equal the in-repo decode, PSNR sane."""
    frames = _clip10()
    p = param_default_preset("medium")
    p.width, p.height, p.bit_depth = 96, 64, 10
    p.qp, p.rc_mode, p.bframes = 32, RC_CQP, 2
    enc = Encoder(p)
    stream = enc.encode(frames)
    ours = HEVCDecoder().decode(stream)
    assert len(ours) == 4
    err = ours[0].y - frames[0][0].astype(np.int64)
    psnr = 10 * np.log10(1023 ** 2 / max(1e-9, float((err ** 2).mean())))
    assert psnr > 34
    if de265.available():
        ext = de265.decode(stream)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i
            assert np.array_equal(o.cb, e[1].astype(np.int32)), i
            assert np.array_equal(o.cr, e[2].astype(np.int32)), i


_REF10 = "/root/repo/.refbuild10/x265"


@pytest.mark.skipif(not os.path.exists(_REF10),
                    reason="10-bit reference x265 not built")
def test_main10_decode_reference_stream(tmp_path):
    """Our decoder must decode a Main10 stream from the reference x265."""
    w, h, n = 96, 64, 3
    frames = _clip10(w, h, n)
    raw = tmp_path / "in10.yuv"
    with open(raw, "wb") as f:
        for (y, cb, cr) in frames:
            f.write(y.astype("<u2").tobytes())
            f.write(cb.astype("<u2").tobytes())
            f.write(cr.astype("<u2").tobytes())
    out = tmp_path / "ref10.hevc"
    r = subprocess.run(
        [_REF10, "--input", str(raw), "--input-res", f"{w}x{h}",
         "--fps", "25", "--input-depth", "10", "--output-depth", "10",
         "--preset", "ultrafast", "--qp", "30", "--no-wpp",
         "--frames", str(n), "--bframes", "0", "--ref", "1",
         "--no-sao", "--no-deblock", "--no-signhide", "--rd", "2",
         "--no-weightp", "--no-rect", "--no-amp", "--max-merge", "2",
         "--no-temporal-mvp", "--output", str(out)],
        capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[:500]
    pics = HEVCDecoder().decode(out.read_bytes())
    assert len(pics) == n
    if de265.available():   # our decode of the reference stream == libde265
        ext = de265.decode(out.read_bytes())
        for i, (o, e) in enumerate(zip(pics, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i
    err = pics[0].y - frames[0][0].astype(np.int64)
    psnr = 10 * np.log10(1023 ** 2 / max(1e-9, float((err ** 2).mean())))
    assert psnr > 35
