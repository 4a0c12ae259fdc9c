"""End-to-end all-intra encode/decode tests (BASELINE config #1 ladder).

Mirrors x265's test strategy (SURVEY.md §4): every bitstream is
decode-verified — by the in-repo reference decoder always, and by the
independent system decoder (libde265) when present. x265-produced golden
streams additionally pin spec conformance of the shared tables/syntax.
"""
import os
import subprocess

import numpy as np
import pytest

from x265_tpu.api.params import param_default_preset, param_parse, RC_CQP
from x265_tpu.api.encoder import Encoder
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.decoder import de265

X265_BIN = "/root/repo/.refbuild8/x265"


def _test_frames(w, h, n=1, seed=11):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        y = ((xx + yy * 2 + i * 17) % 256).astype(np.uint8)
        y[h // 4:h // 2, w // 6:w // 2] = (80 + i * 30) % 256
        y = np.clip(y.astype(int) + rng.integers(-10, 10, (h, w)), 0, 255).astype(np.uint8)
        cb = ((xx[::2, ::2] // 3 + i * 5) % 256).astype(np.uint8)
        cr = ((yy[::2, ::2] // 3 + 100) % 256).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def test_lossless_roundtrip_own_decoder():
    frames = _test_frames(96, 64)
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    param_parse(p, "lossless")
    stream = Encoder(p).encode(frames)
    pics = HEVCDecoder().decode(stream)
    for (y, cb, cr), d in zip(frames, pics):
        assert np.array_equal(d.y, y.astype(np.int32))
        assert np.array_equal(d.cb, cb.astype(np.int32))
        assert np.array_equal(d.cr, cr.astype(np.int32))


@pytest.mark.skipif(not de265.available(), reason="libde265 not present")
def test_lossless_conformance_libde265():
    frames = _test_frames(96, 64, n=2)
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    param_parse(p, "lossless")
    stream = Encoder(p).encode(frames)
    pics = de265.decode(stream)
    assert len(pics) == 2
    for (y, cb, cr), (dy, dcb, dcr) in zip(frames, pics):
        assert np.array_equal(dy, y)
        assert np.array_equal(dcb, cb)
        assert np.array_equal(dcr, cr)


@pytest.mark.skipif(not de265.available(), reason="libde265 not present")
def test_lossless_sparse_residual_conformance():
    """Regression: the transIdxLps[28] / pState-63 table bugs showed up only
    on sparse multi-CG residuals at deep-MPS states (qp 4)."""
    rng = np.random.default_rng(5)
    w = h = 32
    for trial in range(4):
        r = (rng.random((16, 16)) < 0.2) * rng.integers(-2, 3, (16, 16))
        src = np.full((h, w), 128, np.int32)
        src[:16, :16] = np.clip(128 + r, 0, 255)
        y = src.astype(np.uint8)
        cb = np.full((16, 16), 128, np.uint8)
        cr = np.full((16, 16), 128, np.uint8)
        p = param_default_preset("ultrafast")
        p.width, p.height = w, h
        param_parse(p, "lossless")
        stream = Encoder(p).encode([(y, cb, cr)])
        out = de265.decode(stream)[0][0].astype(int)
        assert np.array_equal(out, src), f"trial {trial}"


def test_cqp_recon_matches_decoder():
    frames = _test_frames(96, 64)
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    p.rc_mode = RC_CQP
    p.qp = 30
    p.lossless = False
    enc = Encoder(p)
    stream = enc.encode(frames)
    d = HEVCDecoder().decode(stream)[0]
    # encoder-side recon must equal decoder recon (closed loop)
    ry, rcb, rcr = enc._last_recon
    assert np.array_equal(d.y, ry)
    assert np.array_equal(d.cb, rcb)
    assert np.array_equal(d.cr, rcr)
    err = d.y - frames[0][0].astype(np.int64)
    psnr = 10 * np.log10(255 ** 2 / max(1e-9, float((err ** 2).mean())))
    assert psnr > 28.0


@pytest.mark.skipif(not de265.available(), reason="libde265 not present")
def test_cqp_conformance_libde265():
    frames = _test_frames(96, 64)
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    p.rc_mode = RC_CQP
    p.qp = 26
    p.lossless = False
    stream = Encoder(p).encode(frames)
    dy = de265.decode(stream)[0][0].astype(np.int32)
    own = HEVCDecoder().decode(stream)[0].y
    assert np.array_equal(dy, own)


@pytest.mark.skipif(not os.path.exists(X265_BIN) or not de265.available(),
                    reason="x265 reference binary not built")
def test_decode_x265_lossless_stream(tmp_path):
    """Cross-validation: our decoder must bit-exactly decode streams from
    the reference x265 encoder (BASELINE config #1)."""
    from x265_tpu.io.y4m import write_y4m, VideoInfo
    frames = _test_frames(96, 64, n=2, seed=3)
    y4m = tmp_path / "in.y4m"
    hevc = tmp_path / "out.hevc"
    write_y4m(str(y4m), frames, VideoInfo(96, 64, 25, 1))
    subprocess.run([X265_BIN, "--input", str(y4m), "--output", str(hevc),
                    "--preset", "ultrafast", "--lossless", "--keyint", "1",
                    "--no-wpp", "--frames", "2", "--log-level", "0"],
                   check=True, capture_output=True)
    pics = HEVCDecoder().decode(hevc.read_bytes())
    assert len(pics) == 2
    for (y, cb, cr), d in zip(frames, pics):
        assert np.array_equal(d.y, y.astype(np.int32))
        assert np.array_equal(d.cb, cb.astype(np.int32))
        assert np.array_equal(d.cr, cr.astype(np.int32))
