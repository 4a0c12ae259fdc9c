"""Application/IO tail: HDR10+ dynamic metadata SEIs (--dhdr10-info,
x265 dynamicHDR10/hdr10plus.h), ReconPlay display-order streaming
(source/output/reconplay.cpp), and depth-reducing dither
(x265_dither_image, x265.h:2150).
"""
import json
import os

import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse
from x265_tpu.hevc.bitstream import split_annexb, strip_emulation_prevention
from x265_tpu.hevc.dhdr10 import (dhdr10_sei, pack_st2094_40,
                                  parse_st2094_40,
                                  SEI_USER_DATA_REGISTERED)
from x265_tpu.hevc.sei import parse_sei

META = {
    "BezierCurveData": {
        "Anchors": [102, 205, 307, 410, 512, 614, 717, 819, 922],
        "KneePointX": 10, "KneePointY": 25},
    "LuminanceParameters": {
        "AverageRGB": 400,
        "LuminanceDistributions": {
            "DistributionIndex": [1, 5, 10, 25, 50, 75, 90, 95, 99],
            "DistributionValues": [17, 100000, 201, 301, 405, 510,
                                   615, 720, 844]},
        "MaxScl": [17830, 16895, 14252]},
    "NumberOfWindows": 1,
    "TargetedSystemDisplayMaximumLuminance": 400,
}


def _collect_seis(bs, payload_type):
    out = []
    for nal in split_annexb(bs):
        if (nal[0] >> 1) & 0x3F == 39:
            for pt, pl in parse_sei(strip_emulation_prevention(nal[2:])):
                if pt == payload_type:
                    out.append(pl)
    return out


def test_st2094_40_roundtrip():
    payload = pack_st2094_40(META)
    back = parse_st2094_40(payload)
    assert back["TargetedSystemDisplayMaximumLuminance"] == 400
    lp = back["LuminanceParameters"]
    assert lp["MaxScl"] == [17830, 16895, 14252]
    assert lp["AverageRGB"] == 400
    assert (lp["LuminanceDistributions"]["DistributionValues"]
            == META["LuminanceParameters"]["LuminanceDistributions"]
            ["DistributionValues"])
    bez = back["BezierCurveData"]
    assert (bez["KneePointX"], bez["KneePointY"]) == (10, 25)
    assert bez["Anchors"] == META["BezierCurveData"]["Anchors"]


def _small_frames(n, seed=7, h=64, w=96):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w)).astype(np.uint8)
    out = []
    for i in range(n):
        y = np.roll(base, i * 2, axis=1)
        out.append((y, np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 130, np.uint8)))
    return out


def test_dhdr10_sei_per_frame(tmp_path):
    """One HDR10+ SEI per AU, indexed by display order."""
    n = 4
    frames = []
    for i in range(n):
        m = json.loads(json.dumps(META))
        m["TargetedSystemDisplayMaximumLuminance"] = 100 + i
        frames.append(m)
    jpath = tmp_path / "hdr10plus.json"
    jpath.write_text(json.dumps({"SceneInfo": frames}))

    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    p.bframes = 2
    p.b_adapt = 0
    p.scenecut = 0
    param_parse(p, "qp", "30")
    param_parse(p, "dhdr10-info", str(jpath))
    bs = Encoder(p).encode(_small_frames(n))
    seis = _collect_seis(bs, SEI_USER_DATA_REGISTERED)
    assert len(seis) == n
    lums = sorted(parse_st2094_40(pl)
                  ["TargetedSystemDisplayMaximumLuminance"] for pl in seis)
    assert lums == [100, 101, 102, 103]


def test_dhdr10_opt_dedupes(tmp_path):
    """--dhdr10-opt: unchanged payloads are only sent on keyframes."""
    n = 4
    jpath = tmp_path / "hdr10plus.json"
    jpath.write_text(json.dumps({"SceneInfo": [META] * n}))
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    p.bframes = 0
    p.scenecut = 0
    param_parse(p, "qp", "30")
    param_parse(p, "dhdr10-info", str(jpath))
    param_parse(p, "dhdr10-opt")
    bs = Encoder(p).encode(_small_frames(n))
    seis = _collect_seis(bs, SEI_USER_DATA_REGISTERED)
    assert len(seis) == 1          # IDR only; P payloads identical


def test_reconplay_reorders_to_display_order(tmp_path):
    """ReconPlay receives encode-order frames (anchors before their B
    pictures) and must emit display order."""
    from x265_tpu.io.reconplay import ReconPlay
    from x265_tpu.io.y4m import VideoInfo, Y4MReader

    info = VideoInfo(96, 64, 25, 1)
    path = tmp_path / "recon.y4m"
    rp = ReconPlay("pipe:" + str(path), info)
    mk = lambda v: (np.full((64, 96), v, np.uint8),
                    np.full((32, 48), v, np.uint8),
                    np.full((32, 48), v, np.uint8))
    for idx in (0, 3, 1, 2, 5, 4):       # encode order
        rp.write_frame(idx, mk(idx * 10))
    rp.close()
    r = Y4MReader(str(path))
    vals = [int(y[0, 0]) for (y, cb, cr) in r.frames()]
    r.close()
    assert vals == [0, 10, 20, 30, 40, 50]


def test_cli_recon_display_order(tmp_path):
    """--recon through the CLI produces display-order Y4M even with B
    frames in the stream (encode order != display order)."""
    from x265_tpu.cli import main as cli_main
    from x265_tpu.io.y4m import write_y4m, Y4MReader, VideoInfo
    from x265_tpu.decoder.decoder import decode_file

    frames = _small_frames(6)
    src = tmp_path / "in.y4m"
    write_y4m(str(src), frames, VideoInfo(96, 64, 25, 1))
    out = tmp_path / "out.hevc"
    rec = tmp_path / "rec.y4m"
    rc = cli_main(["--input", str(src), "--output", str(out),
                   "--preset", "ultrafast", "--qp", "30",
                   "--bframes", "2", "--recon", str(rec),
                   "--b-adapt", "0", "--scenecut", "0"])
    assert rc == 0
    dec = decode_file(str(out))
    dec.sort(key=lambda d: d.poc)
    r = Y4MReader(str(rec))
    got = list(r.frames())
    r.close()
    assert len(got) == 6
    for d, (y, cb, cr) in zip(dec, got):
        assert np.array_equal(d.y, y)


def test_dither_reduces_banding():
    from x265_tpu.io.dither import dither_image, dither_plane

    # a smooth 10-bit ramp: straight truncation makes wide flat bands
    # with a systematic floor bias; error diffusion keeps each row's
    # running average on the true value (zero-mean error), which is the
    # whole point of x265's ditherPlane
    ramp10 = np.tile(np.linspace(0, 1023, 512).astype(np.uint16), (64, 1))
    d8 = dither_plane(ramp10, 2, 255)
    t8 = np.minimum(ramp10 >> 2, 255)
    assert d8.shape == ramp10.shape
    assert np.abs(d8.astype(int) - t8.astype(int)).max() <= 2
    true = ramp10.astype(float) / 4.0
    bias_d = abs((d8.astype(float) - true).mean())
    bias_t = abs((t8.astype(float) - true).mean())
    assert bias_d < 0.05 < bias_t        # truncation floor-bias ~0.37 LSB
    y, cb, cr = dither_image((ramp10, ramp10[:32, :256], ramp10[:32, :256]),
                             10, 8)
    assert y.max() <= 255 and cb.shape == (32, 256)


def test_dolby_vision_rpu_passthrough(tmp_path):
    """--dolby-vision-rpu: one NAL_UNSPEC62 per AU, display-order
    payloads, both interchange formats; streams still decode."""
    from x265_tpu.api.params import param_default_preset, param_parse
    from x265_tpu.decoder.decoder import HEVCDecoder
    from x265_tpu.hevc.bitstream import make_nal, annexb, split_annexb

    n = 4
    payloads = [bytes([0x10 + i, 0xAA, i]) for i in range(n)]
    # format A: Annex-B framed NAL 62 units
    fa = tmp_path / "rpu_annexb.bin"
    fa.write_bytes(b"".join(annexb([make_nal(62, pl)]) for pl in payloads))
    # format B: 4-byte BE length prefixes (raw payloads)
    fb = tmp_path / "rpu_len.bin"
    fb.write_bytes(b"".join(len(pl).to_bytes(4, "big") + pl
                            for pl in payloads))

    for path in (fa, fb):
        p = param_default_preset("ultrafast")
        p.width, p.height = 96, 64
        p.bframes = 2
        p.b_adapt = 0
        p.scenecut = 0
        param_parse(p, "qp", "30")
        param_parse(p, "dolby-vision-rpu", str(path))
        frames = _small_frames(n)
        enc = Encoder(p)
        bs = enc.encode(frames)
        units = [nal for nal in split_annexb(bs)
                 if (nal[0] >> 1) & 0x3F == 62]
        assert len(units) == n, path
        # payload set preserved (RBSP after the 2-byte NAL header)
        got = {u[2:5] for u in units}
        if path is fa:
            assert got == {pl[:3] for pl in payloads}
        dec = HEVCDecoder().decode(bs)
        assert len(dec) == n
