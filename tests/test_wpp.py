"""Encoder-side WPP entry points (x265 --wpp; entropy.cpp:724,
frameencoder.cpp:1033 serializeSubstreams): per-CTU-row byte-aligned
substreams with the col-2 context handoff and entry_point_offsets in
the slice header. Conformance is arbitrated by libde265; the in-repo
decoder cross-checks recon equality against the no-wpp stream (WPP
changes only the entropy layer — decisions and recon are identical)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder


def _frames(n=3, w=192, h=192, seed=23):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (118 + 90 * np.sin(xx / 7.0) * np.cos(yy / 11.0)).astype(int)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, 2 * i, 1) + rng.integers(-6, 7, (h, w)),
                    0, 255)
        out.append((y.astype(np.uint8),
                    np.clip(112 + (y[::2, ::2] >> 3), 0, 255)
                    .astype(np.uint8),
                    np.full((h // 2, w // 2), 131, np.uint8)))
    return out


def _encode(frames, wpp, **kw):
    p = param_default_preset(kw.pop("preset", "medium"))
    p.width = frames[0][0].shape[1]
    p.height = frames[0][0].shape[0]
    for k, v in kw.items():
        param_parse(p, k, v)
    p.wpp = wpp
    return Encoder(p).encode(frames)


def _recon_equal(a, b):
    for pa, pb in zip(a, b):
        for ca, cb_ in zip((pa.y, pa.cb, pa.cr), (pb.y, pb.cb, pb.cr)):
            if not np.array_equal(ca, cb_):
                return False
    return True


def test_wpp_intra_lossless_bit_exact():
    frames = _frames(2)
    p = param_default_preset("ultrafast")
    p.width = p.height = 192
    param_parse(p, "lossless")
    param_parse(p, "keyint", "1")
    p.wpp = True
    stream = Encoder(p).encode(frames)
    # our decoder: bit-exact roundtrip through the entry-point path
    pics = HEVCDecoder().decode(stream)
    for f, d in zip(frames, pics):
        assert np.array_equal(d.y, f[0])
        assert np.array_equal(d.cb, f[1])
        assert np.array_equal(d.cr, f[2])
    if de265.available():
        dpics = de265.decode(stream)
        for f, d in zip(frames, dpics):
            assert np.array_equal(d[0], f[0])


def test_wpp_entry_point_count():
    frames = _frames(1)
    p = param_default_preset("ultrafast")
    p.width = p.height = 192       # 3 CTU rows at 64
    param_parse(p, "qp", "30")
    param_parse(p, "keyint", "1")
    p.wpp = True
    stream = Encoder(p).encode(frames)
    # parse the slice header back: 2 entry points for 3 rows
    from x265_tpu.hevc.bitstream import (split_annexb,
                                         strip_emulation_prevention)
    from x265_tpu.hevc.headers import (parse_pps, parse_slice_header,
                                       parse_sps)
    sps = pps = None
    for nal in split_annexb(stream):
        t = (nal[0] >> 1) & 0x3F
        rbsp = strip_emulation_prevention(nal[2:])
        if t == 33:
            sps = parse_sps(rbsp)
        elif t == 34:
            pps = parse_pps(rbsp)
            assert pps.entropy_coding_sync_enabled
        elif t < 32:
            sh, _ = parse_slice_header(rbsp, t, sps, pps)
            rows = -(-sps.height // sps.ctb_size)
            assert rows > 1
            assert len(sh.entry_point_offsets) == rows - 1
            return
    raise AssertionError("no slice NAL found")


def test_wpp_pb_matches_nowpp_recon():
    frames = _frames(4)
    s_wpp = _encode(frames, True, qp="30", bframes="2")
    s_ref = _encode(frames, False, qp="30", bframes="2")
    a = HEVCDecoder().decode(s_wpp)
    b = HEVCDecoder().decode(s_ref)
    assert len(a) == len(b) == len(frames)
    assert _recon_equal(a, b)
    if de265.available():
        d = de265.decode(s_wpp)
        for da, dd in zip(a, d):
            assert np.array_equal(da.y, dd[0])
            assert np.array_equal(da.cb, dd[1])
            assert np.array_equal(da.cr, dd[2])
