"""B-frame / random-access GOP tests — BASELINE config #3 ladder.

Covers reordering (decode != display order), inline RPS with positive
deltas, bi-prediction, combined-bi merge candidates, cross-list AMVP with
MV scaling, non-reference TRAIL_N pictures and the encode latency contract
(encode_frame returns queued AUs; flush drains)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset, param_parse
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder


def _clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(np.int32)
    out = []
    for i in range(n):
        y = np.clip(np.roll(np.roll(base, i * 2, 1), i, 0) +
                    rng.integers(-5, 5, (h, w)), 0, 255)
        out.append((y.astype(np.uint8),
                    np.clip(120 + 20 * np.sin(xx[::2, ::2] / 9.0) + i * 2,
                            0, 255).astype(np.uint8),
                    np.clip(130 + 20 * np.cos(yy[::2, ::2] / 7.0) - i,
                            0, 255).astype(np.uint8)))
    return out


def _conform(stream):
    ours = HEVCDecoder().decode(stream)
    if de265.available():
        ext = de265.decode(stream)
        assert len(ours) == len(ext)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), f"Y {i}"
            assert np.array_equal(o.cb, e[1].astype(np.int32)), f"Cb {i}"
            assert np.array_equal(o.cr, e[2].astype(np.int32)), f"Cr {i}"
    return ours


def test_bframes_roundtrip_and_reorder():
    frames = _clip(96, 64, 7)
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 2
    enc = Encoder(p)
    # latency contract: IDR returns at once, then AUs arrive in bursts
    aus = [enc.encode_frame(*f) for f in frames]
    assert len(aus[0]) > 0          # IDR immediate
    assert aus[1] == b""            # queued B
    stream = enc.headers() + b"".join(aus) + enc.flush()
    ours = _conform(stream)
    assert [o.poc for o in ours] == list(range(7))  # display order restored
    mse = np.mean([np.mean((o.y - f[0].astype(np.int64)) ** 2)
                   for o, f in zip(ours, frames)])
    assert 10 * np.log10(255 ** 2 / mse) > 30


def test_bframes_keyint_boundary():
    frames = _clip(96, 64, 11, seed=5)
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes, p.keyint = 32, RC_CQP, 2, 6
    # default open GOP: the mid-stream keyframe is a CRA with RASL
    # leading pictures — both decoders must agree bit-exactly
    ours = _conform(Encoder(p).encode(frames))
    assert len(ours) == 11
    p2 = param_default_preset("medium")
    p2.width, p2.height = 96, 64
    p2.qp, p2.rc_mode, p2.bframes, p2.keyint = 32, RC_CQP, 2, 6
    p2.open_gop = False
    ours2 = _conform(Encoder(p2).encode(frames))
    assert len(ours2) == 11


def test_bframes_lossless():
    frames = _clip(64, 64, 5, seed=9)
    p = param_default_preset("medium")
    p.width, p.height = 64, 64
    param_parse(p, "lossless")
    p.bframes = 2
    ours = _conform(Encoder(p).encode(frames))
    for i, o in enumerate(ours):
        assert np.array_equal(o.y, frames[i][0].astype(np.int32))
        assert np.array_equal(o.cb, frames[i][1].astype(np.int32))
        assert np.array_equal(o.cr, frames[i][2].astype(np.int32))


def test_bframes_beat_ippp_on_static_content():
    """Static scene + temporal noise: B frames (higher QP + bi averaging)
    must cost substantially less than IPPP (the compression reason B
    frames exist)."""
    yy, xx = np.mgrid[0:64, 0:96]
    base_y = (128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(int)
    rng = np.random.default_rng(1)
    frames = [(np.clip(base_y + rng.integers(-12, 12, (64, 96)),
                       0, 255).astype(np.uint8),
               np.full((32, 48), 120, np.uint8),
               np.full((32, 48), 130, np.uint8)) for _ in range(9)]
    base = param_default_preset("medium")
    base.width, base.height = 96, 64
    base.qp, base.rc_mode = 30, RC_CQP
    base.cu_tree = False   # isolate the B-frame economics from cuTree
    pb = base.copy(); pb.bframes = 3
    pp = base.copy(); pp.bframes = 0
    sb = Encoder(pb).encode(frames)
    sp = Encoder(pp).encode(frames)
    assert len(sb) < 0.8 * len(sp)


def test_b_pyramid_conformance():
    """--b-pyramid: the middle B is a referenced TRAIL_R; leaf Bs predict
    from the nearest of (anchor, bref); RPS keep-alives retain everything
    later frames need (verified against libde265)."""
    frames = _clip(96, 64, 11, seed=4)
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes = 32, RC_CQP, 4
    assert p.b_pyramid
    enc = Encoder(p)
    stream = enc.encode(frames)
    ours = HEVCDecoder().decode(stream)
    assert [o.poc for o in ours] == list(range(11))
    if de265.available():
        ext = de265.decode(stream)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i
            assert np.array_equal(o.cb, e[1].astype(np.int32)), i
    # the stream really contains a referenced B (TRAIL_R between TRAIL_Ns)
    from x265_tpu.hevc.bitstream import split_annexb
    kinds = [(n[0] >> 1) & 0x3F for n in split_annexb(stream)]
    slice_kinds = [k for k in kinds if k < 32]
    assert 0 in slice_kinds and 1 in slice_kinds
