"""Open GOP (x265 --open-gop, default on): non-first keyframes are CRA
pictures whose queued leading pictures code as RASL_N (reference across
the keyframe; dropped on random access). Reference: dpb.cpp:229
getNalUnitType, slice.h NAL types."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder import de265
from x265_tpu.hevc.bitstream import NAL_CRA, NAL_RASL_N


def _frames(n=12, w=128, h=96):
    rng = np.random.default_rng(23)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 80 * np.sin(xx / 7.0) * np.cos(yy / 8.0)).astype(int)
    return [(np.clip(np.roll(base, 2 * i, 1)
                     + rng.integers(-4, 5, (h, w)), 0, 255).astype(np.uint8),
             np.full((h // 2, w // 2), 118, np.uint8),
             np.full((h // 2, w // 2), 134, np.uint8)) for i in range(n)]


def _nal_types(stream):
    out = []
    i = 0
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            return out
        out.append((stream[j + 3] >> 1) & 0x3F)
        i = j + 3


def test_open_gop_emits_cra_and_rasl():
    frames = _frames()
    p = param_default_preset("medium")
    p.width, p.height = 128, 96
    p.rc_mode, p.qp = RC_CQP, 30
    p.bframes, p.rc_lookahead = 2, 0
    p.keyint, p.min_keyint, p.scenecut = 6, 2, 0
    p.open_gop = True
    enc = Encoder(p)
    stream = enc.encode(frames)
    kinds = _nal_types(stream)
    assert NAL_CRA in kinds, kinds
    assert NAL_RASL_N in kinds, kinds
    from x265_tpu.decoder.decoder import HEVCDecoder
    own = HEVCDecoder().decode(stream)
    assert len(own) == len(frames)
    if de265.available():
        pics = de265.decode(stream)
        assert len(pics) == len(frames)
        for o, e in zip(own, pics):
            assert np.array_equal(o.y, e[0].astype(np.int32))
            assert np.array_equal(o.cb, e[1].astype(np.int32))
            assert np.array_equal(o.cr, e[2].astype(np.int32))


def test_closed_gop_still_idr():
    frames = _frames(8)
    p = param_default_preset("medium")
    p.width, p.height = 128, 96
    p.rc_mode, p.qp = RC_CQP, 30
    p.bframes, p.rc_lookahead = 2, 0
    p.keyint, p.min_keyint, p.scenecut = 4, 2, 0
    p.open_gop = False
    enc = Encoder(p)
    stream = enc.encode(frames)
    kinds = _nal_types(stream)
    assert NAL_CRA not in kinds
