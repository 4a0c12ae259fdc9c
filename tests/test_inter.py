"""IPPP (P-frame) end-to-end tests — BASELINE config #2 ladder."""
import numpy as np
import pytest

from x265_tpu.api.params import param_default_preset, param_parse, RC_CQP
from x265_tpu.api.encoder import Encoder
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.decoder import de265
from x265_tpu.hevc.inter_tools import (
    InterCtx, amvp_candidates, decode_mvd, encode_mvd, merge_candidates,
)
from x265_tpu.hevc.cabac import CabacDecoder, CabacEncoder
from x265_tpu.hevc.tables import CTX_OFF


def _moving_frames(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    big = np.clip((np.mgrid[0:h * 2, 0:w * 2][0] // 2 +
                   np.mgrid[0:h * 2, 0:w * 2][1] // 3) % 256 +
                  rng.integers(-8, 8, (h * 2, w * 2)), 0, 255).astype(np.uint8)
    cb_big = ((np.mgrid[0:h, 0:w][1]) % 256).astype(np.uint8)
    out = []
    for i in range(n):
        ox, oy = 4 * i, 2 * i
        out.append((big[oy:oy + h, ox:ox + w].copy(),
                    cb_big[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy(),
                    cb_big[oy // 2 + 8:oy // 2 + 8 + h // 2,
                           ox // 2 + 8:ox // 2 + 8 + w // 2].copy()))
    return out


def test_mvd_roundtrip():
    rng = np.random.default_rng(0)
    enc = CabacEncoder()
    enc.init_slice(1, 30)
    vals = [(int(rng.integers(-200, 200)), int(rng.integers(-200, 200)))
            for _ in range(200)] + [(0, 0), (1, 0), (0, -1), (2, 2), (-2, 1)]
    for (mx, my) in vals:
        encode_mvd(enc, CTX_OFF["mvd"], mx, my)
    enc.encode_bin_trm(1)
    dec = CabacDecoder(enc.finish())
    dec.init_slice(1, 30)
    for (mx, my) in vals:
        assert decode_mvd(dec, CTX_OFF["mvd"]) == (mx, my)


def test_merge_amvp_shared_derivation():
    ic = InterCtx(64, 64)
    avail = np.zeros((16, 16), dtype=bool)
    # left neighbor CU with mv (8, 4)
    ic.mv4[0:4, 0:4] = (8, 4)
    ic.ref4[0:4, 0:4] = 0
    avail[0:4, 0:4] = True
    cands = merge_candidates(ic, avail, 16, 0, 16, 16, 64, 64, 5, 32)
    assert cands[0] == (8, 4)
    assert cands[1] == (0, 0)
    am = amvp_candidates(ic, avail, 16, 0, 16, 16, 64, 64)
    assert am[0] == (8, 4)


@pytest.mark.parametrize("lossless", [True, False])
def test_ippp_roundtrip(lossless):
    w, h = 96, 64
    frames = _moving_frames(w, h, 3)
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    if lossless:
        param_parse(p, "lossless")
    else:
        p.rc_mode = RC_CQP
        p.qp = 28
        p.lossless = False
    enc = Encoder(p)
    aus = [enc.encode_frame(*f) for f in frames]
    stream = enc.headers() + b"".join(aus)
    own = HEVCDecoder().decode(stream)
    assert len(own) == 3
    if lossless:
        for f, d in zip(frames, own):
            assert np.array_equal(d.y, f[0].astype(np.int32))
            assert np.array_equal(d.cb, f[1].astype(np.int32))
            assert np.array_equal(d.cr, f[2].astype(np.int32))
        # P frames should be far smaller than the IDR on translating content
        assert len(aus[1]) < len(aus[0]) // 2
    else:
        err = own[2].y - frames[2][0].astype(np.int64)
        psnr = 10 * np.log10(255 ** 2 / max(1e-9, float((err ** 2).mean())))
        assert psnr > 28.0


@pytest.mark.skipif(not de265.available(), reason="libde265 not present")
@pytest.mark.parametrize("lossless", [True, False])
def test_ippp_conformance_libde265(lossless):
    w, h = 96, 64
    frames = _moving_frames(w, h, 4)
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    if lossless:
        param_parse(p, "lossless")
    else:
        p.rc_mode = RC_CQP
        p.qp = 26
        p.lossless = False
    enc = Encoder(p)
    stream = enc.headers() + b"".join(enc.encode_frame(*f) for f in frames)
    pics = de265.decode(stream)
    assert len(pics) == 4
    own = HEVCDecoder().decode(stream)
    for i in range(4):
        assert np.array_equal(pics[i][0].astype(np.int32), own[i].y)
        assert np.array_equal(pics[i][1].astype(np.int32), own[i].cb)
        assert np.array_equal(pics[i][2].astype(np.int32), own[i].cr)
        if lossless:
            assert np.array_equal(pics[i][0], frames[i][0])
            assert np.array_equal(pics[i][1], frames[i][1])
            assert np.array_equal(pics[i][2], frames[i][2])
