"""Deblocking filter tests (x265 analog: deblock.cpp covered only by the
CLI regression suites, SURVEY.md §4 — here we decode-verify directly).

The arbiter is libde265: with deblock enabled the encoder's closed-loop
recon, the in-repo decoder's output and libde265's output must be
identical for every frame.
"""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder


def _make_frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    frames, prev = [], None
    for i in range(n):
        if prev is None:
            y = rng.integers(0, 256, (h, w)).astype(np.uint8)
        else:  # sparse changes so P frames mix skip/merge/MVD/intra CUs
            delta = rng.integers(-20, 20, (h, w)) * (rng.random((h, w)) < 0.1)
            y = np.clip(prev.astype(int) + delta, 0, 255).astype(np.uint8)
        prev = y
        cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def _encode(frames, w, h, qp, boff=0, toff=0):
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.qp, p.rc_mode = qp, RC_CQP
    p.deblock_beta_offset, p.deblock_tc_offset = boff, toff
    enc = Encoder(p)
    return enc, enc.encode(frames)


def test_decoder_matches_encoder_recon_with_deblock():
    w, h = 96, 64
    frames = _make_frames(w, h, 3)
    enc, stream = _encode(frames, w, h, qp=30)
    assert not enc.pps.deblocking_filter_disabled
    pics = HEVCDecoder().decode(stream)
    assert len(pics) == 3
    assert np.array_equal(pics[-1].y, enc._last_recon[0])
    assert np.array_equal(pics[-1].cb, enc._last_recon[1])
    assert np.array_equal(pics[-1].cr, enc._last_recon[2])


def test_deblock_changes_output():
    """Deblock must actually modify high-QP block edges (not a no-op).

    Needs *smooth* content: the d<beta gate (8.7.2.5.3) only fires where
    the signal is locally flat, which is exactly where blocking shows.
    """
    w, h = 96, 64
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((xx * 255) // w + yy // 4).clip(0, 255).astype(np.uint8)
    cb = ((xx[::2, ::2] * 200) // w).astype(np.uint8)
    cr = ((yy[::2, ::2] * 200) // h).astype(np.uint8)
    frames = [(y, cb, cr)]
    _, s_on = _encode(frames, w, h, qp=40)
    p = param_default_preset("medium")
    p.width, p.height, p.qp, p.rc_mode = w, h, 40, RC_CQP
    p.deblock = False
    enc_off = Encoder(p)
    s_off = enc_off.encode(frames)
    on = HEVCDecoder().decode(s_on)[0]
    off = HEVCDecoder().decode(s_off)[0]
    assert not np.array_equal(on.y, off.y)


@pytest.mark.skipif(not de265.available(), reason="libde265 not installed")
@pytest.mark.parametrize("w,h,qp,boff,toff", [
    (64, 64, 37, 0, 0),
    (96, 64, 22, 2, -2),
    (176, 144, 30, -3, 3),
    (128, 96, 45, 0, 0),
])
def test_deblock_conformance_de265(w, h, qp, boff, toff):
    frames = _make_frames(w, h, 3, seed=w + qp)
    _, stream = _encode(frames, w, h, qp, boff, toff)
    ours = HEVCDecoder().decode(stream)
    ext = de265.decode(stream)
    assert len(ext) == len(ours)
    for o, e in zip(ours, ext):
        assert np.array_equal(o.y, e[0].astype(np.int32))
        assert np.array_equal(o.cb, e[1].astype(np.int32))
        assert np.array_equal(o.cr, e[2].astype(np.int32))
