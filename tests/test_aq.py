"""Adaptive quantization / cu_qp_delta tests (x265 analog: aq modes in
calcAdaptiveQuantFrame + the dQP syntax covered by CLI suites)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.engine.aq import aq_qp_offsets


def _mixed_texture_clip(w=176, h=144, n=5, seed=3):
    """Smooth left half, busy right half — AQ must spread QPs."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.where(xx < w // 2, 128 + (yy // 8) * 2,
                    128 + ((xx * 7 + yy * 13) % 97)).astype(np.int32)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, i * 2, 1) + rng.integers(-3, 3, (h, w)),
                    0, 255)
        out.append((y.astype(np.uint8),
                    np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 130, np.uint8)))
    return out


def test_aq_offsets_track_texture():
    frames = _mixed_texture_clip(n=1)
    off = aq_qp_offsets(frames[0][0], 6, 2, 1.0)
    assert off.max() > off.min()          # busy CTBs get higher QP
    # frame-average roughly preserved (auto-variance renormalization)
    assert abs(float(off.mean())) < 1.5


def test_dqp_conformance():
    frames = _mixed_texture_clip()
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.qp, p.rc_mode, p.bframes = 32, RC_CQP, 2
    assert p.aq_mode == 2
    enc = Encoder(p)
    stream = enc.encode(frames)
    assert enc.pps.cu_qp_delta_enabled
    ours = HEVCDecoder().decode(stream)
    assert len(ours) == 5
    if de265.available():
        ext = de265.decode(stream)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i
            assert np.array_equal(o.cb, e[1].astype(np.int32)), i
            assert np.array_equal(o.cr, e[2].astype(np.int32)), i


def test_aq_off_means_no_dqp():
    frames = _mixed_texture_clip(n=1)
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.qp, p.rc_mode, p.aq_mode = 32, RC_CQP, 0
    p.cu_tree = False                 # cuTree also activates cu_qp_delta
    enc = Encoder(p)
    stream = enc.encode(frames)
    assert not enc.pps.cu_qp_delta_enabled
    assert len(HEVCDecoder().decode(stream)) == 1


def test_aq_improves_smooth_region_quality():
    """AQ shifts bits to smooth areas: the smooth half should get closer
    to the source than with AQ off at (approximately) matched size."""
    frames = _mixed_texture_clip(n=1)
    p_on = param_default_preset("medium")
    p_on.width, p_on.height = 176, 144
    p_on.qp, p_on.rc_mode, p_on.aq_mode = 34, RC_CQP, 2
    p_on.aq_strength = 1.5
    p_off = p_on.copy(); p_off.aq_mode = 0
    d_on = HEVCDecoder().decode(Encoder(p_on).encode(frames))[0]
    d_off = HEVCDecoder().decode(Encoder(p_off).encode(frames))[0]
    src = frames[0][0].astype(np.int64)
    # measure the CTB column that is entirely smooth (QG granularity = CTB)
    smooth = (slice(None), slice(0, 64))
    mse_on = float(np.mean((d_on.y[smooth] - src[smooth]) ** 2))
    mse_off = float(np.mean((d_off.y[smooth] - src[smooth]) ** 2))
    assert mse_on <= mse_off


def test_aq_mode3_biased_darkens_flat_blocks():
    """AQ_AUTO_VARIANCE_BIASED (x265 slicetype.cpp:589): the bias term
    strength*(1 - 11/act^2) LOWERS qp for very flat (low-activity)
    blocks relative to plain auto-variance."""
    frames = _mixed_texture_clip(n=1)
    y, cb, cr = frames[0]
    off2 = aq_qp_offsets(y, 6, 2, 1.0, cb=cb, cr=cr)
    off3 = aq_qp_offsets(y, 6, 3, 1.0, cb=cb, cr=cr)
    assert off2.shape == off3.shape
    assert off2.dtype.kind == "f"          # float offsets now
    # the flat (left) half must be biased DOWN vs mode 2
    assert float(off3[:, 0].mean()) < float(off2[:, 0].mean()) + 1e-9


def test_aq_mode4_edge_runs_and_encodes():
    """AQ_EDGE (x265 slicetype.cpp:596): edge-density activity."""
    frames = _mixed_texture_clip()
    y, cb, cr = frames[0]
    off4 = aq_qp_offsets(y, 6, 4, 1.0, cb=cb, cr=cr)
    assert np.isfinite(off4).all()
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.qp, p.rc_mode, p.aq_mode = 32, RC_CQP, 4
    stream = Encoder(p).encode(frames[:3])
    ours = HEVCDecoder().decode(stream)
    assert len(ours) == 3
    if de265.available():
        ext = de265.decode(stream)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i
