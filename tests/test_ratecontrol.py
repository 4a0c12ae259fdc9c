"""Rate-control tests (x265 analog: rate-control-tests.txt suite,
SURVEY.md §4 — ABR convergence tolerance, VBV constraint adherence)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_ABR, RC_CRF, param_default_preset
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder


def _clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(int)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, i * 2, 1) + rng.integers(-5, 5, (h, w)),
                    0, 255)
        out.append((y.astype(np.uint8),
                    np.clip(120 + 20 * np.sin(xx[::2, ::2] / 9.0),
                            0, 255).astype(np.uint8),
                    np.clip(130 + 20 * np.cos(yy[::2, ::2] / 7.0),
                            0, 255).astype(np.uint8)))
    return out


def test_crf_monotone_and_conformant():
    frames = _clip(96, 64, 9)
    sizes = []
    for crf in (22, 30, 38):
        p = param_default_preset("medium")
        p.width, p.height = 96, 64
        p.rc_mode, p.crf, p.bframes = RC_CRF, crf, 2
        s = Encoder(p).encode(frames)
        ours = HEVCDecoder().decode(s)
        assert len(ours) == 9
        if de265.available():
            ext = de265.decode(s)
            for o, e in zip(ours, ext):
                assert np.array_equal(o.y, e[0].astype(np.int32))
        sizes.append(len(s))
    assert sizes[0] > sizes[1] > sizes[2]


def test_abr_converges():
    frames = _clip(176, 144, 25)
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.rc_mode, p.bitrate, p.bframes = RC_ABR, 400, 2
    p.fps_num, p.fps_den = 25, 1
    s = Encoder(p).encode(frames)
    kbps = len(s) * 8 * 25.0 / 25 / 1000
    # one-pass ABR on a 1s clip: x265's own tolerance regime is loose
    assert 0.6 * 400 < kbps < 1.5 * 400, kbps


def test_vbv_limits_frame_bits():
    """With a tight VBV, no frame may exceed what the CPB can hold."""
    frames = _clip(176, 144, 15, seed=9)
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.rc_mode, p.bitrate, p.bframes = RC_ABR, 300, 0
    p.vbv_maxrate, p.vbv_bufsize = 300, 150   # half-second buffer
    p.fps_num, p.fps_den = 25, 1
    enc = Encoder(p)
    aus = [enc.encode_frame(*f) for f in frames] + [enc.flush()]
    aus = [a for a in aus if a]
    # every non-IDR AU must fit well inside the buffer (IDR gets slack)
    for au in aus[1:]:
        assert len(au) * 8 < p.vbv_bufsize * 1000, len(au) * 8


def test_rc_qp_varies_with_complexity():
    """The controller must react: flat frames get lower QP than noisy
    ones under CRF (complexity-driven qscale)."""
    from x265_tpu.engine.ratecontrol import I_SLICE, P_SLICE, RateControl
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.rc_mode = RC_CRF
    rc = RateControl(p)
    q_complex = rc.start(P_SLICE, 500000.0)
    rc.end(50000)
    rc2 = RateControl(p)
    q_flat = rc2.start(P_SLICE, 5000.0)
    assert q_flat < q_complex
