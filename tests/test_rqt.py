"""Inter RQT (tu-inter-depth 2) conformance + RD sanity.

x265 analog: estimateResidualQT (search.cpp:2863) with
tuQTMaxInterDepth=2 (x265.h:1079); streams must decode identically in
the in-repo decoder and libde265.
"""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset, param_parse
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder


def _textured_motion_clip(w=192, h=128, n=5, seed=9):
    """Half-smooth pan with a high-detail moving patch: CUs whose
    residual concentrates in one quadrant — the RQT's favorite case."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h + 32, w + 32)).astype(np.float32)
    import scipy.ndimage as ndi
    base = ndi.gaussian_filter(base, 4) * 2.0
    base = np.clip(base - base.min() + 20, 0, 235)
    detail = rng.integers(-70, 70, (40, 40)).astype(np.float32)
    out = []
    for i in range(n):
        f = base[8 + i:8 + i + h, 4 + 2 * i:4 + 2 * i + w].copy()
        yd, xd = 30 + 3 * i, 60 + 5 * i
        f[yd:yd + 40, xd:xd + 40] = np.clip(
            f[yd:yd + 40, xd:xd + 40] + detail, 0, 255)
        out.append((f.astype(np.uint8),
                    np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 130, np.uint8)))
    return out


def _encode(frames, depth, **kw):
    p = param_default_preset("medium")
    p.width, p.height = 192, 128
    p.qp, p.rc_mode = 30, RC_CQP
    p.aq_mode = 0
    p.cu_tree = False
    param_parse(p, "tu-inter-depth", str(depth))
    for k, v in kw.items():
        setattr(p, k, v)
    enc = Encoder(p)
    stream = enc.encode(frames)
    return stream, enc


def test_rqt_streams_decode_conformant():
    frames = _textured_motion_clip()
    stream, enc = _encode(frames, 2)
    assert enc.param.tu_inter_depth == 2
    ours = HEVCDecoder().decode(stream)
    assert len(ours) == len(frames)
    if de265.available():
        ext = de265.decode(stream)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i
            assert np.array_equal(o.cb, e[1].astype(np.int32)), i
            assert np.array_equal(o.cr, e[2].astype(np.int32)), i


def test_rqt_splits_actually_fire():
    """The device RD must choose a split somewhere on this content."""
    frames = _textured_motion_clip()
    stream, enc = _encode(frames, 2)
    la = enc._last_analysis
    assert la is not None and la.tusplit8 is not None
    assert int(np.asarray(la.tusplit8).sum()) > 0


def test_rqt_rd_not_worse():
    """Depth 2 must not lose RD vs depth 1 at matched QP: distortion
    equal-or-better at equal-or-smaller size, allowing a small bits
    tolerance for the flag overhead."""
    frames = _textured_motion_clip()
    s1, _ = _encode(frames, 1)
    s2, _ = _encode(frames, 2)
    d1 = HEVCDecoder().decode(s1)
    d2 = HEVCDecoder().decode(s2)
    src = np.stack([f[0].astype(np.int64) for f in frames])
    r1 = np.stack([p.y for p in d1]).astype(np.int64)
    r2 = np.stack([p.y for p in d2]).astype(np.int64)
    mse1 = float(((src - r1) ** 2).mean())
    mse2 = float(((src - r2) ** 2).mean())
    # RD-combined: bits*lambda + distortion should not regress beyond
    # the split-flag overhead (1 bin per root-cbf CU)
    assert mse2 <= mse1 * 1.02
    assert len(s2) <= len(s1) * 1.03


def test_depth1_streams_unchanged_syntax():
    """tu-inter-depth 1 keeps the old no-flag syntax (SPS depth 0)."""
    frames = _textured_motion_clip(n=2)
    stream, enc = _encode(frames, 1)
    assert enc.sps.max_transform_hierarchy_depth_inter == 0
    assert len(HEVCDecoder().decode(stream)) == 2
