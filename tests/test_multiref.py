"""Multiple reference frames (--ref N; x265 predInterSearch per-ref loop
and the pme bonded group, re-imagined as per-ref batched sweeps + argmin
over the ref axis)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder


def _flicker_clip(w=176, h=144, n=10, seed=3):
    """Content alternating between two states: the best reference for
    frame i is often i-2, not i-1 — multi-ref must win here."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    a = (128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(int)
    b = (128 + 70 * np.cos(xx / 7.0) * np.sin(yy / 9.0)).astype(int)
    out = []
    for i in range(n):
        base = a if i % 2 == 0 else b
        y = np.clip(np.roll(base, i // 2, 1) +
                    rng.integers(-3, 3, (h, w)), 0, 255)
        out.append((y.astype(np.uint8),
                    np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 130, np.uint8)))
    return out


def _param(nref):
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 0
    p.ref = nref
    p.scenecut = 0        # the flicker would otherwise IDR every frame
    return p


def test_multiref_conformance():
    frames = _flicker_clip()
    enc = Encoder(_param(3))
    stream = enc.encode(frames)
    ours = HEVCDecoder().decode(stream)
    assert len(ours) == 10
    if de265.available():
        ext = de265.decode(stream)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i
            assert np.array_equal(o.cb, e[1].astype(np.int32)), i


def test_multiref_actually_selects_older_refs():
    frames = _flicker_clip()
    enc = Encoder(_param(3))
    # drive two minigops so anchors accumulate, then inspect decisions
    for f in frames[:5]:
        enc.encode_frame(*f)
    assert len(enc.anchors) >= 2
    dec = enc._p_decisions(frames[5][0], [a[1] for a in enc.anchors], 30)
    assert dec.ref8.max() > 0         # some blocks pick an older ref


def test_multiref_beats_single_ref_on_flicker():
    frames = _flicker_clip()
    s3 = Encoder(_param(3)).encode(frames)
    s1 = Encoder(_param(1)).encode(frames)
    assert len(s3) < len(s1)          # older refs capture the alternation
