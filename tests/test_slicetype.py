"""Lookahead slicetype decisions: scenecut IDR insertion + adaptive B
(x265 analog: slicetypeAnalyse/scenecut, slicetype.cpp:1867/2186)."""
import numpy as np

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CRF, param_default_preset
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.hevc.bitstream import split_annexb


def _two_scene_clip(w=176, h=144, n=12, cut=6, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    scene_a = (128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(int)
    scene_b = (100 + 90 * np.cos(xx / 5.0 + yy / 17.0)).astype(int)
    frames = []
    for i in range(n):
        base = scene_a if i < cut else scene_b
        y = np.clip(np.roll(base, i, 1) + rng.integers(-4, 4, (h, w)), 0, 255)
        frames.append((y.astype(np.uint8),
                       np.full((h // 2, w // 2), 120, np.uint8),
                       np.full((h // 2, w // 2), 130, np.uint8)))
    return frames


def _idr_count(stream):
    return sum(1 for nal in split_annexb(stream)
               if ((nal[0] >> 1) & 0x3F) in (19, 20))


def _keyframe_count(stream):
    # IDR or CRA (open GOP, the x265 default, emits CRA at scenecuts)
    return sum(1 for nal in split_annexb(stream)
               if ((nal[0] >> 1) & 0x3F) in (19, 20, 21))


def test_scenecut_inserts_idr():
    frames = _two_scene_clip()
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.rc_mode, p.crf, p.bframes = RC_CRF, 30, 3
    stream = Encoder(p).encode(frames)
    # opening IDR + a CRA at the cut (open GOP default); with
    # --no-open-gop the cut is an IDR
    assert _keyframe_count(stream) == 2
    assert len(HEVCDecoder().decode(stream)) == 12
    p2 = param_default_preset("medium")
    p2.width, p2.height = 176, 144
    p2.rc_mode, p2.crf, p2.bframes = RC_CRF, 30, 3
    p2.open_gop = False
    stream2 = Encoder(p2).encode(frames)
    assert _idr_count(stream2) == 2


def test_scenecut_off_single_idr():
    frames = _two_scene_clip()
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.rc_mode, p.crf, p.bframes = RC_CRF, 30, 3
    p.scenecut = 0
    stream = Encoder(p).encode(frames)
    assert _idr_count(stream) == 1


def test_no_spurious_scenecut_on_smooth_motion():
    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:144, 0:176]
    base = (128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(int)
    frames = [(np.clip(np.roll(base, 2 * i, 1) +
                       rng.integers(-4, 4, (144, 176)), 0, 255)
               .astype(np.uint8),
               np.full((72, 88), 120, np.uint8),
               np.full((72, 88), 130, np.uint8)) for i in range(10)]
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.rc_mode, p.crf, p.bframes = RC_CRF, 30, 2
    stream = Encoder(p).encode(frames)
    assert _idr_count(stream) == 1


def test_cutree_credits_referenced_blocks():
    """Static well-predicted content must earn the anchor negative QP
    offsets; pure-noise (unpredictable) content earns ~none."""
    import numpy as np
    from x265_tpu.engine.lookahead import cutree_propagate

    shape = (8, 12)
    static = [{"icost": np.full(shape, 1000, np.int64),
               "mcost": np.full(shape, 10, np.int64),
               "mv": np.zeros((*shape, 2), np.int32)} for _ in range(4)]
    off = cutree_propagate(static, ctb_log2=6)
    assert off.min() < 0              # anchor blocks credited
    noise = [{"icost": np.full(shape, 1000, np.int64),
              "mcost": np.full(shape, 2000, np.int64),
              "mv": np.zeros((*shape, 2), np.int32)} for _ in range(4)]
    off2 = cutree_propagate(noise, ctb_log2=6)
    # float offsets now (rounded once by the encoder); unpredictable
    # content must stay under half a QP step of credit
    assert np.abs(off2).max() < 0.5   # nothing meaningful propagates
