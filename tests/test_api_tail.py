"""Encoder query/control API tail (x265.h:2108-2186 analogs) plus
--frame-dup / --hist-scenecut / csv-log-level 2.
"""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse
from x265_tpu.hevc.bitstream import split_annexb, strip_emulation_prevention
from x265_tpu.hevc.sei import parse_sei, SEI_PIC_TIMING


def _params(**kw):
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    p.bframes = kw.pop("bframes", 0)
    p.scenecut = kw.pop("scenecut", 0)
    param_parse(p, "qp", str(kw.pop("qp", 30)))
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def _frames(n, seed=5, h=64, w=96):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w)).astype(np.uint8)
    return [(np.roll(base, 2 * i, axis=1),
             np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 130, np.uint8)) for i in range(n)]


def test_get_slicetype_poc_and_scenecut():
    enc = Encoder(_params())
    frames = _frames(3)
    enc.encode_frame(*frames[0])
    st = enc.get_slicetype_poc_and_scenecut()
    assert st == {"slice_type": "I", "poc": 0, "scenecut": False}
    enc.encode_frame(*frames[1])
    enc.flush()
    st = enc.get_slicetype_poc_and_scenecut()
    assert st["slice_type"] == "P" and st["poc"] == 1


def test_get_ref_frame_list():
    enc = Encoder(_params(ref=2))
    for f in _frames(4):
        enc.encode_frame(*f)
    enc.flush()
    rl = enc.get_ref_frame_list()
    assert rl["l0"] and rl["l0"][0] == max(rl["l0"])   # nearest first


def test_set_get_analysis_data():
    """In-memory analysis reuse: feeding a frame's own recorded decisions
    back reproduces the identical stream (the set/get twin of
    --analysis-save/--analysis-load)."""
    frames = _frames(1)
    p = _params(keyint=1)
    enc = Encoder(p)
    bs1 = enc.encode_frame(*frames[0]) + enc.flush()
    dec = enc.get_analysis_data()
    assert dec is not None

    enc2 = Encoder(_params(keyint=1))
    enc2.set_analysis_data(dec)
    bs2 = enc2.encode_frame(*frames[0]) + enc2.flush()
    assert bs1 == bs2


def test_set_ctu_info_changes_qp():
    """Per-CTU QP offsets (x265_encoder_ctu_info ROI analog) must land in
    the coded QP map."""
    p = _params(aq_mode=1, qp=30)
    enc = Encoder(p)
    cty, ctx = p.pic_height_in_ctbs, p.pic_width_in_ctbs
    off = np.zeros((cty, ctx), np.int32)
    off[0, 0] = 8
    enc.set_ctu_info(0, off)
    bs1 = enc.encode_frame(*_frames(1)[0]) + enc.flush()

    enc2 = Encoder(_params(aq_mode=1, qp=30))
    bs2 = enc2.encode_frame(*_frames(1)[0]) + enc2.flush()
    assert bs1 != bs2         # the offset changed the coded picture


def test_calculate_vmaf_gated():
    with pytest.raises(NotImplementedError):
        Encoder.calculate_vmaf()


def _pic_timings(bs):
    out = []
    for nal in split_annexb(bs):
        if (nal[0] >> 1) & 0x3F == 39:
            for pt, pl in parse_sei(strip_emulation_prevention(nal[2:])):
                if pt == SEI_PIC_TIMING:
                    out.append(pl)
    return out


def test_frame_dup_drops_and_signals():
    """A duplicate input is dropped; the previous picture's pic_timing
    carries pic_struct=7 (frame doubling) and the stream still decodes."""
    from x265_tpu.decoder.decoder import HEVCDecoder

    frames = _frames(4)
    frames[2] = frames[1]              # exact duplicate
    p = _params(frame_dup=True)
    enc = Encoder(p)
    bs = b"".join([enc.headers()] +
                  [enc.encode_frame(*f) for f in frames]) + enc.flush()
    assert len(enc.frame_stats) == 3   # one picture dropped
    pts = _pic_timings(bs)
    assert len(pts) == 3               # every AU carries pic_timing (ffi)
    structs = [pl[0] >> 4 for pl in pts]
    assert structs.count(7) == 1       # exactly one doubled picture
    dec = HEVCDecoder().decode(bs)
    assert len(dec) == 3


def test_frame_dup_off_encodes_all():
    frames = _frames(4)
    frames[2] = frames[1]
    enc = Encoder(_params())
    for f in frames:
        enc.encode_frame(*f)
    enc.flush()
    assert len(enc.frame_stats) == 4


def test_hist_scenecut_inserts_keyframe():
    rng = np.random.default_rng(9)
    h, w = 64, 96
    a = rng.integers(0, 100, (h, w)).astype(np.uint8)       # dark scene
    b = rng.integers(156, 255, (h, w)).astype(np.uint8)     # bright scene
    c2 = (np.full((32, 48), 120, np.uint8), np.full((32, 48), 130, np.uint8))
    frames = [(np.roll(a, i, 1),) + c2 for i in range(3)] + \
             [(np.roll(b, i, 1),) + c2 for i in range(3)]
    p = _params(hist_scenecut=True, min_keyint=1, open_gop=False)
    enc = Encoder(p)
    for f in frames:
        enc.encode_frame(*f)
    enc.flush()
    types = [s["type"] for s in enc.frame_stats]
    assert types.count("I") >= 2       # the cut forced a keyframe
    st = enc.get_slicetype_poc_and_scenecut()
    assert 3 in enc._scenecut_frames


def test_csv_log_level2_columns(tmp_path):
    from x265_tpu.cli import main as cli_main
    from x265_tpu.io.y4m import write_y4m, VideoInfo

    src = tmp_path / "in.y4m"
    write_y4m(str(src), _frames(3), VideoInfo(96, 64, 25, 1))
    out = tmp_path / "o.hevc"
    csv = tmp_path / "log.csv"
    rc = cli_main(["--input", str(src), "--output", str(out),
                   "--preset", "ultrafast", "--qp", "30", "--bframes", "0",
                   "--csv", str(csv), "--csv-log-level", "2"])
    assert rc == 0
    lines = csv.read_text().strip().splitlines()
    assert "Avg CU size" in lines[0] and "CU64%" in lines[0]
    assert len(lines) == 4
    first = [v.strip() for v in lines[1].split(",")]
    assert float(first[12]) > 0        # avg CU size populated


def test_level_enforcement():
    """x265 enforceLevel analog (level.cpp:290): a requested level must
    fit the picture; rate knobs are clamped; ABR inherits the level's
    VBV when none is set."""
    from x265_tpu.api.params import RC_ABR

    # 1080p cannot claim level 2.0 (idc 60)
    p = _params()
    p.width, p.height = 1920, 1080
    p.level_idc = 60
    with pytest.raises(ValueError):
        Encoder(p)

    # bitrate above the level-3.1 cap is clamped, VBV inherited
    p = _params()
    p.rc_mode = RC_ABR
    p.bitrate = 99999
    p.level_idc = 93            # level 3.1: MaxBR 10000 kbps main
    enc = Encoder(p)
    assert enc.param.bitrate == 10000
    assert enc.param.vbv_maxrate == 10000
    assert enc.param.vbv_bufsize == 10000

    # high tier is refused where the spec has none
    p = _params()
    p.level_idc = 90
    p.high_tier = True
    enc = Encoder(p)
    assert enc.param.high_tier is False
