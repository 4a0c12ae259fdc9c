"""API surface odds and ends: reconfigure, AUD, profiling scopes
(x265 analogs: x265_encoder_reconfig api.cpp:307, --aud, cpuEvents)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.hevc.bitstream import split_annexb


def _frames(n=8, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:64, 0:96]
    base = (128 + 70 * np.sin(xx / 13.0) * np.cos(yy / 11.0)).astype(int)
    return [(np.clip(np.roll(base, 2 * i, 1) +
                     rng.integers(-5, 5, (64, 96)), 0, 255).astype(np.uint8),
             np.full((32, 48), 120, np.uint8),
             np.full((32, 48), 130, np.uint8)) for i in range(n)]


def test_reconfigure_qp_midstream():
    frames = _frames()
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes = 26, RC_CQP, 0
    enc = Encoder(p)
    out = [enc.headers()]
    for i, f in enumerate(frames):
        if i == 4:
            enc.reconfigure(qp=44)
        out.append(enc.encode_frame(*f))
    out.append(enc.flush())
    enc.close()
    pics = HEVCDecoder().decode(b"".join(out))
    assert len(pics) == len(frames)
    qps = [s["qp"] for s in enc.frame_stats]
    assert max(qps[:4]) < min(qps[5:])     # QP jumped mid-stream
    with pytest.raises(ValueError):
        enc.reconfigure(ctu_size=32)       # not reconfigurable


def test_aud_emission():
    frames = _frames(4)
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 2
    p.aud = True
    enc = Encoder(p)
    stream = enc.encode(frames)
    auds = [n for n in split_annexb(stream) if ((n[0] >> 1) & 0x3F) == 35]
    assert len(auds) == 4                  # one per access unit
    assert len(HEVCDecoder().decode(stream)) == 4
    if de265.available():
        assert len(de265.decode(stream)) == 4


def test_profiling_scopes():
    from x265_tpu.utils import profiling
    profiling.reset()
    with profiling.scope("analysis"):
        pass
    r = profiling.report()
    assert r["analysis"]["calls"] == 1


def test_intra_refresh_column_sweeps():
    """--intra-refresh forces one intra CTU column per P frame, sweeping
    across the picture (x265_encoder_intra_refresh analog)."""
    frames = _frames(6)
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 0
    p.intra_refresh = True
    enc = Encoder(p)
    stream = enc.encode(frames)
    assert len(HEVCDecoder().decode(stream)) == 6
    if de265.available():
        assert len(de265.decode(stream)) == 6
    dec = enc._p_decisions(frames[1][0], [enc.anchors[0][1]], 30)
    assert (~dec.inter8).all(axis=0).any()     # a full intra column exists


def test_rc_tuning_params():
    """--qpmin/--qpmax/--ipratio/--pbratio/--qcomp reach RateControl."""
    from x265_tpu.api.params import param_default_preset, param_parse
    from x265_tpu.engine.ratecontrol import RateControl
    p = param_default_preset("medium")
    p.width, p.height = 640, 360
    param_parse(p, "qpmin", "20")
    param_parse(p, "qpmax", "40")
    param_parse(p, "ipratio", "1.6")
    param_parse(p, "qcomp", "0.7")
    param_parse(p, "crf", "28")
    rc = RateControl(p)
    assert rc.qp_min == 20 and rc.qp_max == 40
    assert rc.ip_factor == 1.6 and rc.qcompress == 0.7
    qp = rc.start(1, 1e9)        # absurd complexity -> clamped at qpmax
    assert qp <= 40


def test_max_merge_limits_candidates():
    """--max-merge caps the merge list and the slice header field."""
    import numpy as np
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.api.params import param_default_preset, param_parse
    from x265_tpu.decoder import de265
    from x265_tpu.decoder.decoder import HEVCDecoder
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.bframes = 0
    p.scenecut = 0
    p.aq_mode = 0
    p.cu_tree = False
    p.sao = False
    param_parse(p, "qp", "30")
    param_parse(p, "max-merge", "2")
    rng = np.random.default_rng(5)
    base = rng.integers(0, 255, (64, 96)).astype(np.int32)
    frames = [(np.clip(np.roll(base, i * 2, 1)
                       + rng.integers(-4, 4, (64, 96)), 0, 255)
               .astype(np.uint8),
               np.full((32, 48), 120, np.uint8),
               np.full((32, 48), 130, np.uint8)) for i in range(4)]
    enc = Encoder(p)
    bs = enc.encode(frames)
    ours = HEVCDecoder().decode(bs)
    assert len(ours) == 4
    if de265.available():
        ext = de265.decode(bs)
        for o, e in zip(ours, ext):
            assert np.array_equal(o.y, e[0].astype(np.int32))


def test_option_surface_honored_or_coerced():
    """VERDICT r1 #5: no silently-ignored options. Every coerced option
    must warn and be forced to its supported value by check_params."""
    from x265_tpu.api.params import (
        COERCED_OPTIONS, Param, check_params)
    p = Param(width=64, height=64, rect=True, amp=True,
              tu_inter_depth=3, tu_intra_depth=3, wpp=True, tiles=(2, 2))
    p = check_params(p)
    assert not p.rect and not p.amp
    assert p.tu_inter_depth == 1 and p.tu_intra_depth == 1
    assert p.wpp and p.tiles == (1, 1)   # wpp honored since r4 (b6a8a87)
    # psy-rd is honored now (models/rdo.py), not coerced
    p2 = check_params(Param(width=64, height=64, psy_rd=3.0))
    assert p2.psy_rd == 3.0
    # the documented coerce list matches what check_params forces
    assert set(COERCED_OPTIONS) == {
        "rect", "amp", "tu_inter_depth", "tu_intra_depth",
        "tiles", "weightb", "constrained_intra", "cu_lossless",
        "ssim_rd", "lowpass_dct", "dynamic_rd", "aq_motion", "hevc_aq",
        "interlace", "single_sei", "opt_qp_pps", "temporal_layers",
        "uhd_bd", "sao_non_deblock", "selective_sao", "vbv_end",
        "refine_intra", "refine_inter", "refine_mv", "qg_size"}
    # the simple-coerce table forces each row back to its supported value
    from x265_tpu.api.params import _COERCE_SIMPLE
    for (fld, bad, forced) in _COERCE_SIMPLE:
        pc = Param(width=64, height=64)
        setattr(pc, fld, True if isinstance(forced, bool)
                else forced + 1)
        assert bad(getattr(pc, fld)), fld
        pc = check_params(pc)
        assert getattr(pc, fld) == forced, fld


def test_rd_level_dial():
    """--rd >= 5 engages RDOQ (presets.rst behavior)."""
    from x265_tpu.api.params import Param, check_params
    p = check_params(Param(width=64, height=64, rd_level=5))
    assert p.rdoq_level > 0
    p = check_params(Param(width=64, height=64, rd_level=3))
    assert p.rdoq_level == 0


def test_qpfile_forces_keyframe_and_qp(tmp_path):
    """x265 --qpfile: 'frame type QP' lines force per-frame keyframes and
    QPs (x265cli parseQPFile analog)."""
    import numpy as np
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.api.params import RC_CQP, param_default_preset
    rng = np.random.default_rng(3)
    frames = [(rng.integers(0, 255, (64, 64)).astype(np.uint8),
               np.full((32, 32), 120, np.uint8),
               np.full((32, 32), 130, np.uint8)) for _ in range(6)]
    qf = tmp_path / "qp.txt"
    qf.write_text("0 I 30\n3 I 25\n")
    p = param_default_preset("ultrafast")
    p.width = p.height = 64
    p.rc_mode, p.qp, p.bframes = RC_CQP, 34, 0
    p.keyint, p.scenecut, p.open_gop = 250, 0, False
    p.qpfile = str(qf)
    enc = Encoder(p)
    enc.encode(frames)
    stats = {s["poc"]: s for s in enc.frame_stats}
    types = [s["type"] for s in enc.frame_stats]
    assert types.count("I") == 2               # frames 0 and 3 forced
    forced = [s for s in enc.frame_stats if s["type"] == "I"]
    assert forced[0]["qp"] == 30
    assert forced[1]["qp"] == 25


def test_qpfile_open_gop_bframes(tmp_path):
    """ADVICE r2: forced QPs must survive the default configuration —
    open GOP (forced keyframe takes the CRA path) and queued B frames."""
    import numpy as np
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.api.params import RC_CQP, param_default_preset
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (64, 64)).astype(np.int32)
    frames = [(np.clip(np.roll(base, 2 * i, 1)
                       + rng.integers(-3, 4, (64, 64)), 0, 255)
               .astype(np.uint8),
               np.full((32, 32), 120, np.uint8),
               np.full((32, 32), 130, np.uint8)) for i in range(8)]
    qf = tmp_path / "qp.txt"
    # frame 4: forced CRA keyframe at QP 26; frame 2 (a B) forced QP 40;
    # junk + comment lines must be skipped
    qf.write_text("# comment\n2 B 40\nnot-a-number x\n4 K 26\n")
    p = param_default_preset("medium")
    p.width = p.height = 64
    p.rc_mode, p.qp = RC_CQP, 34
    p.bframes = 2
    p.keyint, p.scenecut = 250, 0
    p.aq_mode, p.cu_tree, p.sao = 0, False, False
    assert p.open_gop
    p.qpfile = str(qf)
    enc = Encoder(p)
    enc.encode(frames)
    istats = [s for s in enc.frame_stats if s["type"] == "I"]
    assert len(istats) == 2            # frame 0 IDR + forced CRA
    assert istats[1]["qp"] == 26       # forced through the CRA path
    bstats = [s for s in enc.frame_stats if s["qp"] == 40]
    assert len(bstats) == 1 and bstats[0]["type"] == "B"
