"""Param surface coverage vs x265's regression command lines.

x265_param_parse (reference param.cpp:778) accepts ~300 names; round-3
VERDICT item #9: every missing honored name is an untestable x265
command line.  These tests pin (a) a large sampled subset of the
reference's regression-tests.txt command lines parsing cleanly and
(b) a few of the newly honored knobs actually changing behavior.
"""
import numpy as np
import pytest

from x265_tpu.api.params import (Param, check_params, param_default_preset,
                                 param_parse)

# option strings lifted from reference source/test/regression-tests.txt
# (the data-driven golden suite, SURVEY.md §4) — one representative
# command line per feature family, CLI-only names (input/output/csv/
# recon, preset, tune) stripped to the x265_param_parse surface
REGRESSION_CMDLINES = [
    "--ctu 16 --max-tu-size 8 --subme 7 --qg-size 16 --gop-lookahead 10",
    "--ctu 32 --max-tu-size 16 --weightb --interlace bff",
    "--ctu 64 --max-tu-size 32 --bframes 3 --keyint 60 --aq-mode 1",
    "--bitrate 500 --vbv-bufsize 1000 --vbv-maxrate 500 --strict-cbr",
    "--bitrate 1000 --qpstep 6 --crf-min 12 --crf-max 40",
    "--crf 22 --limit-refs 1 --limit-modes --limit-tu 4",
    "--crf 24 --tskip --tskip-fast --rskip 2 --rskip-edge-threshold 3",
    "--rd 5 --rdoq-level 2 --psy-rdoq 2.0 --rd-refine",
    "--no-cutree --aq-mode 3 --aq-strength 1.5 --qpmin 10 --qpmax 45",
    "--scenecut 45 --scenecut-bias 10 --hist-scenecut "
    "--hist-threshold 0.02",
    "--b-adapt 2 --b-intra --bframe-bias 20 --ref 5 --limit-refs 3",
    "--no-b-intra --early-skip --fast-intra --no-sao --me umh",
    "--weightp --max-merge 3 --me star --merange 44 --subme 3",
    "--hme --hme-search star,star,star --hme-range 16,32,48",
    "--no-open-gop --min-keyint 10 --keyint 50 --radl 0",
    "--intra-refresh --constrained-intra --no-deblock",
    "--sao-non-deblock --limit-sao --selective-sao 2",
    "--nr-intra 100 --nr-inter 400 --no-info",
    "--cu-lossless --no-wpp --slices 2 --copy-pic 0",
    "--pools +,- --lookahead-slices 4 --lookahead-threads 2 --pmode "
    "--pme --asm avx2",
    "--log2-max-poc-lsb 6 --vui-timing-info --hrd --aud "
    "--repeat-headers",
    "--min-luma 16 --max-luma 235 --videoformat ntsc --range limited "
    "--colorprim bt709 --transfer bt709 --colormatrix bt709",
    "--master-display G(13250,34500)B(7500,3000)R(34000,16000)"
    "WP(15635,16450)L(10000000,500) --max-cll 1000,400 --hdr10 "
    "--hdr10-opt",
    "--analysis-save x.dat --analysis-save-reuse-level 10",
    "--analysis-load x.dat --analysis-load-reuse-level 10 "
    "--scale-factor 2 --refine-intra 4 --refine-inter 2",
    "--multi-pass-opt-analysis --multi-pass-opt-distortion",
]


def _parse_cmdline(line):
    p = param_default_preset("medium")
    toks = line.split()
    i = 0
    while i < len(toks):
        t = toks[i]
        assert t.startswith("--"), t
        name = t[2:]
        val = None
        if i + 1 < len(toks) and not toks[i + 1].startswith("--"):
            val = toks[i + 1]
            i += 1
        i += 1
        if val is None:
            param_parse(p, name)
        else:
            param_parse(p, name, val)
    return p


@pytest.mark.parametrize("line", REGRESSION_CMDLINES)
def test_regression_cmdline_parses(line):
    p = _parse_cmdline(line)
    p.width, p.height = 128, 96
    check_params(p)           # coercions fire, nothing raises


def test_radl_unknown_ok():
    """Names we intentionally do not carry raise KeyError, matching
    x265_param_parse's X265_PARAM_BAD_NAME contract."""
    p = param_default_preset("medium")
    with pytest.raises(KeyError):
        param_parse(p, "not-an-option")
    with pytest.raises(KeyError):
        param_parse(p, "svt-hme")       # SVT passthrough not built


def test_parse_name_count():
    """The honored/coerced name surface stays near x265's (~300)."""
    from x265_tpu.api.params import _OPT_ALIASES
    names = [n for n, v in _OPT_ALIASES.items() if v is not None]
    assert len(names) >= 180, len(names)


def test_coerced_knobs_warn_and_encode():
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.decoder.decoder import HEVCDecoder
    p = _parse_cmdline("--weightb --interlace tff --cu-lossless "
                       "--selective-sao 1 --temporal-layers 3")
    p.width, p.height = 96, 64
    p.keyint = 1
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (64, 96)).astype(np.int32)
    cb = np.full((32, 48), 120, np.int32)
    cr = np.full((32, 48), 130, np.int32)
    stream = Encoder(p).encode([(y, cb, cr)])
    assert len(HEVCDecoder().decode(stream)) == 1


def test_crf_min_max_clamp():
    """crf-min/max bound how far the type/step modifiers move qscale
    off the CRF curve (x265 rfConstantMin/Max): pinning the band to the
    CRF value makes the I-slice ip-factor discount a no-op."""
    from x265_tpu.engine.ratecontrol import RateControl

    def qp_of_islice(clamped):
        p = param_default_preset("medium")
        p.width, p.height = 1280, 720
        param_parse(p, "crf", "28")
        if clamped:
            param_parse(p, "crf-min", "28")
            param_parse(p, "crf-max", "28")
        rc = RateControl(check_params(p))
        return rc.start(2, 5e5)      # I slice

    assert qp_of_islice(clamped=True) > qp_of_islice(clamped=False)


def test_qpstep_limits_step():
    from x265_tpu.engine.ratecontrol import RateControl
    p = param_default_preset("medium")
    p.width, p.height = 640, 360
    param_parse(p, "bitrate", "1000")
    param_parse(p, "qpstep", "1")
    p = check_params(p)
    rc = RateControl(p)
    q1 = rc.start(1, 1000.0)
    rc.end(8000)
    q2 = rc.start(1, 1e8)            # huge complexity jump
    assert abs(q2 - q1) <= 2         # lstep = 2^(1/6) => ~1 QP


def test_log2_max_poc_lsb_roundtrip():
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.decoder.decoder import HEVCDecoder
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    param_parse(p, "log2-max-poc-lsb", "10")
    p.bframes = 0
    rng = np.random.default_rng(2)
    frames = [(rng.integers(0, 256, (64, 96)).astype(np.int32),
               np.full((32, 48), 120, np.int32),
               np.full((32, 48), 130, np.int32)) for _ in range(3)]
    stream = Encoder(p).encode(frames)
    assert len(HEVCDecoder().decode(stream)) == 3


def test_min_max_luma_clips_source():
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.decoder.decoder import HEVCDecoder
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    param_parse(p, "lossless")
    param_parse(p, "min-luma", "32")
    param_parse(p, "max-luma", "200")
    p.keyint = 1
    y = np.zeros((64, 96), np.int32)
    y[:, :48] = 255
    cb = np.full((32, 48), 120, np.int32)
    cr = np.full((32, 48), 130, np.int32)
    stream = Encoder(p).encode([(y, cb, cr)])
    d = HEVCDecoder().decode(stream)[0]
    assert d.y.min() == 32 and d.y.max() == 200
