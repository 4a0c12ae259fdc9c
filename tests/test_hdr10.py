"""HDR10 static metadata: mastering-display + content-light-level SEIs
(D.3.28 / D.3.35) and VUI colour description (E.2.1 / H.273).

Reference analog: x265 --master-display / --max-cll / --colorprim /
--transfer / --colormatrix (x265.h:611, sei.h MasteringDisplayColorVolume).
"""
import struct

import numpy as np

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse
from x265_tpu.hevc.bitstream import split_annexb, strip_emulation_prevention
from x265_tpu.hevc.headers import parse_sps
from x265_tpu.hevc.sei import (SEI_CONTENT_LIGHT_LEVEL,
                               SEI_MASTERING_DISPLAY, parse_master_display,
                               parse_sei)

MD = "G(13250,34500)B(7500,3000)R(34000,16000)WP(15635,16450)L(10000000,1)"


def _scan(bs):
    found, sps = {}, None
    for nal in split_annexb(bs):
        t = (nal[0] >> 1) & 0x3F
        body = strip_emulation_prevention(nal[2:])
        if t == 39:
            for pt, pl in parse_sei(body):
                found[pt] = pl
        elif t == 33:
            sps = parse_sps(body)
    return found, sps


def test_master_display_string_parse():
    prim, wp, maxl, minl = parse_master_display(MD)
    assert prim == ((13250, 34500), (7500, 3000), (34000, 16000))
    assert wp == (15635, 16450) and maxl == 10000000 and minl == 1


def test_hdr10_seis_and_vui():
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.bframes = 0
    p.sao = False
    p.aq_mode = 0
    p.cu_tree = False
    param_parse(p, "qp", "30")
    param_parse(p, "master-display", MD)
    param_parse(p, "max-cll", "1000,400")
    param_parse(p, "colorprim", "bt2020")
    param_parse(p, "transfer", "smpte2084")
    param_parse(p, "colormatrix", "bt2020nc")
    rng = np.random.default_rng(5)
    frames = [(rng.integers(0, 255, (64, 96)).astype(np.uint8),
               np.full((32, 48), 120, np.uint8),
               np.full((32, 48), 130, np.uint8))]
    bs = Encoder(p).encode(frames)
    found, sps = _scan(bs)
    vals = struct.unpack(">6H2H2I", found[SEI_MASTERING_DISPLAY])
    assert vals == (13250, 34500, 7500, 3000, 34000, 16000,
                    15635, 16450, 10000000, 1)
    assert struct.unpack(">2H", found[SEI_CONTENT_LIGHT_LEVEL]) == (1000, 400)
    assert (sps.colour_primaries, sps.transfer_characteristics,
            sps.matrix_coeffs) == (9, 16, 9)


def test_hdr10_shortcut_flag():
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.bframes = 0
    param_parse(p, "qp", "30")
    param_parse(p, "hdr10")
    enc = Encoder(p)
    assert enc.sps.colour_primaries == 9          # bt2020
    assert enc.sps.transfer_characteristics == 16  # smpte2084 (PQ)
    assert enc.sps.matrix_coeffs == 9              # bt2020nc


def test_no_hdr_default_stream_unchanged():
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.bframes = 0
    param_parse(p, "qp", "30")
    rng = np.random.default_rng(5)
    frames = [(rng.integers(0, 255, (64, 96)).astype(np.uint8),
               np.full((32, 48), 120, np.uint8),
               np.full((32, 48), 130, np.uint8))]
    bs = Encoder(p).encode(frames)
    found, sps = _scan(bs)
    assert SEI_MASTERING_DISPLAY not in found
    assert sps.colour_primaries == 0 and sps.matrix_coeffs == -1


def test_sar_and_videoformat_vui():
    """--sar/--videoformat VUI signalling (E.2.1; x265 x265cli.h)."""
    p = param_default_preset("ultrafast")
    p.width, p.height = 64, 48
    param_parse(p, "qp", "30")
    param_parse(p, "keyint", "1")
    param_parse(p, "sar", "16:11")
    param_parse(p, "videoformat", "ntsc")
    rng = np.random.default_rng(3)
    frames = [(rng.integers(0, 255, (48, 64)).astype(np.uint8),
               np.full((24, 32), 120, np.uint8),
               np.full((24, 32), 130, np.uint8))]
    enc = Encoder(p)
    assert enc.sps.sar_idc == 4            # 16:11 named entry
    assert enc.sps.video_format == 2       # ntsc
    bs = enc.encode(frames)
    _, sps = _scan(bs)
    assert sps is not None                 # SPS with the VUI still parses
