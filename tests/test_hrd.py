"""HRD signalling (x265 --hrd): VUI hrd_parameters (E.2.2) +
buffering_period / pic_timing SEIs (D.3.2/D.3.3)."""
import numpy as np

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.hevc.bitstream import split_annexb, strip_emulation_prevention
from x265_tpu.hevc.sei import (SEI_BUFFERING_PERIOD, SEI_PIC_TIMING,
                               parse_sei)


def test_hrd_seis_and_vui():
    rng = np.random.default_rng(2)
    w, h = 96, 64
    frames = [(rng.integers(0, 255, (h, w)).astype(np.uint8),
               np.full((h // 2, w // 2), 120, np.uint8),
               np.full((h // 2, w // 2), 130, np.uint8)) for _ in range(5)]
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.bframes = 2
    p.b_adapt = 0
    p.scenecut = 0
    p.aq_mode = 0
    p.cu_tree = False
    p.sao = False
    param_parse(p, "bitrate", "400")
    param_parse(p, "vbv-maxrate", "400")
    param_parse(p, "vbv-bufsize", "800")
    param_parse(p, "hrd")
    enc = Encoder(p)
    assert enc.sps.hrd_bitrate == 400000
    bs = enc.encode(frames)
    nbp = npt = 0
    for nal in split_annexb(bs):
        if ((nal[0] >> 1) & 0x3F) == 39:
            for pt, _ in parse_sei(strip_emulation_prevention(nal[2:])):
                nbp += pt == SEI_BUFFERING_PERIOD
                npt += pt == SEI_PIC_TIMING
    assert nbp == 1 and npt == len(frames)
    # the HRD VUI must still parse: both decoders read the SPS
    ours = HEVCDecoder().decode(bs)
    assert len(ours) == len(frames)
    if de265.available():
        ext = de265.decode(bs)
        for o, e in zip(ours, ext):
            assert np.array_equal(o.y, e[0].astype(np.int32))
