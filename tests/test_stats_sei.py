"""Stats/CSV/metrics + decoded-picture-hash SEI tests (x265 analog:
x265_encoder_get_stats, csvlog, SEIDecodedPictureHash sei.h:150)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.hevc.bitstream import split_annexb, strip_emulation_prevention
from x265_tpu.hevc.sei import (
    SEI_DECODED_PICTURE_HASH, check_picture_hash, parse_sei,
)
from x265_tpu.utils.metrics import psnr, ssim


def _clip(w=96, h=64, n=5, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 70 * np.sin(xx / 11.0) * np.cos(yy / 13.0)).astype(int)
    return [(np.clip(np.roll(base, i * 2, 1) +
                     rng.integers(-5, 5, (h, w)), 0, 255).astype(np.uint8),
             np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 130, np.uint8)) for i in range(n)]


def test_metrics_identities():
    a = np.random.default_rng(0).integers(0, 256, (64, 64))
    assert psnr(a, a) > 99
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = np.clip(a + 20, 0, 255)
    assert psnr(a, b) < 25
    assert ssim(a, b) < 1.0


def test_encoder_stats():
    frames = _clip()
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 2
    p.psnr_metrics = True            # metrics are opt-in (x265 --psnr)
    enc = Encoder(p)
    enc.encode(frames)
    st = enc.get_stats()
    assert st["frames"] == 5
    assert st["by_type"]["I"]["count"] == 1
    assert st["by_type"]["B"]["count"] >= 1
    assert 25 < st["global_psnr_y"] < 99
    assert 0.5 < st["global_ssim"] <= 1.0
    # B frames carry higher QP than P under the CQP ladder
    assert st["by_type"]["B"]["avg_qp"] > st["by_type"]["P"]["avg_qp"]


def test_decoded_picture_hash_sei():
    frames = _clip(n=4)
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 2
    p.decoded_picture_hash = 1
    enc = Encoder(p)
    stream = enc.encode(frames)
    # collect hash SEIs (decode order) and decoded pictures (display order)
    seis = []
    for nal in split_annexb(stream):
        t = (nal[0] >> 1) & 0x3F
        if t == 40:     # suffix SEI
            for (pt, payload) in parse_sei(strip_emulation_prevention(nal[2:])):
                if pt == SEI_DECODED_PICTURE_HASH:
                    seis.append(payload)
    assert len(seis) == 4
    pics = HEVCDecoder().decode(stream)
    # each decoded picture must match exactly one hash
    matched = 0
    for pic in pics:
        planes = (pic.y, pic.cb, pic.cr)
        if any(check_picture_hash(s, planes) for s in seis):
            matched += 1
    assert matched == 4


def test_recovery_point_sei_with_intra_refresh():
    """recovery_point SEI (D.3.8) opens each --intra-refresh cycle."""
    import numpy as np
    from x265_tpu.api.encoder import Encoder
    from x265_tpu.api.params import param_default_preset, param_parse
    from x265_tpu.hevc.bitstream import (split_annexb,
                                         strip_emulation_prevention)
    from x265_tpu.hevc.sei import (SEI_RECOVERY_POINT, parse_recovery_point,
                                   parse_sei)
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    p.bframes = 0
    p.scenecut = 0
    param_parse(p, "qp", "30")
    param_parse(p, "intra-refresh")
    param_parse(p, "keyint", "100")
    rng = np.random.default_rng(3)
    frames = [(rng.integers(0, 255, (64, 96)).astype(np.uint8),
               np.full((32, 48), 120, np.uint8),
               np.full((32, 48), 130, np.uint8)) for _ in range(5)]
    bs = Encoder(p).encode(frames)
    pts = []
    for nal in split_annexb(bs):
        if ((nal[0] >> 1) & 0x3F) == 39:
            for pt, pl in parse_sei(strip_emulation_prevention(nal[2:])):
                if pt == SEI_RECOVERY_POINT:
                    pts.append(parse_recovery_point(pl))
    assert pts, "no recovery point SEI found"
    cnt, exact, broken = pts[0]
    assert cnt == p.pic_width_in_ctbs - 1 and exact and not broken
