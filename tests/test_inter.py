"""IPPP (P-frame) end-to-end tests — BASELINE config #2 ladder."""
import numpy as np
import pytest

from x265_tpu.api.params import param_default_preset, param_parse, RC_CQP
from x265_tpu.api.encoder import Encoder
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.decoder import de265
from x265_tpu.hevc.inter_tools import (
    InterCtx, amvp_candidates, decode_mvd, encode_mvd, merge_candidates,
)
from x265_tpu.hevc.cabac import CabacDecoder, CabacEncoder
from x265_tpu.hevc.tables import CTX_OFF


def _moving_frames(w, h, n, seed=7):
    rng = np.random.default_rng(seed)
    big = np.clip((np.mgrid[0:h * 2, 0:w * 2][0] // 2 +
                   np.mgrid[0:h * 2, 0:w * 2][1] // 3) % 256 +
                  rng.integers(-8, 8, (h * 2, w * 2)), 0, 255).astype(np.uint8)
    cb_big = ((np.mgrid[0:h, 0:w][1]) % 256).astype(np.uint8)
    out = []
    for i in range(n):
        ox, oy = 4 * i, 2 * i
        out.append((big[oy:oy + h, ox:ox + w].copy(),
                    cb_big[oy // 2:oy // 2 + h // 2, ox // 2:ox // 2 + w // 2].copy(),
                    cb_big[oy // 2 + 8:oy // 2 + 8 + h // 2,
                           ox // 2 + 8:ox // 2 + 8 + w // 2].copy()))
    return out


def test_mvd_roundtrip():
    rng = np.random.default_rng(0)
    enc = CabacEncoder()
    enc.init_slice(1, 30)
    vals = [(int(rng.integers(-200, 200)), int(rng.integers(-200, 200)))
            for _ in range(200)] + [(0, 0), (1, 0), (0, -1), (2, 2), (-2, 1)]
    for (mx, my) in vals:
        encode_mvd(enc, CTX_OFF["mvd"], mx, my)
    enc.encode_bin_trm(1)
    dec = CabacDecoder(enc.finish())
    dec.init_slice(1, 30)
    for (mx, my) in vals:
        assert decode_mvd(dec, CTX_OFF["mvd"]) == (mx, my)


def test_merge_amvp_shared_derivation():
    ic = InterCtx(64, 64)
    avail = np.zeros((16, 16), dtype=bool)
    # left neighbor CU, uni L0 mv (8, 4) ref 0
    ic.set_block(0, 0, 16, 16, (1, (8, 4), (0, 0), 0, -1), False)
    avail[0:4, 0:4] = True
    cands = merge_candidates(ic, avail, 16, 0, 16, 16, 64, 64, 5, 32,
                             is_b=False, ref_poc=((0,), ()))
    assert cands[0] == (1, (8, 4), (0, 0), 0, -1)
    assert cands[1] == (1, (0, 0), (0, 0), 0, -1)
    am = amvp_candidates(ic, avail, 16, 0, 16, 16, 64, 64,
                         lx=0, ref_idx=0, cur_poc=1, ref_poc=((0,), ()))
    assert am[0] == (8, 4)


def test_amvp_scaling():
    """Neighbor referencing a farther picture scales toward the target:
    neighbor mv (16, 8) at ref distance 2 predicts (8, 4) at distance 1."""
    ic = InterCtx(64, 64)
    avail = np.zeros((16, 16), dtype=bool)
    ic.set_block(0, 0, 16, 16, (1, (16, 8), (0, 0), 1, -1), False)
    avail[0:4, 0:4] = True
    # cur_poc=2, L0 refs at POC 1 (idx 0) and POC 0 (idx 1)
    am = amvp_candidates(ic, avail, 16, 0, 16, 16, 64, 64,
                         lx=0, ref_idx=0, cur_poc=2, ref_poc=((1, 0), ()))
    assert am[0] == (8, 4)


def test_merge_combined_bi():
    """B-slice merge list appends combined L0+L1 candidates (8.5.3.2.4)."""
    ic = InterCtx(64, 64)
    avail = np.zeros((16, 16), dtype=bool)
    ic.set_block(0, 0, 16, 16, (1, (8, 4), (0, 0), 0, -1), False)   # A1: L0
    ic.set_block(16, 0, 16, 16, (2, (0, 0), (-4, 2), -1, 0), False)  # B1: L1
    avail[0:4, 0:8] = True
    cands = merge_candidates(ic, avail, 16, 16, 16, 16, 64, 64, 5, 32,
                             is_b=True, ref_poc=((0,), (2,)))
    # CU at (16,16): B1=(31,15) is the L1 block, B2=(15,15) the L0 block;
    # A1/A0/B0 fall outside the available area
    assert cands[0] == (2, (0, 0), (-4, 2), -1, 0)     # B1
    assert cands[1] == (1, (8, 4), (0, 0), 0, -1)      # B2
    assert cands[2] == (3, (8, 4), (-4, 2), 0, 0)      # combined(1,0)
    # zero-fill candidates are bi in B slices
    assert cands[-1][0] == 3


@pytest.mark.parametrize("lossless", [True, False])
def test_ippp_roundtrip(lossless):
    w, h = 96, 64
    frames = _moving_frames(w, h, 3)
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.bframes = 0                      # this test targets IPPP (config #2)
    if lossless:
        param_parse(p, "lossless")
    else:
        p.rc_mode = RC_CQP
        p.qp = 28
        p.lossless = False
    enc = Encoder(p)
    aus = [enc.encode_frame(*f) for f in frames]
    stream = enc.headers() + b"".join(aus)
    own = HEVCDecoder().decode(stream)
    assert len(own) == 3
    if lossless:
        for f, d in zip(frames, own):
            assert np.array_equal(d.y, f[0].astype(np.int32))
            assert np.array_equal(d.cb, f[1].astype(np.int32))
            assert np.array_equal(d.cr, f[2].astype(np.int32))
        # P frames should be far smaller than the IDR on translating content
        assert len(aus[1]) < len(aus[0]) // 2
    else:
        err = own[2].y - frames[2][0].astype(np.int64)
        psnr = 10 * np.log10(255 ** 2 / max(1e-9, float((err ** 2).mean())))
        assert psnr > 28.0


@pytest.mark.skipif(not de265.available(), reason="libde265 not present")
@pytest.mark.parametrize("lossless", [True, False])
def test_ippp_conformance_libde265(lossless):
    w, h = 96, 64
    frames = _moving_frames(w, h, 4)
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.bframes = 0                      # this test targets IPPP (config #2)
    if lossless:
        param_parse(p, "lossless")
    else:
        p.rc_mode = RC_CQP
        p.qp = 26
        p.lossless = False
    enc = Encoder(p)
    stream = enc.headers() + b"".join(enc.encode_frame(*f) for f in frames)
    pics = de265.decode(stream)
    assert len(pics) == 4
    own = HEVCDecoder().decode(stream)
    for i in range(4):
        assert np.array_equal(pics[i][0].astype(np.int32), own[i].y)
        assert np.array_equal(pics[i][1].astype(np.int32), own[i].cb)
        assert np.array_equal(pics[i][2].astype(np.int32), own[i].cr)
        if lossless:
            assert np.array_equal(pics[i][0], frames[i][0])
            assert np.array_equal(pics[i][1], frames[i][1])
            assert np.array_equal(pics[i][2], frames[i][2])


def test_hme_honors_large_merange():
    """merange > 24 must search the full range (hierarchical ME), not
    silently clamp: 40-px motion is only findable when merange 57 is
    honored (reference motion.cpp:739 searches the whole merange)."""
    from x265_tpu.engine.me import motion_decide
    rng = np.random.default_rng(3)
    H, W = 128, 192
    ref = rng.integers(0, 256, (H, W)).astype(np.uint8)
    # cur = ref shifted right by 40 px (edge-replicated)
    cur = np.concatenate([np.repeat(ref[:, :1], 40, 1), ref[:, :-40]],
                         axis=1)
    mv, cost = motion_decide(cur, ref, W, H, S=16, R=57, qp=32, subme=0)
    # interior blocks (content fully present in ref) find dx = -40
    assert (mv[:, 3:, 0] == -160).all(), mv[:, :, 0] // 4
    assert (mv[:, 3:, 1] == 0).all()


def test_decoder_cu_stats_collection():
    """collect_stats must not perturb decoding and must account for all
    coded CUs (tools/stream_stats.py relies on both)."""
    w, h = 96, 64
    frames = _moving_frames(w, h, 3)
    p = param_default_preset("ultrafast")
    p.width, p.height = w, h
    p.bframes = 0
    p.rc_mode = RC_CQP
    p.qp = 32
    enc = Encoder(p)
    stream = enc.headers() + b"".join(enc.encode_frame(*f) for f in frames)
    plain = HEVCDecoder().decode(stream)
    dec = HEVCDecoder(collect_stats=True)
    with_stats = dec.decode(stream)
    for a, b in zip(plain, with_stats):
        assert np.array_equal(a.y, b.y)
    assert len(dec.pic_stats) == 3
    for poc, stype, events in dec.pic_stats:
        assert events, "every picture has coded CUs"
        area = sum(size * size for (_st, size, _k, _b, _r, _c) in events)
        assert area == w * h, "CU events must tile the picture"
        for (_st, size, kind, nbytes, nres, _cbf) in events:
            assert kind in ("skip", "merge", "amvp", "intra")
            assert 0 <= nres <= nbytes + 1
