"""Recon-in-the-loop RD promotions with motion unification
(models/rdo.py; x265 compressInterCU_rd0_4 + checkMerge2Nx2N analog).
"""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset


def _pan_frames(n=4, h=128, w=192, seed=7):
    """Textured pan: per-block subpel refinement leaves almost-equal MVs
    — exactly the field the unification must merge."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.int32)
    base = (base[:-2, :-2] + base[1:-1, :-2] + base[2:, :-2]
            + base[:-2, 1:-1] + base[1:-1, 1:-1] + base[2:, 1:-1]
            + base[:-2, 2:] + base[1:-1, 2:] + base[2:, 2:]) // 9
    out = []
    for i in range(n):
        y = base[8:8 + h, 8 + 3 * i:8 + 3 * i + w].astype(np.uint8)
        out.append((np.ascontiguousarray(y),
                    np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 130, np.uint8)))
    return out


def _encode(rd_level):
    p = param_default_preset("medium")
    p.width, p.height = 192, 128
    p.rc_mode, p.qp = RC_CQP, 32
    p.bframes = 0
    p.sao = False
    p.aq_mode = 0
    p.cu_tree = False
    p.scenecut = 0
    p.ref = 1
    p.rd_level = rd_level
    enc = Encoder(p)
    maps = []
    orig = enc._p_decisions

    def spy(*a, **k):
        dec = orig(*a, **k)
        maps.append(dec.cu_log2_map.copy())
        return dec

    enc._p_decisions = spy
    return enc.encode(_pan_frames()), maps


@pytest.mark.slow
def test_unification_promotes_more_and_conforms():
    from x265_tpu.decoder import de265
    from x265_tpu.decoder.decoder import HEVCDecoder

    bs_rd, maps_rd = _encode(rd_level=3)    # RD + unification
    bs_fast, maps_fast = _encode(rd_level=2)  # SATD heuristics only
    big_rd = sum(int((m >= 5).sum()) for m in maps_rd)
    big_fast = sum(int((m >= 5).sum()) for m in maps_fast)
    assert big_rd >= big_fast               # unification merges more
    assert big_rd > 0
    assert len(bs_rd) <= len(bs_fast) * 1.02   # and it pays off in bits

    ours = HEVCDecoder().decode(bs_rd)
    ref = de265.decode(bs_rd)
    for o, e in zip(ours, ref):
        assert np.array_equal(o.y, e[0].astype(np.int32))
        assert np.array_equal(o.cb, e[1].astype(np.int32))
        assert np.array_equal(o.cr, e[2].astype(np.int32))
