"""Zones: per-frame-range rate-control overrides (x265 --zones,
x265.h:zones / param.cpp parseZones analog)."""
import numpy as np

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse
from x265_tpu.engine.ratecontrol import parse_zones


def _clip(n=9, w=96, h=64, seed=2):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w)).astype(np.int32)
    frames = []
    for i in range(n):
        y = np.clip(base + rng.integers(-8, 8, (h, w)), 0, 255)
        frames.append((y.astype(np.uint8),
                       np.full((h // 2, w // 2), 120, np.uint8),
                       np.full((h // 2, w // 2), 130, np.uint8)))
    return frames


def test_parse_zones():
    z = parse_zones("0,10,q=20/11,20,b=1.5")
    assert z == [{"start": 0, "end": 10, "q": 20},
                 {"start": 11, "end": 20, "b": 1.5}]
    assert parse_zones("") == []


def test_zone_forced_qp():
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.bframes = 0
    p.scenecut = 0
    p.aq_mode = 0
    p.cu_tree = False
    p.sao = False
    param_parse(p, "qp", "30")
    param_parse(p, "zones", "3,5,q=18")
    enc = Encoder(p)
    enc.encode(_clip())
    qps = {s["poc"]: s["qp"] for s in enc.frame_stats}
    # frames 3..5 carry the zone QP; others the CQP ladder
    for poc in (3, 4, 5):
        assert qps[poc] == 18, (poc, qps)
    assert qps[1] != 18 and qps[7] != 18


def test_zone_bitrate_multiplier():
    def run(zones):
        p = param_default_preset("medium")
        p.width, p.height = 96, 64
        p.bframes = 0
        p.scenecut = 0
        p.aq_mode = 0
        p.cu_tree = False
        p.sao = False
        param_parse(p, "crf", "30")
        if zones:
            param_parse(p, "zones", zones)
        enc = Encoder(p)
        enc.encode(_clip())
        return [s["bits"] for s in enc.frame_stats if s["type"] == "P"]

    base = run("")
    boosted = run("0,20,b=2.0")
    assert sum(boosted) > sum(base) * 1.2, (sum(base), sum(boosted))
