"""Rate-control hardening (VERDICT r2 #5): VBV emergency re-encode,
cuTree offsets in the 2-pass stats file, and the pass-2 VBV re-plan.
References: ratecontrol.cpp:2526 (rowVbvRateControl), :994 (initPass2),
ratecontrol.h:237-252 (cuTree stat files), x264 findUnderflow/fixUnderflow.
"""
import json

import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse, RC_ABR
from x265_tpu.engine.ratecontrol import (RateControl, qp2qscale,
                                         I_SLICE, P_SLICE)


def _frames(n, seed=5, h=64, w=96, noisy_from=None):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w)).astype(np.uint8)
    out = []
    for i in range(n):
        if noisy_from is not None and i >= noisy_from:
            y = rng.integers(0, 255, (h, w)).astype(np.uint8)  # new noise
        else:
            y = np.roll(base, 2 * i, axis=1)
        out.append((y, np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 130, np.uint8)))
    return out


def test_reencode_qp_triggers_on_underflow():
    """Unit: a frame whose coded size would drain the CPB below the hard
    floor gets a strictly higher re-encode QP; a safe frame does not."""
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    param_parse(p, "bitrate", "400")
    p.rc_mode = RC_ABR
    p.vbv_maxrate, p.vbv_bufsize = 400, 400
    rc = RateControl(p)
    qp = rc.start(P_SLICE, 50000.0)
    # safe frame: bits well under the buffer
    assert rc.reencode_qp(1000) is None
    rc.start(P_SLICE, 50000.0)
    big = int(rc.buffer_fill + rc.buffer_rate)   # drains to ~0
    rq = rc.reencode_qp(big)
    assert rq is not None and rq > qp
    # the model was repointed at the re-encode operating point
    assert abs(rc.last_qscale - qp2qscale(rq)) < 1e-9


@pytest.mark.slow
def test_vbv_reencode_e2e_protects_buffer():
    """A scene change under a tight VBV must not blow the buffer: replay
    the actual coded sizes through the CPB model and check the floor."""
    p = param_default_preset("ultrafast")
    p.width, p.height = 96, 64
    p.bframes = 0
    p.scenecut = 0
    p.keyint = 50
    param_parse(p, "bitrate", "60")
    p.rc_mode = RC_ABR
    p.vbv_maxrate, p.vbv_bufsize = 60, 30      # half-second buffer
    enc = Encoder(p)
    for f in _frames(12, noisy_from=6):
        enc.encode_frame(*f)
    enc.flush()
    fill = p.vbv_bufsize * 1000 * 0.9
    rate = p.vbv_maxrate * 1000 / 25.0
    worst = fill
    for s in enc.frame_stats:
        fill = min(p.vbv_bufsize * 1000, fill + rate) - s["bits"]
        worst = min(worst, fill)
    assert worst > -0.25 * p.vbv_bufsize * 1000   # no catastrophic drain


def test_pass2_vbv_replan_removes_underflow(tmp_path):
    """Unit: a pass-1 log with a complexity spike produces a pass-2 plan
    whose predicted bits never underflow the CPB after the re-plan."""
    stats = tmp_path / "p1.log"
    recs = []
    for i in range(40):
        cost = 5e5 if 18 <= i <= 22 else 3e4     # spike
        bits = int(cost / 10)
        recs.append({"type": "P" if i else "I", "cost": cost,
                     "bits": bits, "qscale": 10.0})
    stats.write_text("\n".join(json.dumps(r) for r in recs))
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    param_parse(p, "bitrate", "500")
    p.rc_mode = RC_ABR
    p.pass_num = 2
    p.stats_file = str(stats)
    p.vbv_maxrate, p.vbv_bufsize = 500, 250
    rc = RateControl(p)
    assert rc.pass2_qp is not None
    fill = rc.vbv_bufsize * 0.9
    for rec, q in zip(recs, rc.pass2_qs):
        cplx = max(1.0, rec["bits"] * rec["qscale"])
        fill = min(rc.vbv_bufsize, fill + rc.buffer_rate) - cplx / q
        assert fill >= 0.15 * rc.vbv_bufsize - 1e-6


@pytest.mark.slow
def test_cutree_rides_stats_file(tmp_path):
    """Pass 1 writes per-frame cuTree offset maps into the stats file;
    pass 2 reads them back and applies them."""
    stats = tmp_path / "2p.log"
    p1 = param_default_preset("medium")
    p1.width, p1.height = 96, 64
    p1.bframes = 2
    p1.b_adapt = 0
    p1.scenecut = 0
    param_parse(p1, "bitrate", "300")
    p1.rc_mode = RC_ABR
    p1.pass_num = 1
    p1.stats_file = str(stats)
    frames = _frames(8)
    Encoder(p1).encode(frames)
    recs = [json.loads(l) for l in stats.read_text().splitlines()]
    assert any("cutree" in r for r in recs)

    p2 = param_default_preset("medium")
    p2.width, p2.height = 96, 64
    p2.bframes = 2
    p2.b_adapt = 0
    p2.scenecut = 0
    param_parse(p2, "bitrate", "300")
    p2.rc_mode = RC_ABR
    p2.pass_num = 2
    p2.stats_file = str(stats)
    enc2 = Encoder(p2)
    bs = enc2.encode(frames)
    assert len(bs) > 0
    # the recorded offsets reached pass 2's rate control
    assert any(ct is not None for ct in enc2.rc.pass2_cutree)
