"""2-pass rate control tests (x265 analog: --pass 1/2 + rate-control-tests
suite: 2-pass determinism and bitrate adherence)."""
import numpy as np

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_ABR, param_default_preset


def _frames(w=176, h=144, n=20, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 70 * np.sin(xx / 13.0) * np.cos(yy / 11.0)).astype(int)
    out = []
    for i in range(n):
        # complexity ramp: second half gets busier (2-pass should shift
        # bits toward it better than 1-pass reacting late)
        noise = 4 if i < n // 2 else 12
        y = np.clip(np.roll(base, 2 * i, 1) +
                    rng.integers(-noise, noise, (h, w)), 0, 255)
        out.append((y.astype(np.uint8),
                    np.full((h // 2, w // 2), 120, np.uint8),
                    np.full((h // 2, w // 2), 130, np.uint8)))
    return out


def _param(stats, pass_num):
    p = param_default_preset("medium")
    p.width, p.height = 176, 144
    p.rc_mode, p.bitrate, p.bframes = RC_ABR, 400, 2
    p.fps_num, p.fps_den = 25, 1
    p.pass_num = pass_num
    p.stats_file = stats
    return p


def test_two_pass_hits_target_better(tmp_path):
    frames = _frames()
    stats = str(tmp_path / "2pass.log")
    s1 = Encoder(_param(stats, 1)).encode(frames)
    s2 = Encoder(_param(stats, 2)).encode(frames)
    fps, n, target = 25.0, len(frames), 400
    kbps1 = len(s1) * 8 * fps / n / 1000
    kbps2 = len(s2) * 8 * fps / n / 1000
    # pass 2 must land at least as close to the target as pass 1
    assert abs(kbps2 - target) <= abs(kbps1 - target) * 1.05, (kbps1, kbps2)
    assert 0.7 * target < kbps2 < 1.35 * target


def test_two_pass_deterministic(tmp_path):
    frames = _frames(n=10)
    stats = str(tmp_path / "2pass.log")
    Encoder(_param(stats, 1)).encode(frames)
    a = Encoder(_param(stats, 2)).encode(frames)
    b = Encoder(_param(stats, 2)).encode(frames)
    assert a == b
