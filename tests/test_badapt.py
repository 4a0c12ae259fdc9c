"""Windowed slice-type decision (x264/x265 b-adapt 2 slicetypePath
analog): DP over anchor placements on lowres pair costs."""
import numpy as np

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import param_default_preset, param_parse


def _clip(mode, n=9, w=96, h=64, seed=9):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w)).astype(np.int32)
    frames = []
    for i in range(n):
        if mode == "pan":
            yy = np.clip(np.roll(base, i * 2, 1)
                         + rng.integers(-4, 4, (h, w)), 0, 255)
        else:
            yy = np.clip(base + rng.integers(-4, 4, (h, w)), 0, 255)
        frames.append((yy.astype(np.uint8),
                       np.full((h // 2, w // 2), 120, np.uint8),
                       np.full((h // 2, w // 2), 130, np.uint8)))
    return frames


def _run(mode, b_adapt):
    p = param_default_preset("medium")
    p.width, p.height = 96, 64
    p.bframes = 4
    p.b_adapt = b_adapt
    p.b_pyramid = False
    p.scenecut = 0
    p.aq_mode = 0
    p.cu_tree = False
    p.sao = False
    param_parse(p, "qp", "30")
    enc = Encoder(p)
    bs = enc.encode(_clip(mode))
    types = "".join(s["type"] for s in sorted(enc.frame_stats,
                                              key=lambda s: s["poc"]))
    return len(bs), types


def test_badapt_keeps_bs_on_static():
    _, types = _run("static", 2)
    assert types.count("B") >= 4, types


def test_badapt_not_worse_than_fixed_on_pan():
    n_fixed, _ = _run("pan", 0)
    n_adapt, types = _run("pan", 2)
    assert types[0] == "I"
    assert n_adapt <= n_fixed * 1.02, (n_adapt, n_fixed)


def test_slicetype_split_scene_change():
    """A hard content change inside the window forces an early anchor."""
    from x265_tpu.engine.lookahead import slicetype_split
    rng = np.random.default_rng(1)
    a = rng.integers(0, 255, (32, 48)).astype(np.int32)
    b = rng.integers(0, 255, (32, 48)).astype(np.int32)
    def noisy(x):
        return np.clip(x + rng.integers(-3, 3, x.shape), 0, 255)
    # frames 0,1 = scene A; frames 2,3,4 = scene B
    queue = [noisy(a), noisy(b), noisy(b), noisy(b)]
    k = slicetype_split(noisy(a), queue, max_bs=4)
    # anchoring inside scene A (k=0) or right at the boundary beats
    # spanning the cut with one GOP
    assert k <= 1, k
