"""Preset-dial substance (VERDICT r2 weak #5): --subme tiers run real
extra refinement rounds and me=star forces the exhaustive integer sweep,
so the slow half of the ladder trades measurable work for quality.
"""
import numpy as np
import pytest

from x265_tpu.engine.me import subpel_rounds, motion_decide


def test_subpel_round_tiers_differ():
    lens = {k: len(subpel_rounds(k)) for k in (0, 1, 2, 3, 4, 5, 7)}
    assert lens[0] == lens[1] == 1
    assert lens[2] == lens[3] == 2
    assert lens[4] == 3
    assert lens[5] == lens[7] == 4


def test_subme_cost_monotone_nonincreasing():
    """More refinement rounds can only find equal-or-better minima."""
    rng = np.random.default_rng(4)
    h, w = 64, 96
    big = rng.integers(0, 200, (h + 16, w + 16)).astype(np.int32)
    # box-blur for meaningful subpel interpolation
    big = (big[:-2, :-2] + big[1:-1, :-2] + big[2:, :-2]
           + big[:-2, 1:-1] + big[1:-1, 1:-1] + big[2:, 1:-1]
           + big[:-2, 2:] + big[1:-1, 2:] + big[2:, 2:]) // 9
    ref = big[4:4 + h, 4:4 + w].astype(np.uint8)
    # genuine quarter-pel vertical motion (3:1 row blend): only the
    # quarter rounds can model it, so tier 2 must beat tier 1
    sub = big[4:5 + h, 7:7 + w]
    cur = ((3 * sub[:-1].astype(np.int32) + sub[1:]) // 4).astype(np.uint8)
    costs = {}
    for subme in (1, 2, 4, 5):
        _mv, cost = motion_decide(cur, ref, w, h, S=16, R=8, qp=30,
                                  subme=subme)
        costs[subme] = float(cost.sum())
    assert costs[2] <= costs[1] + 1e-6
    assert costs[4] <= costs[2] + 1e-6
    assert costs[5] <= costs[4] + 1e-6
    # and the quarter round does something on off-grid motion
    assert costs[2] < costs[1]


def test_star_forces_dense_sweep():
    """me=star must route to the exhaustive integer sweep (like me=full),
    not the 2-level HME."""
    from x265_tpu.api.params import param_default_preset
    p = param_default_preset("slower")
    assert p.me_method == "star"
    import inspect
    from x265_tpu.api import encoder as enc_mod
    src = inspect.getsource(enc_mod)
    assert 'me_method in ("full", "star", "sea")' in src
