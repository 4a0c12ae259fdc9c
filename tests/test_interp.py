"""Fractional-sample interpolation + subpel ME tests (x265 analog:
ipfilterharness.cpp, SURVEY.md §4 TestBench)."""
import numpy as np
import pytest

from x265_tpu.ops.ref.interp import (
    CHROMA_FILTERS, LUMA_FILTERS, mc_chroma, mc_luma,
)


def test_filter_gains():
    assert (LUMA_FILTERS.sum(axis=1) == 64).all()
    assert (CHROMA_FILTERS.sum(axis=1) == 64).all()


def test_integer_mv_is_copy():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 256, (64, 64)).astype(np.int32)
    refp = np.pad(ref, 16, mode="edge")
    blk = mc_luma(refp, 16, 8, 8, 16, 16, (4 * 3, 4 * -2))
    assert np.array_equal(blk, ref[6:22, 11:27])
    blkc = mc_chroma(refp, 16, 8, 8, 16, 16, (8 * 3, 8 * -2))
    assert np.array_equal(blkc, ref[6:22, 11:27])


@pytest.mark.parametrize("mv", [(1, 0), (2, 3), (3, 3), (0, 2), (5, 7)])
def test_flat_invariance(mv):
    """Unit-gain filters must reproduce constants at every phase."""
    flat = np.full((64, 64), 77, np.int32)
    flatp = np.pad(flat, 16, mode="edge")
    assert (mc_luma(flatp, 16, 8, 8, 8, 8, mv) == 77).all()
    assert (mc_chroma(flatp, 16, 8, 8, 8, 8, mv) == 77).all()


def test_halfpel_symmetry():
    """The half-pel filter is symmetric, so interpolating the mirrored
    signal at the mirrored positions reproduces the original result:
    position x+1/2 in a 64-sample signal maps to (62-x)+1/2 in the mirror.
    """
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 256, (8, 64)).astype(np.int32)
    refp = np.pad(ref, ((0, 0), (16, 16)), mode="edge")
    a = mc_luma(refp, 0, 16 + 16, 0, 16, 8, (2, 0))      # x0=16: 16.5..31.5
    refm = ref[:, ::-1].copy()
    refmp = np.pad(refm, ((0, 0), (16, 16)), mode="edge")
    b = mc_luma(refmp, 0, 31 + 16, 0, 16, 8, (2, 0))     # 31.5..46.5 mirrored
    assert np.array_equal(a, b[:, ::-1])


def test_subpel_me_recovers_synthetic_shift():
    from x265_tpu.engine.me import motion_decide

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(xx / 7.0) * np.cos(yy / 9.0)).astype(np.int32)
    refp = np.pad(base, 16, mode="edge")
    cur = np.zeros_like(base)
    for y in range(h):
        cur[y] = [mc_luma(refp, 16, x, y, 1, 1, (5, -2))[0, 0]
                  for x in range(w)]
    mv, cost = motion_decide(cur, base, w, h, S=16, R=8, qp=30, subme=2)
    good = (mv[..., 0] == 5) & (mv[..., 1] == -2)
    assert good.mean() > 0.6
