"""Tile-parallel analysis over a device mesh (SURVEY.md §2.4 P1/P2
re-imagining): band sharding, ppermute reference halos, psum'd RC state.
Runs on the 8-virtual-device CPU mesh from conftest."""
import numpy as np
import jax
import pytest

from x265_tpu.parallel.tiles import make_tile_mesh, sharded_frame_analysis

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 devices")


@needs_8
def test_sharded_analysis_matches_cross_band_motion():
    mesh = make_tile_mesh(8)
    S = 16
    H, W = S * 2 * 8, 128
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (H, W)).astype(np.int32)
    # vertical motion crossing band boundaries: only correct halo
    # exchange lets edge blocks find the zero-cost match
    ref = np.roll(y, 5, axis=0)
    modes, icost, mcost, fc = sharded_frame_analysis(mesh, y, ref, S=S, R=8)
    assert int(np.asarray(mcost).max()) == 0
    assert modes.shape[0] == (H // S) * (W // S)
    assert float(fc) >= 0


@needs_8
def test_sharded_rc_psum_equals_sum_of_bands():
    mesh = make_tile_mesh(8)
    S = 16
    H, W = S * 2 * 8, 128
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (H, W)).astype(np.int32)
    ref = rng.integers(0, 256, (H, W)).astype(np.int32)
    modes, icost, mcost, fc = sharded_frame_analysis(mesh, y, ref, S=S, R=8)
    manual = float(np.minimum(np.asarray(icost).reshape(H // S, W // S),
                              np.asarray(mcost) * 2.0).sum())
    assert abs(float(fc) - manual) / max(1.0, manual) < 1e-5
