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
    R = 8
    H, W = S * 2 * 8, 128
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (H, W)).astype(np.int32)
    # vertical motion crossing band boundaries: edge-replicated shift
    # (real motion semantics — NOT np.roll, which wraps frame edges; the
    # halo exchange must clamp at the frame top/bottom like
    # extendPicBorder, not wrap around the ring)
    ref = np.concatenate([np.repeat(y[:1], 5, axis=0), y[:-5]])
    modes, icost, mcost, fc = sharded_frame_analysis(mesh, y, ref, S=S, R=R)
    mcost = np.asarray(mcost)
    # every interior block finds its zero-cost match 5 rows down — this
    # requires correct cross-band halos (bands are 32 rows, shift is 5)
    assert int(mcost[:-1].max()) == 0
    # single-device reference: dense sweep over the edge-padded ref must
    # match the sharded result everywhere, including frame-edge bands
    ref_pad = np.pad(ref, R, mode="edge")
    nby, nbx = H // S, W // S
    expected = np.full((nby, nbx), 1 << 30, np.int64)
    for dy in range(2 * R + 1):
        for dx in range(2 * R + 1):
            sh = ref_pad[dy:dy + H, dx:dx + W]
            sad = np.abs(y - sh).reshape(nby, S, nbx, S).sum(axis=(1, 3))
            expected = np.minimum(expected, sad)
    assert np.array_equal(mcost.astype(np.int64), expected)
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
