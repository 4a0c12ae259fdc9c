"""On-device differential tests for the Pallas MC kernels.

The CPU tier (conftest forces JAX_PLATFORMS=cpu) exercises the jnp
twins; these tests only run when a real TPU backend is present
(X265TPU_TEST_TPU=1 overrides the conftest platform pin) and pin the
Pallas window-gather kernels bit-exact against the XLA twin they
replace (x265 analog: the asm-vs-C checks in test/pixelharness.cpp).
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("X265TPU_TEST_TPU") != "1",
    reason="TPU-only differential tests (set X265TPU_TEST_TPU=1)")


def _tpu_ready():
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@pytest.mark.parametrize("n,taps,bd", [(16, 8, 8), (8, 4, 8),
                                       (32, 8, 10), (64, 8, 8)])
def test_mc_gather_pallas_matches_xla(n, taps, bd):
    import jax
    import jax.numpy as jnp
    if not _tpu_ready():
        pytest.skip("no TPU backend")
    import x265_tpu.models.inter_residual as ir
    rng = np.random.default_rng(0)
    H, W, pad = 256, 448, 80
    R = 2
    planes = jnp.asarray(rng.integers(
        0, (1 << bd) - 1, (R, H + 2 * pad, W + 2 * pad)).astype(np.int16))
    N = 100                     # deliberately not a LANES multiple
    filt = ir._LUMA_FILT if taps == 8 else ir._CHROMA_FILT
    fb = 2 if taps == 8 else 3
    args = tuple(jnp.asarray(a) for a in (
        rng.integers(0, R, N).astype(np.int32),
        rng.integers(0, W - n, N).astype(np.int32),
        rng.integers(0, H - n, N).astype(np.int32),
        rng.integers(-228, 228, N).astype(np.int32),
        rng.integers(-228, 228, N).astype(np.int32)))

    def f(*ar):
        return ir._mc_gather(*ar, filt=filt, fb=fb, n=n, taps=taps,
                             pad=pad, bd=bd)

    os.environ["X265TPU_PALLAS_MC"] = "1"
    a = np.asarray(jax.jit(f)(planes, *args))
    os.environ["X265TPU_PALLAS_MC"] = "0"
    try:
        b = np.asarray(jax.jit(f)(planes, *args))
    finally:
        os.environ["X265TPU_PALLAS_MC"] = "1"
    assert np.array_equal(a, b)


def test_tile_gather_matches_xla_with_sentinels():
    import jax
    import jax.numpy as jnp
    if not _tpu_ready():
        pytest.skip("no TPU backend")
    import x265_tpu.models.inter_residual as ir
    rng = np.random.default_rng(1)
    H, W = 256, 448
    src = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.uint8))
    N = 66
    ys = np.concatenate([rng.integers(0, H - 16, N - 2),
                         [1 << 20, 5]]).astype(np.int32)
    xs = np.concatenate([rng.integers(0, W - 16, N - 2),
                         [3, 1 << 20]]).astype(np.int32)

    def f(s, y, x):
        return ir.gather_src_blocks(s, y, x, 16)

    os.environ["X265TPU_PALLAS_MC"] = "1"
    a = np.asarray(jax.jit(f)(src, jnp.asarray(ys), jnp.asarray(xs)))
    os.environ["X265TPU_PALLAS_MC"] = "0"
    try:
        b = np.asarray(jax.jit(f)(src, jnp.asarray(ys), jnp.asarray(xs)))
    finally:
        os.environ["X265TPU_PALLAS_MC"] = "1"
    assert np.array_equal(a, b)
