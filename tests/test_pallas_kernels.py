"""Pallas TPU kernels: bit-exact vs the jnp references (interpret mode
on CPU; the on-device speed comparison lives in tools/kernel_bench.py,
the TestBench analog).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from x265_tpu.ops.pallas_kernels import (HAVE_PALLAS, satd8x8_pallas,
                                         satd_pallas, sad_sweep_pallas)
from x265_tpu.engine.me import satd8_batched

pytestmark = pytest.mark.skipif(not HAVE_PALLAS,
                                reason="pallas unavailable")


def test_satd8x8_matches_reference():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (130, 8, 8)).astype(np.int32)   # non-multiple
    b = rng.integers(0, 256, (130, 8, 8)).astype(np.int32)
    ref = np.asarray(satd8_batched(jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(satd8x8_pallas(jnp.asarray(a), jnp.asarray(b),
                                    interpret=True))
    assert np.array_equal(ref, got)


def test_satd_16x16_and_10bit():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1024, (41, 16, 16)).astype(np.int32)
    b = rng.integers(0, 1024, (41, 16, 16)).astype(np.int32)
    ref = np.asarray(satd8_batched(jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(satd_pallas(jnp.asarray(a), jnp.asarray(b),
                                 interpret=True))
    assert np.array_equal(ref, got)


def test_sad_sweep_matches_dense_reference():
    rng = np.random.default_rng(4)
    H, W, R, S = 32, 48, 3, 16
    cur = rng.integers(0, 256, (H, W)).astype(np.int32)
    refp = rng.integers(0, 256, (H + 2 * R, W + 2 * R)).astype(np.int32)
    got = np.asarray(sad_sweep_pallas(jnp.asarray(cur), jnp.asarray(refp),
                                      S, R, interpret=True))
    n = 2 * R + 1
    for d in range(n * n):
        dy, dx = d // n, d % n
        sh = refp[dy:dy + H, dx:dx + W]
        want = np.abs(cur - sh).reshape(H // S, S, W // S, S).sum((1, 3))
        assert np.array_equal(got[d], want), d
