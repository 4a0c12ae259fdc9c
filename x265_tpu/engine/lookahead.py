"""Lookahead-lite: lowres frame complexity estimation for rate control
(x265 analog: Lookahead/slicetype.cpp estimateFrameCost:3056 +
Lowres::init lowres.cpp:259 + the frameInitLowres primitive).

Round-1 scope: half-res downscale + per-8x8 min(intra, inter) SATD/SAD
cost, fully batched/jitted — the complexity signal that drives
CRF/ABR/VBV (ratecontrol.cpp rateEstimateQscale's m_currentSatd). The
full slicetype machinery (B-adapt Viterbi, scenecut, cuTree propagation)
layers on top of these same lowres tensors in a later round.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from x265_tpu.engine.me import satd8_batched


@jax.jit
def lowres_downscale(y: jnp.ndarray) -> jnp.ndarray:
    """Half-res by 2x2 mean (frameInitLowres analog)."""
    H, W = y.shape
    return (y.reshape(H // 2, 2, W // 2, 2).sum((1, 3)) + 2) >> 2


@partial(jax.jit, static_argnames=("R",))
def _lowres_costs(low: jnp.ndarray, prev: jnp.ndarray, R: int = 4):
    """Per-8x8-block (intra_cost, inter_cost) on the lowres plane.

    intra: SA8D energy after DC removal (lowresIntraEstimate proxy);
    inter: min over the (2R+1)^2 integer window of block SAD vs prev
    (estimateCUCost's hex search collapsed to a dense sweep).
    """
    H, W = low.shape
    nby, nbx = H // 8, W // 8
    blocks = low.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    dc = blocks.mean(axis=(2, 3), keepdims=True).astype(jnp.int32)
    flat = (blocks - dc).reshape(-1, 8, 8)
    icost = satd8_batched(flat, jnp.zeros_like(flat)).reshape(nby, nbx)

    prev_pad = jnp.pad(prev, R, mode="edge")
    n = 2 * R + 1

    def body(best, d):
        dy = d // n
        dx = d % n
        sh = jax.lax.dynamic_slice(prev_pad, (dy, dx), (H, W))
        sad = jnp.abs(low - sh).reshape(nby, 8, nbx, 8).sum(axis=(1, 3))
        return jnp.minimum(best, sad), None

    init = jnp.full((nby, nbx), 1 << 30, jnp.int32)
    mcost, _ = jax.lax.scan(body, init, jnp.arange(n * n))
    return icost.astype(jnp.int32), mcost.astype(jnp.int32)


class Lookahead:
    """Per-frame complexity costs in display order."""

    def __init__(self, width: int, height: int):
        # pad lowres to multiples of 8
        self.lw = (width // 2 + 7) // 8 * 8
        self.lh = (height // 2 + 7) // 8 * 8
        self.prev_low = None

    def frame_cost(self, y: np.ndarray, is_intra: bool) -> float:
        """SATD-domain complexity of one frame (x265 m_currentSatd)."""
        return self.frame_costs(y, is_intra)[0]

    def frame_costs(self, y: np.ndarray, is_intra: bool):
        """(cost, intra_cost, inter_cost) of one display-order frame; the
        inter cost is vs the previous frame (the slicetype/scenecut
        signal, slicetype.cpp:2186)."""
        low = np.asarray(lowres_downscale(jnp.asarray(
            np.asarray(y, dtype=np.int32))))
        ph, pw = self.lh - low.shape[0], self.lw - low.shape[1]
        low = np.pad(low, ((0, ph), (0, pw)), mode="edge")
        first = self.prev_low is None
        prev = low if first else self.prev_low
        icost, mcost = _lowres_costs(jnp.asarray(low), jnp.asarray(prev))
        icost_sum = float(np.asarray(icost).sum())
        pcost_sum = float(np.minimum(np.asarray(icost),
                                     np.asarray(mcost) * 2).sum())
        self.prev_low = low
        if first or is_intra:
            cost = icost_sum
        else:
            cost = pcost_sum
        return (max(1.0, cost), max(1.0, icost_sum),
                icost_sum if first else max(1.0, pcost_sum))
