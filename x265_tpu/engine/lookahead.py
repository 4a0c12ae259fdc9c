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
    y = y.astype(jnp.int32)          # upcast on device (narrow wire)
    return (y.reshape(H // 2, 2, W // 2, 2).sum((1, 3)) + 2) >> 2


@partial(jax.jit, static_argnames=("R",))
def _lowres_costs(low: jnp.ndarray, prev: jnp.ndarray, R: int = 4):
    """Per-8x8-block (intra_cost, inter_cost, best_mv) on the lowres plane.

    intra: SA8D energy after DC removal (lowresIntraEstimate proxy);
    inter: min over the (2R+1)^2 integer window of block SAD vs prev
    (estimateCUCost's hex search collapsed to a dense sweep); best_mv is
    the winning displacement (cuTree propagation needs it).
    """
    H, W = low.shape
    nby, nbx = H // 8, W // 8
    blocks = low.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    dc = blocks.mean(axis=(2, 3), keepdims=True).astype(jnp.int32)
    flat = (blocks - dc).reshape(-1, 8, 8)
    icost = satd8_batched(flat, jnp.zeros_like(flat)).reshape(nby, nbx)

    prev_pad = jnp.pad(prev, R, mode="edge")
    n = 2 * R + 1

    def body(carry, d):
        best, bidx = carry
        dy = d // n
        dx = d % n
        sh = jax.lax.dynamic_slice(prev_pad, (dy, dx), (H, W))
        sad = jnp.abs(low - sh).reshape(nby, 8, nbx, 8).sum(axis=(1, 3))
        upd = sad < best
        return (jnp.where(upd, sad, best), jnp.where(upd, d, bidx)), None

    init = (jnp.full((nby, nbx), 1 << 30, jnp.int32),
            jnp.zeros((nby, nbx), jnp.int32))
    (mcost, midx), _ = jax.lax.scan(body, init, jnp.arange(n * n))
    mvx = (midx % n) - R
    mvy = (midx // n) - R
    return (icost.astype(jnp.int32), mcost.astype(jnp.int32),
            jnp.stack([mvx, mvy], axis=-1).astype(jnp.int32))


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
        signal, slicetype.cpp:2186). Per-block tensors are kept in
        self.last_blocks for cuTree propagation."""
        yw = np.asarray(y)
        if yw.dtype not in (np.uint8, np.int16, np.uint16):
            yw = yw.astype(np.int16)
        low = np.asarray(lowres_downscale(jnp.asarray(yw)))
        ph, pw = self.lh - low.shape[0], self.lw - low.shape[1]
        low = np.pad(low, ((0, ph), (0, pw)), mode="edge")
        first = self.prev_low is None
        prev = low if first else self.prev_low
        icost, mcost, mv = _lowres_costs(jnp.asarray(low), jnp.asarray(prev))
        icost = np.asarray(icost)
        mcost2 = np.asarray(mcost) * 2
        self.last_blocks = {"icost": icost, "mcost": mcost2,
                            "mv": np.asarray(mv)}
        icost_sum = float(icost.sum())
        pcost_sum = float(np.minimum(icost, mcost2).sum())
        self.prev_low = low
        if first or is_intra:
            cost = icost_sum
        else:
            cost = pcost_sum
        return (max(1.0, cost), max(1.0, icost_sum),
                icost_sum if first else max(1.0, pcost_sum))


def cutree_propagate(records, ctb_log2: int, qcompress: float = 0.6,
                     max_off: int = 4) -> np.ndarray:
    """cuTree (x265 analog: Lookahead::cuTree/estimateCUPropagate +
    the propagateCost primitive, slicetype.cpp:2479).

    records: per-frame dicts {icost, mcost, mv} in DISPLAY order; each
    frame's lowres inter costs/MVs reference the PREVIOUS frame. Costs of
    well-predicted blocks are propagated backward to the blocks they
    reference; the first frame (the upcoming anchor's reference chain
    root) receives the accumulated propagation and yields per-CTB QP
    offsets: -strength * log2(1 + propagate/intra).
    """
    if not records:
        return None
    shape = records[0]["icost"].shape
    propagate = np.zeros(shape, dtype=np.float64)
    for rec in reversed(records[1:]):
        icost = rec["icost"].astype(np.float64) + 1.0
        mcost = np.minimum(rec["mcost"], rec["icost"]).astype(np.float64)
        fraction = np.clip(1.0 - mcost / icost, 0.0, 1.0)
        amount = (icost + propagate) * fraction
        # splat to the referenced block (integer lowres-block MV splat;
        # x265 does bilinear over 4 neighbors — 8x8 blocks, MV in pels)
        nby, nbx = shape
        by, bx = np.mgrid[0:nby, 0:nbx]
        ty = np.clip(by + np.round(rec["mv"][..., 1] / 8.0).astype(int),
                     0, nby - 1)
        tx = np.clip(bx + np.round(rec["mv"][..., 0] / 8.0).astype(int),
                     0, nbx - 1)
        nxt = np.zeros(shape, dtype=np.float64)
        np.add.at(nxt, (ty.ravel(), tx.ravel()), amount.ravel())
        propagate = nxt
    root = records[0]
    icost = root["icost"].astype(np.float64) + 1.0
    strength = 5.0 * (1.0 - qcompress)
    off = -strength * np.log2(1.0 + propagate / icost)
    # lowres 8x8 blocks -> CTB grid (ctb/2 lowres pels per CTB)
    blocks_per_ctb = max(1, (1 << ctb_log2) // 16)
    nby, nbx = shape
    cy = -(-nby // blocks_per_ctb)
    cx = -(-nbx // blocks_per_ctb)
    pad_y = cy * blocks_per_ctb - nby
    pad_x = cx * blocks_per_ctb - nbx
    offp = np.pad(off, ((0, pad_y), (0, pad_x)), mode="edge")
    ctb_off = offp.reshape(cy, blocks_per_ctb, cx,
                           blocks_per_ctb).mean(axis=(1, 3))
    return np.clip(np.rint(ctb_off), -max_off, 0).astype(np.int32)
