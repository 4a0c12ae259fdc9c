"""Batched TPU motion estimation — the re-imagining of x265's serial
MotionEstimate::motionEstimate loop (reference motion.cpp:739, SURVEY §3.6)
as dense frame-level computation: every block's full search window is
evaluated at once as shifted-frame absolute differences reduced per block
(the sad_x4/ads primitive family becomes one fused displacement sweep).

MVs are currently restricted to even integer luma positions so chroma MC
stays on integer samples (interpolation filters arrive with subpel ME).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("S", "R", "step"))
def full_search_sads(cur: jnp.ndarray, ref_pad: jnp.ndarray,
                     S: int = 16, R: int = 16, step: int = 2):
    """cur [H,W] int32, ref_pad [H+2R, W+2R] int32 ->
    (best_disp_idx [nby,nbx], best_sad [nby,nbx]); displacement list is the
    static (2R/step+1)^2 grid, index = row-major (dy, dx)."""
    H, W = cur.shape
    nby, nbx = H // S, W // S
    disps = [(dy, dx) for dy in range(-R, R + 1, step)
             for dx in range(-R, R + 1, step)]

    def sad_for(d):
        dy, dx = d
        sh = jax.lax.dynamic_slice(ref_pad, (R + dy, R + dx), (H, W))
        ad = jnp.abs(cur - sh)
        return ad.reshape(nby, S, nbx, S).sum(axis=(1, 3))

    sads = jnp.stack([sad_for(d) for d in disps])      # [D, nby, nbx]
    best = jnp.argmin(sads, axis=0)
    return best.astype(jnp.int32), jnp.min(sads, axis=0).astype(jnp.float32)


def motion_decide(cur_y: np.ndarray, ref_y: np.ndarray, width: int,
                  height: int, S: int = 16, R: int = 16, step: int = 2):
    """Full-search ME vs the reference frame.

    Returns (mv_blocks [nby,nbx,2] quarter-pel, sad [nby,nbx]) on the
    S-block grid of the padded frame.
    """
    ph = -(-height // S) * S
    pw = -(-width // S) * S
    cur = np.pad(np.asarray(cur_y, dtype=np.int32),
                 ((0, ph - height), (0, pw - width)), mode="edge")
    ref = np.pad(np.asarray(ref_y, dtype=np.int32),
                 ((0, ph - height), (0, pw - width)), mode="edge")
    ref_pad = np.pad(ref, R, mode="edge")
    idx, sad = full_search_sads(jnp.asarray(cur), jnp.asarray(ref_pad),
                                S=S, R=R, step=step)
    idx = np.asarray(idx)
    sad = np.asarray(sad)
    n = 2 * R // step + 1
    dy = (idx // n) * step - R
    dx = (idx % n) * step - R
    mv = np.stack([dx * 4, dy * 4], axis=-1).astype(np.int32)  # quarter-pel
    return mv, sad
