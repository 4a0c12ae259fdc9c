"""Adaptive quantization (x265 analog: calcAdaptiveQuantFrame,
slicetype.cpp:444 — AQ modes; cuTree offsets land on the same per-QG map).

Mode 1 (variance): qp_off = strength * (log2(var) - 14.427) (the x264
constant re-centering a "typical" block energy).
Mode 2 (auto-variance, default): per-frame renormalized — offsets are
strength * (energy - frame mean energy) * scale, so the frame's average
QP stays at the rate-control target.

Energies are per-16x16-block variances computed as one jitted reduction;
QG (== CTB) offsets average their blocks.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("S",))
def block_energies(y: jnp.ndarray, S: int = 16) -> jnp.ndarray:
    """log2(variance + 1) per SxS block -> [nby, nbx] float32."""
    H, W = y.shape
    b = y.reshape(H // S, S, W // S, S).astype(jnp.float32)
    mean = b.mean(axis=(1, 3), keepdims=True)
    var = ((b - mean) ** 2).mean(axis=(1, 3))
    return jnp.log2(var + 1.0)


def aq_qp_offsets(y: np.ndarray, ctb_log2: int, mode: int,
                  strength: float) -> np.ndarray:
    """Per-CTB integer QP offsets for one frame."""
    ctb = 1 << ctb_log2
    H, W = y.shape
    S = 16
    ph, pw = -(-H // ctb) * ctb, -(-W // ctb) * ctb
    wire = np.asarray(y)
    if wire.dtype not in (np.uint8, np.int16, np.uint16):
        wire = wire.astype(np.int16)
    yp = np.pad(wire, ((0, ph - H), (0, pw - W)), mode="edge")
    e = np.asarray(block_energies(jnp.asarray(yp), S=S))   # [ph/16, pw/16]
    r = ctb // S
    cy, cx = ph // ctb, pw // ctb
    e_ctb = e.reshape(cy, r, cx, r).mean(axis=(1, 3))
    if mode == 1:
        off = strength * (e_ctb - 14.427)
    else:  # mode 2/3 auto-variance
        off = 1.5 * strength * (e_ctb - float(e_ctb.mean()))
    return np.clip(np.rint(off), -6, 6).astype(np.int32)
