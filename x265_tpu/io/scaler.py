"""Downscaler for the ABR ladder (x265 analog: source/scaler.{h,cpp} —
the swscale-derived polyphase ScalerFilterManager used by abrEncApp and
--scale-factor analysis reuse).

Jitted separable resampler: area averaging for integer ratios (the
common ladder case: 1080p -> 540p/270p), bilinear for fractional ones.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("fy", "fx"))
def _area_down(y: jnp.ndarray, fy: int, fx: int) -> jnp.ndarray:
    H, W = y.shape
    r = y[:H - H % fy, :W - W % fx].reshape(H // fy, fy, W // fx, fx)
    return ((r.sum(axis=(1, 3)) + (fy * fx) // 2) // (fy * fx)).astype(
        y.dtype)


def _bilinear(y: np.ndarray, oh: int, ow: int) -> np.ndarray:
    H, W = y.shape
    ys = (np.arange(oh) + 0.5) * H / oh - 0.5
    xs = (np.arange(ow) + 0.5) * W / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    a = y[np.ix_(y0, x0)].astype(np.float64)
    b = y[np.ix_(y0, x1)].astype(np.float64)
    c = y[np.ix_(y1, x0)].astype(np.float64)
    d = y[np.ix_(y1, x1)].astype(np.float64)
    out = (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx +
           c * wy * (1 - wx) + d * wy * wx)
    return np.rint(out).astype(y.dtype)


def scale_plane(plane: np.ndarray, oh: int, ow: int) -> np.ndarray:
    H, W = plane.shape
    if H == oh and W == ow:
        return plane
    if H % oh == 0 and W % ow == 0:
        return np.asarray(_area_down(jnp.asarray(plane.astype(np.int32)),
                                     H // oh, W // ow)).astype(plane.dtype)
    return _bilinear(plane, oh, ow)


def scale_frame(frame, oh: int, ow: int):
    """(y, cb, cr) 4:2:0 -> scaled to oh x ow luma."""
    y, cb, cr = frame
    return (scale_plane(np.asarray(y), oh, ow),
            scale_plane(np.asarray(cb), oh // 2, ow // 2),
            scale_plane(np.asarray(cr), oh // 2, ow // 2))
