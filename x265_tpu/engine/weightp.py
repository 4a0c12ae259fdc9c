"""Weighted-prediction analysis for P slices (fades / brightness ramps).

Reference analog: x265 weightAnalyse (weightPrediction.cpp:480) — fit a
global luma scale+offset per (frame, ref) by least squares on subsampled
planes, then keep the weight only when it actually reduces SAD by a
margin.  TPU-first deviation: the fit is a closed-form moment match on a
4x-decimated grid (two means, a variance, a covariance), so it's four
reductions — no iterative search like the reference's chroma loop.

The resulting weights use the pred_weight_table explicit form
(7.3.6.3 / 8.5.4.2.3.2): denom 6 (matching x265's default denom), weight
in [1, 127], offset in [-128, 127].
"""
from typing import Optional, Tuple

import numpy as np

DENOM = 6  # x265 weightPrediction.cpp: luma/chroma log2 denom default


def _fit(cur: np.ndarray, ref: np.ndarray, bd: int):
    """Closed-form (w, off) moment fit at denom 6; None if unweighted."""
    c = cur[::4, ::4].astype(np.float64)
    r = ref[::4, ::4].astype(np.float64)
    mr, mc = r.mean(), c.mean()
    vr = ((r - mr) ** 2).mean()
    if vr < 1e-3:
        a = 1.0
    else:
        a = ((r - mr) * (c - mc)).mean() / vr
    w = int(round(np.clip(a, 1.0 / (1 << DENOM), 127.0 / (1 << DENOM))
                  * (1 << DENOM)))
    off = int(round(mc - (w * mr) / (1 << DENOM)))
    off = int(np.clip(off >> (bd - 8), -128, 127)) if bd > 8 else \
        int(np.clip(off, -128, 127))
    if w == (1 << DENOM) and off == 0:
        return None
    # keep only if weighted SAD clearly beats unweighted (x265 uses the
    # same accept test: weighted cost < unweighted cost, with a margin)
    o_px = off << (bd - 8)
    pred = np.clip(r * w / (1 << DENOM) + o_px, 0, (1 << bd) - 1)
    sad_w = np.abs(c - pred).sum()
    sad_u = np.abs(c - r).sum()
    if sad_w * 1.03 >= sad_u:
        return None
    return w, off


def analyze_slice_weights(cur_planes, ref_planes, bd: int = 8):
    """-> (luma (w, off) | None, chroma ((wcb, ocb), (wcr, ocr)) | None).

    Chroma gets an offset-only weight (scale fixed at 1<<DENOM) — fades to
    black/white shift chroma toward the midpoint much less than luma, and
    an offset captures most of the gain (same simplification x265 applies
    when chroma denom search fails).
    """
    luma = _fit(np.asarray(cur_planes[0]), np.asarray(ref_planes[0]), bd)
    chroma = None
    if luma is not None:
        offs = []
        for i in (1, 2):
            c = np.asarray(cur_planes[i])[::4, ::4].astype(np.float64)
            r = np.asarray(ref_planes[i])[::4, ::4].astype(np.float64)
            d = int(round(c.mean() - r.mean())) >> (bd - 8) if bd > 8 \
                else int(round(c.mean() - r.mean()))
            offs.append(int(np.clip(d, -128, 127)))
        if any(abs(o) >= 2 for o in offs):
            chroma = (((1 << DENOM), offs[0]), ((1 << DENOM), offs[1]))
    return luma, chroma


def weight_plane(plane: np.ndarray, w: int, off: int, bd: int = 8):
    """Apply (w, off, DENOM) to a pixel-domain plane — used to bias the
    motion search toward the weighted reference (approximate: the real
    weighting happens at 14-bit post-interpolation in the writers)."""
    o_px = off << (bd - 8)
    v = (plane.astype(np.int64) * w) >> DENOM
    return np.clip(v + o_px, 0, (1 << bd) - 1).astype(plane.dtype)
