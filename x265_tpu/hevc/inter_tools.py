"""Inter prediction derivations shared by encoder finalizer and decoder:
merge candidate list (spec 8.5.3.2.2-8.5.3.2.5), AMVP predictor list
(8.5.3.2.6-8.5.3.2.7) and MVD binarization (7.3.8.9 / 9.3.3.8).

Scope (current feature set): P slices, single reference picture, no TMVP,
so all candidates share refIdx 0 and no MV scaling ever applies. x265
analog: mergeEstimation/getInterMergeCandidates + AMVP in
source/common/cudata.cpp and encoder/search.cpp:1891.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

MV = Tuple[int, int]  # (x, y) in quarter-pel units


class InterCtx:
    """Per-picture inter state at 4x4 granularity."""

    def __init__(self, h: int, w: int):
        h4, w4 = (h + 3) // 4, (w + 3) // 4
        self.mv4 = np.zeros((h4, w4, 2), dtype=np.int32)
        self.ref4 = np.full((h4, w4), -1, dtype=np.int32)   # -1 = intra/unset
        self.skip4 = np.zeros((h4, w4), dtype=bool)


def _neighbor(ic: InterCtx, avail4: np.ndarray, x: int, y: int,
              width: int, height: int) -> Optional[MV]:
    """Return the MV at luma position (x, y) if available and inter."""
    if x < 0 or y < 0 or x >= width or y >= height:
        return None
    i, j = y >> 2, x >> 2
    if not avail4[i, j] or ic.ref4[i, j] < 0:
        return None
    return (int(ic.mv4[i, j, 0]), int(ic.mv4[i, j, 1]))


def merge_candidates(ic: InterCtx, avail4: np.ndarray, x0: int, y0: int,
                     nw: int, nh: int, width: int, height: int,
                     max_cand: int, ctb_size: int) -> List[MV]:
    """Spatial merge list (A1,B1,B0,A0,B2) + zero fill. refIdx always 0."""
    a1 = _neighbor(ic, avail4, x0 - 1, y0 + nh - 1, width, height)
    b1 = _neighbor(ic, avail4, x0 + nw - 1, y0 - 1, width, height)
    b0 = _neighbor(ic, avail4, x0 + nw, y0 - 1, width, height)
    a0 = _neighbor(ic, avail4, x0 - 1, y0 + nh, width, height)
    b2 = _neighbor(ic, avail4, x0 - 1, y0 - 1, width, height)

    cands: List[MV] = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and b1 != a1:
        cands.append(b1)
    if b0 is not None and b0 != b1:
        cands.append(b0)
    if a0 is not None and a0 != a1:
        cands.append(a0)
    if len(cands) < 4 and b2 is not None and b2 != a1 and b2 != b1:
        cands.append(b2)
    # no TMVP (SPS temporal_mvp off); zero-MV fill
    while len(cands) < max_cand:
        cands.append((0, 0))
    return cands[:max_cand]


def amvp_candidates(ic: InterCtx, avail4: np.ndarray, x0: int, y0: int,
                    nw: int, nh: int, width: int, height: int) -> List[MV]:
    """AMVP list: candidate A from {A0, A1}, B from {B0, B1, B2}; dedup;
    zero fill to 2. All refs identical => no scaling branches."""
    a0 = _neighbor(ic, avail4, x0 - 1, y0 + nh, width, height)
    a1 = _neighbor(ic, avail4, x0 - 1, y0 + nh - 1, width, height)
    b0 = _neighbor(ic, avail4, x0 + nw, y0 - 1, width, height)
    b1 = _neighbor(ic, avail4, x0 + nw - 1, y0 - 1, width, height)
    b2 = _neighbor(ic, avail4, x0 - 1, y0 - 1, width, height)

    cand_a = a0 if a0 is not None else a1
    cand_b = next((c for c in (b0, b1, b2) if c is not None), None)
    out: List[MV] = []
    if cand_a is not None:
        out.append(cand_a)
    if cand_b is not None and cand_b != cand_a:
        out.append(cand_b)
    while len(out) < 2:
        out.append((0, 0))
    return out[:2]


# ---------------------------------------------------------------------------
# MVD coding (7.3.8.9; EG1 bypass for abs-2)
# ---------------------------------------------------------------------------

def encode_mvd(cab, ctx_mvd: int, mvd_x: int, mvd_y: int) -> None:
    ax, ay = abs(mvd_x), abs(mvd_y)
    cab.encode_bin(ctx_mvd + 0, 1 if ax > 0 else 0)
    cab.encode_bin(ctx_mvd + 0, 1 if ay > 0 else 0)
    if ax > 0:
        cab.encode_bin(ctx_mvd + 1, 1 if ax > 1 else 0)
    if ay > 0:
        cab.encode_bin(ctx_mvd + 1, 1 if ay > 1 else 0)
    if ax > 0:
        if ax > 1:
            _encode_eg1(cab, ax - 2)
        cab.encode_bin_ep(1 if mvd_x < 0 else 0)
    if ay > 0:
        if ay > 1:
            _encode_eg1(cab, ay - 2)
        cab.encode_bin_ep(1 if mvd_y < 0 else 0)


def decode_mvd(cab, ctx_mvd: int) -> MV:
    g0x = cab.decode_bin(ctx_mvd + 0)
    g0y = cab.decode_bin(ctx_mvd + 0)
    g1x = cab.decode_bin(ctx_mvd + 1) if g0x else 0
    g1y = cab.decode_bin(ctx_mvd + 1) if g0y else 0
    mvd_x = mvd_y = 0
    if g0x:
        ax = 1 + (1 + _decode_eg1(cab) if g1x else 0)
        mvd_x = -ax if cab.decode_bin_ep() else ax
    if g0y:
        ay = 1 + (1 + _decode_eg1(cab) if g1y else 0)
        mvd_y = -ay if cab.decode_bin_ep() else ay
    return (mvd_x, mvd_y)


def _encode_eg1(cab, value: int) -> None:
    """Exp-Golomb order-1, bypass bins (spec 9.3.3.3 with k=1)."""
    k = 1
    while value >= (1 << k):
        cab.encode_bin_ep(1)
        value -= 1 << k
        k += 1
    cab.encode_bin_ep(0)
    for i in range(k - 1, -1, -1):
        cab.encode_bin_ep((value >> i) & 1)


def _decode_eg1(cab) -> int:
    k = 1
    value = 0
    while cab.decode_bin_ep():
        value += 1 << k
        k += 1
    for _ in range(k):
        value = value  # suffix below
    suffix = 0
    for _ in range(k):
        suffix = (suffix << 1) | cab.decode_bin_ep()
    return value + suffix
