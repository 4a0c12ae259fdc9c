"""Recon-in-the-loop RD evaluation for quadtree promotions.

x265 analog: Analysis::compressInterCU_rd0_4's bottom-up merge
(analysis.cpp:1146) — each candidate CU size is coded (predict,
transform, quantize, reconstruct), its distortion measured against the
source and its rate estimated, and the cheaper tree wins. Re-imagined
TPU-first: every candidate 32x32 group in the frame is evaluated in ONE
batched dispatch — both configurations (one 32x32 TU vs four 16x16 TUs)
share the motion-compensated prediction (translation-invariant MC), so
the only difference is the transform/quant domain, exactly what the
batched _tq_chain computes.

Cost domain matches the RDOQ fixed-point model: 32*SSE +
RDOQ_LAM32[qp] * (rate_bins + per-CU header overhead), so promotion
decisions are consistent with the quantizer's own RD arithmetic.

Luma-only: chroma residual energy tracks luma at these block sizes and
its rate share is small; the ranking (not the absolute cost) is what
matters here.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from x265_tpu.hevc.tables import RDOQ_LAM32
from x265_tpu.models.residual import _tq_chain
from x265_tpu.models.inter_residual import _mc_gather, _LUMA_FILT

# bits of CU-level syntax a merged tree saves per eliminated CU
# (skip_flag + merge idx bins; calibrated with the static rate model)
CU_OH_BITS = 6


def _rate_bins_j(l: jnp.ndarray) -> jnp.ndarray:
    """The RDOQ static bin-count rate model (ops.ref.transform.rate_bins)
    in jnp, int32."""
    a = jnp.abs(l).astype(jnp.int32)
    r = jnp.where(a > 0, 3, 1)
    lg = jnp.zeros_like(a)
    for k in range(1, 16):
        lg = lg + (a >= (1 << k)).astype(jnp.int32)
    return r + jnp.where(a > 1, 2 + 2 * lg, 0)


@partial(jax.jit, static_argnames=("n", "bd", "sdh", "do_rdoq", "scaling",
                                   "pad"))
def _promo_costs(src_y, r0y, r1y, xy, mv, dirm, ref_i, qp,
                 n, bd, sdh, do_rdoq, scaling, pad):
    """RD costs of G candidate n x n regions with uniform motion:
    coded as ONE n-CU vs FOUR (n/2)-CUs.

    src_y [H,W] int32; r0y/r1y [R,Hp,Wp] padded int16 ref stacks;
    xy [G,2] (x0,y0); mv [G,2,2] qpel; dirm [G] 1/2/3; ref_i [G] L0 idx;
    qp [G]. Returns (cost_one [G], cost_four [G]) int64-domain float32.
    """
    G = xy.shape[0]
    x0, y0 = xy[:, 0], xy[:, 1]
    maxv = (1 << bd) - 1
    filt = jnp.asarray(_LUMA_FILT)
    use0 = (dirm & 1) > 0
    use1 = (dirm & 2) > 0

    p0 = _mc_gather(r0y, jnp.where(use0, ref_i, 0), x0, y0,
                    mv[:, 0, 0], mv[:, 0, 1], filt, 2, n, 8, pad, bd)
    p1 = _mc_gather(r1y, jnp.zeros_like(ref_i), x0, y0,
                    mv[:, 1, 0], mv[:, 1, 1], filt, 2, n, 8, pad, bd)
    sh_bi = 15 - bd
    bi = jnp.clip((p0 + p1 + (1 << (sh_bi - 1))) >> sh_bi, 0, maxv)
    p14 = jnp.where(use0[:, None, None], p0, p1)
    sh_u = 14 - bd
    uni = jnp.clip((p14 + (1 << (sh_u - 1))) >> sh_u, 0, maxv)
    pred = jnp.where((dirm == 3)[:, None, None], bi, uni)

    def blk(i):
        return jax.lax.dynamic_slice(src_y, (y0[i], x0[i]), (n, n))

    src = jax.vmap(blk)(jnp.arange(G)).astype(jnp.int32)
    resi = src - pred
    qpy = qp + 6 * (bd - 8)
    lam = jnp.asarray(np.asarray(RDOQ_LAM32),
                      jnp.int64)[qpy].astype(jnp.float32)

    def cfg_cost(r, qvec, m):
        lvl, rres, cbf = _tq_chain(r, qvec, jnp.zeros((r.shape[0],),
                                                      jnp.int32),
                                   m, False, False, bd, sdh, do_rdoq,
                                   False, scaling)
        e = (r - rres).astype(jnp.float32)
        sse = (e * e).sum(axis=(1, 2))
        rate = jnp.where(cbf, _rate_bins_j(lvl).sum(axis=(1, 2)), 0)
        return sse, rate.astype(jnp.float32)

    # one n-CU (TU == n)
    sse1, rate1 = cfg_cost(resi, qpy, n)
    cost_one = 32.0 * sse1 + lam * (rate1 + CU_OH_BITS)
    # four (n/2)-CUs — same prediction, finer transform
    m = n // 2
    q = resi.reshape(G, 2, m, 2, m).transpose(0, 1, 3, 2, 4)
    q = q.reshape(G * 4, m, m)
    sse4, rate4 = cfg_cost(q, jnp.repeat(qpy, 4), m)
    sse4 = sse4.reshape(G, 4).sum(axis=1)
    rate4 = rate4.reshape(G, 4).sum(axis=1)
    cost_four = 32.0 * sse4 + lam * (rate4 + 4 * CU_OH_BITS)
    return cost_one, cost_four


def rd_promote32(src_y, refs0_padded, refs1_padded, cand_yx, mv, dirm,
                 ref_i, qp, p, mesh=None):
    """Decide per candidate group whether one 32x32 CU beats four 16s.

    cand_yx [G,2] (y32, x32) indices on the 32-grid; mv [G,2,2];
    dirm/ref_i/[G]. Returns promote [G] bool. Batches are padded to the
    full 32-grid so the jitted shape never varies frame-to-frame.
    """
    from jax import enable_x64
    h32 = p.height // 32
    w32 = p.width // 32
    G = len(cand_yx)
    NB = max(32, -(-(h32 * w32) // 32) * 32)
    pad_n = NB - G

    def padn(a, fill=0):
        return np.concatenate(
            [a, np.full((pad_n,) + a.shape[1:], fill, a.dtype)]) \
            if pad_n else a

    xy = np.stack([cand_yx[:, 1] * 32, cand_yx[:, 0] * 32], 1)
    args = (jnp.asarray(padn(xy.astype(np.int32))),
            jnp.asarray(padn(mv.astype(np.int32))),
            jnp.asarray(padn(dirm.astype(np.int32), 1)),
            jnp.asarray(padn(ref_i.astype(np.int32))),
            jnp.asarray(padn(np.full(G, qp, np.int32), 26)))

    def stack(lst, hp, wp):
        if not lst:
            return jnp.zeros((1, hp, wp), jnp.int16)
        return jnp.stack([jnp.asarray(r) for r in lst])

    pad = 80
    hp, wp = p.height + 2 * pad, p.width + 2 * pad
    r0 = stack(refs0_padded, hp, wp)
    r1 = stack(refs1_padded, hp, wp)
    with enable_x64():
        c1, c4 = _promo_costs(
            jnp.asarray(np.asarray(src_y, np.int32)), r0, r1, *args,
            n=32, bd=p.bit_depth, sdh=bool(p.sign_hide),
            do_rdoq=p.rdoq_level > 0, scaling=bool(p.scaling_lists),
            pad=pad)
    c1 = np.asarray(c1)[:G]
    c4 = np.asarray(c4)[:G]
    return c1 <= c4
