"""Exact batched intra prediction — device side of the finalizer split.

Reproduces the native finalizer's reference-sample handling and 35-mode
prediction (slice_writer.cpp get_ref_samples/filter_refs/predict_intra;
spec 8.4.4.2) bit-exactly as batched gathers:

Every predicted sample of every mode is expressible as
    pred[p] = clip0( (sum_t w[m,p,t] * refx[idx[m,p,t]] + rnd[m,p])
                     >> shift[m,p] )
over an extended reference vector refx = [ref (4nt+1 samples), dc], with
per-(mode, position) 4-sparse integer weight tables built once in numpy
(the intra_pred_allangs idea, reference intrapred.cpp:32-240, recast as
table-driven gathers instead of 25K lines of asm). The data-dependent
parts (reference sample substitution, strong-smoothing condition, DC
value) are computed per block on device.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from x265_tpu.hevc.tables import INTRA_PRED_ANGLE


def _filter_flag(mode: int, log2: int) -> bool:
    if mode in (1, 10, 26) or log2 == 2:
        return False
    if mode == 0:
        return True
    d = min(abs(mode - 26), abs(mode - 10))
    thresh = 7 if log2 == 3 else (1 if log2 == 4 else 0)
    return d > thresh


@lru_cache(maxsize=16)
def build_pred_tables(nt: int, luma: bool):
    """4-sparse prediction tables for all 35 modes at one TU size.

    Returns (idx [35,nt*nt,4] int32 into refx[R+1] (slot R = dc),
    w [35,nt*nt,4] int32, rnd [35,nt*nt] int32, shift [35,nt*nt] int32,
    filt [35] bool).
    """
    n2 = 2 * nt
    corner = n2
    R = 4 * nt + 1
    DC = R                      # index of the dc pseudo-sample
    log2 = nt.bit_length() - 1
    np_idx = np.zeros((35, nt * nt, 4), np.int32)
    np_w = np.zeros((35, nt * nt, 4), np.int32)
    np_rnd = np.zeros((35, nt * nt), np.int32)
    np_shift = np.zeros((35, nt * nt), np.int32)

    def topp(i):
        return corner + 1 + i

    def leftv(y):
        return n2 - 1 - y

    # mode 0: planar
    for y in range(nt):
        for x in range(nt):
            p = y * nt + x
            np_idx[0, p] = (leftv(y), topp(nt), topp(x), leftv(nt))
            np_w[0, p] = (nt - 1 - x, x + 1, nt - 1 - y, y + 1)
            np_rnd[0, p] = nt
            np_shift[0, p] = log2 + 1

    # mode 1: DC (+ luma edge filtering for nt < 32)
    np_idx[1, :, 0] = DC
    np_w[1, :, 0] = 1
    if luma and nt < 32:
        for x in range(1, nt):
            np_idx[1, x] = (topp(x), DC, 0, 0)
            np_w[1, x] = (1, 3, 0, 0)
            np_rnd[1, x] = 2
            np_shift[1, x] = 2
        for y in range(1, nt):
            p = y * nt
            np_idx[1, p] = (leftv(y), DC, 0, 0)
            np_w[1, p] = (1, 3, 0, 0)
            np_rnd[1, p] = 2
            np_shift[1, p] = 2
        np_idx[1, 0] = (leftv(0), DC, topp(0), 0)
        np_w[1, 0] = (1, 2, 1, 0)
        np_rnd[1, 0] = 2
        np_shift[1, 0] = 2

    # modes 2..34: angular
    for mode in range(2, 35):
        angle = int(INTRA_PRED_ANGLE[mode - 2])
        vertical = mode >= 18
        main_src = np.zeros(2 * n2 + 8, np.int32)
        if angle < 0:
            ia = 8192.0 / angle
            inv = -256 if angle == -32 else int(ia + (0.5 if ia >= 0 else -0.5))
            lo = (nt * angle) >> 5
            base = -lo
            for x in range(lo + 1, 0):
                k = ((x * inv + 128) >> 8) - 1
                main_src[x - lo] = corner if k < 0 else (
                    leftv(k) if vertical else topp(k))
            main_src[base] = corner
            for i in range(n2):
                main_src[base + 1 + i] = topp(i) if vertical else leftv(i)
        else:
            base = 0
            main_src[0] = corner
            for i in range(n2):
                main_src[1 + i] = topp(i) if vertical else leftv(i)
            main_src[n2 + 1] = topp(n2 - 1) if vertical else leftv(n2 - 1)
        for j in range(1, nt + 1):
            iidx = (j * angle) >> 5
            ifact = (j * angle) & 31
            for i in range(nt):
                k = i + iidx + 1 + base
                p = (j - 1) * nt + i if vertical else i * nt + (j - 1)
                np_idx[mode, p] = (main_src[k], main_src[k + 1], 0, 0)
                np_w[mode, p] = (32 - ifact, ifact, 0, 0)
                np_rnd[mode, p] = 16
                np_shift[mode, p] = 5
        if luma and nt < 32:
            if mode == 26:       # first column: t0 + ((left(y) - pc) >> 1)
                for y in range(nt):
                    p = y * nt
                    np_idx[26, p] = (topp(0), leftv(y), corner, 0)
                    np_w[26, p] = (2, 1, -1, 0)
                    np_rnd[26, p] = 0
                    np_shift[26, p] = 1
            elif mode == 10:     # first row: l0 + ((top(x) - pc) >> 1)
                for x in range(nt):
                    np_idx[10, x] = (leftv(0), topp(x), corner, 0)
                    np_w[10, x] = (2, 1, -1, 0)
                    np_rnd[10, x] = 0
                    np_shift[10, x] = 1

    filt = np.array([_filter_flag(m, log2) for m in range(35)], bool)
    return np_idx, np_w, np_rnd, np_shift, filt


@partial(jax.jit, static_argnames=("nt", "bd", "luma", "strong"))
def predict_intra_batch(refs: jnp.ndarray, avail: jnp.ndarray,
                        modes: jnp.ndarray, nt: int, bd: int, luma: bool,
                        strong: bool) -> jnp.ndarray:
    """refs [N, 4nt+1] raw reference samples (native layout: left
    bottom-up, corner, top), avail [N, 4nt+1] bool, modes [N] ->
    pred [N, nt, nt] int32. Bit-exact vs get_ref_samples substitution +
    filter_refs + predict_intra."""
    N, R = refs.shape
    n2 = 2 * nt
    corner = n2
    refs = refs.astype(jnp.int32)

    # --- reference sample substitution (unavailable -> forward fill) ---
    idx = jnp.where(avail, jnp.arange(R)[None, :], -1)
    last = jax.lax.associative_scan(jnp.maximum, idx, axis=1)
    first = jnp.argmax(avail, axis=1)
    take = jnp.where(last >= 0, last, first[:, None])
    ref = jnp.take_along_axis(refs, take, axis=1)
    none_avail = ~jnp.any(avail, axis=1)
    ref = jnp.where(none_avail[:, None], 1 << (bd - 1), ref)

    # --- 1:2:1 reference filtering (+ strong bilinear for nt=32) ---
    f121 = ref.at[:, 1:R - 1].set(
        (ref[:, :R - 2] + 2 * ref[:, 1:R - 1] + ref[:, 2:] + 2) >> 2)
    if strong and nt == 32:
        c = ref[:, corner]
        topend = ref[:, 4 * nt]
        leftend = ref[:, 0]
        thr = 1 << (bd - 5)
        cond = ((jnp.abs(c + topend - 2 * ref[:, corner + nt]) < thr) &
                (jnp.abs(c + leftend - 2 * ref[:, nt]) < thr))
        x = jnp.arange(n2 - 1)
        top_s = ((63 - x)[None, :] * c[:, None]
                 + (x + 1)[None, :] * topend[:, None] + 32) >> 6
        yy = n2 - 1 - jnp.arange(1, n2)
        left_s = ((63 - yy)[None, :] * c[:, None]
                  + (yy + 1)[None, :] * leftend[:, None] + 32) >> 6
        strong_ref = ref.at[:, corner + 1:corner + n2].set(top_s)
        strong_ref = strong_ref.at[:, 1:n2].set(left_s)
        fref = jnp.where(cond[:, None], strong_ref, f121)
    else:
        fref = f121
    tabs = build_pred_tables(nt, luma)
    if luma:
        filt_tab = jnp.asarray(tabs[4])
        use_filt = filt_tab[modes]
        final_ref = jnp.where(use_filt[:, None], fref, ref)
    else:
        final_ref = ref          # chroma refs are never filtered (8.4.4.2.3)

    # --- dc pseudo-sample (from the per-block selected ref: DC mode is
    # never filtered, so final_ref == raw ref for those blocks) ---
    log2 = nt.bit_length() - 1
    top_sum = final_ref[:, corner + 1:corner + 1 + nt].sum(axis=1)
    left_sum = final_ref[:, n2 - nt:n2][:, ::-1].sum(axis=1)
    dc = (top_sum + left_sum + nt) >> (log2 + 1)
    refx = jnp.concatenate([final_ref, dc[:, None]], axis=1)  # [N, R+1]

    # --- 4-term sparse prediction ---
    t_idx = jnp.asarray(tabs[0])[modes]      # [N, nt*nt, 4]
    t_w = jnp.asarray(tabs[1])[modes]
    t_rnd = jnp.asarray(tabs[2])[modes]
    t_shift = jnp.asarray(tabs[3])[modes]
    g = jnp.take_along_axis(refx[:, None, :].repeat(1, axis=1),
                            t_idx.reshape(N, 1, -1), axis=2)
    g = g.reshape(N, nt * nt, 4)
    acc = (g * t_w).sum(axis=2) + t_rnd
    pred = acc >> t_shift
    pred = jnp.clip(pred, 0, (1 << bd) - 1)
    return pred.reshape(N, nt, nt)
