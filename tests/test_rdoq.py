"""RDOQ tests (x265 Quant::rdoQuant, quant.cpp:610 — simplified level
choice + CG zeroing with a calibrated static rate model)."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder import de265
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.ops.ref.transform import (
    dequantize, forward_transform, inverse_transform, quantize, rdoq,
)


def _clip(n=6, seed=5):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:144, 0:176]
    base = (128 + 70 * np.sin(xx / 13.0) * np.cos(yy / 11.0)).astype(int)
    return [(np.clip(np.roll(base, 2 * i, 1) +
                     rng.integers(-6, 6, (144, 176)), 0, 255)
             .astype(np.uint8),
             np.full((72, 88), 120, np.uint8),
             np.full((72, 88), 130, np.uint8)) for i in range(n)]


def test_rdoq_never_increases_internal_cost():
    rng = np.random.default_rng(0)
    for qp in (26, 32, 40):
        resi = rng.integers(-40, 40, (16, 16)).astype(np.int32)
        c = forward_transform(resi, False, 8)
        l = quantize(c, qp, 4, False, 8)
        lam = 0.4 * 0.85 * 2.0 ** ((qp - 12) / 3.0)
        l2 = rdoq(c, l, qp, 4, lam, 8)
        assert np.abs(l2).sum() <= np.abs(l).sum()   # only reduces levels


def test_rdoq_rd_positive():
    """At medium QP the calibrated RDOQ must save substantial bits for a
    negligible PSNR cost (measured e2e with real CABAC bits)."""
    frames = _clip()
    res = {}
    for lvl in (0, 2):
        p = param_default_preset("medium")
        p.width, p.height = 176, 144
        p.qp, p.rc_mode, p.bframes, p.rdoq_level = 30, RC_CQP, 2, lvl
        enc = Encoder(p)
        s = enc.encode(frames)
        d = HEVCDecoder().decode(s)
        mse = np.mean([np.mean((x.y - f[0].astype(np.int64)) ** 2)
                       for x, f in zip(d, frames)])
        res[lvl] = (len(s), 10 * np.log10(255 ** 2 / mse))
    (b0, p0), (b2, p2) = res[0], res[2]
    assert b2 < 0.92 * b0            # >8% bit saving
    assert p0 - p2 < 0.25            # tiny quality cost


def test_rdoq_native_matches_oracle_and_conforms():
    frames = _clip(4)
    p = param_default_preset("slow")         # slow preset: rdoq_level 2
    p.width, p.height = 176, 144
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 2
    assert p.rdoq_level == 2
    enc_n = Encoder(p)
    s_n = enc_n.encode(frames)
    enc_p = Encoder(p)
    enc_p.use_native = False
    s_p = enc_p.encode(frames)
    assert s_n == s_p
    ours = HEVCDecoder().decode(s_n)
    if de265.available():
        ext = de265.decode(s_n)
        for i, (o, e) in enumerate(zip(ours, ext)):
            assert np.array_equal(o.y, e[0].astype(np.int32)), i


def test_psy_rdoq_three_way_agreement_and_energy():
    """psy-rdoq (--psy-rdoq; quant.cpp:610 usePsyMask analog): the Q8
    energy credit must (a) keep the oracle and the batched device RDOQ
    bit-identical, (b) never DECREASE total level energy vs psy off,
    and (c) actually change decisions somewhere at a realistic QP."""
    import jax.numpy as jnp
    from x265_tpu.models.residual import rdoq_b
    rng = np.random.default_rng(9)
    psy_fx = int(round(10.0 * 256))
    changed = 0
    for qp in (30, 36):
        for trial in range(4):
            resi = rng.integers(-28, 28, (16, 16)).astype(np.int32)
            c = forward_transform(resi, False, 8)
            l = quantize(c, qp, 4, False, 8)
            l_plain = rdoq(c, l, qp, 4, None, 8)
            l_psy = rdoq(c, l, qp, 4, None, 8, psy_fx=psy_fx)
            dev = np.asarray(rdoq_b(
                jnp.asarray(c[None]), jnp.asarray(l[None]),
                jnp.asarray([qp]), 16, 8, psy_fx=psy_fx))[0]
            assert np.array_equal(dev, l_psy)
            assert np.abs(l_psy).sum() >= np.abs(l_plain).sum()
            changed += int(not np.array_equal(l_psy, l_plain))
    assert changed > 0


def test_psy_rdoq_stream_conforms():
    """--rdoq-level 2 --psy-rdoq 1.0 end-to-end: the native finalizer
    carries the same credit; streams stay conformant."""
    frames = _clip(3)
    p = param_default_preset("slow")
    p.width, p.height = 176, 144
    p.rc_mode = RC_CQP
    p.qp = 32
    p.psy_rdoq = 1.0
    p.bframes = 2
    stream = Encoder(p).encode(frames)
    pics = HEVCDecoder().decode(stream)
    assert len(pics) == len(frames)
    if de265.available():
        d = de265.decode(stream)
        for a, b in zip(pics, d):
            assert np.array_equal(a.y, b[0])
