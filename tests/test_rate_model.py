"""estBit fractional-bit rate model (hevc/rate_model.py).

x265 analog: Entropy::estBit (entropy.cpp:2217) + Quant::rdoQuant
(quant.cpp:610) — RDOQ costs come from CABAC fractional-bit tables, not
bin counts.  These tests pin (a) the tri-implementation agreement
(oracle / device / native decide identically from the same constants),
and (b) the model quality: on sample TBs the fractional estimate must
track the REAL CABAC residual-coding bits better than the static
bin-count model (the differential check round-3 VERDICT item #4 asks
for)."""
import numpy as np
import pytest

from x265_tpu.hevc.cabac import CabacEncoder
from x265_tpu.hevc.rate_model import (rate_fx_np, rdoq_rate_consts,
                                      slice_rate_consts)
from x265_tpu.hevc.residual import encode_residual
from x265_tpu.ops.ref.transform import (forward_transform, quantize,
                                        rdoq)


def test_consts_shape_and_sanity():
    for it in (0, 1, 2):
        for qp in (22, 30, 40, 51):
            k = rdoq_rate_consts(it, qp)
            assert k.shape == (2, 8)
            assert (k > 0).all()
            assert (k < (16 << 15)).all()   # < 16 bits per flag
    # at inter init states / mid QP, zeros dominate: sig=1 costs more
    for it in (1, 2):
        k = rdoq_rate_consts(it, 32)
        assert k[0, 1] > k[0, 0]
        assert k[1, 1] > k[1, 0]


def test_rate_formula_monotonic():
    k = rdoq_rate_consts(1, 32)[0]
    r = rate_fx_np(np.arange(0, 200), k)
    assert (np.diff(r[1:]) >= 0).all()       # nondecreasing in |level|
    assert r[0] < r[1]


def _real_bits(levels, log2, qp):
    """Actual CABAC bits of coding one luma TB's levels (fresh P-slice
    contexts; flush overhead cancelled by subtracting an empty run)."""
    def run(blocks):
        enc = CabacEncoder()
        enc.init_slice(1, qp)
        for lv in blocks:
            encode_residual(enc, lv, log2, 0, 0, False, False)
        enc.encode_bin_trm(1)
        return len(enc.finish()) * 8
    return run([levels]) - run([])


@pytest.mark.parametrize("qp", [26, 36])
def test_estimate_tracks_real_bits_better_than_bin_count(qp):
    rng = np.random.default_rng(7)
    k = rdoq_rate_consts(1, qp)[0]
    err_est = err_bins = 0.0
    total = 0.0
    for _ in range(24):
        n = int(rng.choice([4, 8, 16]))
        log2 = n.bit_length() - 1
        resi = (rng.integers(-70, 70, (n, n))
                * (rng.random((n, n)) < 0.4)).astype(np.int32)
        c = forward_transform(resi, False, 8)
        lv = quantize(c, qp, log2, False, 8)
        if not lv.any():
            continue
        real = _real_bits(lv, log2, qp)
        est = float(rate_fx_np(lv, k).sum()) / 32768.0
        bins = float(np.where(np.abs(lv) > 0, 3, 1).sum())
        err_est += abs(est - real)
        err_bins += abs(bins - real)
        total += real
    assert total > 0
    # the fractional model must be the closer estimate in aggregate
    assert err_est < err_bins


def test_oracle_device_agreement():
    import jax.numpy as jnp
    from x265_tpu.models.residual import rdoq_b
    rng = np.random.default_rng(3)
    k = slice_rate_consts(1, 33)
    for n, qp in ((4, 28), (8, 33), (16, 39), (32, 44)):
        log2 = n.bit_length() - 1
        cs, ls, outs = [], [], []
        for _ in range(4):
            resi = rng.integers(-50, 50, (n, n)).astype(np.int32)
            c = forward_transform(resi, False, 8)
            l = quantize(c, qp, log2, False, 8)
            cs.append(c)
            ls.append(l)
            outs.append(rdoq(c, l, qp, log2, None, 8, None, consts=k[0]))
        dev = np.asarray(rdoq_b(np.stack(cs), np.stack(ls),
                                np.full(4, qp, np.int32), n, 8,
                                consts=jnp.asarray(k[0])))
        assert np.array_equal(dev, np.stack(outs)), (n, qp)


def test_rdoq_with_consts_only_reduces_levels():
    rng = np.random.default_rng(0)
    k = slice_rate_consts(1, 32)
    for qp in (26, 32, 40):
        resi = rng.integers(-40, 40, (16, 16)).astype(np.int32)
        c = forward_transform(resi, False, 8)
        l = quantize(c, qp, 4, False, 8)
        l2 = rdoq(c, l, qp, 4, None, 8, None, consts=k[0])
        assert np.abs(l2).sum() <= np.abs(l).sum()
        assert (np.abs(l2) <= np.abs(l)).all()
