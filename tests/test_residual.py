"""residual_coding + transform round-trip tests (TestBench analog)."""
import numpy as np
import pytest

from x265_tpu.hevc.cabac import CabacDecoder, CabacEncoder
from x265_tpu.hevc.residual import encode_residual, decode_residual
from x265_tpu.hevc.tables import SCANS
from x265_tpu.ops.ref.transform import (
    forward_transform, inverse_transform, quantize, dequantize,
    sign_bit_hiding_adjust, DCT, DST4,
)


def test_residual_roundtrip_fuzz():
    rng = np.random.default_rng(3)
    for trial in range(120):
        log2 = int(rng.integers(2, 6))
        n = 1 << log2
        c_idx = int(rng.integers(0, 3))
        scan = int(rng.integers(0, 3)) if log2 <= 3 else 0
        density = rng.choice([0.02, 0.1, 0.5, 1.0])
        sh = bool(rng.integers(0, 2))
        coeff = (rng.random((n, n)) < density) * rng.integers(-255, 256, (n, n))
        if not coeff.any():
            coeff[0, 0] = 1
        coeff = coeff.astype(np.int32)
        if sh:
            coeff = sign_bit_hiding_adjust(coeff, SCANS[(log2, scan)])
            if not coeff.any():
                continue
        enc = CabacEncoder()
        enc.init_slice(0, 26)
        encode_residual(enc, coeff, log2, c_idx, scan, sign_hiding=sh)
        enc.encode_bin_trm(1)
        dec = CabacDecoder(enc.finish())
        dec.init_slice(0, 26)
        out = decode_residual(dec, log2, c_idx, scan, sign_hiding=sh)
        assert np.array_equal(out, coeff), (trial, log2, c_idx, scan, sh)


def test_transform_matrices_are_orthogonal_scaled():
    for n, t in DCT.items():
        # HEVC integer DCT approximates 64*sqrt(n)*orthonormal
        g = t @ t.T
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() <= np.abs(np.diag(g)).min() * 0.05


def test_fwd_inv_transform_near_identity():
    rng = np.random.default_rng(0)
    for n in (4, 8, 16, 32):
        for dst in ((True, False) if n == 4 else (False,)):
            resi = rng.integers(-64, 64, (n, n)).astype(np.int32)
            coeff = forward_transform(resi, dst)
            back = inverse_transform(coeff, dst)
            assert np.abs(back - resi).max() <= 1, (n, dst)


def test_quant_dequant_qp4_near_lossless():
    rng = np.random.default_rng(1)
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        resi = rng.integers(-10, 11, (n, n)).astype(np.int32)
        coeff = forward_transform(resi, False)
        lvl = quantize(coeff, 4, log2, True)
        deq = dequantize(lvl, 4, log2)
        back = inverse_transform(deq, False)
        assert np.abs(back - resi).max() <= 2, log2
