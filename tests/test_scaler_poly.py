import numpy as np
from x265_tpu.io.scaler import scale_plane, _poly_matrix, _polyphase, _bilinear

def test_poly_matrix_rows_normalized():
    m = _poly_matrix(720, 480)
    assert np.allclose(m.sum(axis=1), 1.0, atol=1e-5)
    m = _poly_matrix(480, 720)      # upsample
    assert np.allclose(m.sum(axis=1), 1.0, atol=1e-5)

def test_polyphase_dc_preserved():
    flat = np.full((72, 96), 137, np.uint8)
    out = scale_plane(flat, 48, 64)          # 2/3 ratio -> polyphase
    assert out.shape == (48, 64)
    assert np.all(np.abs(out.astype(int) - 137) <= 1)

def test_polyphase_antialiases_vs_bilinear():
    # high-frequency checkerboard downscaled 3:2: bilinear aliases badly,
    # the windowed-sinc polyphase keeps the mean with less variance error
    yy, xx = np.mgrid[0:96, 0:144]
    cb = (((yy + xx) % 2) * 255).astype(np.uint8)     # Nyquist pattern
    poly = _polyphase(cb, 64, 96).astype(float)
    bil = _bilinear(cb, 64, 96).astype(float)
    # true content is unresolvable: ideal answer is the 127.5 mean
    assert abs(poly.mean() - 127.5) < 4
    err_poly = np.abs(poly - 127.5).mean()
    err_bil = np.abs(bil - 127.5).mean()
    assert err_poly <= err_bil

def test_10bit_path():
    rng = np.random.default_rng(2)
    p10 = rng.integers(0, 1024, (72, 96)).astype(np.uint16)
    out = scale_plane(p10, 60, 80)
    assert out.dtype == np.uint16 and out.max() <= 1023
