"""Analysis save/load tests (x265 --analysis-save/--analysis-load,
save-load-tests.txt suite analog): a dependent encode loading the saved
decision tensors must produce the IDENTICAL bitstream, and the
cross-resolution rescale (--scale-factor analog) must stay decodable."""
import numpy as np

from x265_tpu.api.analysis_io import (
    AnalysisReader, AnalysisWriter, scale_decisions,
)
from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset
from x265_tpu.decoder.decoder import HEVCDecoder


def _frames(w=96, h=64, n=6, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 70 * np.sin(xx / 13.0) * np.cos(yy / 11.0)).astype(int)
    return [(np.clip(np.roll(base, 2 * i, 1) +
                     rng.integers(-5, 5, (h, w)), 0, 255).astype(np.uint8),
             np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 130, np.uint8)) for i in range(n)]


def _param(w=96, h=64):
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.qp, p.rc_mode, p.bframes = 30, RC_CQP, 2
    return p


def test_save_load_bitstream_identical(tmp_path):
    frames = _frames()
    stats = str(tmp_path / "a.x265tpu")
    p1 = _param(); p1.analysis_save = stats
    s1 = Encoder(p1).encode(frames)
    p2 = _param(); p2.analysis_load = stats
    s2 = Encoder(p2).encode(frames)
    assert s1 == s2


def test_scale_decisions_roundtrip(tmp_path):
    frames = _frames(192, 128)
    stats = str(tmp_path / "a.x265tpu")
    p1 = _param(192, 128); p1.analysis_save = stats
    Encoder(p1).encode(frames)
    # rescale the saved decisions to half resolution and encode with them
    rd = AnalysisReader(stats)
    half = [(f[0][::2, ::2].copy(), f[1][::2, ::2].copy(),
             f[2][::2, ::2].copy()) for f in frames]
    p2 = _param(96, 64)
    enc = Encoder(p2)
    out = [enc.headers()]
    for f in half:
        dec = scale_decisions(rd.get(), 2)
        dec.qp_map = None          # re-derive AQ at the new resolution
        out.append(enc.encode_frame(*f, decisions=dec))
    out.append(enc.flush())
    # NOTE: scaled decisions only pre-seed the intra path here (inter
    # decisions re-derive); the stream must still decode cleanly
    pics = HEVCDecoder().decode(b"".join(out))
    assert len(pics) == len(half)
