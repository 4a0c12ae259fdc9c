"""Multi-slice pictures (x265 --slices; frameencoder.cpp:820-876): even
CTU-row bands, each an independent slice segment with its own CABAC
state — the parallel-entropy shard axis (SURVEY §2.4 P4). Conformance is
arbitrated by libde265."""
import numpy as np
import pytest

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset, param_parse
from x265_tpu.decoder import de265

pytestmark = pytest.mark.skipif(not de265.available(),
                                reason="libde265 unavailable")


def _frames(n=4, w=192, h=192):
    rng = np.random.default_rng(17)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 80 * np.sin(xx / 8.0) * np.cos(yy / 9.0)).astype(int)
    out = []
    for i in range(n):
        y = np.clip(np.roll(base, 3 * i, 1) + rng.integers(-5, 6, (h, w)),
                    0, 255)
        out.append((y.astype(np.uint8),
                    np.clip(110 + (y[::2, ::2] >> 3), 0, 255)
                    .astype(np.uint8),
                    np.full((h // 2, w // 2), 133, np.uint8)))
    return out


def _count_slice_nals(stream: bytes) -> int:
    n = 0
    i = 0
    while True:
        j = stream.find(b"\x00\x00\x01", i)
        if j < 0:
            break
        nal_type = (stream[j + 3] >> 1) & 0x3F
        if nal_type <= 31:            # VCL NAL
            n += 1
        i = j + 3
    return n


def test_slices_lossless_intra_bit_exact():
    frames = _frames(2)
    p = param_default_preset("ultrafast")
    p.width = p.height = 192
    param_parse(p, "lossless")
    param_parse(p, "keyint", "1")
    p.slices = 3
    enc = Encoder(p)
    stream = enc.headers() + b"".join(enc.encode_frame(*f) for f in frames)
    assert _count_slice_nals(stream) == 3 * len(frames)
    pics = de265.decode(stream)
    assert len(pics) == len(frames)
    for f, d in zip(frames, pics):
        assert np.array_equal(d[0], f[0])
        assert np.array_equal(d[1], f[1])
        assert np.array_equal(d[2], f[2])


def test_slices_sao_inrepo_decoder_matches_de265():
    """ADVICE r2: parse_sao_ctu must omit the up-merge bin at the first
    CTU row of each slice segment (mirroring the native writer) — the
    in-repo decoder used to desync on multi-slice+SAO streams."""
    from x265_tpu.decoder.decoder import HEVCDecoder
    frames = _frames(3)
    p = param_default_preset("medium")     # medium: SAO on
    p.width = p.height = 192
    p.rc_mode, p.qp = RC_CQP, 32
    p.bframes = 0
    p.slices = 2
    assert p.sao
    enc = Encoder(p)
    stream = enc.headers()
    for f in frames:
        stream += enc.encode_frame(*f)
    stream += enc.flush()
    ours = HEVCDecoder().decode(stream)
    ext = de265.decode(stream)
    assert len(ours) == len(ext) == len(frames)
    for o, e in zip(ours, ext):
        assert np.array_equal(o.y, e[0].astype(np.int32))
        assert np.array_equal(o.cb, e[1].astype(np.int32))
        assert np.array_equal(o.cr, e[2].astype(np.int32))


def test_slices_pb_conformance():
    frames = _frames(5)
    p = param_default_preset("medium")
    p.width = p.height = 192
    p.rc_mode, p.qp = RC_CQP, 30
    p.bframes = 2
    p.rc_lookahead = 0
    p.slices = 2
    enc = Encoder(p)
    stream = enc.headers()
    recons = []
    orig = enc._inter_slice_data

    def spy(*a, **k):
        data, recon = orig(*a, **k)
        recons.append(tuple(np.asarray(x) for x in recon))
        return data, recon

    enc._inter_slice_data = spy
    for f in frames:
        stream += enc.encode_frame(*f)
    stream += enc.flush()
    pics = de265.decode(stream)
    assert len(pics) == len(frames)
    # libde265's decoded pictures (display order) must match the
    # encoder's loop-filtered recons (encode order) as sets
    dec_set = {tuple(p_[c].astype(np.uint8).tobytes() for c in range(3))
               for p_ in pics}
    for rec in recons:
        key = tuple(np.asarray(rec[c]).astype(np.uint8).tobytes()
                    for c in range(3))
        assert key in dec_set
