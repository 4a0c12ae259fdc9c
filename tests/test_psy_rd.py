"""Psychovisual RD (--psy-rd; x265 rdcost.h calcPsyRdCost +
pixel.cpp:727 psyCost_pp). The energy model and its effect on the
recon-in-the-loop RD dispatches (models/rdo.py)."""
import numpy as np
import jax.numpy as jnp

from x265_tpu.api.encoder import Encoder
from x265_tpu.api.params import RC_CQP, param_default_preset


def _energy_ref(b):
    """x265 psy energy of one 8x8 pixel block: sa8d vs zero minus the
    DC term (pixel.cpp:727)."""
    h = np.array([[1, 1, 1, 1, 1, 1, 1, 1],
                  [1, -1, 1, -1, 1, -1, 1, -1],
                  [1, 1, -1, -1, 1, 1, -1, -1],
                  [1, -1, -1, 1, 1, -1, -1, 1],
                  [1, 1, 1, 1, -1, -1, -1, -1],
                  [1, -1, 1, -1, -1, 1, -1, 1],
                  [1, 1, -1, -1, -1, -1, 1, 1],
                  [1, -1, -1, 1, -1, 1, 1, -1]], np.int64)
    t = h @ b.astype(np.int64) @ h.T
    return int(np.abs(t).sum()) // 4 - (int(b.sum()) >> 2)


def test_psy_energy_matches_reference_formula():
    from x265_tpu.models.rdo import _psy_energy8
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (5, 16, 16)).astype(np.int32)
    got = np.asarray(_psy_energy8(jnp.asarray(blocks)))
    for n in range(5):
        want = [_energy_ref(blocks[n, 8 * i:8 * i + 8, 8 * j:8 * j + 8])
                for i in range(2) for j in range(2)]
        assert got[n].tolist() == want


def test_psy_rd_flips_energy_killing_adoption():
    """The decision-level property psy-rd exists for (rdcost.h): a merge
    adoption whose half-pel prediction BLURS a Nyquist texture away is
    taken by pure SSE+rate RD at high QP (the residual quantizes to
    zero, saving AMVP header bits) but must be refused when the psy
    energy term sees the texture vanish from the recon."""
    from dataclasses import replace
    from x265_tpu.api.params import Param, check_params
    from x265_tpu.models.rdo import rd_adopt16

    H = W = 128
    p = check_params(Param(width=W, height=H, rdoq_level=0,
                           sign_hide=False, aq_mode=0))
    amp = 4
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    chk = (128 + amp * (1 - 2 * ((yy + xx) & 1))).astype(np.int32)
    src = (chk, np.full((H // 2, W // 2), 120, np.int32),
           np.full((H // 2, W // 2), 130, np.int32))
    pad = 80
    ref = tuple(np.pad(pl, pad >> (0 if i == 0 else 1),
                       mode="edge").astype(np.int16)
                for i, pl in enumerate(src))
    nb = H // 16
    inter = np.ones((nb, nb), bool)
    mv = np.zeros((nb, nb, 2, 2), np.int32)       # own motion: exact
    dirm = np.ones((nb, nb), np.int32)
    refb = np.zeros((nb, nb), np.int32)
    cands = [(1, 0, 0, (2, 0), (0, 0))]           # half-pel x: blurs

    flipped = False
    for qp in range(34, 52, 2):
        kw = dict()
        _d0, _m0, _r0, ad_off = rd_adopt16(
            src, [ref], [], inter, mv, dirm, refb, cands, qp,
            replace(p, psy_rd=0.0), **kw)
        if not ad_off.any():
            continue
        _d1, _m1, _r1, ad_on = rd_adopt16(
            src, [ref], [], inter, mv, dirm, refb, cands, qp,
            replace(p, psy_rd=2.0), **kw)
        assert ad_on.sum() < ad_off.sum()
        flipped = True
        break
    assert flipped, "SSE-only RD never adopted the blurring candidate"


def test_psy_rd_default_stream_conforms():
    """medium now runs psy-rd 2.0 by default (param.cpp:235): the
    psy-shaped stream must stay decodable."""
    from x265_tpu.decoder import de265
    from x265_tpu.decoder.decoder import HEVCDecoder

    rng = np.random.default_rng(3)
    h, w = 128, 192
    base = rng.integers(0, 256, (h + 32, w + 32)).astype(np.uint8)
    frames = [(np.ascontiguousarray(base[8:8 + h, 8 + 2 * i:8 + 2 * i + w]),
               np.full((h // 2, w // 2), 120, np.uint8),
               np.full((h // 2, w // 2), 130, np.uint8)) for i in range(5)]
    p = param_default_preset("medium")
    p.width, p.height = w, h
    p.rc_mode, p.qp = RC_CQP, 37
    p.bframes = 0
    p.sao = False
    p.aq_mode = 0
    p.cu_tree = False
    p.scenecut = 0
    p.ref = 1
    assert p.psy_rd == 2.0
    bs = Encoder(p).encode(frames)
    ours = HEVCDecoder().decode(bs)
    assert len(ours) == 5
    if de265.available():
        ext = de265.decode(bs)
        for o, e in zip(ours, ext):
            assert np.array_equal(o.y, e[0].astype(np.int32))


def test_psy_rd_flips_intra_mode_toward_energy():
    """Intra mode choice (frame_intra_analysis): a striped texture whose
    top reference row continues the stripes OUT OF PHASE. Pure SATD
    prefers the flat DC/planar prediction (the in-phase residual is
    smaller than the doubled antiphase one); psy-rd penalizes the
    energy-killing flat prediction and flips to the vertical mode that
    keeps the texture (x265 calcPsyRdCost applied in every intra mode
    comparison, rdcost.h:48)."""
    import jax.numpy as jnp
    from x265_tpu.models.intra_frame import frame_intra_analysis

    S = 16
    y = np.full((2 * S, 2 * S), 128, np.int32)
    xx = np.arange(2 * S)
    stripes = np.where((xx // 2) % 2 == 0, 168, 88)
    # block (1,1): striped texture; its top neighbor row (last row of
    # block (0,1)) carries the OPPOSITE phase
    y[S:, S:] = stripes[S:][None, :]
    y[S - 1, S:] = np.where((xx[S:] // 2) % 2 == 0, 88, 168)
    m0, _ = frame_intra_analysis(jnp.asarray(y), S=S, psy=0.0)
    m4, _ = frame_intra_analysis(jnp.asarray(y), S=S, psy=4.0)
    b = 3                        # block (1,1) of the 2x2 grid
    mode0, mode4 = int(np.asarray(m0)[b]), int(np.asarray(m4)[b])
    assert mode0 != mode4
    # the psy choice must be the texture-preserving vertical-ish mode
    assert 22 <= mode4 <= 30 or mode4 in (0,), (mode0, mode4)
