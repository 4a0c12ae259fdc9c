"""ABR ladder tests (x265 analog: abrEncApp multi-rendition encode;
BASELINE config #5 single-host form + the process-shard map that carries
it to multi-host)."""
import numpy as np
import pytest

from x265_tpu.api.ladder import AbrLadder, Rendition, renditions_for_process
from x265_tpu.decoder.decoder import HEVCDecoder
from x265_tpu.io.scaler import scale_plane


def _frames(w=192, h=128, n=9, seed=2):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 70 * np.sin(xx / 13.0) * np.cos(yy / 11.0)).astype(int)
    return [(np.clip(np.roll(base, 2 * i, 1) +
                     rng.integers(-4, 4, (h, w)), 0, 255).astype(np.uint8),
             np.full((h // 2, w // 2), 120, np.uint8),
             np.full((h // 2, w // 2), 130, np.uint8)) for i in range(n)]


def test_scaler_area_and_bilinear():
    p = np.arange(64 * 96, dtype=np.int32).reshape(64, 96) % 256
    half = scale_plane(p, 32, 48)
    assert half.shape == (32, 48)
    odd = scale_plane(p, 24, 40)
    assert odd.shape == (24, 40)
    flat = np.full((64, 96), 77, np.int32)
    assert (scale_plane(flat, 32, 48) == 77).all()
    assert (scale_plane(flat, 24, 40) == 77).all()


def test_rendition_sharding():
    r = [Rendition(192, 128, 600), Rendition(96, 64, 200),
         Rendition(48, 32, 80)]
    assert renditions_for_process(r, 0, 1) == [0, 1, 2]
    assert renditions_for_process(r, 0, 2) == [0, 2]
    assert renditions_for_process(r, 1, 2) == [1]


def test_ladder_encodes_all_renditions():
    frames = _frames()
    ladder = AbrLadder(192, 128, [Rendition(192, 128, 600),
                                  Rendition(96, 64, 200)])
    for f in frames:
        ladder.push(f)
    out = ladder.finish()
    assert set(out) == {0, 1}
    # every rendition decodes to the right geometry and frame count
    for i, (w, h) in ((0, (192, 128)), (1, (96, 64))):
        pics = HEVCDecoder().decode(out[i])
        assert len(pics) == len(frames)
        assert pics[0].y.shape == (h, w)
    # higher-bitrate rendition spends more bits
    assert len(out[0]) > len(out[1])
    st = ladder.stats()
    assert st[0]["frames"] == len(frames)
