import numpy as np
import pytest

from x265_tpu.hevc.bitstream import (
    BitReader, BitWriter, add_emulation_prevention, annexb, make_nal,
    split_annexb, strip_emulation_prevention,
)


def test_bitwriter_basics():
    bw = BitWriter()
    bw.write(0b101, 3)
    bw.write(0b11111, 5)
    assert bw.data() == bytes([0b10111111])


def test_ue_se_roundtrip():
    rng = np.random.default_rng(0)
    vals_ue = [0, 1, 2, 3, 7, 8, 255, 65534] + list(rng.integers(0, 1 << 20, 50))
    vals_se = [0, 1, -1, 2, -2, 127, -128] + list(rng.integers(-(1 << 15), 1 << 15, 50))
    bw = BitWriter()
    for v in vals_ue:
        bw.write_ue(int(v))
    for v in vals_se:
        bw.write_se(int(v))
    bw.rbsp_trailing_bits()
    br = BitReader(bw.data())
    for v in vals_ue:
        assert br.read_ue() == int(v)
    for v in vals_se:
        assert br.read_se() == int(v)


def test_emulation_prevention_roundtrip():
    cases = [
        b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03",
        b"\x00\x00\x04", b"abc\x00\x00\x00\x00\x01xyz", b"\x00" * 10,
        bytes(range(256)),
    ]
    rng = np.random.default_rng(1)
    cases += [bytes(rng.integers(0, 4, 100, dtype=np.uint8)) for _ in range(20)]
    for rbsp in cases:
        esc = add_emulation_prevention(rbsp)
        # no illegal sequence remains
        for i in range(len(esc) - 2):
            assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2), esc
        assert strip_emulation_prevention(esc) == rbsp


def test_annexb_split():
    n1 = make_nal(33, b"\x01\x02\x03")
    n2 = make_nal(34, b"\x04\x05")
    stream = annexb([n1, n2])
    out = split_annexb(stream)
    assert out == [n1, n2]
    # nal header check
    assert (n1[0] >> 1) & 0x3F == 33
