"""Multi-host ABR ladder: a real 2-process jax.distributed run
(BASELINE config #5; reference: abrEncApp.cpp:497-846 — one AbrEncoder
per host, renditions statically sharded).

Spawns two OS processes that each call jax.distributed.initialize
against a shared coordinator, encode their rendition shard of the same
synthesised source, and write streams; the parent then decodes both
streams and checks geometry/frame count.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_ladder(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # each worker is a fresh single-device CPU process
    env.pop("XLA_FLAGS", None)
    out = tmp_path / "ladder"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "ladder_worker.py"),
             "--coordinator", f"127.0.0.1:{port}",
             "--procs", "2", "--proc-id", str(pid),
             "--out", str(out), "--frames", "3"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=600)
        outs.append((p.returncode, so, se))
    for rc, so, se in outs:
        assert rc == 0, se.decode(errors="replace")[-2000:]

    from x265_tpu.decoder.decoder import HEVCDecoder
    for i, (w, h) in ((0, (96, 64)), (1, (64, 48))):
        path = out / f"r{i}.hevc"
        assert path.exists(), f"rendition {i} missing (shard not encoded)"
        pics = HEVCDecoder().decode(path.read_bytes())
        assert len(pics) == 3
        assert pics[0].y.shape == (h, w)
