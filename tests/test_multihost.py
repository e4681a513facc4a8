"""Real multi-process multihost test (VERDICT r1 item 3).

Launches a genuine 2-process ``jax.distributed`` job on the CPU backend
(SURVEY.md §4: multi-host logic is testable with multi-process JAX on CPU)
and checks the stitched stream is byte-identical to the single-host encode
and decodes via bzip2 -d.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _corpus() -> bytes:
    import numpy as np

    rng = np.random.default_rng(7)
    txt = open(os.path.join(REPO, "banzai_tpu", "rle1.py"), "rb").read()
    parts = [
        txt * 3,
        b"abcde" * 8000,
        bytes(rng.integers(0, 256, 60_000, dtype=np.uint8)),
        b"\x00" * 30_000,
        txt,
    ]
    return b"".join(parts)


@pytest.mark.parametrize("level,nproc", [(1, 2), (1, 3)])
def test_two_process_stream_matches_single_host(tmp_path, level, nproc):
    data = _corpus()
    inp = tmp_path / "input.bin"
    outp = tmp_path / "multi.bz2"
    inp.write_bytes(data)

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port),
             str(inp), str(outp), str(level)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(nproc)
    ]
    for p in procs:
        try:
            rc = p.wait(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        if rc != 0:
            err = p.stderr.read().decode()[-2000:]
            pytest.fail(f"worker exited {rc}: {err}")

    multi = outp.read_bytes()

    # Single-host reference (this process, CPU backend via conftest).
    from banzai_tpu.pipeline import compress

    single = compress(data, level)
    assert multi == single, (
        f"multi-host stream differs: {len(multi)} vs {len(single)} bytes"
    )

    d = subprocess.run(["bzip2", "-d", "-c"], input=multi,
                       capture_output=True)
    assert d.returncode == 0 and d.stdout == data
