"""Worker for the real 2-process multihost test (tests/test_multihost.py).

Usage: python multihost_worker.py <pid> <nproc> <port> <input> <output> <level>

Run once per process; forms a jax.distributed job over localhost TCP on the
CPU backend and encodes <input> with encode_multihost_path.  Process 0
writes the stitched stream to <output>.
"""

import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    inp, outp, level = sys.argv[4], sys.argv[5], int(sys.argv[6])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc

    from banzai_tpu.parallel.multihost import encode_multihost_path

    out = encode_multihost_path(inp, level)
    if pid == 0:
        with open(outp, "wb") as f:
            f.write(out)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
