"""Test harness config: force JAX onto a virtual 8-device CPU mesh so the
sharded pipeline is exercised without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; a config update after import wins and pins tests to the
# virtual 8-device CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

import subprocess

import pytest


@pytest.fixture(scope="session")
def bunzip():
    """Independent decode oracle: system bzip2 1.0.8 (the reference fuzz
    harness's differential pattern, fuzz/fuzz_targets/round_trip.rs)."""

    def _bunzip(data: bytes) -> bytes:
        p = subprocess.run(["bzip2", "-d"], input=data, capture_output=True)
        if p.returncode != 0:
            raise AssertionError(f"bzip2 -d failed: {p.stderr[:300]!r}")
        return p.stdout

    return _bunzip


@pytest.fixture(scope="session")
def sample_blob():
    """The 72,133-byte mixed text sample anchored in BASELINE.md."""
    import glob

    files = sorted(glob.glob("/root/reference/lib/*.rs")) + [
        "/root/reference/README.md",
        "/root/reference/bnz/src/main.rs",
    ]
    return b"".join(open(f, "rb").read() for f in files)
