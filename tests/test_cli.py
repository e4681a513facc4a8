import os
import subprocess
import sys

import pytest

from banzai_tpu.cli import EXIT_OK, EXIT_USAGE, parse_args


def test_parse_defaults():
    inv = parse_args(["file.txt"])
    assert inv.input == "file.txt" and inv.level == 9
    assert not inv.keep and not inv.stdout


def test_parse_combined_short_flags():
    inv = parse_args(["-kc9", "x"])
    assert inv.keep and inv.stdout and inv.level == 9


def test_parse_aliases_and_output():
    inv = parse_args(["--fast", "--output", "out.bz2", "in"])
    assert inv.level == 1 and inv.output == "out.bz2"


def test_parse_stdin_and_end_of_flags():
    inv = parse_args(["--", "-weird-name"])
    assert inv.input == "-weird-name"
    inv = parse_args(["-c", "-"])
    assert inv.input == "-" and inv.stdout


def test_parse_errors():
    assert parse_args([]) == EXIT_USAGE
    assert parse_args(["-x", "f"]) == EXIT_USAGE
    assert parse_args(["a", "b"]) == EXIT_USAGE
    assert parse_args(["--output"]) == EXIT_USAGE


def test_cli_roundtrip(tmp_path, bunzip):
    src = tmp_path / "data.txt"
    payload = b"the quick brown fox " * 200
    src.write_bytes(payload)
    env = dict(os.environ, BANZAI_TPU_BACKEND="numpy")
    p = subprocess.run(
        [sys.executable, "-m", "banzai_tpu.cli", "-k", "-1", str(src)],
        capture_output=True, env=env, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    out = (tmp_path / "data.txt.bz2").read_bytes()
    assert bunzip(out) == payload
    assert src.exists()          # -k kept the input


def test_cli_deletes_input_by_default(tmp_path):
    src = tmp_path / "g.txt"
    src.write_bytes(b"abc" * 100)
    p = subprocess.run(
        [sys.executable, "-m", "banzai_tpu.cli", "-1", str(src)],
        capture_output=True, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    assert not src.exists()
    assert (tmp_path / "g.txt.bz2").exists()
