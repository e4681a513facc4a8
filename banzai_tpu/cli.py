"""bnz-compatible CLI (reference: bnz/src/main.rs).

Flags (bnz/src/main.rs:32-59): ``--output <path>``, ``-c/--stdout``,
``-k/--keep``, ``-r/--remove``, ``-1``..``-9``, ``--fast``/``--best``,
``-v/--verbose`` (parsed, unused — mirroring the reference quirk but we do
emit per-block stats), ``-`` for stdin, ``--`` end-of-flags, combined short
flags (``-kc9``), ``--help/--info/--version``.

Behavior: default level 9 (bnz/src/main.rs:165-170), default output
``<input>.bz2`` (bnz/src/main.rs:268-277), input deleted unless the output
was manually specified or ``--keep`` (bnz/src/main.rs:292-309).
Exit codes 0/1/2/3 (bnz/src/main.rs:11-14).
"""

from __future__ import annotations

import os
import sys

EXIT_OK = 0
EXIT_USAGE = 1
EXIT_INPUT_IO = 2
EXIT_OUTPUT_IO = 3

_HELP = """usage: bnz [flags] [--output <path>] <input|->

Compress a file to the bzip2 format on TPU.

flags:
  -c, --stdout     write to standard output
  -k, --keep       keep the input file
  -r, --remove     remove the input file (default unless --output/-c/-k)
  -1 .. -9         block size 100kB..900kB (default 9)
      --fast       alias for -1
      --best       alias for -9
  -v, --verbose    per-block statistics to stderr
      --output P   write to P
      --help       this message
      --info       about this program
      --version    version string
"""

_INFO = (
    "banzai_tpu: a TPU-native bzip2 encoder (JAX/XLA/Pallas).\n"
    "Linear-work pipeline: RLE1 -> rotation-sort BWT -> chunk-parallel MTF\n"
    "-> RLE2 -> package-merge Huffman -> prefix-sum bit packing.\n"
)


class Invocation:
    def __init__(self) -> None:
        self.input: str | None = None
        self.output: str | None = None
        self.stdout = False
        self.keep = False
        self.remove = False
        self.verbose = False
        self.level: int | None = None


def parse_args(argv: list[str]) -> Invocation | int:
    inv = Invocation()
    expect_output = False
    no_more_flags = False
    for arg in argv:
        if expect_output:
            inv.output = arg
            expect_output = False
            continue
        if not no_more_flags and arg == "--":
            no_more_flags = True
            continue
        if not no_more_flags and arg.startswith("--"):
            name = arg[2:]
            if name == "help":
                print(_HELP, end="")
                return EXIT_OK
            if name == "info":
                print(_INFO, end="")
                return EXIT_OK
            if name == "version":
                from . import __version__

                print(f"banzai_tpu {__version__}")
                return EXIT_OK
            if name == "output":
                expect_output = True
            elif name == "stdout":
                inv.stdout = True
            elif name == "keep":
                inv.keep = True
            elif name == "remove":
                inv.remove = True
            elif name == "verbose":
                inv.verbose = True
            elif name == "fast":
                inv.level = 1
            elif name == "best":
                inv.level = 9
            else:
                print(f"bnz: unknown flag --{name}", file=sys.stderr)
                return EXIT_USAGE
            continue
        if not no_more_flags and arg.startswith("-") and arg != "-":
            for ch in arg[1:]:
                if ch == "c":
                    inv.stdout = True
                elif ch == "k":
                    inv.keep = True
                elif ch == "r":
                    inv.remove = True
                elif ch == "v":
                    inv.verbose = True
                elif ch.isdigit() and ch != "0":
                    inv.level = int(ch)
                else:
                    print(f"bnz: unknown flag -{ch}", file=sys.stderr)
                    return EXIT_USAGE
            continue
        if inv.input is not None:
            print("bnz: multiple inputs specified", file=sys.stderr)
            return EXIT_USAGE
        inv.input = arg
    if expect_output:
        print("bnz: --output requires a path", file=sys.stderr)
        return EXIT_USAGE
    if inv.input is None:
        print("bnz: no input specified (use - for stdin)", file=sys.stderr)
        return EXIT_USAGE
    if inv.level is None:
        inv.level = 9
    return inv


def main(argv: list[str] | None = None) -> int:
    inv = parse_args(sys.argv[1:] if argv is None else argv)
    if isinstance(inv, int):
        return inv

    from . import compress

    # Read input.
    if inv.input == "-":
        data = sys.stdin.buffer.read()
    else:
        try:
            with open(inv.input, "rb") as f:
                data = f.read()
        except OSError as e:
            print(f"bnz: cannot read {inv.input}: {e}", file=sys.stderr)
            return EXIT_INPUT_IO

    out = compress(data, inv.level)
    if inv.verbose:
        ratio = len(out) / max(1, len(data))
        print(
            f"bnz: {len(data)} -> {len(out)} bytes "
            f"({ratio * 100:.1f}%), level {inv.level}",
            file=sys.stderr,
        )

    # Write output.
    if inv.stdout:
        try:
            sys.stdout.buffer.write(out)
            sys.stdout.buffer.flush()
        except BrokenPipeError:
            # Reader went away (e.g. `bnz -c x | head`); mirror bzip2's
            # quiet exit instead of a traceback.
            try:
                sys.stdout.close()
            except Exception:
                pass
            return EXIT_OUTPUT_IO
    else:
        path = inv.output
        if path is None:
            if inv.input == "-":
                print("bnz: stdin input requires -c or --output", file=sys.stderr)
                return EXIT_USAGE
            path = inv.input + ".bz2"
        try:
            with open(path, "wb") as f:
                f.write(out)
        except OSError as e:
            print(f"bnz: cannot write {path}: {e}", file=sys.stderr)
            return EXIT_OUTPUT_IO

    # Input deletion policy (bnz/src/main.rs:292-309): delete unless output
    # was manually specified, writing to stdout, or --keep.
    if (
        inv.input != "-"
        and not inv.keep
        and not inv.stdout
        and (inv.output is None or inv.remove)
    ):
        try:
            os.unlink(inv.input)
        except OSError:
            pass
    return EXIT_OK


if __name__ == "__main__":
    sys.exit(main())
