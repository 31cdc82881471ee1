"""Utility commands: input conversion.

Usage:
    python -m rpvg_tpu.tools json-to-rpa in.json[.gz] out.rpa [--single-path] [--single-end]

Converts protobuf-JSON alignment lines (`vg view -a` output) into the
binary .rpa container the native engine streams directly.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="rpvg-tpu-tools")
    sub = parser.add_subparsers(dest="command", required=True)

    convert = sub.add_parser("json-to-rpa", help="convert protobuf-JSON alignments to .rpa")
    convert.add_argument("input", help="JSON-lines alignment file (optionally .gz)")
    convert.add_argument("output", help="output .rpa path")
    convert.add_argument("--single-path", action="store_true", help="GAM-style single-path records")
    convert.add_argument("--single-end", action="store_true", help="not interleaved pairs")

    args = parser.parse_args(argv)

    if args.command == "json-to-rpa":
        from .io.rpa import convert_json

        convert_json(
            args.input,
            args.output,
            is_multipath=not args.single_path,
            is_paired=not args.single_end,
        )
        print(f"wrote {args.output}", file=sys.stderr)
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
