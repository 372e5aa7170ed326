"""Kernel debug CLI — the reference's CLI shape (SURVEY.md §3.A A15:
apply a transformation defined in a Python module to an XML/HTML file,
write the serialized result to stdout or a file).

Usage:
    python -m inxs_spark.kernel.cli DOC.xml [--rules pkg.mod:attr]
        [--out OUT] [--text-only]

Default rule-set is the main-content preset; --text-only prints the
extracted text instead of serialized markup. No Spark involved — this
is the single-document path, byte-identical to what each Arrow batch
row goes through.
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys

from ..extract import MAIN_CONTENT, extract_turn, text_with_spans
from .parse import parse_payload, serialize
from .transformation import Transformation


def load_rules(spec: str) -> Transformation:
    module_name, _, attr = spec.partition(":")
    module = importlib.import_module(module_name)
    obj = getattr(module, attr or "transformation")
    if callable(obj) and not isinstance(obj, Transformation):
        obj = obj()
    if not isinstance(obj, Transformation):
        raise TypeError(f"{spec} is not a Transformation")
    return obj


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="inxs_spark.kernel.cli")
    parser.add_argument("doc", help="XML/HTML file, or '-' for stdin")
    parser.add_argument(
        "--rules",
        default=None,
        help="transformation as 'module:attr' (default: main-content preset)",
    )
    parser.add_argument("--out", default=None, help="output file (default stdout)")
    parser.add_argument(
        "--text-only", action="store_true",
        help="print extracted text instead of serialized markup",
    )
    parser.add_argument(
        "--spans", action="store_true",
        help="with --text-only: print a JSON line with text+spans+failure",
    )
    args = parser.parse_args(argv)

    try:
        payload = sys.stdin.read() if args.doc == "-" else open(args.doc).read()
    except OSError as exc:
        print(f"error: cannot read {args.doc}: {exc}", file=sys.stderr)
        return 2
    try:
        transformation = load_rules(args.rules) if args.rules else MAIN_CONTENT
    except (ImportError, AttributeError, TypeError) as exc:
        print(f"error: cannot load rules {args.rules!r}: {exc}", file=sys.stderr)
        return 2

    if args.text_only or args.spans:
        text, spans, failure = extract_turn(payload, transformation)
        if args.spans:
            out = json.dumps(
                {"extracted_text": text,
                 "spans": [{"start": s, "end": e, "path": p} for s, e, p in spans],
                 "failure": failure}
            )
        else:
            out = text if text is not None else f"<failure: {failure}>"
    else:
        root, kind = parse_payload(payload)
        if root is None:
            out = payload
        else:
            result = transformation(root)
            out = serialize(result, html_mode=(kind == "html"))

    if args.out:
        with open(args.out, "w") as fh:
            fh.write(out)
    else:
        print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
