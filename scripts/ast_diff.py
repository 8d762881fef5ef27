"""Enumerate registered queries whose source changed between two git
refs — the changed-since-green detector behind the grading rotation.

For each `@register("name", ...)`-decorated function in
hbase_sep_spark/ at REF_A and REF_B, compares the full source segment
(decorators INCLUDING the oracle SQL literal + body). A name whose
segment differs (or is new) is "changed": per the rotation policy it
outranks any stale green in `_GRADE_FIRST`, because its last driver
grade no longer covers the code that will run.

Usage:
    python scripts/ast_diff.py REF_A REF_B [--graded CORRECTNESS.json ...]

With --graded files, also prints the subset NOT re-graded since the
change (the names that must lead the next round's prefix).
"""

from __future__ import annotations

import argparse
import ast
import json
import subprocess


def register_segments(commit: str) -> dict[str, str]:
    """name -> source segment for every register() site at `commit`."""
    files = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", commit, "hbase_sep_spark/"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    out: dict[str, str] = {}
    for f in files:
        if not f.endswith(".py"):
            continue
        src = subprocess.run(
            ["git", "show", f"{commit}:{f}"], capture_output=True, text=True
        ).stdout
        try:
            tree = ast.parse(src)
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            for dec in node.decorator_list:
                if not isinstance(dec, ast.Call):
                    continue
                fn = dec.func
                name = getattr(fn, "id", getattr(fn, "attr", ""))
                if name == "register" and dec.args and isinstance(dec.args[0], ast.Constant):
                    qname = dec.args[0].value
                    seg = ast.get_source_segment(src, node) or ""
                    decs = "\n".join(
                        ast.get_source_segment(src, d) or "" for d in node.decorator_list
                    )
                    out[qname] = (f, decs + "\n" + seg)  # type: ignore[assignment]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--graded", nargs="*", default=[],
                    help="CORRECTNESS_*.json files from rounds AFTER ref_a")
    args = ap.parse_args()

    a = register_segments(args.ref_a)
    b = register_segments(args.ref_b)
    changed = sorted(n for n in b if n not in a or a[n] != b[n])
    removed = sorted(n for n in a if n not in b)
    print(f"changed {args.ref_a}..{args.ref_b}: {len(changed)}")
    for n in changed:
        print(f"  {n}  ({b[n][0]})")
    if removed:
        print(f"REMOVED (registry must never shrink!): {removed}")
    if args.graded:
        graded: set[str] = set()
        for path in args.graded:
            graded |= set(json.load(open(path)))
        pending = [n for n in changed if n not in graded]
        print(f"\nchanged but NOT re-graded ({len(pending)}) — lead the next prefix:")
        for n in pending:
            print(f"  {n}")


if __name__ == "__main__":
    main()
