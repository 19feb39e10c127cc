"""Function-level similarity scan vs the reference repo.

Compares every function/method body in the package against every
reference body (cross-name, so renamed ports are caught too) with
difflib on normalized source lines.  Usage:

    python tools/similarity_scan.py [--min-lines 10] [--ratio 0.75]

Prints one line per hit; exit code 1 when any hit survives.
"""
import argparse
import ast
import difflib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent / "dask_geomodeling_tpu"
REF = Path("/root/reference/dask_geomodeling")


def _bodies(root):
    out = []
    for path in sorted(root.rglob("*.py")):
        try:
            tree = ast.parse(path.read_text())
        except SyntaxError:
            continue
        src = path.read_text().splitlines()
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            lines = [
                ln.strip()
                for ln in src[node.lineno - 1 : node.end_lineno]
                if ln.strip() and not ln.strip().startswith("#")
            ]
            out.append((path, node.name, node.lineno, lines))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--min-lines", type=int, default=10)
    parser.add_argument("--ratio", type=float, default=0.75)
    args = parser.parse_args()

    ref = [
        (p, n, ln, body)
        for (p, n, ln, body) in _bodies(REF)
        if len(body) >= args.min_lines
    ]
    hits = 0
    for path, name, lineno, body in _bodies(REPO):
        if len(body) < args.min_lines:
            continue
        blob = "\n".join(body)
        for rpath, rname, rline, rbody in ref:
            if abs(len(rbody) - len(body)) > max(len(body), len(rbody)) * 0.5:
                continue
            ratio = difflib.SequenceMatcher(
                None, blob, "\n".join(rbody)
            ).ratio()
            if ratio >= args.ratio:
                hits += 1
                print(
                    "%.2f  %s:%d %s  ~=  %s:%d %s"
                    % (
                        ratio,
                        path.relative_to(REPO.parent),
                        lineno,
                        name,
                        rpath.relative_to(REF.parent),
                        rline,
                        rname,
                    )
                )
    if hits:
        print("%d hit(s)" % hits)
        return 1
    print("no hits (min-lines=%d ratio=%.2f)" % (args.min_lines, args.ratio))
    return 0


if __name__ == "__main__":
    sys.exit(main())
