#!/usr/bin/env python3
"""Tolerant line-JSON comparison (the reference's compare_table.pl role):
words must match exactly; numeric fields within tolerances."""

import json
import sys


def compare_doc(a, b, time_tol=0.05, prob_tol=1.0, path="$"):
    errs = []
    if isinstance(a, dict) and isinstance(b, dict):
        for k in set(a) | set(b):
            if k not in a or k not in b:
                if k == "w":   # nested words may be absent
                    continue
                errs.append(f"{path}.{k}: missing")
                continue
            errs += compare_doc(a[k], b[k], time_tol, prob_tol,
                                f"{path}.{k}")
    elif isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            errs.append(f"{path}: length {len(a)} != {len(b)}")
        for i, (x, y) in enumerate(zip(a, b)):
            errs += compare_doc(x, y, time_tol, prob_tol, f"{path}[{i}]")
    elif isinstance(a, (int, float)) and isinstance(b, (int, float)):
        tol = prob_tol if path.endswith(".p") else time_tol
        if abs(a - b) > tol:
            errs.append(f"{path}: {a} vs {b}")
    else:
        if a != b:
            errs.append(f"{path}: {a!r} != {b!r}")
    return errs


def main():
    if len(sys.argv) < 3:
        print("usage: compare_json.py A.json B.json [time_tol] [prob_tol]")
        return 2
    time_tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    prob_tol = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0
    ok = True
    with open(sys.argv[1]) as fa, open(sys.argv[2]) as fb:
        for la, lb in zip(fa, fb):
            if not la.strip() or not lb.strip():
                continue
            errs = compare_doc(json.loads(la), json.loads(lb),
                               time_tol, prob_tol)
            for e in errs:
                print(e)
                ok = False
    print("MATCH" if ok else "DIFFER")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
