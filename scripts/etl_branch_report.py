#!/usr/bin/env python
"""Line/branch-coverage report for data/pack_episode.py under the ETL parity
corpus (stdlib `trace`; the coverage package is not in this image).

Runs every (seed, dataset) case of tests/etl_parity_common.py through our
packer with tracing on, then prints each executable line of pack_episode.py
that never ran — i.e. filter/dest/interp branches no golden exercises.
VERDICT r3 item 5 asks for every branch to be hit; this script is the check.

Usage: python scripts/etl_branch_report.py   (exit 1 if any conditional
line — if/elif/else/for/while — never executed)
"""

from __future__ import annotations

import sys
import trace
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np  # noqa: E402

from trafficbotsv15_tpu.data import pack_episode as pk  # noqa: E402
from etl_parity_common import make_raw, run_pipeline, variant_for_seed  # noqa: E402


def main() -> int:
    tracer = trace.Trace(count=True, trace=False)

    def run_all():
        for seed in range(50):
            for dataset in ("training", "validation", "testing"):
                run_pipeline(pk, make_raw(seed), dataset, is_ref=False, seed=seed)
        rng = np.random.default_rng(7)
        for _ in range(4):
            quad = np.cumsum(rng.uniform(1.0, 8.0, (4, 3)), axis=0)
            quad[:, 2] = 0.0
            pk.get_polylines_from_polygon(quad)

    tracer.runfunc(run_all)
    counts = tracer.results().counts

    src_path = Path(pk.__file__)
    hit = {ln for (f, ln), c in counts.items() if Path(f) == src_path and c > 0}

    import ast

    tree = ast.parse(src_path.read_text())
    executable, conditional = set(), set()

    for node in ast.walk(tree):
        if isinstance(node, (ast.stmt,)) and not isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Import,
                   ast.ImportFrom, ast.Global, ast.Nonlocal, ast.Pass)
        ):
            # skip docstrings (constant-expression statements never "run")
            if isinstance(node, ast.Expr) and isinstance(node.value, ast.Constant):
                continue
            executable.add(node.lineno)
        if isinstance(node, (ast.If, ast.For, ast.While, ast.IfExp)):
            conditional.add(node.lineno)
            if isinstance(node, (ast.If, ast.For, ast.While)) and node.orelse:
                conditional.add(node.orelse[0].lineno)
                executable.add(node.orelse[0].lineno)

    # module docstring/constants run at import (before tracing) — restrict to
    # lines inside function bodies
    func_lines = set()
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            func_lines.update(range(node.body[0].lineno, node.end_lineno + 1))
    executable &= func_lines
    conditional &= func_lines

    lines = src_path.read_text().splitlines()
    missed = sorted(executable - hit)
    missed_cond = sorted(conditional - hit)

    total = len(executable)
    print(f"pack_episode.py: {total - len(missed)}/{total} executable lines hit "
          f"({100.0 * (total - len(missed)) / total:.1f}%) over 150 parity cases")
    if missed:
        print("\nnever-executed lines:")
        for ln in missed:
            tag = "  <-- CONDITIONAL" if ln in missed_cond else ""
            print(f"  {ln:4d}: {lines[ln - 1].rstrip()}{tag}")
    if missed_cond:
        print(f"\n{len(missed_cond)} conditional lines unexercised — add corpus variants.")
        return 1
    print("all conditional lines exercised.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
