"""Shell-level tests of launch/train_preemptible.sh restart semantics.

The launcher's contract (the reference's SLURM requeue role, bash/train.sh):
rc=0 stops the loop as a clean finish; any other rc — a crash OR the graceful
preemption exit 143 raised by run.py main() after a SIGTERM checkpoint —
relaunches with resume=true, bounded by MAX_RESTARTS. Tested by substituting
train_tpu.sh with a stub that scripts its own exit codes.
"""

import os
import shutil
import stat
import subprocess
from pathlib import Path

import pytest

LAUNCHER = Path(__file__).resolve().parent.parent / "launch" / "train_preemptible.sh"


def _run_launcher(tmp_path, exit_codes, max_restarts=10):
    """Copy the launcher next to a stub train_tpu.sh that exits with the
    scripted codes in order (repeating the last one if exhausted)."""
    d = tmp_path / "launch"
    d.mkdir()
    shutil.copy(LAUNCHER, d / "train_preemptible.sh")
    codes = " ".join(str(c) for c in exit_codes)
    stub = d / "train_tpu.sh"
    stub.write_text(
        "#!/bin/bash\n"
        f"codes=({codes})\n"
        f"count_file={tmp_path}/count\n"
        "n=$(cat \"$count_file\" 2>/dev/null || echo 0)\n"
        "echo $((n + 1)) > \"$count_file\"\n"
        "echo \"launch $((n + 1)) args: $*\"\n"
        "i=$(( n < ${#codes[@]} ? n : ${#codes[@]} - 1 ))\n"
        "exit \"${codes[$i]}\"\n"
    )
    for f in (stub, d / "train_preemptible.sh"):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    env = dict(os.environ, MAX_RESTARTS=str(max_restarts), BACKOFF="0")
    proc = subprocess.run(
        ["bash", str(d / "train_preemptible.sh"), "max_epochs=2"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    launches = int((tmp_path / "count").read_text())
    return proc, launches


def test_clean_finish_stops_the_loop(tmp_path):
    proc, launches = _run_launcher(tmp_path, [0])
    assert proc.returncode == 0 and launches == 1
    assert "finished cleanly" in proc.stdout


def test_graceful_preemption_relaunches_with_resume(tmp_path):
    """exit 143 (run.py main's signal-initiated stop) must NOT read as a
    clean finish: the loop relaunches, passing resume=true every time."""
    proc, launches = _run_launcher(tmp_path, [143, 143, 0])
    assert proc.returncode == 0 and launches == 3
    assert proc.stdout.count("resume=true") == 3
    assert "restart 2/10" in proc.stderr


def test_crash_bounded_by_max_restarts(tmp_path):
    proc, launches = _run_launcher(tmp_path, [1], max_restarts=3)
    assert proc.returncode == 1
    assert launches == 4  # 1 initial + 3 restarts
    assert "giving up after 3 restarts" in proc.stderr
