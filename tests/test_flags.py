"""Guards for ops/flags.py — the single env-read point of models/ and ops/.

VERDICT r4 weak #7 closed the env-flag sprawl by routing every TB_* read
through flags.py; this test pins the invariant so a future module can't
quietly reintroduce a scattered `os.environ` read that changes the compiled
program out from under the config system (the footgun flags.py exists to
prevent — see its module docstring).
"""

import dataclasses
import os
import re
from pathlib import Path

from trafficbotsv15_tpu.ops import flags

PKG = Path(flags.__file__).resolve().parents[1]  # trafficbotsv15_tpu/


def test_flags_is_the_only_env_read_point():
    pattern = re.compile(r"os\.environ|os\.getenv|getenv\(")
    offenders = []
    for sub in ("models", "ops"):
        for path in sorted((PKG / sub).rglob("*.py")):
            if path.name == "flags.py":
                continue
            for lineno, line in enumerate(path.read_text().splitlines(), 1):
                code = line.split("#", 1)[0]
                if pattern.search(code):
                    offenders.append(f"{path.relative_to(PKG)}:{lineno}: {line.strip()}")
    assert not offenders, (
        "env reads outside ops/flags.py (route them through flags.get() / "
        "a flags.py accessor instead):\n" + "\n".join(offenders)
    )


def test_env_table_matches_opscfg_fields():
    # every OpsCfg field has an env override and vice versa
    fields = {f.name for f in dataclasses.fields(flags.OpsCfg)}
    assert fields == set(flags._ENV.keys())


def test_configure_then_env_override_precedence(monkeypatch):
    monkeypatch.delenv("TB_KNN_PALLAS", raising=False)
    try:
        flags.configure(flags.OpsCfg(knn_pallas=False))
        assert flags.get().knn_pallas is False  # config default wins ...
        monkeypatch.setenv("TB_KNN_PALLAS", "1")
        assert flags.get().knn_pallas is True  # ... until the env A/B override
    finally:
        flags.configure(None)


def test_seg_attn_and_dense_knn_max_accessors(monkeypatch):
    monkeypatch.delenv("TB_SEG_ATTN", raising=False)
    monkeypatch.delenv("TB_DENSE_KNN_MAX", raising=False)
    assert flags.seg_attn(True) is True and flags.seg_attn(False) is False
    assert flags.dense_knn_max(128) == 128
    monkeypatch.setenv("TB_SEG_ATTN", "0")
    monkeypatch.setenv("TB_DENSE_KNN_MAX", "64")
    assert flags.seg_attn(True) is False
    assert flags.dense_knn_max(128) == 64
