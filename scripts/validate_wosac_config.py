#!/usr/bin/env python
"""Diff the native WOSAC constants against the official 2024 challenge config.

Run on a machine with `waymo_open_dataset` installed (it is not part of this
image). Loads `wdl_limited/sim_agents_metrics/challenge_2024_config.textproto`
exactly as the reference does (/root/reference/src/models/metrics/wosac.py:99-105)
and compares every histogram range / bin count / smoothing pseudocount /
metametric weight against trafficbotsv15_tpu.eval.wosac_likelihood
.CHALLENGE_2024_CONFIG. Exits 1 and prints a per-field report on any mismatch,
so CI on a waymo-enabled machine certifies the transcription.

Usage: python scripts/validate_wosac_config.py
"""

from __future__ import annotations

import sys


def main() -> int:
    try:
        from google.protobuf import text_format
        from pathlib import Path
        from waymo_open_dataset.protos import sim_agents_metrics_pb2
        from waymo_open_dataset.wdl_limited import sim_agents_metrics as wosac_metrics
    except ImportError as e:
        print(f"SKIP: waymo_open_dataset not available ({e}); nothing validated.")
        return 0

    from trafficbotsv15_tpu.eval.wosac_likelihood import CHALLENGE_2024_CONFIG

    config_path = Path(wosac_metrics.__file__).parent / "challenge_2024_config.textproto"
    config = sim_agents_metrics_pb2.SimAgentMetricsConfig()
    text_format.Parse(config_path.read_text(), config)

    failures = []

    def check(field: str, ours, official, what: str):
        if isinstance(ours, float) or isinstance(official, float):
            ok = abs(float(ours) - float(official)) < 1e-9
        else:
            ok = ours == official
        status = "ok" if ok else "MISMATCH"
        print(f"{field:32s} {what:28s} ours={ours!r:16} official={official!r:16} {status}")
        if not ok:
            failures.append((field, what, ours, official))

    for name, ours in CHALLENGE_2024_CONFIG.items():
        official = getattr(config, name)
        check(name, ours["metametric_weight"], official.metametric_weight, "metametric_weight")
        check(name, ours["independent_timesteps"], official.independent_timesteps,
              "independent_timesteps")
        if "histogram" in ours:
            h = ours["histogram"]
            check(name, h.val_min, official.histogram.min_val, "histogram.min_val")
            check(name, h.val_max, official.histogram.max_val, "histogram.max_val")
            check(name, h.num_bins, official.histogram.num_bins, "histogram.num_bins")
            check(name, h.additive_smoothing,
                  official.histogram.additive_smoothing_pseudocount,
                  "histogram.smoothing")
        else:
            check(name, ours["bernoulli_smoothing"],
                  official.bernoulli.additive_smoothing_pseudocount,
                  "bernoulli.smoothing")

    if failures:
        print(f"\n{len(failures)} mismatching constants — update CHALLENGE_2024_CONFIG:")
        for field, what, ours, official in failures:
            print(f'  "{field}" {what}: {ours!r} -> {official!r}')
        return 1
    print("\nAll native WOSAC constants match the official 2024 challenge config.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
