"""Checkpoint save/restore via Orbax.

Parity target: the reference's ModelCheckpointWB + resume path
(/root/reference/src/callbacks/wandb_callbacks.py:27-77, run.py:32-46):
keep best-on-val-loss + last, store hyperparameters with the weights, and
support "morph-for-submission" config overrides at restore time
(configs/resume/submission.yaml semantics via `config_overrides`).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from trafficbotsv15_tpu.config import ExperimentCfg, config_from_dict, config_to_dict


class CheckpointManager:
    def __init__(self, ckpt_dir: str, keep_best: bool = True):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_best = keep_best
        self.best_score: Optional[float] = None
        self._ckptr = ocp.StandardCheckpointer()

    def _save(self, name: str, state: Dict[str, Any], cfg: ExperimentCfg, meta: Dict[str, Any]):
        path = self.dir / name
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        (self.dir / f"{name}.json").write_text(
            json.dumps({"config": config_to_dict(cfg), "meta": meta})
        )

    def save_last(self, state, cfg: ExperimentCfg, meta: Dict[str, Any]):
        self._save("last", state, cfg, meta)

    def save_best(self, state, cfg: ExperimentCfg, score: float, meta: Dict[str, Any]):
        """Keep top-1 on val/loss (lower is better), like ModelCheckpointWB."""
        if self.best_score is None or score < self.best_score:
            self.best_score = score
            self._save("best", state, cfg, {**meta, "score": score})
            return True
        return False

    def restore(
        self, name: str = "last", example_state: Optional[Dict[str, Any]] = None,
        config_overrides: Optional[Dict[str, Any]] = None,
    ) -> Tuple[Dict[str, Any], ExperimentCfg, Dict[str, Any]]:
        path = self.dir / name
        info = json.loads((self.dir / f"{name}.json").read_text())
        cfg_dict = info["config"]
        if config_overrides:
            def deep_update(d, u):
                for k, v in u.items():
                    if isinstance(v, dict) and isinstance(d.get(k), dict):
                        deep_update(d[k], v)
                    else:
                        d[k] = v
            deep_update(cfg_dict, config_overrides)
        cfg = config_from_dict(cfg_dict)
        if example_state is not None:
            try:
                state = self._ckptr.restore(path, example_state)
            except ValueError:
                # partial restore: the checkpoint holds more top-level entries
                # than requested (fit saves params+opt_state(+ema/swa); eval
                # only wants params) — restore raw and subset
                full = self._ckptr.restore(path)
                missing = set(example_state) - set(full)
                if missing:
                    raise
                state = {k: full[k] for k in example_state}
        else:
            state = self._ckptr.restore(path)
        return state, cfg, info["meta"]
