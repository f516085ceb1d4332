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


def _is_proc0() -> bool:
    import jax

    return jax.process_index() == 0


def _barrier(tag: str) -> None:
    """Cross-host sync point; no-op single-process (incl. this image)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


# Param renames across framework versions: round 2 replaced the kv Dense
# submodule with explicit params (kv_proj/{kernel,bias} -> kv_w/kv_b) and the
# per-layer target LayerNorm submodule with explicit scale/bias params
# (norm_tgt/{scale,bias} -> norm_tgt_{scale,bias}) so LN folding and concat
# matmuls work on raw weights. Checkpoints written before that rename are
# migrated transparently at restore time.
_PARAM_RENAMES = {
    "kv_w": ("kv_proj", "kernel"),
    "kv_b": ("kv_proj", "bias"),
    "norm_tgt_scale": ("norm_tgt", "scale"),
    "norm_tgt_bias": ("norm_tgt", "bias"),
}


def migrate_param_tree(full: Any, example: Any) -> Any:
    """Project a raw restored tree onto the example tree's structure, applying
    known historical param renames (see _PARAM_RENAMES) and dropping entries
    the example does not request (e.g. opt_state when eval only wants params).
    Raises KeyError naming the first leaf that cannot be resolved."""
    if not isinstance(example, dict):
        return full
    if not isinstance(full, dict):
        raise KeyError(f"checkpoint holds a leaf where a subtree was expected: {example.keys()}")
    out = {}
    for k, ex_v in example.items():
        if k in full:
            out[k] = migrate_param_tree(full[k], ex_v)
        elif k in _PARAM_RENAMES:
            old_mod, old_leaf = _PARAM_RENAMES[k]
            sub = full.get(old_mod)
            if isinstance(sub, dict) and old_leaf in sub:
                out[k] = sub[old_leaf]
            else:
                raise KeyError(f"checkpoint missing param {k!r} (also tried {old_mod}/{old_leaf})")
        else:
            raise KeyError(f"checkpoint missing entry {k!r}")
    return out


class CheckpointManager:
    def __init__(self, ckpt_dir: str, keep_best: bool = True):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_best = keep_best
        # persist top-1 ranking across process restarts (resumed fits must not
        # overwrite a better historical "best" with a worse score)
        self.best_score: Optional[float] = None
        best_meta = self.dir / "best.json"
        if best_meta.exists():
            score = json.loads(best_meta.read_text()).get("meta", {}).get("score")
            if score is not None:
                self.best_score = float(score)
        # StandardCheckpointer IS an orbax AsyncCheckpointer: save() returns
        # once the device->host copy is done and writes to disk in background.
        self._ckptr = ocp.StandardCheckpointer()
        self._pending = None  # (name, tmp_path, json_payload) of an in-flight save

    def _finalize_pending(self):
        """Complete an in-flight async save: wait for the background write,
        then atomically swap tmp -> final (keeping the previous checkpoint at
        <name>.old until the swap is through, so a crash at any point leaves
        either the old or the new checkpoint restorable) and write the json.

        Multi-host: orbax save() is a collective (every process writes its
        addressable shards into tmp); the swap + json are filesystem-level and
        run on process 0 only, fenced by barriers so no process finalizes
        before all shards are durable or restores before the swap is visible."""
        if self._pending is None:
            return
        import shutil

        name, tmp, payload = self._pending
        self._pending = None
        self._ckptr.wait_until_finished()
        _barrier(f"ckpt_written_{name}")
        if _is_proc0():
            final, old = self.dir / name, self.dir / f"{name}.old"
            if final.exists():
                # drop any older .old only when final is here to replace it —
                # after a crash that left just .old, it stays restorable until
                # the new checkpoint is fully in place
                if old.exists():
                    shutil.rmtree(old)
                final.rename(old)
            tmp.rename(final)
            (self.dir / f"{name}.json").write_text(payload)
            if old.exists():
                shutil.rmtree(old)
        _barrier(f"ckpt_swapped_{name}")

    def wait(self):
        """Block until any in-flight async save is durable. Call before the
        process exits (fit() does) — an unfinalized save is discarded on
        restart exactly like a save interrupted by preemption."""
        self._finalize_pending()

    def _save(self, name: str, state: Dict[str, Any], cfg: ExperimentCfg,
              meta: Dict[str, Any], block: bool = True):
        self._finalize_pending()
        import shutil

        tmp = self.dir / f"{name}.tmp"
        if _is_proc0() and tmp.exists():
            shutil.rmtree(tmp)  # stale leftover from a crashed save
        _barrier(f"ckpt_tmp_clean_{name}")
        self._ckptr.save(tmp, state)
        self._pending = (name, tmp, json.dumps({"config": config_to_dict(cfg), "meta": meta}))
        if block:
            self._finalize_pending()

    def _resolve(self, name: str) -> Path:
        """Checkpoint path for `name`, falling back to the pre-swap `.old`
        copy if a crash hit the finalize window between renames."""
        path = self.dir / name
        if not path.exists() and (self.dir / f"{name}.old").exists():
            return self.dir / f"{name}.old"
        return path

    def save_last(self, state, cfg: ExperimentCfg, meta: Dict[str, Any]):
        """Async: returns after the device->host copy; the disk write overlaps
        training and is finalized by the next save/restore/wait()."""
        self._save("last", state, cfg, meta, block=False)

    def save_best(self, state, cfg: ExperimentCfg, score: float, meta: Dict[str, Any]):
        """Keep top-1 on val/loss (lower is better), like ModelCheckpointWB.
        Synchronous: a True return means the ranking is durable on disk."""
        if self.best_score is None or score < self.best_score:
            self.best_score = score
            self._save("best", state, cfg, {**meta, "score": score})
            return True
        return False

    def restore_resume(
        self, example_builders: Dict[str, Any], name: str = "last",
    ) -> Tuple[Dict[str, Any], ExperimentCfg, Dict[str, Any]]:
        """Restore a fit checkpoint for training resumption.

        A "last" checkpoint holds a flag-dependent subset of
        {params, opt_state, ema, swa, swa_state}; `example_builders` maps each
        entry name to a zero-arg callable producing its example pytree (the
        opt_state example is what gives optax its NamedTuple structure back —
        a raw restore would return plain dicts). Entries present in the
        checkpoint but missing a builder are restored raw; builders without a
        matching checkpoint entry are skipped (e.g. resuming a no-EMA run with
        ema_decay now on starts a fresh EMA).
        """
        self._finalize_pending()
        path = self._resolve(name)
        # entry names (and, for builder-less entries, array shapes) come from
        # the checkpoint metadata — reading the data itself here would double
        # resume-time I/O and transiently hold two copies of training state
        md_tree = self._ckptr.metadata(path).item_metadata.tree
        import jax

        def _md_example(t):
            return jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype), t)

        example = {
            k: (example_builders[k]() if k in example_builders else _md_example(md_tree[k]))
            for k in md_tree
        }
        state = self._ckptr.restore(path, example)
        info = json.loads((self.dir / f"{name}.json").read_text())
        return state, config_from_dict(info["config"]), info["meta"]

    def restore(
        self, name: str = "last", example_state: Optional[Dict[str, Any]] = None,
        config_overrides: Optional[Dict[str, Any]] = None,
    ) -> Tuple[Dict[str, Any], ExperimentCfg, Dict[str, Any]]:
        self._finalize_pending()
        path = self._resolve(name)
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
            except (ValueError, KeyError):
                # partial restore (the checkpoint holds more entries than
                # requested — fit saves params+opt_state(+ema/swa); eval only
                # wants params) and/or a pre-rename param tree: restore raw,
                # then project onto the example tree with rename migration
                full = self._ckptr.restore(path)
                state = migrate_param_tree(full, example_state)
        else:
            state = self._ckptr.restore(path)
        return state, cfg, info["meta"]
