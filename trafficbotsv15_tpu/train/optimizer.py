"""Optimizer: AdamW + grad clipping + StepLR schedule (+ separate navi LR).

Parity target: configs/model/sim_agent.yaml optimizer block and
waymo_motion.py:820-838 (separate navi_predictor param group).
"""

from __future__ import annotations

from typing import Optional

import optax

from trafficbotsv15_tpu.config import OptimizerCfg


def step_lr(base_lr: float, gamma: float, step_epochs: int, steps_per_epoch: int):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (gamma ** (epoch // step_epochs))
    return schedule


def make_optimizer(cfg: OptimizerCfg, steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_schedule(step_lr(cfg.lr, cfg.scheduler_gamma, cfg.scheduler_step_epochs, steps_per_epoch)),
            optax.scale(-1.0) if lr is None else optax.scale(-lr / cfg.lr),
        )

    def wrap(tx):
        if cfg.accumulate_grad_batches > 1:
            return optax.MultiSteps(tx, every_k_schedule=cfg.accumulate_grad_batches)
        return tx

    lr_navi: Optional[float] = cfg.lr_navi
    if lr_navi is None or lr_navi == cfg.lr:
        return wrap(adamw(None))

    def label_fn(params):
        import jax

        def label(path, _):
            top = path[0].key if hasattr(path[0], "key") else str(path[0])
            return "navi" if "navi_predictor" in str(top) else "main"

        return jax.tree_util.tree_map_with_path(label, params)

    return wrap(optax.multi_transform({"main": adamw(None), "navi": adamw(lr_navi)}, label_fn))
