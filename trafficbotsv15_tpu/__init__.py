"""TrafficBots V1.5 — TPU-native reimplementation.

A JAX/XLA/Pallas framework with the capabilities of zhejz/TrafficBotsV1.5
(TrafficBots CVAE policy + HPTR pairwise-relative KNN transformer, trained and
evaluated on the Waymo Open Motion Dataset for WOSAC and WOMD challenges),
re-designed TPU-first:

- the closed-loop rollout is a single fixed-shape ``jax.lax.scan``
- the 32/128 WOSAC joint futures are a vmapped/sharded replica axis
- KNN-RPE attention (KNARPE) runs as a fused Pallas kernel on the MXU
- data-parallel training uses GSPMD/`jax.sharding` over a device mesh
"""

__version__ = "0.1.0"
