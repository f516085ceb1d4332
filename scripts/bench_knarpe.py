#!/usr/bin/env python
"""Standalone on-chip microbench: KNARPE cross-attention kernel vs XLA paths.

Isolates the per-call cost of the fused Pallas kernel (v2/v3) against the
production XLA formulation (head-segment matmul attention with the fused
kv+rpe concat projection) at exact flagship and scaled rollout shapes —
the whole-rollout A/Bs say WHICH wins; this says WHY (per-op ms + implied
HBM GB/s), feeding the v3 design (docs/PERF.md).

Usage: python scripts/bench_knarpe.py [--shape flagship|scaled] [--iters 50]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="flagship", choices=["flagship", "scaled"])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    if args.shape == "flagship":
        B, S, K, D, R, H = 128, 64, 89, 128, 128, 4
    else:
        B, S, K, D, R, H = 128, 64, 89, 256, 256, 8

    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, S, D), dt)
    tgt = jax.random.normal(ks[1], (B, S, K, D), dt)
    rpe = jax.random.normal(ks[2], (B, S, K, R), dt)
    inv = jax.random.bernoulli(ks[3], 0.2, (B, S, K))
    w_kv = jax.random.normal(ks[4], (D, 2 * D), dt) * 0.05
    w_rpe = jax.random.normal(ks[5], (R, 2 * D), dt) * 0.05
    b = jax.random.normal(ks[6], (2 * D,), dt) * 0.05

    from trafficbotsv15_tpu.ops.attention import knn_attention_fullwidth
    from trafficbotsv15_tpu.ops import pallas_knarpe as pk

    # production XLA path: one concat matmul -> fullwidth halves -> segment attn
    @jax.jit
    def xla_fullwidth(q, tgt, rpe, inv, w_kv, w_rpe, b):
        cat = jnp.concatenate([tgt, rpe], axis=-1)
        w = jnp.concatenate([w_kv, w_rpe], axis=0)
        kv = cat @ w + b
        k, v = jnp.split(kv, 2, axis=-1)
        return knn_attention_fullwidth(q, k, v, inv, H)

    @jax.jit
    def pallas_v2(q, tgt, rpe, inv, w_kv, w_rpe, b):
        return pk.knarpe_cross_attention(q, tgt, rpe, inv, w_kv, w_rpe, b, H)

    variants = [("xla_fullwidth", xla_fullwidth), ("pallas_v2", pallas_v2)]
    if hasattr(pk, "knarpe_cross_attention_v3"):
        @jax.jit
        def pallas_v3(q, tgt, rpe, inv, w_kv, w_rpe, b):
            return pk.knarpe_cross_attention_v3(q, tgt, rpe, inv, w_kv, w_rpe, b, H)

        variants.append(("pallas_v3", pallas_v3))

    # correctness cross-check first
    ref = np.asarray(xla_fullwidth(q, tgt, rpe, inv, w_kv, w_rpe, b), np.float32)
    bytes_in = (tgt.size + rpe.size) * 2  # dominant HBM reads per call
    for name, fn in variants:
        out = np.asarray(fn(q, tgt, rpe, inv, w_kv, w_rpe, b), np.float32)
        err = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-9))
        ms = timeit(fn, q, tgt, rpe, inv, w_kv, w_rpe, b, iters=args.iters)
        print(f"{name:16s} {ms:8.3f} ms   rel_err={err:.2e}   "
              f"input-stream {bytes_in / ms / 1e6:.0f} GB/s")


if __name__ == "__main__":
    main()
