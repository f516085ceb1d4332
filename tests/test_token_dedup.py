"""K-futures static-token dedup (sim/rollout.py token_rep): bit-parity vs the
replicated path, and the gather plumbing it rides on.

The dedup keeps ONE copy of the map/TL tokens per unique scenario and folds
the K future-replicas into the agent axis of the per-step gathers. It is
default OFF on measurement (-2.5% whole-rollout on v5e, PERF.md chain12) but
stays available behind cfg.rollout_token_dedup / BENCH_TOKEN_DEDUP=1, so its
exactness contract needs a standing test: reshaping replica rows into the
source axis must not change a single bit of the rollout buffer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.ops.rpe import gather_tgt, get_tgt_knn_lazy
from trafficbotsv15_tpu.train.evaluation import joint_future_pred
from trafficbotsv15_tpu.train.pipeline import build_model, init_params


def test_gather_tgt_rep_matches_replicated():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    feat_u = jax.random.normal(k1, (2, 16, 8))  # unique scenarios
    idx = jax.random.randint(k2, (6, 5, 3), 0, 16)  # 6 rows = 2 scenarios x 3 reps
    feat_full = jnp.repeat(feat_u, 3, axis=0)
    ref = gather_tgt(feat_full, idx)
    out = gather_tgt(feat_u, idx, tgt_rep=3)
    assert jnp.array_equal(ref, out)


def test_knn_lazy_rep_matches_replicated():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    src_pose = jax.random.normal(ks[0], (6, 5, 3)) * 10
    src_invalid = jax.random.bernoulli(ks[1], 0.2, (6, 5))
    tgt_pose_u = jax.random.normal(ks[2], (2, 16, 3)) * 10
    tgt_invalid_u = jax.random.bernoulli(ks[3], 0.2, (2, 16))
    tgt_pose = jnp.repeat(tgt_pose_u, 3, axis=0)
    tgt_invalid = jnp.repeat(tgt_invalid_u, 3, axis=0)
    ref = get_tgt_knn_lazy(src_pose, src_invalid, tgt_pose, tgt_invalid, 4, 30.0)
    out = get_tgt_knn_lazy(src_pose, src_invalid, tgt_pose_u, tgt_invalid_u, 4, 30.0,
                           tgt_rep=3)
    for a, b in zip(ref, out):
        assert jnp.array_equal(a, b)


@pytest.fixture(scope="module")
def setup():
    cfg = dataclasses.replace(tiny_config(), tl_prepass=True)
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=2, seed=0).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    return cfg, batch, model, params


@pytest.mark.slow
def test_joint_future_bit_parity(setup):
    """Full joint-future rollout, dedup on vs off: every buffer leaf bit-equal
    (the dedup only reshapes which axis carries the future replicas; all
    per-row arithmetic — KNN select, rpe, attention — is unchanged)."""
    cfg, batch, model, params = setup
    key = jax.random.PRNGKey(7)
    on = dataclasses.replace(cfg, rollout_token_dedup=True)
    off = dataclasses.replace(cfg, rollout_token_dedup=False)
    _, buf_on = joint_future_pred(on, model, params, batch, key, n_joint_future=4,
                                  check_level=1)
    _, buf_off = joint_future_pred(off, model, params, batch, key, n_joint_future=4,
                                   check_level=1)
    for a, b in zip(jax.tree_util.tree_leaves(buf_on), jax.tree_util.tree_leaves(buf_off)):
        assert jnp.array_equal(a, b)


@pytest.mark.slow
def test_dedup_gates_off_without_prepass(setup):
    """rollout_token_dedup without the TL pre-pass must fall back to the
    replicated path (the in-scan TL encoder consumes full-batch windows)."""
    cfg, batch, model, params = setup
    key = jax.random.PRNGKey(9)
    no_pre = dataclasses.replace(cfg, tl_prepass=False, rollout_token_dedup=True)
    ref = dataclasses.replace(cfg, tl_prepass=False, rollout_token_dedup=False)
    _, buf_a = joint_future_pred(no_pre, model, params, batch, key, n_joint_future=2,
                                 check_level=1)
    _, buf_b = joint_future_pred(ref, model, params, batch, key, n_joint_future=2,
                                 check_level=1)
    for a, b in zip(jax.tree_util.tree_leaves(buf_a), jax.tree_util.tree_leaves(buf_b)):
        assert jnp.array_equal(a, b)
