"""Numeric parity vs torch.distributions (the reference's math substrate).

These tests verify our distribution/loss primitives against PyTorch's
implementations of the same formulas — the strongest parity evidence
available without the WOMD dataset.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from trafficbotsv15_tpu.ops.distributions import (
    DiagGaussian,
    MultiCategorical,
    balanced_kl,
    kl_diag_gaussian,
    kl_multi_categorical,
)
from trafficbotsv15_tpu.sim.dynamics import process_action_multipathpp, update_multipathpp
from trafficbotsv15_tpu.config import DynamicsCfg

RNG = np.random.default_rng(0)


def test_diag_gaussian_log_prob_matches_torch():
    mean = RNG.normal(size=(4, 6)).astype(np.float32)
    std = np.exp(RNG.normal(size=(4, 6)).astype(np.float32) * 0.3)
    x = RNG.normal(size=(4, 6)).astype(np.float32)
    ours = np.asarray(DiagGaussian(jnp.asarray(mean), jnp.asarray(std)).log_prob(jnp.asarray(x)))
    ref = (
        torch.distributions.Independent(
            torch.distributions.Normal(torch.tensor(mean), torch.tensor(std)), 1
        )
        .log_prob(torch.tensor(x))
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_kl_gaussian_matches_torch():
    m1 = RNG.normal(size=(3, 5)).astype(np.float32)
    s1 = np.exp(RNG.normal(size=(3, 5)).astype(np.float32) * 0.2)
    m2 = RNG.normal(size=(3, 5)).astype(np.float32)
    s2 = np.exp(RNG.normal(size=(3, 5)).astype(np.float32) * 0.2)
    ours = np.asarray(kl_diag_gaussian(
        DiagGaussian(jnp.asarray(m1), jnp.asarray(s1)), DiagGaussian(jnp.asarray(m2), jnp.asarray(s2))))
    ref = torch.distributions.kl_divergence(
        torch.distributions.Independent(torch.distributions.Normal(torch.tensor(m1), torch.tensor(s1)), 1),
        torch.distributions.Independent(torch.distributions.Normal(torch.tensor(m2), torch.tensor(s2)), 1),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_kl_categorical_matches_torch():
    l1 = RNG.normal(size=(3, 4, 5)).astype(np.float32)
    l2 = RNG.normal(size=(3, 4, 5)).astype(np.float32)
    ours = np.asarray(kl_multi_categorical(
        MultiCategorical(jnp.asarray(l1)), MultiCategorical(jnp.asarray(l2))))
    ref = torch.distributions.kl_divergence(
        torch.distributions.Independent(
            torch.distributions.OneHotCategorical(logits=torch.tensor(l1)), 1),
        torch.distributions.Independent(
            torch.distributions.OneHotCategorical(logits=torch.tensor(l2)), 1),
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_balanced_kl_matches_torch_formula():
    """DreamerV2 two-sided balanced KL with free nats (metrics/loss.py:39-77):
    max(KL(sg(post)||prior), free) + alpha * max(KL(post||sg(prior)), free)."""
    alpha, free = 0.2, 1.0
    m1 = RNG.normal(size=(6, 4)).astype(np.float32) * 2
    s1 = np.exp(RNG.normal(size=(6, 4)).astype(np.float32) * 0.2)
    m2 = RNG.normal(size=(6, 4)).astype(np.float32)
    s2 = np.exp(RNG.normal(size=(6, 4)).astype(np.float32) * 0.2)
    ours = np.asarray(balanced_kl(
        DiagGaussian(jnp.asarray(m1), jnp.asarray(s1)), DiagGaussian(jnp.asarray(m2), jnp.asarray(s2)),
        alpha, free))
    P = torch.distributions.Independent(torch.distributions.Normal(torch.tensor(m1), torch.tensor(s1)), 1)
    Q = torch.distributions.Independent(torch.distributions.Normal(torch.tensor(m2), torch.tensor(s2)), 1)
    kl = torch.distributions.kl_divergence(P, Q)
    ref = torch.clamp(kl, min=free) + alpha * torch.clamp(kl, min=free)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4)


def test_multipathpp_integrator_matches_torch_formula():
    """tanh-bounded action + midpoint integration (dynamics.py:225-274)."""
    cfg = DynamicsCfg()
    n_sc, n_ag = 2, 5
    pose = RNG.normal(size=(n_sc, n_ag, 3)).astype(np.float32)
    motion = RNG.normal(size=(n_sc, n_ag, 3)).astype(np.float32)
    raw = RNG.normal(size=(n_sc, n_ag, 2)).astype(np.float32)
    ag_type = np.eye(3, dtype=bool)[RNG.integers(0, 3, (n_sc, n_ag))]

    action = np.asarray(process_action_multipathpp(jnp.asarray(raw), jnp.asarray(ag_type), cfg))
    new_pose, new_motion = update_multipathpp(jnp.asarray(pose), jnp.asarray(motion), jnp.asarray(action), cfg.dt)

    t = torch.tensor(raw)
    tanh = torch.tanh(t)
    max_acc = torch.tensor(np.asarray(cfg.max_acc, np.float32))[torch.tensor(ag_type.argmax(-1))]
    max_yr = torch.tensor(np.asarray(cfg.max_yaw_rate, np.float32))[torch.tensor(ag_type.argmax(-1))]
    ref_action = torch.stack([tanh[..., 0] * max_acc, tanh[..., 1] * max_yr], -1)
    np.testing.assert_allclose(action, ref_action.numpy(), rtol=1e-4)

    acc, yr = ref_action[..., 0], ref_action[..., 1]
    pose_t, motion_t = torch.tensor(pose), torch.tensor(motion)
    v_t = motion_t[..., 0] + 0.5 * cfg.dt * acc
    th_t = pose_t[..., 2] + 0.5 * cfg.dt * yr
    dp = torch.stack([v_t * torch.cos(th_t), v_t * torch.sin(th_t), yr], -1)
    ref_pose = pose_t + cfg.dt * dp
    ref_motion = torch.stack([motion_t[..., 0] + cfg.dt * acc, acc, yr], -1)
    np.testing.assert_allclose(np.asarray(new_pose), ref_pose.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_motion), ref_motion.numpy(), rtol=2e-4, atol=1e-5)
