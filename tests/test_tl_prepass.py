"""TL pre-pass (sim/tl_prepass.py) semantic parity vs the in-scan TL path.

The hoisted TL subsystem must reproduce the legacy rollout bit-for-bit up to
float reassociation: same TL features feeding the agent encoder, same TL state
trajectory, same NLL. Covers both regimes — fully-forced (reactive replay /
training) and free-running beyond the GT horizon (joint-future prediction).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.train.evaluation import joint_future_pred, reactive_replay
from trafficbotsv15_tpu.train.pipeline import build_model, init_params, training_forward


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=2, seed=3).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(0))
    return cfg, batch, model, params


def _buffers_close(b0, b1, atol, mismatch_frac=0.0):
    """allclose over every buffer leaf; mismatch_frac > 0 tolerates a small
    share of out-of-band elements (closed-loop chaos amplifies reassociation-
    level float diffs over the rollout horizon — a random-init policy has no
    contraction, so late-step poses can drift visibly from ~1e-6 inputs)."""
    t0 = jax.tree_util.tree_leaves(b0)
    t1 = jax.tree_util.tree_leaves(b1)
    assert len(t0) == len(t1)
    for a, b in zip(t0, t1):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        bad = np.abs(a - b) > atol
        if mismatch_frac == 0.0:
            np.testing.assert_allclose(a, b, atol=atol)
        else:
            assert bad.mean() <= mismatch_frac, (bad.mean(), np.abs(a - b).max())


@pytest.mark.slow
def test_joint_future_parity(setup):
    """Free-running regime: TL leaves the GT horizon after 11 steps and
    evolves via the predictor — pre-pass on un-replicated scenarios must
    match the in-scan trajectory on the K-replicated batch."""
    cfg, batch, model, params = setup
    cfg_on = dataclasses.replace(cfg, tl_prepass=True)
    cfg_off = dataclasses.replace(cfg, tl_prepass=False)
    _, b_on = joint_future_pred(cfg_on, model, params, batch, jax.random.PRNGKey(7), n_joint_future=3)
    _, b_off = joint_future_pred(cfg_off, model, params, batch, jax.random.PRNGKey(7), n_joint_future=3)
    # TL state trajectory is discrete (one-hot): must be exactly equal
    np.testing.assert_array_equal(np.asarray(b_on.tl_state), np.asarray(b_off.tl_state))
    _buffers_close(b_on, b_off, atol=2e-4)


def test_forced_windows_match_scan(setup):
    """The batched-window math itself: tl_rollout_forced (vmapped windows)
    must reproduce tl_rollout_scan (shift register, == legacy in-scan path)
    on the same fully-forced trajectory, feature-for-feature."""
    from trafficbotsv15_tpu.sim import tl_prepass
    from trafficbotsv15_tpu.data.preprocessing import pre_processing
    from trafficbotsv15_tpu.train.evaluation import encode_scene

    cfg, batch, model, params = setup
    pp = pre_processing(batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
                        n_step_hist=cfg.n_step_hist, training=True)
    _, tl_tokens = encode_scene(cfg, model, params, pp)
    gt = pp.gt_tl_state.astype(jnp.float32)
    n = cfg.time_step_end
    w = cfg.model.temp_window_size
    forced = tl_prepass.tl_rollout_forced(model, params, tl_tokens, gt, n, w)
    scanned = tl_prepass.tl_rollout_scan(
        model, params, tl_tokens, gt, jnp.ones(gt.shape[:3], bool), n, w)
    np.testing.assert_array_equal(np.asarray(forced["state"]), np.asarray(scanned["state"]))
    np.testing.assert_allclose(np.asarray(forced["feature"]), np.asarray(scanned["feature"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(forced["logits"]), np.asarray(scanned["logits"]),
                               atol=1e-5)


def test_prepass_fires_under_jit_trace(setup, monkeypatch):
    """The forced pre-pass must engage INSIDE jit, not just eagerly: under
    omnistaging even jnp.ones is a tracer, so a value-based all-True gate
    silently falls back to the in-scan TL path in every jitted step while
    eager parity tests keep passing (regression test for exactly that bug).
    Asserts tl_rollout_forced is reached while TRACING training_forward and
    reactive_replay, and that a genuinely partial mask still gates it off."""
    from trafficbotsv15_tpu.sim import tl_prepass
    from trafficbotsv15_tpu.train.evaluation import reactive_replay

    cfg, batch, model, params = setup
    calls = []
    orig = tl_prepass.tl_rollout_forced
    monkeypatch.setattr(tl_prepass, "tl_rollout_forced",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])

    jax.make_jaxpr(
        lambda p: training_forward(cfg, model, p, batch, jax.random.PRNGKey(1))[0]
    )(params)
    assert calls, "training_forward did not take the TL pre-pass under trace"

    n_train = len(calls)
    jax.make_jaxpr(
        lambda p: reactive_replay(cfg, model, p, batch, jax.random.PRNGKey(2))[1].pred_pose
    )(params)
    assert len(calls) > n_train, "reactive_replay did not take the TL pre-pass under trace"

    # a partial mask must NOT pass the gate
    partial = jnp.ones((2, 3, 5), bool).at[0, 0, 0].set(False)
    assert not tl_prepass.fully_forced(partial)
    ones = jnp.ones((2, 3, 5), bool)
    assert tl_prepass.fully_forced(ones)
    assert tl_prepass.fully_forced(ones, ones)


@pytest.mark.slow
def test_reactive_replay_parity(setup):
    """Fully-forced regime end-to-end. The vmapped TL encode reassociates
    float reductions, and the closed loop amplifies ~1e-6 feature diffs
    through 20 dynamics steps — poses may drift a few mm (the feature-level
    equivalence is pinned tightly by test_forced_windows_match_scan)."""
    cfg, batch, model, params = setup
    cfg_on = dataclasses.replace(cfg, tl_prepass=True)
    cfg_off = dataclasses.replace(cfg, tl_prepass=False)
    _, b_on, *_ = reactive_replay(cfg_on, model, params, batch, jax.random.PRNGKey(5))
    _, b_off, *_ = reactive_replay(cfg_off, model, params, batch, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(b_on.tl_state), np.asarray(b_off.tl_state))
    _buffers_close(b_on, b_off, atol=2e-2, mismatch_frac=0.02)


def _zero_dropout(obj):
    """Recursively zero every *dropout* rate in a config dataclass tree, so
    the two TL paths draw no random masks and differ only by reassociation."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        upd = {}
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            if "dropout" in f.name and isinstance(v, float):
                upd[f.name] = 0.0
            elif dataclasses.is_dataclass(v) and not isinstance(v, type):
                upd[f.name] = _zero_dropout(v)
        return dataclasses.replace(obj, **upd)
    return obj


@pytest.mark.slow
def test_training_loss_and_grads(setup):
    """Training still differentiates through the hoisted TL encode: the TL
    encoder/predictor params get nonzero grads (NLL + ag2tl attention), and
    the dropout-free loss matches the legacy path. Grad tolerance is loose —
    the closed loop is chaotic, so reassociation-level feature diffs amplify
    through the 20-step BPTT chain (exact math is pinned by
    test_forced_windows_match_scan)."""
    cfg, batch, model, params = setup
    cfg_nodrop = _zero_dropout(cfg)
    # dropout rates are baked into the flax modules at construction, so the
    # model must be rebuilt from the zeroed config (params are reusable:
    # dropout has no parameters). Otherwise the two TL paths draw different
    # dropout masks (scan-body keys vs k_tlpre) and diverge legitimately.
    model = build_model(cfg_nodrop)
    # full agent teacher forcing: every step's carry is reset to GT, so the
    # closed loop cannot compound reassociation-level TL-feature diffs into
    # flipped collision indicators / drifting rewards — the two paths then
    # differ by float noise only
    tf_full = dataclasses.replace(cfg_nodrop.teacher_forcing_training, step_horizon=10_000)
    cfg_on = dataclasses.replace(cfg_nodrop, tl_prepass=True, teacher_forcing_training=tf_full)
    cfg_off = dataclasses.replace(cfg_nodrop, tl_prepass=False, teacher_forcing_training=tf_full)

    def loss_fn(cfg_x):
        def f(p):
            loss, _ = training_forward(cfg_x, model, p, batch, jax.random.PRNGKey(11))
            return loss
        return jax.value_and_grad(f)(params)

    l_on, g_on = loss_fn(cfg_on)
    l_off, g_off = loss_fn(cfg_off)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-4)
    tl_g = jax.tree_util.tree_leaves(g_on["tl_encoder"]) + jax.tree_util.tree_leaves(g_on["tl_state_predictor"])
    assert any(float(jnp.abs(g).max()) > 0 for g in tl_g), "TL params got no gradient"
    for a, b in zip(jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(1e-6, float(np.abs(b).max()))
        assert float(np.abs(a - b).max()) / denom < 0.02
