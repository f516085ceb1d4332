"""Fixed-seed golden-value regression tests (SURVEY §4: golden-tensor tests per
encoder + end-to-end loss). Guards against silent numerical regressions in the
encoder stack, rollout and loss assembly. CPU, fp32, fixed seeds.

If an intentional change shifts these values, re-derive them with the
generation snippet in the module docstring history (git log of this file).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trafficbotsv15_tpu.config import tiny_config
from trafficbotsv15_tpu.data.preprocessing import pre_processing
from trafficbotsv15_tpu.data.synthetic import make_batch
from trafficbotsv15_tpu.train.pipeline import build_model, init_params, training_forward

# regenerated 2026-08-21: the TL pre-pass (on by default since round 4, and
# actually firing in training since the trace-gate fix) moves the TL encoder
# out of the scan, so its DROPOUT keys are consumed on a different path —
# the training-loss realization shifts (~1%) while the dropout-free loss
# stays bit-equal prepass-on vs -off (verified before re-pinning; the
# pre-2026-08-21 values are reproduced exactly by tl_prepass=False up to the
# fold_in key-derivation change). mp_feat values unchanged.
GOLDEN = {
    "mp_feat_sum": 675.9125366210938,
    "mp_feat_absmean": 0.9132077097892761,
    "loss": 9.101146697998047,
    "training/vae_kl": 2.745497465133667,
    "training/navi_loss": 1.3392088413238525,
    "training/tl_state_loss": 2.6139004230499268,
}


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = {k: jnp.asarray(v) for k, v in make_batch(cfg.data, n_sc=2, seed=42).items()}
    model = build_model(cfg)
    params = init_params(cfg, model, batch, jax.random.PRNGKey(42))
    return cfg, batch, model, params


def test_map_encoder_golden(setup):
    cfg, batch, model, params = setup
    pp = pre_processing(batch, tl_mode=cfg.model.tl_mode, navi_mode=cfg.model.navi_mode,
                        n_step_hist=cfg.n_step_hist, training=True)
    mp = model.apply({"params": params}, pp.mp_valid, pp.mp_attr, pp.mp_pose, pp.mp_type,
                     method="encode_map")
    np.testing.assert_allclose(float(jnp.sum(mp.feature)), GOLDEN["mp_feat_sum"], rtol=1e-4)
    np.testing.assert_allclose(float(jnp.mean(jnp.abs(mp.feature))), GOLDEN["mp_feat_absmean"], rtol=1e-4)


@pytest.mark.slow
def test_training_loss_golden(setup):
    cfg, batch, model, params = setup
    loss, m = training_forward(cfg, model, params, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(loss), GOLDEN["loss"], rtol=1e-3)
    for k in ("training/vae_kl", "training/navi_loss", "training/tl_state_loss"):
        np.testing.assert_allclose(float(m[k]), GOLDEN[k], rtol=1e-3, err_msg=k)


@pytest.mark.slow
def test_determinism(setup):
    """Same key -> bit-identical loss (determinism by construction, SURVEY §5)."""
    cfg, batch, model, params = setup
    l1, _ = training_forward(cfg, model, params, batch, jax.random.PRNGKey(9))
    l2, _ = training_forward(cfg, model, params, batch, jax.random.PRNGKey(9))
    assert float(l1) == float(l2)
