"""The reference-objective mode (TrainConfig.objective, VERDICT r2 item 4):
raw NLL (no Huber), unbounded outputs, beta=0, Adam eps 1e-8, fp32/HIGHEST —
the reference repo's exact training objective [P eq. 2] — vs the stabilized
production default. Oracle: the same dense-numpy reference as
tests/test_estimator.py evaluated on the RAW network outputs with the plain
quadratic and no pixel weighting."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu.config import (
    ModelConfig,
    NoiseConfig,
    NoiseModel,
    NoiseValue,
    TrainConfig,
    to_json,
    train_config_from_json,
)
from ssdn_tpu.estimator import nll, posterior_mean

from tests.test_estimator import dense_reference, rand_outputs
from tests.test_train_step import run_steps, tiny_cfg


def test_reference_nll_matches_raw_dense_gray():
    out, y = rand_outputs(1, seed=10)
    sigma = np.array([25.0, 10.0], np.float32) / 255.0
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.KNOWN)
    params = {"sigma": jnp.asarray(sigma)}
    loss, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, params,
                  beta=0.0, robust=False, bound=False)
    var = np.broadcast_to((sigma ** 2)[:, None, None, None], y.shape)
    # raw outputs (no tanh), plain quadratic (no Huber), no beta weight
    ref_nll, _, _ = dense_reference(out[..., :1], out[..., 1:2], y, var,
                                    robust=False)
    np.testing.assert_allclose(float(loss), ref_nll.mean(), rtol=1e-5)


def test_reference_nll_matches_raw_dense_rgb():
    out, y = rand_outputs(3, seed=11)
    sigma = np.array([25.0, 40.0], np.float32) / 255.0
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.KNOWN)
    params = {"sigma": jnp.asarray(sigma)}
    loss, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, params,
                  beta=0.0, robust=False, bound=False)
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, params,
                          bound=False)
    var = np.broadcast_to((sigma ** 2)[:, None, None, None], y.shape)
    ref_nll, ref_post, _ = dense_reference(out[..., :3], out[..., 3:9], y,
                                           var, robust=False)
    np.testing.assert_allclose(float(loss), ref_nll.mean(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(post), ref_post, rtol=1e-3,
                               atol=1e-4)


def test_unbounded_outputs_pass_through():
    """With bound=False, extreme network outputs reach the estimator raw
    (the tanh bound would clamp mu at +-2)."""
    out, y = rand_outputs(1, seed=12)
    out[..., 0] = 7.5  # far beyond the mu bound L=2
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.KNOWN)
    params = {"sigma": jnp.full((2,), 100.0)}  # noise dominates: post ~ mu
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, params,
                          bound=False)
    np.testing.assert_allclose(np.asarray(post), 7.5, atol=1e-3)
    bounded = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, params,
                             bound=True)
    assert float(jnp.max(jnp.abs(bounded))) < 2.0 + 1e-6


def test_reference_objective_config_enforcement():
    cfg = TrainConfig(
        objective="reference",
        model=ModelConfig(conv_precision="default"),
        nll_beta=1.0,
        adam_eps=1e-3,
    )
    # the mode is a complete preset: every half-measure is overridden,
    # and the "auto" dtype resolves to the conservative fp32 default
    assert cfg.nll_beta == 0.0
    assert cfg.adam_eps == 1e-8
    assert cfg.model.compute_dtype == "float32"
    assert cfg.model.conv_precision == "highest"
    assert not cfg.robust_nll and not cfg.bound_outputs
    # an EXPLICIT compute_dtype is respected (round-4: the r1 instability
    # that motivated unconditional forcing was proven to be corpus
    # memorization, so bf16 + reference is a supported measured config)
    fast = TrainConfig(
        objective="reference",
        model=ModelConfig(compute_dtype="bfloat16"),
    )
    assert fast.model.compute_dtype == "bfloat16"
    assert fast.nll_beta == 0.0 and fast.adam_eps == 1e-8
    # stabilized "auto" resolves to bfloat16
    assert TrainConfig().model.compute_dtype == "bfloat16"
    # and it round-trips through the checkpoint config serialization
    cfg2 = train_config_from_json(to_json(cfg))
    assert cfg2.objective == "reference"
    assert not cfg2.robust_nll and cfg2.adam_eps == 1e-8

    default = TrainConfig()
    assert default.objective == "stabilized"
    assert default.robust_nll and default.bound_outputs

    with pytest.raises(ValueError):
        TrainConfig(objective="huber")


def test_reference_objective_trains():
    """A few steps of the exact reference objective on CPU: finite loss,
    finite params, and deterministic across runs."""
    cfg = dataclasses.replace(tiny_cfg(), objective="reference")
    assert cfg.nll_beta == 0.0 and not cfg.robust_nll
    state, losses = run_steps(cfg, 8)
    assert np.isfinite(losses).all()
    for leaf in jax.tree.leaves(state.params):
        assert bool(jnp.isfinite(leaf).all())
    _, losses2 = run_steps(cfg, 8)
    assert losses == losses2
    # the stabilized objective on the same data gives a DIFFERENT loss
    # stream (different estimator), proving the axis is actually wired
    _, losses_stab = run_steps(tiny_cfg(), 8)
    assert losses != losses_stab
