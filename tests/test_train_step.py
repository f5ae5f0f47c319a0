"""Integration: one/a-few training steps on CPU (SURVEY.md §4 integration
row 1): loss finite and decreasing on a tiny fixed problem; determinism
across runs at the same seed; every pipeline trains."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu.config import (
    ModelConfig,
    Pipeline,
    TrainConfig,
    parse_noise_style,
)
from ssdn_tpu.data import PatchSampler, synthetic_dataset
from ssdn_tpu.train.step import (
    init_state,
    blind_reg_schedule,
    lr_schedule,
    make_train_step,
    pipeline_blindspot,
)


def tiny_cfg(pipeline=Pipeline.SSDN, noise="gauss25", blind=False, gray=True,
             iterations=60):
    return TrainConfig(
        pipeline=pipeline,
        noise=parse_noise_style(noise, blind=blind),
        model=ModelConfig(
            in_channels=1 if gray else 3, compute_dtype="float32",
            # narrow widths: same architecture/invariants, ~8x fewer FLOPs
            # (suite wall-clock, VERDICT r2 item 8)
            enc_features=16, dec_features=32, nin_a_features=64,
            nin_b_features=32,
        ),
        patch_size=32,
        batch_size=4,
        iterations=iterations,
        lr=1e-3,
        seed=0,
        grayscale=gray,
    )


def run_steps(cfg, n, state=None):
    ds = synthetic_dataset(n=8, size=64, channels=3, seed=1,
                           grayscale=cfg.grayscale)
    sampler = PatchSampler(ds, cfg.patch_size, cfg.batch_size, seed=cfg.seed)
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    state = state or init_state(cfg)
    losses = []
    for i in range(n):
        state, m = step(state, jnp.asarray(sampler.sample(int(state.step))))
        losses.append(float(m["loss"]))
    return state, losses


def test_ssdn_loss_decreases():
    _, losses = run_steps(tiny_cfg(), 50)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.1


def test_determinism_same_seed():
    cfg = tiny_cfg()
    s1, l1 = run_steps(cfg, 5)
    s2, l2 = run_steps(cfg, 5)
    assert l1 == l2
    leaves1 = jax.tree.leaves(s1.params)
    leaves2 = jax.tree.leaves(s2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize(
    "pipeline,noise,blind,gray",
    [
        (Pipeline.SSDN, "gauss25", False, True),     # [B] config 1
        (Pipeline.SSDN, "gauss5_50", True, False),   # [B] config 2
        (Pipeline.SSDN, "poisson30", False, False),  # [B] config 3
        (Pipeline.SSDN, "impulse50", False, False),  # [B] config 4
        (Pipeline.SSDN, "poisson5_50", True, False),   # [P] blind-lambda
        (Pipeline.SSDN, "impulse30_60", True, False),  # [P] blind-alpha
        (Pipeline.SSDN_MSE, "gauss25", False, True),
        (Pipeline.N2C, "gauss25", False, False),
        (Pipeline.N2N, "gauss25", False, True),
    ],
)
def test_every_pipeline_steps(pipeline, noise, blind, gray):
    cfg = tiny_cfg(pipeline, noise, blind, gray)
    state, losses = run_steps(cfg, 2)
    assert np.isfinite(losses).all()
    assert int(state.step) == 2
    for leaf in jax.tree.leaves(state.params):
        assert bool(jnp.isfinite(leaf).all())


def test_lr_schedule_rampdown():
    cfg = tiny_cfg(iterations=100)
    sched = lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(cfg.lr)
    assert float(sched(69)) == pytest.approx(cfg.lr, rel=1e-3)
    assert float(sched(85)) < cfg.lr * 0.6
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def test_blind_reg_schedule():
    # default: constant barrier at every step
    cfg = tiny_cfg(noise="gauss5_50", blind=True, iterations=100)
    sched = blind_reg_schedule(cfg)
    assert float(sched(0)) == pytest.approx(cfg.blind_reg)
    assert float(sched(100)) == pytest.approx(cfg.blind_reg)
    # rampdown over the last half: constant before, cosine to 0 after
    cfg = dataclasses.replace(cfg, blind_reg_rampdown_frac=0.5)
    sched = blind_reg_schedule(cfg)
    assert float(sched(0)) == pytest.approx(cfg.blind_reg)
    assert float(sched(49)) == pytest.approx(cfg.blind_reg, rel=1e-3)
    assert float(sched(75)) == pytest.approx(cfg.blind_reg * 0.5, rel=1e-6)
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)


def test_blind_reg_rampdown_trains():
    # the barrier weight is a traced function of state.step inside the
    # jitted program; a short blind run with full-length rampdown must
    # stay finite end to end (the final steps run at ~zero barrier)
    cfg = dataclasses.replace(
        tiny_cfg(noise="gauss5_50", blind=True, iterations=4),
        blind_reg_rampdown_frac=1.0,
    )
    state, losses = run_steps(cfg, 4)
    assert np.isfinite(losses).all()
    assert int(state.step) == 4


def test_blindspot_flag_per_pipeline():
    assert pipeline_blindspot(Pipeline.SSDN)
    assert pipeline_blindspot(Pipeline.SSDN_MSE)
    assert not pipeline_blindspot(Pipeline.N2C)
    assert not pipeline_blindspot(Pipeline.N2N)
