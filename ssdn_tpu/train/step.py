"""The fused training step (SURVEY.md §3.1 hot loop, redesigned).

One jitted program per step: uint8 batch -> normalize -> on-device noise
injection -> rotation-folded blind-spot forward -> NLL -> grads -> Adam.
The reference's process/host boundaries (CPU worker noise injection, 4
sequential branch passes, eager posterior math) all collapse into this one
XLA program ([B]: "on-device fused preprocessing", SURVEY.md §3.5).

RNG discipline: the per-step key is fold_in(key(seed), step) — training is a
pure function of (params0, dataset, seed), and resume-from-checkpoint is
exact with no RNG state to save beyond the step counter (SURVEY.md §7.4
"bit-for-behavior" interpretation (a)).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ssdn_tpu import estimator
from ssdn_tpu.config import Pipeline, TrainConfig
from ssdn_tpu.models import blindspot_unet
from ssdn_tpu.noise import add_noise


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def pipeline_blindspot(pipeline: Pipeline) -> bool:
    return pipeline in (Pipeline.SSDN, Pipeline.SSDN_MSE)


def lr_schedule(cfg: TrainConfig):
    """Constant LR with smooth cosine ramp-down over the final
    `lr_rampdown_frac` of training ([N2N] convention, SURVEY.md §2.1
    trainer row)."""

    def schedule(step):
        t = jnp.asarray(step, jnp.float32) / max(cfg.iterations, 1)
        frac = cfg.lr_rampdown_frac
        if frac <= 0:
            return jnp.asarray(cfg.lr, jnp.float32)
        v = jnp.clip((1.0 - t) / frac, 0.0, 1.0)
        ramp = 0.5 - 0.5 * jnp.cos(v * jnp.pi)
        return cfg.lr * ramp

    return schedule


def blind_reg_schedule(cfg: TrainConfig):
    """Barrier-weight schedule for the blind-noise anti-degeneracy
    regularizer: constant `cfg.blind_reg`, cosined to 0 over the final
    `blind_reg_rampdown_frac` of training (same curve as lr_schedule).
    The barrier's job is early-training rail protection; held constant it
    biases the converged estimate (impulse alpha_hat compresses toward
    0.5 — config.py field note, CALIBRATION_r5.json)."""

    def schedule(step):
        frac = cfg.blind_reg_rampdown_frac
        if frac <= 0:
            return jnp.asarray(cfg.blind_reg, jnp.float32)
        t = jnp.asarray(step, jnp.float32) / max(cfg.iterations, 1)
        v = jnp.clip((1.0 - t) / frac, 0.0, 1.0)
        ramp = 0.5 - 0.5 * jnp.cos(v * jnp.pi)
        return cfg.blind_reg * ramp

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    adam = optax.adam(
        learning_rate=lr_schedule(cfg),
        b1=cfg.adam_b1,
        b2=cfg.adam_b2,
        eps=cfg.adam_eps,
    )
    if cfg.grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), adam)
    return adam


def _blind_const_init(cfg: TrainConfig) -> jnp.ndarray:
    """Raw init for the BLIND_CONST free scalar. Gaussian/Poisson: softplus
    maps it to the noise scale (std in internal [0,1] units) — start at a
    neutral mid-range 0.1 (~sigma 25/255). Impulse: the scaled sigmoid maps
    it to alpha — start at 0 (alpha = 0.5)."""
    from ssdn_tpu.config import NoiseModel

    if cfg.noise.model == NoiseModel.IMPULSE:
        return jnp.zeros((), jnp.float32)
    return jnp.asarray(math.log(math.expm1(0.1)), jnp.float32)


def init_state(cfg: TrainConfig) -> TrainState:
    from ssdn_tpu.config import NoiseValue, n_output_channels

    c = cfg.model.in_channels
    n_out = n_output_channels(cfg.pipeline, cfg.noise, c)
    params = blindspot_unet.init_params(
        jax.random.key(cfg.seed),
        c,
        n_out,
        blindspot=pipeline_blindspot(cfg.pipeline),
        enc=cfg.model.enc_features,
        dec=cfg.model.dec_features,
        nin_a=cfg.model.nin_a_features,
        nin_b=cfg.model.nin_b_features,
    )
    if cfg.pipeline == Pipeline.SSDN and cfg.noise.value == NoiseValue.BLIND_CONST:
        # constant-blind: the noise parameter is a free scalar trained by
        # the same NLL (reference NoiseValue "unknown-constant", SURVEY.md
        # §5.6). Same {name: {leaf: array}} shape as the conv entries so
        # param_count / checkpointing / sharding treat it uniformly.
        params["noise_scalar"] = {"raw": _blind_const_init(cfg)}
    opt_state = make_optimizer(cfg).init(params)
    return TrainState(params=params, opt_state=opt_state,
                      step=jnp.zeros((), jnp.int32))


def make_train_step(cfg: TrainConfig):
    """Returns step_fn(state, batch_u8) -> (state, metrics); pure, jittable,
    shardable by parallel.jit_data_parallel."""
    optimizer = make_optimizer(cfg)
    blindspot = pipeline_blindspot(cfg.pipeline)
    compute_dtype = jnp.dtype(cfg.model.compute_dtype)

    def forward(params, y):
        return blindspot_unet.apply(
            params, y, blindspot=blindspot, compute_dtype=compute_dtype,
            conv_backend=cfg.model.conv_backend,
            conv_precision=cfg.model.conv_precision,
            decoder_mode=cfg.model.decoder_mode,
            head_backend=cfg.model.head_backend,
        )

    def step_fn(state: TrainState, batch_u8) -> Tuple[TrainState, Dict]:
        x = batch_u8.astype(jnp.float32) / 255.0 - 0.5
        key = jax.random.fold_in(jax.random.key(cfg.seed), state.step)
        k1, k2 = jax.random.split(key)
        y, noise_params = add_noise(k1, x, cfg.noise)

        def loss_fn(params):
            if cfg.pipeline == Pipeline.SSDN:
                out = forward(params, y)
                np_ = noise_params
                if "noise_scalar" in params:
                    # BLIND_CONST: thread the learned scalar into the
                    # estimator (gradient flows to it through the NLL)
                    np_ = {**noise_params,
                           "raw_scale": params["noise_scalar"]["raw"]}
                loss, aux = estimator.nll(
                    out, y, cfg.noise, np_,
                    blind_reg=blind_reg_schedule(cfg)(state.step),
                    beta=cfg.nll_beta,
                    robust=cfg.robust_nll, bound=cfg.bound_outputs,
                )
                return loss, aux
            if cfg.pipeline == Pipeline.SSDN_MSE:
                # mu-only ablation: MSE against the *noisy* target; the
                # blind spot prevents the identity solution (SURVEY.md §2.5)
                out = forward(params, y)
                c = x.shape[-1]
                return estimator.mse_loss(estimator.mu_only(out, c), y), {}
            if cfg.pipeline == Pipeline.N2C:
                out = forward(params, y)
                return estimator.mse_loss(out, x), {}
            if cfg.pipeline == Pipeline.N2N:
                y2, _ = add_noise(k2, x, cfg.noise)  # independent second copy
                out = forward(params, y)
                return estimator.mse_loss(out, y2), {}
            raise ValueError(cfg.pipeline)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "lr": lr_schedule(cfg)(state.step)}
        for k, v in aux.items():
            metrics[k] = jnp.mean(v)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return step_fn
