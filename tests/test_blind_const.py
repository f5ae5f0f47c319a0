"""Constant-blind noise estimation (reference ``NoiseValue`` mode 3,
SURVEY.md §5.6 "known / constant-blind / variable-blind"): the noise
parameter is corpus-constant but unknown and is learned as a single free
scalar (``params["noise_scalar"]["raw"]``) trained by the same NLL.

Covers: head-width invariance (no extra output channel), the NLL oracle
vs dense numpy with sigma = softplus(raw), gradient flow into the scalar,
a short end-to-end training run where the scalar converges toward the
true sigma, and the eval path reading the learned scalar."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ssdn_tpu.config import (
    ModelConfig,
    NoiseConfig,
    NoiseModel,
    NoiseValue,
    Pipeline,
    TrainConfig,
    n_output_channels,
    parse_noise_style,
)
from ssdn_tpu.estimator import nll, posterior_mean

from test_estimator import dense_reference

B, H, W = 2, 4, 5


def test_parse_blind_modes():
    import warnings

    import pytest

    assert parse_noise_style("gauss25").value == NoiseValue.KNOWN
    assert parse_noise_style("gauss25", blind=True).value == NoiseValue.BLIND
    assert (parse_noise_style("gauss25", blind="variable").value
            == NoiseValue.BLIND)
    # const + ranged style is accepted but mis-specified (the scalar fits
    # the range's effective mean) — it must warn loudly (ADVICE r3)
    with pytest.warns(UserWarning, match="corpus-constant"):
        assert (parse_noise_style("gauss5_50", blind="const").value
                == NoiseValue.BLIND_CONST)
    # fixed-parameter const (the intended use) must stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert (parse_noise_style("gauss25", blind="const").value
                == NoiseValue.BLIND_CONST)
        # variable-blind over a range is well-specified: no warning
        assert (parse_noise_style("gauss5_50", blind="variable").value
                == NoiseValue.BLIND)


def test_no_extra_channel():
    """BLIND adds one head channel; BLIND_CONST does not (the scalar lives
    outside the network)."""
    for c in (1, 3):
        base = c + c * (c + 1) // 2
        known = NoiseConfig(value=NoiseValue.KNOWN)
        blind = NoiseConfig(value=NoiseValue.BLIND)
        const = NoiseConfig(value=NoiseValue.BLIND_CONST)
        assert n_output_channels(Pipeline.SSDN, known, c) == base
        assert n_output_channels(Pipeline.SSDN, blind, c) == base + 1
        assert n_output_channels(Pipeline.SSDN, const, c) == base


def test_gauss_const_nll_oracle():
    """C=1 Gaussian BLIND_CONST NLL == dense numpy with sigma =
    softplus(raw), including the anti-degeneracy regularizer, raw (robust
    off, bounds off, beta=0) form."""
    rng = np.random.default_rng(0)
    out = rng.normal(size=(B, H, W, 2)).astype(np.float32)
    y = rng.normal(scale=0.3, size=(B, H, W, 1)).astype(np.float32)
    raw = np.float32(-1.7)
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.BLIND_CONST)
    blind_reg = 0.1

    loss, aux = nll(
        jnp.asarray(out), jnp.asarray(y), cfg,
        {"sigma": jnp.asarray(0.123), "raw_scale": jnp.asarray(raw)},
        blind_reg=blind_reg, beta=0.0, robust=False, bound=False,
    )
    sigma = math.log1p(math.exp(raw))  # softplus
    mu, a = out[..., :1], out[..., 1:2]
    var = np.full_like(y, sigma ** 2)
    nll_px, _, _ = dense_reference(mu, a, y, var)
    expect = nll_px.mean() - blind_reg * sigma
    np.testing.assert_allclose(float(loss), expect, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(aux["sigma_hat"]), sigma, rtol=1e-6
    )
    # the true injected sigma (0.123) must NOT be what the estimator used
    assert abs(float(loss) - (nll_px.mean() - blind_reg * 0.123)) > 1e-3

    # gradient must flow into the raw scalar
    g = jax.grad(
        lambda r: nll(
            jnp.asarray(out), jnp.asarray(y), cfg,
            {"sigma": jnp.asarray(0.123), "raw_scale": r},
            blind_reg=blind_reg, beta=0.0, robust=False, bound=False,
        )[0]
    )(jnp.asarray(raw))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-6


def test_impulse_const_alpha_path():
    """Impulse BLIND_CONST: alpha comes from the scaled sigmoid of the
    scalar; loss finite, gradient into the scalar nonzero, posterior is a
    y/mu convex mix."""
    rng = np.random.default_rng(1)
    out = rng.normal(size=(B, H, W, 2)).astype(np.float32)
    y = rng.uniform(-0.5, 0.5, size=(B, H, W, 1)).astype(np.float32)
    cfg = NoiseConfig(model=NoiseModel.IMPULSE, value=NoiseValue.BLIND_CONST)
    np_ = {"alpha": jnp.asarray(0.5), "raw_scale": jnp.asarray(0.3)}
    loss, aux = nll(jnp.asarray(out), jnp.asarray(y), cfg, np_,
                    beta=0.0, robust=False, bound=False)
    assert np.isfinite(float(loss))
    a_hat = float(np.asarray(aux["alpha_hat"]))
    expect_alpha = 0.02 + 0.96 * (1 / (1 + math.exp(-0.3)))
    np.testing.assert_allclose(a_hat, expect_alpha, rtol=1e-6)
    g = jax.grad(
        lambda r: nll(jnp.asarray(out), jnp.asarray(y), cfg,
                      {"alpha": jnp.asarray(0.5), "raw_scale": r},
                      beta=0.0, robust=False, bound=False)[0]
    )(jnp.asarray(0.3))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-8
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, np_,
                          bound=False)
    assert np.isfinite(np.asarray(post)).all()
    mu = out[..., :1]
    lo = np.minimum(mu, y) - 1e-5
    hi = np.maximum(mu, y) + 1e-5
    p = np.asarray(post)
    assert ((p >= lo) & (p <= hi)).all()


def _tiny_cfg(noise_style="gauss25", **kw):
    return TrainConfig(
        noise=parse_noise_style(noise_style, blind="const"),
        model=ModelConfig(
            in_channels=1, compute_dtype="float32",
            enc_features=8, dec_features=16, nin_a_features=32,
            nin_b_features=16,
        ),
        patch_size=32,
        batch_size=4,
        iterations=60,
        lr=3e-3,
        **kw,
    )


def test_scalar_recovers_true_sigma():
    """Identifiability: with the network outputs held at a well-specified
    scene (mu = clean, tiny model variance), minimizing the NLL over the
    free scalar alone recovers the true noise sigma."""
    import optax

    rng = np.random.default_rng(7)
    clean = rng.uniform(-0.4, 0.4, (2, 16, 16, 1)).astype(np.float32)
    true_sigma = 60 / 255
    y = clean + rng.normal(0, true_sigma, clean.shape).astype(np.float32)
    # out = [mu, a]: mu = clean, a small (model variance ~ 1e-4)
    out = np.concatenate([clean, np.full_like(clean, 0.01)], axis=-1)
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.BLIND_CONST)

    def loss(raw):
        # blind_reg=0 isolates the likelihood optimum from the
        # anti-degeneracy tilt (which exists to fight Sigma_x degeneracy,
        # impossible here with a frozen)
        return nll(jnp.asarray(out), jnp.asarray(y), cfg,
                   {"sigma": jnp.asarray(0.0), "raw_scale": raw},
                   blind_reg=0.0, beta=0.0, robust=False, bound=False)[0]

    opt = optax.adam(0.05)
    raw = jnp.asarray(math.log(math.expm1(0.1)), jnp.float32)
    opt_state = opt.init(raw)
    g = jax.jit(jax.grad(loss))
    for _ in range(200):
        upd, opt_state = opt.update(g(raw), opt_state, raw)
        raw = optax.apply_updates(raw, upd)
    sigma_hat = float(jax.nn.softplus(raw))
    np.testing.assert_allclose(sigma_hat, true_sigma, rtol=0.08)


def test_train_learns_constant_sigma():
    """End to end: a short tiny-model run trains the free scalar jointly
    with the network — sigma_hat must move toward the true corpus sigma
    (60/255, vs the neutral 0.1 init) while the loss stays finite, and
    the eval path must read the learned scalar. Convergence speed is the
    identifiability test's job; here we gate direction + plumbing."""
    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.infer import make_denoise_fn
    from ssdn_tpu.train.step import init_state, make_train_step

    cfg = _tiny_cfg("gauss60")
    state = init_state(cfg)
    assert "noise_scalar" in state.params
    init_sigma = float(jax.nn.softplus(state.params["noise_scalar"]["raw"]))

    ds = open_dataset("synthetic:8:64", grayscale=True)
    step = jax.jit(make_train_step(cfg))
    rng = np.random.default_rng(0)
    sigma_hat = None
    for i in range(cfg.iterations):
        idx = rng.integers(0, len(ds), size=cfg.batch_size)
        batch = np.stack([
            np.asarray(ds[j])[:cfg.patch_size, :cfg.patch_size]
            for j in idx
        ])
        state, metrics = step(state, jnp.asarray(batch))
        assert np.isfinite(float(metrics["loss"]))
        sigma_hat = float(metrics["sigma_hat"])

    true_sigma = 60 / 255
    # direction: moved up from init (~0.1) toward the true value (~0.235)
    # past float noise (the joint problem converges over thousands of
    # steps; 60 steps establish the sign)
    assert init_sigma < sigma_hat < true_sigma + 0.05, (
        init_sigma, sigma_hat, true_sigma
    )

    # eval path: posterior mean reads the learned scalar (vec is ignored)
    fn = make_denoise_fn(cfg)
    y = jnp.asarray(
        rng.uniform(-0.5, 0.5, (1, 32, 32, 1)).astype(np.float32)
    )
    out = fn(state.params, y, jnp.full((1,), 999.0, jnp.float32))
    assert out.shape == y.shape and np.isfinite(np.asarray(out)).all()


def test_config_roundtrip():
    from ssdn_tpu.config import to_json, train_config_from_json

    cfg = _tiny_cfg()
    cfg2 = train_config_from_json(to_json(cfg))
    assert cfg2.noise.value == NoiseValue.BLIND_CONST
