"""NLL losses and Bayesian posterior-mean estimators (SURVEY.md §2.5).

The network predicts a per-pixel Gaussian prior over the clean signal:
mean mu (C channels) and covariance Sigma_x (= a^2 for C=1; = A^T A with A
upper-triangular from 6 channels for C=3), plus one extra channel when the
noise parameter is blind-estimated. Per noise model [P]:

  * Gaussian, sigma known:  y ~ N(mu, Sigma_x + sigma^2 I)
        loss = 1/2 [ (y-mu)^T Sigma_y^{-1} (y-mu) + logdet Sigma_y ]
        denoised = mu + Sigma_x Sigma_y^{-1} (y - mu)
  * Gaussian, blind sigma: sigma_hat = spatial mean of softplus(extra ch)
        per image; same NLL with sigma_hat, plus regularizer
        -blind_reg * sigma_hat discouraging the degenerate Sigma_x-explains-
        everything solution ([P] §3.1; coefficient configurable — flagged
        "re-verify" in SURVEY.md §2.5).
  * Constant-blind (NoiseValue.BLIND_CONST, any model): the parameter is
        corpus-constant but unknown; sigma/s/alpha come from a learned free
        scalar (params["noise_scalar"]["raw"], threaded in via
        noise_params["raw_scale"]) through the same positivity maps and
        regularizers — the reference NoiseValue's third mode (SURVEY.md
        §5.6 "known / constant-blind / variable-blind").
  * Poisson lam: y = Poisson(lam (x+1/2))/lam - 1/2 approximated as
        heteroscedastic Gaussian with per-channel variance
        max(mu + 1/2, eps)/lam substituted for sigma^2 (diagonal).
  * Poisson, blind lambda: the extra channel estimates s (the noise std at
        mid-intensity, s^2 = 0.5/lam) via the same softplus spatial mean as
        blind sigma; variance = (mu+1/2) * 2 s^2, regularizer
        -blind_reg * s (see _noise_variance for the derivation note).
  * Impulse alpha: pixel replaced by a uniform color with prob alpha;
        marginal p(y) = alpha * u(y) + (1-alpha) N(y; mu, Sigma_x + eps I)
        with u = 1 on the unit cube; loss = -log p(y);
        denoised = w y + (1-w) mu, w = (1-alpha) N / p(y) — the pixel's
        posterior probability of being uncorrupted.

All math is fp32 ("fp32 island", SURVEY.md §2.5) and elementwise — XLA fuses
it into the surrounding step; no kernels needed (SURVEY.md §2.2 table).

Images use the internal range [-1/2, 1/2] (uint8/255 - 1/2); sigma values
are in the same units (sigma_255 / 255).
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ssdn_tpu.config import NoiseConfig, NoiseModel, NoiseValue
from ssdn_tpu.estimator import spd3

_LOG2PI = math.log(2.0 * math.pi)
_VAR_EPS = 1e-8      # variance floor for the C=1 path
_IMPULSE_EPS = 1e-4  # Sigma_x diagonal epsilon for the impulse density
# Blind-alpha bounds: the estimate is a scaled sigmoid into
# [_ALPHA_LO, _ALPHA_HI] rather than a raw sigmoid. Measured necessity
# (round-3 chip smoke, impulse alpha in [0.3,0.6] blind): early in training
# the mixture density N(y; mu, Sigma_x) is << 1 at every pixel, so the
# likelihood is maximized by "every pixel is corrupted" — alpha_hat raced
# 0.31 -> 0.9999 in ~15 steps, the sigmoid mean rounded to exactly 1.0 in
# fp32, log1p(-alpha) hit -inf and its gradient NaN'd the trunk. The scaled
# sigmoid keeps the density finite at any network output; the log-barrier
# regularizer in nll() (below) keeps the estimate off the rail so the
# (1-alpha)-weighted mu/Sigma gradients stay alive.
_ALPHA_LO = 0.02
_ALPHA_HI = 0.98
# Robustified NLL: the quadratic term uses a Huber penalty on the
# *standardized* residual z = L^{-1}(y - mu), switching to linear growth
# beyond _HUBER_DELTA sigmas. Measured necessity (README numerics notes):
# with the pure quadratic, training exhibits a positive-feedback runaway —
# individual pixels become confidently wrong (|mu| drifts past the data
# range while Sigma_x -> 0), their NLL gradient grows like |mu - y| / var
# (observed per-pixel NLL 200+ and gradient-norm spikes 20 -> 135 within a
# few steps), the spike corrupts the shared trunk weights, creating more
# such pixels until the trunk diverges. Huberizing caps the per-pixel
# gradient at delta/sigma while keeping it non-vanishing (hard/tanh output
# bounds were tried and create saturation traps instead). At delta = 5 a
# healthy model's standardized residuals essentially never reach the linear
# region (P(|z|>5) ~ 6e-7), so the optimum matches the reference NLL.
_HUBER_DELTA = 5.0
# Soft output bounds (x -> L tanh(x/L)), the coercive backstop on top of the
# Huber cap: healthy values sit 4-8x inside the linear region (mu in
# [-1/2, 1/2] vs L=2; covariance factors ~0.3 vs L=4), so the estimator is
# unchanged where it matters, while runaway outputs saturate instead of
# escaping to infinity. Huber alone (not coercive) and bounds alone (tight
# bounds trap when pixel gradients push hard) both diverged; the
# combination holds — see README numerics notes.
_MU_BOUND = 2.0
_A_BOUND = 4.0


def _huber_quad(z: jax.Array, delta: float = _HUBER_DELTA) -> jax.Array:
    """x^2-like penalty with linear tails: z^2 for |z|<=delta, else
    2*delta*|z| - delta^2 (so it and its gradient are continuous)."""
    az = jnp.abs(z)
    return jnp.where(az <= delta, z * z, 2.0 * delta * az - delta * delta)


def _soft_bound(x: jax.Array, limit: float) -> jax.Array:
    return limit * jnp.tanh(x / limit)


def split_outputs(out: jax.Array, channels: int, blind: bool,
                  bound: bool = True):
    """(B,H,W,n_out) -> (mu, a_tri, noise_ch|None). n_out layout per
    SURVEY.md §2.4: C mu channels, C(C+1)/2 covariance channels, then one
    optional noise-estimate channel.

    bound=True (the stabilized objective) applies the tanh soft bounds;
    bound=False (TrainConfig.objective "reference") passes the raw network
    outputs through, matching the reference/paper head exactly."""
    t = channels * (channels + 1) // 2
    mu = out[..., :channels]
    a = out[..., channels : channels + t]
    if bound:
        mu = _soft_bound(mu, _MU_BOUND)
        a = _soft_bound(a, _A_BOUND)
    noise_ch = out[..., channels + t] if blind else None
    return mu, a, noise_ch


def estimate_sigma(noise_ch: jax.Array) -> jax.Array:
    """Per-image scalar sigma from the per-pixel map: spatial softplus-mean
    ([P] §3.1: per-pixel estimate averaged over the image)."""
    return jnp.mean(jax.nn.softplus(noise_ch), axis=(1, 2))


def _const_scale(noise_params: Dict[str, jax.Array], batch: int) -> jax.Array:
    """BLIND_CONST noise scale (B,): softplus of the learned free scalar
    (``params["noise_scalar"]["raw"]``, threaded in as ``raw_scale`` by the
    train step / inference paths). Same positivity map as the variable-blind
    channel so the two modes share units and regularizer form."""
    raw = jnp.asarray(noise_params["raw_scale"], jnp.float32)
    return jnp.broadcast_to(jax.nn.softplus(raw)[None], (batch,))


def _noise_variance(
    cfg: NoiseConfig,
    noise_params: Dict[str, jax.Array],
    mu: jax.Array,
    noise_ch,
) -> jax.Array:
    """Per-pixel-per-channel noise variance (B,H,W,C), plus the per-image
    noise-scale estimate (B,) used (sigma or its Poisson analogue s — the
    blind regularizer's argument and the logging value; None when the true
    parameter is known), for the Gaussian-family models."""
    if cfg.model == NoiseModel.GAUSSIAN:
        if cfg.value == NoiseValue.BLIND:
            sigma = estimate_sigma(noise_ch)  # (B,)
        elif cfg.value == NoiseValue.BLIND_CONST:
            sigma = _const_scale(noise_params, mu.shape[0])
        else:
            # scalar (training injector, shared value) or (B,) (batched
            # eval: one value per image) — internal [0,1] units either way
            sigma = jnp.asarray(noise_params["sigma"], jnp.float32)
            if sigma.ndim == 0:
                sigma = jnp.broadcast_to(sigma[None], (mu.shape[0],))
        var = (sigma ** 2)[:, None, None, None]
        return jnp.broadcast_to(var, mu.shape).astype(jnp.float32), sigma
    if cfg.model == NoiseModel.POISSON:
        if cfg.value == NoiseValue.BLIND:
            # Blind lambda, re-derived per the Gaussian-blind pattern ([P]
            # §3.1 describes only the sigma case; SURVEY.md §2.5 flags the
            # exact analogue "re-verify", so this is first-principles —
            # validated by training behavior, tests/test_estimator.py):
            # the network's extra channel estimates s = the noise std at
            # mid-intensity (rate lam/2), i.e. s^2 = 0.5/lam, via the same
            # spatial softplus-mean as sigma. Then var(mu) = (mu+1/2)/lam
            # = (mu+1/2) * 2 s^2, and the anti-degeneracy regularizer
            # -blind_reg * mean(s) has identical form/units/coefficient to
            # the Gaussian one (s and sigma are both stds in the internal
            # [0,1] range, ~0.13 at lam=30).
            s = estimate_sigma(noise_ch)  # (B,)
            var = jnp.maximum(mu + 0.5, 1e-3) * (
                2.0 * (s ** 2)[:, None, None, None]
            )
            return var.astype(jnp.float32), s
        if cfg.value == NoiseValue.BLIND_CONST:
            # constant-blind lambda: the same s parameterization, but s is
            # the learned free scalar instead of a network output
            s = _const_scale(noise_params, mu.shape[0])
            var = jnp.maximum(mu + 0.5, 1e-3) * (
                2.0 * (s ** 2)[:, None, None, None]
            )
            return var.astype(jnp.float32), s
        # scalar or (B,): reshape per-image values to broadcast over
        # (B,H,W,C) — a bare (B,) would line up with channels instead
        lam = jnp.asarray(noise_params["lam"], jnp.float32)
        if lam.ndim == 1:
            lam = lam[:, None, None, None]
        var = jnp.maximum(mu + 0.5, 1e-3) / lam
        return var.astype(jnp.float32), None
    raise ValueError(f"no Gaussian-family variance for {cfg.model}")


def _gauss_nll_post_1(mu, a, y, var, robust=False):
    """C=1 closed forms; all (B,H,W,1). Returns (nll, posterior, per-pixel
    variance scale for the beta-NLL weight)."""
    sigma_x = a[..., :1] ** 2
    var_y = sigma_x + var + _VAR_EPS
    d = y - mu
    z2 = d * d / var_y
    if robust:
        z2 = _huber_quad(d * jax.lax.rsqrt(var_y))
    nll = 0.5 * (z2 + jnp.log(var_y) + _LOG2PI)
    post = mu + sigma_x / var_y * d
    return nll[..., 0], post, var_y[..., 0]


def _gauss_nll_post_3(mu, a, y, var, robust=False):
    """C=3 via the closed-form SPD3 path; robust=True Huberizes each
    whitened residual component z = L^{-1} d. Returns (nll, posterior,
    per-pixel variance scale for the beta-NLL weight)."""
    sx = spd3.sym3_from_tri(a)
    sy = spd3.sym3_add_diag(sx, tuple(var[..., i] for i in range(3)))
    d = tuple(y[..., i] - mu[..., i] for i in range(3))
    L = spd3.chol3(sy)
    z = spd3.chol3_forward_sub(L, d)
    if robust:
        quad = sum(_huber_quad(zi) for zi in z)
    else:
        quad = z[0] * z[0] + z[1] * z[1] + z[2] * z[2]
    logdet = spd3.chol3_logdet(L)
    w = spd3.chol3_back_sub(L, z)
    nll = 0.5 * (quad + logdet + 3.0 * _LOG2PI)
    post = spd3.sym3_matvec(sx, w)
    post = jnp.stack([mu[..., i] + post[i] for i in range(3)], axis=-1)
    # geometric-mean per-channel variance = exp(logdet / 3)
    return nll, post, jnp.exp(logdet / 3.0)


def _gauss_nll_post(mu, a, y, var, robust=False):
    c = mu.shape[-1]
    if c == 1:
        return _gauss_nll_post_1(mu, a, y, var, robust)
    if c == 3:
        return _gauss_nll_post_3(mu, a, y, var, robust)
    raise ValueError(f"unsupported channel count {c}")


def _prior_logdensity(mu, a, y):
    """log N(y; mu, Sigma_x + eps I) — the clean-signal prior evaluated at y
    (impulse model's uncorrupted branch)."""
    c = mu.shape[-1]
    if c == 1:
        var = a[..., :1] ** 2 + _IMPULSE_EPS
        d = y - mu
        return (-0.5 * (d * d / var + jnp.log(var) + _LOG2PI))[..., 0]
    sx = spd3.sym3_from_tri(a)
    sx = spd3.sym3_add_diag(sx, (_IMPULSE_EPS,) * 3)
    d = tuple(y[..., i] - mu[..., i] for i in range(3))
    _, quad, logdet = spd3.sym3_solve_quad_logdet(sx, d)
    return -0.5 * (quad + logdet + 3.0 * _LOG2PI)


def _impulse_alpha(cfg, noise_params, noise_ch):
    if cfg.value == NoiseValue.BLIND:
        # per-image scalar: spatial sigmoid-mean, scaled into
        # [_ALPHA_LO, _ALPHA_HI] (rail-race note at the constants above)
        s = jnp.mean(jax.nn.sigmoid(noise_ch), axis=(1, 2))
        return (_ALPHA_LO + (_ALPHA_HI - _ALPHA_LO) * s)[
            :, None, None
        ]  # (B,1,1)
    if cfg.value == NoiseValue.BLIND_CONST:
        # constant-blind alpha: the learned free scalar through the same
        # scaled sigmoid (scalar — broadcasts over (B,H,W))
        raw = jnp.asarray(noise_params["raw_scale"], jnp.float32)
        return _ALPHA_LO + (_ALPHA_HI - _ALPHA_LO) * jax.nn.sigmoid(raw)
    alpha = jnp.asarray(noise_params["alpha"], jnp.float32)
    return alpha.reshape((-1,) + (1,) * 2) if alpha.ndim else alpha


def nll(
    out: jax.Array,
    y: jax.Array,
    cfg: NoiseConfig,
    noise_params: Dict[str, jax.Array],
    *,
    blind_reg: float = 0.1,
    beta: float = 1.0,
    robust: bool = True,
    bound: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Mean negative log-likelihood training loss. Returns (scalar, aux).

    beta is the beta-NLL pixel weight exponent (Seitzer et al. 2022): each
    pixel's NLL is scaled by stop_grad(var_y)^beta. A positive per-pixel
    rescale leaves every pixel's stationary point IDENTICAL to the plain
    NLL, but at beta=1 the mu-gradient becomes exactly MSE-scale — removing
    the 1/var curvature disparity that was measured to drive the training
    runaway (README numerics notes: beta=1 is the only variant stable in
    bf16; beta=0 reproduces the reference's raw NLL). The weights are
    normalized by their batch mean so the loss magnitude (and the blind_reg
    balance) stays on the NLL scale.

    robust=True Huberizes the whitened residuals (stabilized objective,
    _HUBER_DELTA note above); robust=False + bound=False + beta=0 is the
    reference repo's exact raw NLL (TrainConfig.objective "reference").
    """
    out = out.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c = y.shape[-1]
    # BLIND uses an extra network channel; BLIND_CONST estimates too, but
    # through the learned free scalar (noise_params["raw_scale"]) instead
    blind = cfg.value == NoiseValue.BLIND
    blind_est = cfg.value in (NoiseValue.BLIND, NoiseValue.BLIND_CONST)
    mu, a, noise_ch = split_outputs(out, c, blind, bound=bound)
    aux = {}
    if cfg.model in (NoiseModel.GAUSSIAN, NoiseModel.POISSON):
        var, scale = _noise_variance(cfg, noise_params, mu, noise_ch)
        pix_nll, _, var_scale = _gauss_nll_post(mu, a, y, var, robust=robust)
        if beta:
            w = jax.lax.stop_gradient(var_scale) ** beta
            w = w / jnp.mean(w)
            pix_nll = w * pix_nll
        loss = jnp.mean(pix_nll)
        if blind_est:
            # anti-degeneracy regularizer, same form for both blind models
            # (scale = sigma_hat for Gaussian, s_hat for Poisson — see
            # _noise_variance)
            loss = loss - blind_reg * jnp.mean(scale)
            if cfg.model == NoiseModel.GAUSSIAN:
                aux["sigma_hat"] = scale
            else:
                aux["lam_hat"] = 0.5 / (scale ** 2 + 1e-8)
        elif scale is not None:
            aux["sigma"] = scale
    elif cfg.model == NoiseModel.IMPULSE:
        alpha = _impulse_alpha(cfg, noise_params, noise_ch)
        log_n = _prior_logdensity(mu, a, y)  # (B,H,W)
        # p(y) = alpha * 1 + (1-alpha) * N ; computed in log space
        log_p = jnp.logaddexp(
            jnp.log(alpha + 1e-12) + jnp.zeros_like(log_n),
            jnp.log1p(-alpha + 1e-12) + log_n,
        )
        loss = jnp.mean(-log_p)
        if blind_est:
            # Anti-degeneracy regularizer, the impulse analogue of the
            # blind-sigma/lambda term: a symmetric log-barrier (Beta prior)
            # on alpha_hat. The alpha -> 1 direction is degenerate the same
            # way Sigma_x -> explains-everything is for blind sigma — early
            # in training it trivially maximizes the mixture likelihood AND
            # extinguishes the (1-alpha)-weighted mu/Sigma gradient, so
            # nothing is ever learned (measured: alpha raced to the fp32
            # rail and NaN'd within 20 steps without this). The barrier
            # gradient ~ blind_reg/(1-alpha) grows without bound at the
            # rail while the likelihood pull is bounded by ~1/alpha, so the
            # early equilibrium is interior (~(1+r)/(1+2r)); once the model
            # organizes, uncorrupted pixels (density >> 1) pull alpha back
            # down to the true rate.
            loss = loss + blind_reg * jnp.mean(
                -jnp.log(alpha) - jnp.log1p(-alpha)
            )
            aux["alpha_hat"] = alpha[..., 0, 0] if alpha.ndim else alpha
    else:
        raise ValueError(cfg.model)
    aux["mu_mse"] = jnp.mean((mu - y) ** 2)
    return loss, aux


def posterior_mean(
    out: jax.Array,
    y: jax.Array,
    cfg: NoiseConfig,
    noise_params: Dict[str, jax.Array],
    *,
    bound: bool = True,
) -> jax.Array:
    """Bayes-denoised image E[x | y] (B,H,W,C), fp32.

    bound must match the objective the model was trained with (a model
    trained unbounded must be evaluated unbounded) — infer/ threads
    TrainConfig.bound_outputs here."""
    out = out.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c = y.shape[-1]
    blind = cfg.value == NoiseValue.BLIND  # extra channel only for BLIND
    mu, a, noise_ch = split_outputs(out, c, blind, bound=bound)
    if cfg.model in (NoiseModel.GAUSSIAN, NoiseModel.POISSON):
        var, _ = _noise_variance(cfg, noise_params, mu, noise_ch)
        _, post, _ = _gauss_nll_post(mu, a, y, var)
        return post
    if cfg.model == NoiseModel.IMPULSE:
        alpha = _impulse_alpha(cfg, noise_params, noise_ch)
        log_n = _prior_logdensity(mu, a, y)
        log_unc = jnp.log1p(-alpha + 1e-12) + log_n
        log_p = jnp.logaddexp(jnp.log(alpha + 1e-12) + jnp.zeros_like(log_n),
                              log_unc)
        w = jnp.exp(log_unc - log_p)[..., None]  # P(uncorrupted | y)
        return w * y + (1.0 - w) * mu
    raise ValueError(cfg.model)


def mu_only(out: jax.Array, channels: int) -> jax.Array:
    """The network's mu — used by the SSDN_MSE ablation and the N2C/N2N
    baselines (SURVEY.md §2.5 'baseline pipelines')."""
    return out[..., :channels].astype(jnp.float32)


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
