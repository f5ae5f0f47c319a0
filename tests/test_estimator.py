"""Analytic unit tests for the estimator core (SURVEY.md §4 unit row 3):
closed forms vs dense numpy per-pixel computation, including the 3x3
Cholesky path and the impulse mixture."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ssdn_tpu.config import NoiseConfig, NoiseModel, NoiseValue
from ssdn_tpu.estimator import nll, posterior_mean
from ssdn_tpu.estimator.core import _LOG2PI, estimate_sigma, split_outputs

B, H, W = 2, 4, 5


def huber(z, delta=5.0):
    """Mirror of estimator._huber_quad (robust training NLL)."""
    az = np.abs(z)
    return np.where(az <= delta, z * z, 2 * delta * az - delta * delta)


def bmu(x):
    """Mirror of the mu soft bound (L=2)."""
    return 2.0 * np.tanh(np.asarray(x) / 2.0)


def ba(x):
    """Mirror of the covariance-factor soft bound (L=4)."""
    return 4.0 * np.tanh(np.asarray(x) / 4.0)


def dense_reference(mu, a_tri, y, var_diag, robust=False):
    """Per-pixel dense NLL + posterior with numpy linalg. a_tri packs upper-
    triangular A rows; var_diag (..., C) is the noise covariance diagonal.
    robust=True Huberizes the whitened residual (training-loss form)."""
    C = mu.shape[-1]
    tri = np.zeros(mu.shape[:-1] + (C, C))
    idx = 0
    for i in range(C):
        for j in range(i, C):
            tri[..., i, j] = a_tri[..., idx]
            idx += 1
    sx = np.einsum("...ki,...kj->...ij", tri, tri)
    sy = sx + np.apply_along_axis(np.diag, -1, var_diag)
    d = (y - mu)[..., None]
    syi = np.linalg.inv(sy)
    L = np.linalg.cholesky(sy)
    z = np.linalg.solve(L, d)[..., 0]
    quad = huber(z).sum(-1) if robust else (z ** 2).sum(-1)
    _, logdet = np.linalg.slogdet(sy)
    nll_px = 0.5 * (quad + logdet + C * _LOG2PI)
    if robust:  # mirror the beta=1 pixel weighting of the training loss
        w = np.exp(logdet / C)
        nll_px = (w / w.mean()) * nll_px
    post = mu + np.einsum("...ij,...jk,...k->...i", sx, syi, d[..., 0])
    return nll_px, post, sx


def rand_outputs(C, blind=False, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    t = C * (C + 1) // 2
    n_out = C + t + (1 if blind else 0)
    out = rng.standard_normal((B, H, W, n_out)).astype(np.float32) * scale
    y = rng.standard_normal((B, H, W, C)).astype(np.float32) * 0.3
    return out, y


def test_gaussian_known_gray_matches_dense():
    out, y = rand_outputs(1)
    sigma = np.array([25.0, 10.0], np.float32) / 255.0
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.KNOWN)
    params = {"sigma": jnp.asarray(sigma)}
    loss, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, params)
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, params)

    var = np.broadcast_to((sigma ** 2)[:, None, None, None], y.shape)
    ref_nll, ref_post, _ = dense_reference(bmu(out[..., :1]), ba(out[..., 1:2]), y, var, robust=True)
    np.testing.assert_allclose(float(loss), ref_nll.mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(post), ref_post, rtol=2e-4, atol=1e-5)


def test_gaussian_known_rgb_matches_dense():
    out, y = rand_outputs(3, seed=1)
    sigma = np.array([25.0, 40.0], np.float32) / 255.0
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.KNOWN)
    params = {"sigma": jnp.asarray(sigma)}
    loss, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, params)
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, params)

    var = np.broadcast_to((sigma ** 2)[:, None, None, None], y.shape)
    ref_nll, ref_post, _ = dense_reference(bmu(out[..., :3]), ba(out[..., 3:9]), y, var, robust=True)
    np.testing.assert_allclose(float(loss), ref_nll.mean(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(post), ref_post, rtol=1e-3, atol=1e-4)


def test_gaussian_blind_sigma_estimate_and_reg():
    out, y = rand_outputs(3, blind=True, seed=2)
    cfg = NoiseConfig(
        model=NoiseModel.GAUSSIAN, value=NoiseValue.BLIND,
        sigma_min=5, sigma_max=50,
    )
    loss, aux = nll(jnp.asarray(out), jnp.asarray(y), cfg, {}, blind_reg=0.1)
    sig = np.asarray(aux["sigma_hat"])
    assert sig.shape == (B,) and (sig > 0).all()
    # softplus spatial mean of the 10th channel
    ref_sig = np.log1p(np.exp(out[..., 9])).mean(axis=(1, 2))
    np.testing.assert_allclose(sig, ref_sig, rtol=1e-4)
    # regularizer direction: larger coefficient => smaller loss
    loss2, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, {}, blind_reg=0.5)
    assert float(loss2) < float(loss)
    var = np.broadcast_to((ref_sig ** 2)[:, None, None, None], y.shape)
    ref_nll, _, _ = dense_reference(bmu(out[..., :3]), ba(out[..., 3:9]), y, var, robust=True)
    np.testing.assert_allclose(
        float(loss), ref_nll.mean() - 0.1 * ref_sig.mean(), rtol=1e-4
    )


def test_poisson_variance_substitution():
    out, y = rand_outputs(3, seed=3)
    lam = 30.0
    cfg = NoiseConfig(model=NoiseModel.POISSON, value=NoiseValue.KNOWN, lam=lam)
    params = {"lam": jnp.asarray(lam)}
    loss, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, params)
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, params)
    mu = bmu(out[..., :3])
    var = np.maximum(mu + 0.5, 1e-3) / lam
    ref_nll, ref_post, _ = dense_reference(mu, ba(out[..., 3:9]), y, var, robust=True)
    np.testing.assert_allclose(float(loss), ref_nll.mean(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(post), ref_post, rtol=1e-3, atol=1e-4)


def test_impulse_mixture_matches_dense():
    out, y = rand_outputs(3, seed=4)
    alpha = 0.5
    cfg = NoiseConfig(model=NoiseModel.IMPULSE, value=NoiseValue.KNOWN, alpha=alpha)
    params = {"alpha": jnp.asarray(alpha)}
    loss, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, params)
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, params)

    mu, a = bmu(out[..., :3]), ba(out[..., 3:9])
    eps_var = np.full(y.shape, 1e-4)
    ref_nll_g, _, _ = dense_reference(mu, a, y, eps_var)  # = -log N(y; mu, Sx+eps)
    n_density = np.exp(-ref_nll_g)
    p = alpha * 1.0 + (1 - alpha) * n_density
    np.testing.assert_allclose(float(loss), (-np.log(p)).mean(), rtol=1e-4)
    w = (1 - alpha) * n_density / p
    ref_post = w[..., None] * y + (1 - w[..., None]) * mu
    np.testing.assert_allclose(np.asarray(post), ref_post, rtol=1e-3, atol=1e-4)


def test_impulse_posterior_limits():
    """alpha -> 0: denoised == y (trust the pixel); alpha -> 1: == mu.
    Prior stdev is pinned at 1 so the Gaussian density neither under- nor
    overflows and the limit argument is valid for every pixel."""
    out, y = rand_outputs(1, seed=5)
    out[..., 1] = 1.0  # a -> Sigma_x = 1
    for alpha, ref in [(1e-7, "y"), (1 - 1e-7, "mu")]:
        cfg = NoiseConfig(model=NoiseModel.IMPULSE, value=NoiseValue.KNOWN,
                          alpha=alpha)
        post = np.asarray(
            posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg,
                           {"alpha": jnp.asarray(alpha)})
        )
        target = y if ref == "y" else bmu(out[..., :1])
        np.testing.assert_allclose(post, target, atol=1e-3)


def test_posterior_shrinks_towards_mu_when_noise_dominates():
    """sigma >> sigma_x: posterior ~ mu; sigma -> 0: posterior ~ y."""
    out, y = rand_outputs(1, seed=6)
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.KNOWN)
    big = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg,
                         {"sigma": jnp.full((B,), 100.0)})
    np.testing.assert_allclose(np.asarray(big), bmu(out[..., :1]), atol=1e-3)
    tiny = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg,
                          {"sigma": jnp.full((B,), 1e-6)})
    np.testing.assert_allclose(np.asarray(tiny), y, atol=1e-3)


def test_nll_is_differentiable_and_finite():
    out, y = rand_outputs(3, blind=True, seed=7)
    cfg = NoiseConfig(model=NoiseModel.GAUSSIAN, value=NoiseValue.BLIND)

    def f(o):
        loss, _ = nll(o, jnp.asarray(y), cfg, {})
        return loss

    g = jax.grad(f)(jnp.asarray(out))
    assert bool(jnp.isfinite(g).all())
    # degenerate zero covariance outputs must stay finite too
    out0 = np.zeros_like(out)
    g0 = jax.grad(f)(jnp.asarray(out0))
    assert bool(jnp.isfinite(g0).all())


def test_split_outputs_layout():
    out = jnp.arange(2 * 1 * 1 * 10, dtype=jnp.float32).reshape(2, 1, 1, 10)
    mu, a, s = split_outputs(out, 3, True)
    assert mu.shape == (2, 1, 1, 3) and a.shape == (2, 1, 1, 6)
    assert s.shape == (2, 1, 1)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(out[..., 9]))


def test_impulse_blind_alpha_estimate():
    out, y = rand_outputs(3, blind=True, seed=8)
    cfg = NoiseConfig(model=NoiseModel.IMPULSE, value=NoiseValue.BLIND,
                      alpha=0.5)
    loss, aux = nll(jnp.asarray(out), jnp.asarray(y), cfg, {})
    assert bool(jnp.isfinite(loss))
    ah = np.asarray(aux["alpha_hat"])
    assert ah.shape == (B,) and (ah > 0.02 - 1e-6).all() and (ah < 0.98 + 1e-6).all()
    # sigmoid spatial mean of the extra channel, scaled into [0.02, 0.98]
    # (core._ALPHA_LO/_ALPHA_HI — rail-race regression below)
    ref = 0.02 + 0.96 * (1 / (1 + np.exp(-out[..., 9]))).mean(axis=(1, 2))
    np.testing.assert_allclose(ah, ref, rtol=1e-4)
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, {})
    assert bool(jnp.isfinite(post).all())


def test_impulse_blind_alpha_rail_is_finite_and_repelled():
    """Regression for the measured blind-alpha runaway (round 3): with the
    noise channel saturated hard positive (sigmoid == 1.0 in fp32), the loss
    and its gradient must stay finite, and the gradient w.r.t. the noise
    channel must be positive (pushing alpha_hat DOWN off the rail) — the
    log-barrier regularizer dominating the degenerate likelihood pull."""
    out, y = rand_outputs(3, blind=True, seed=11)
    out[..., 9] = 40.0  # sigmoid(40) == 1.0 in fp32
    cfg = NoiseConfig(model=NoiseModel.IMPULSE, value=NoiseValue.BLIND,
                      alpha=0.5)

    def f(o):
        loss, _ = nll(o, jnp.asarray(y), cfg, {})
        return loss

    loss = f(jnp.asarray(out))
    g = jax.grad(f)(jnp.asarray(out))
    assert bool(jnp.isfinite(loss))
    assert bool(jnp.isfinite(g).all())
    # d loss / d noise_ch > 0 at the high rail => alpha is pulled back
    # (sigmoid'(40) == 0 in fp32, so the live pull must come through the
    # scaled-sigmoid bound... assert on the alpha-level derivative instead:
    # evaluate at a high-but-unsaturated channel value)
    out2 = out.copy()
    out2[..., 9] = 4.0  # sigmoid ~ 0.982, alpha_hat ~ 0.963
    g2 = jax.grad(f)(jnp.asarray(out2))
    assert float(np.asarray(g2[..., 9]).mean()) > 0.0
    # posterior stays finite at the rail too
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, {})
    assert bool(jnp.isfinite(post).all())


def test_poisson_blind_lambda_estimate_and_reg():
    """Blind-lambda path (core._noise_variance derivation note): the extra
    channel's softplus spatial mean s is the mid-intensity noise std,
    var = (mu+1/2) * 2 s^2, regularizer -blind_reg * mean(s), and
    aux lam_hat = 0.5 / s^2."""
    out, y = rand_outputs(3, blind=True, seed=9)
    cfg = NoiseConfig(
        model=NoiseModel.POISSON, value=NoiseValue.BLIND, lam=5, lam_max=50,
    )
    loss, aux = nll(jnp.asarray(out), jnp.asarray(y), cfg, {}, blind_reg=0.1)
    s = np.log1p(np.exp(out[..., 9])).mean(axis=(1, 2))
    np.testing.assert_allclose(
        np.asarray(aux["lam_hat"]), 0.5 / (s ** 2 + 1e-8), rtol=1e-4
    )
    mu = bmu(out[..., :3])
    var = np.maximum(mu + 0.5, 1e-3) * 2.0 * (s ** 2)[:, None, None, None]
    ref_nll, ref_post, _ = dense_reference(mu, ba(out[..., 3:9]), y, var,
                                           robust=True)
    np.testing.assert_allclose(
        float(loss), ref_nll.mean() - 0.1 * s.mean(), rtol=1e-4
    )
    # regularizer direction: larger coefficient => smaller loss
    loss2, _ = nll(jnp.asarray(out), jnp.asarray(y), cfg, {}, blind_reg=0.5)
    assert float(loss2) < float(loss)
    # posterior consumes the same estimated variance — matches dense oracle
    post = posterior_mean(jnp.asarray(out), jnp.asarray(y), cfg, {})
    np.testing.assert_allclose(np.asarray(post), ref_post, rtol=1e-3,
                               atol=1e-4)
