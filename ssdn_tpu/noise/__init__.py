"""Synthetic noise injectors (SURVEY.md §2.1 noise-synthesis row; [P] §3).

The reference injects noise in CPU DataLoader workers; here every injector is
a pure jittable function of a PRNG key so injection runs on-device inside the
fused training step ([B]: "on-device fused preprocessing stage"). Images use
the internal range [-1/2, 1/2]; sigmas are in 0..255 units at the API surface
and converted internally.

Per model:
  * gaussian: y = x + sigma/255 * N(0, I); sigma per image ~ U[smin, smax]
    (fixed when smin == smax) — known-sigma and blind-sigma training [B 1-2].
  * poisson(lam): y = Poisson(lam * (x + 1/2)) / lam - 1/2  [B 3];
    lam per image ~ U[lam, lam_max] when a range is configured
    ([P] Table 3 variable-lambda, style "poisson5_50").
  * impulse(alpha): each pixel independently replaced, with probability
    alpha, by a uniform random color in the unit cube [B 4]; alpha per
    image ~ U[alpha, alpha_max] when a range is configured
    ([P] Table 3 variable-alpha, style "impulse30_60").

All injectors return per-image (B,) parameter vectors in ``params`` (the
KNOWN-value estimator consumes them; fixed configs return constant vectors).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ssdn_tpu.config import NoiseConfig, NoiseModel


def add_noise(
    key: jax.Array, x: jax.Array, cfg: NoiseConfig
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Inject noise into a clean batch (B, H, W, C) in [-1/2, 1/2].

    Returns (noisy, params) where params carries the per-image true noise
    parameters the KNOWN-value estimator path consumes (SURVEY.md §2.5).
    """
    x = x.astype(jnp.float32)
    b = x.shape[0]
    if cfg.model == NoiseModel.GAUSSIAN:
        ksig, knoise = jax.random.split(key)
        sigma = jax.random.uniform(
            ksig, (b,), jnp.float32,
            cfg.sigma_min / 255.0, cfg.sigma_max / 255.0,
        )
        if cfg.fixed_sigma:
            sigma = jnp.full((b,), cfg.sigma_min / 255.0, jnp.float32)
        y = x + sigma[:, None, None, None] * jax.random.normal(
            knoise, x.shape, jnp.float32
        )
        return y, {"sigma": sigma}
    if cfg.model == NoiseModel.POISSON:
        if cfg.fixed_lam:
            lam = jnp.full((b,), cfg.lam, jnp.float32)
        else:
            klam, key = jax.random.split(key)
            lam = jax.random.uniform(
                klam, (b,), jnp.float32, cfg.lam, cfg.lam_max
            )
        lam4 = lam[:, None, None, None]
        rate = jnp.maximum(lam4 * (x + 0.5), 0.0)
        y = jax.random.poisson(key, rate).astype(jnp.float32) / lam4 - 0.5
        return y, {"lam": lam}
    if cfg.model == NoiseModel.IMPULSE:
        kmask, kcolor = jax.random.split(key)
        if cfg.fixed_alpha:
            alpha = jnp.full((b,), cfg.alpha, jnp.float32)
        else:
            kalpha, kmask = jax.random.split(kmask)
            alpha = jax.random.uniform(
                kalpha, (b,), jnp.float32, cfg.alpha, cfg.alpha_max
            )
        # one Bernoulli per pixel (the whole color is replaced together)
        mask = jax.random.bernoulli(
            kmask, alpha[:, None, None], x.shape[:3]
        )[..., None]
        color = jax.random.uniform(kcolor, x.shape, jnp.float32, -0.5, 0.5)
        y = jnp.where(mask, color, x)
        return y, {"alpha": alpha}
    raise ValueError(cfg.model)
