"""Synthetic noise injectors (SURVEY.md §2.1 noise-synthesis row; [P] §3).

The reference injects noise in CPU DataLoader workers; here every injector is
a pure jittable function of a PRNG key so injection runs on-device inside the
fused training step ([B]: "on-device fused preprocessing stage"). Images use
the internal range [-1/2, 1/2]; sigmas are in 0..255 units at the API surface
and converted internally.

Per model:
  * gaussian: y = x + sigma/255 * N(0, I); sigma per image ~ U[smin, smax]
    (fixed when smin == smax) — known-sigma and blind-sigma training [B 1-2].
  * poisson(lam): y = Poisson(lam * (x + 1/2)) / lam - 1/2  [B 3].
  * impulse(alpha): each pixel independently replaced, with probability
    alpha, by a uniform random color in the unit cube [B 4].
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
        lam = jnp.asarray(cfg.lam, jnp.float32)
        rate = jnp.maximum(lam * (x + 0.5), 0.0)
        y = jax.random.poisson(key, rate).astype(jnp.float32) / lam - 0.5
        return y, {"lam": lam}
    if cfg.model == NoiseModel.IMPULSE:
        kmask, kcolor = jax.random.split(key)
        alpha = jnp.asarray(cfg.alpha, jnp.float32)
        # one Bernoulli per pixel (the whole color is replaced together)
        mask = jax.random.bernoulli(kmask, alpha, x.shape[:3])[..., None]
        color = jax.random.uniform(kcolor, x.shape, jnp.float32, -0.5, 0.5)
        y = jnp.where(mask, color, x)
        return y, {"alpha": alpha}
    raise ValueError(cfg.model)
