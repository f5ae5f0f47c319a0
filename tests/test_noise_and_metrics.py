"""Noise-injector moment tests and PSNR oracle (SURVEY.md §4 unit rows 4-5)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu.config import NoiseConfig, NoiseModel, parse_noise_style
from ssdn_tpu.noise import add_noise
from ssdn_tpu.utils import from_internal, pad_to_multiple, psnr, to_internal


def flat_batch(value=0.2, shape=(4, 32, 32, 3)):
    return jnp.full(shape, value, jnp.float32)


def test_gaussian_fixed_sigma_moments():
    x = flat_batch()
    y, p = add_noise(jax.random.key(0), x, parse_noise_style("gauss25"))
    np.testing.assert_allclose(np.asarray(p["sigma"]), 25 / 255, rtol=1e-6)
    resid = np.asarray(y - x)
    assert abs(resid.mean()) < 1e-3
    np.testing.assert_allclose(resid.std(), 25 / 255, rtol=0.02)


def test_gaussian_blind_sigma_range_and_variability():
    x = flat_batch(shape=(64, 16, 16, 3))
    cfg = parse_noise_style("gauss5_50", blind=True)
    y, p = add_noise(jax.random.key(1), x, cfg)
    sig = np.asarray(p["sigma"]) * 255
    assert sig.shape == (64,)
    assert (sig >= 5).all() and (sig <= 50).all()
    assert sig.std() > 5  # actually varies per image
    # per-image empirical std tracks the sampled sigma
    emp = np.asarray(y - x).std(axis=(1, 2, 3)) * 255
    np.testing.assert_allclose(emp, sig, rtol=0.15)


def test_poisson_moments():
    lam = 30.0
    x = flat_batch(0.2, (8, 64, 64, 1))  # intensity 0.7
    y, p = add_noise(jax.random.key(2), x, parse_noise_style("poisson30"))
    resid = np.asarray(y - x)
    assert abs(resid.mean()) < 2e-3  # unbiased
    np.testing.assert_allclose(resid.var(), 0.7 / lam, rtol=0.05)


def test_poisson_clips_negative_rates():
    x = jnp.full((1, 8, 8, 1), -0.6, jnp.float32)  # below valid range
    y, _ = add_noise(jax.random.key(3), x, parse_noise_style("poisson30"))
    assert bool(jnp.isfinite(y).all())
    np.testing.assert_allclose(np.asarray(y), -0.5)


def test_impulse_replacement_stats():
    x = flat_batch(0.4, (8, 64, 64, 3))
    y, p = add_noise(jax.random.key(4), x, parse_noise_style("impulse50"))
    changed = np.any(np.asarray(y) != 0.4, axis=-1)
    np.testing.assert_allclose(changed.mean(), 0.5, atol=0.02)
    # replaced pixels: whole color replaced together, uniform in [-.5,.5)
    vals = np.asarray(y)[changed]
    assert abs(vals.mean()) < 0.01
    np.testing.assert_allclose(vals.std(), math.sqrt(1 / 12), rtol=0.05)
    # all three channels replaced jointly: unchanged pixels keep exact value
    unchanged = np.asarray(y)[~changed]
    assert (unchanged == 0.4).all()


def test_injection_is_deterministic_per_key():
    x = flat_batch()
    cfg = parse_noise_style("gauss25")
    y1, _ = add_noise(jax.random.key(7), x, cfg)
    y2, _ = add_noise(jax.random.key(7), x, cfg)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3, _ = add_noise(jax.random.key(8), x, cfg)
    assert np.any(np.asarray(y3) != np.asarray(y1))


def test_psnr_against_formula():
    rng = np.random.default_rng(0)
    clean = rng.uniform(-0.5, 0.5, (16, 16, 3)).astype(np.float32)
    noisy = clean + 0.1 * rng.standard_normal(clean.shape).astype(np.float32)
    d = np.clip(noisy + 0.5, 0, 1)
    c = clean + 0.5
    ref = 10 * np.log10(1.0 / np.mean((d - c) ** 2))
    np.testing.assert_allclose(psnr(noisy, clean), ref, rtol=1e-6)
    assert psnr(clean, clean) == float("inf")


def test_psnr_known_value():
    # uniform offset of 0.1 over range 1 => PSNR = 20 dB exactly
    clean = np.zeros((8, 8, 1), np.float32)
    noisy = clean + 0.1
    np.testing.assert_allclose(psnr(noisy, clean), 20.0, rtol=1e-6)


def test_range_roundtrip():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
    np.testing.assert_array_equal(from_internal(to_internal(u8)), u8)


def test_pad_to_multiple():
    x = np.random.default_rng(1).uniform(size=(37, 61, 3)).astype(np.float32)
    p, (h, w) = pad_to_multiple(x, 32)
    assert p.shape[:2] == (64, 64) and (h, w) == (37, 61)
    np.testing.assert_array_equal(p[:37, :61], x)
    psq, _ = pad_to_multiple(np.zeros((64, 96, 1), np.float32), 32, square=True)
    assert psq.shape[:2] == (96, 96)


def test_parse_noise_style():
    c = parse_noise_style("gauss25")
    assert c.model == NoiseModel.GAUSSIAN and c.fixed_sigma and c.sigma_min == 25
    c = parse_noise_style("gauss5_50", blind=True)
    assert (c.sigma_min, c.sigma_max) == (5, 50) and c.value.value == "blind"
    assert parse_noise_style("poisson30").lam == 30
    assert parse_noise_style("impulse50").alpha == 0.5
    with pytest.raises(ValueError):
        parse_noise_style("saltpepper")


def test_poisson_range_per_image_lambda():
    """poisson5_50: per-image lambda ~ U[5, 50]; the residual variance of
    each image matches intensity/lam_i ([P] Table 3 variable-lambda)."""
    cfg = parse_noise_style("poisson5_50")
    assert not cfg.fixed_lam
    x = flat_batch(0.2, (16, 64, 64, 1))  # intensity 0.7
    y, p = add_noise(jax.random.key(11), x, cfg)
    lam = np.asarray(p["lam"])
    assert lam.shape == (16,)
    assert (lam >= 5).all() and (lam <= 50).all()
    assert lam.std() > 3  # actually varies across images
    resid = np.asarray(y - x)
    per_img_var = resid.reshape(16, -1).var(axis=1)
    np.testing.assert_allclose(per_img_var, 0.7 / lam, rtol=0.12)


def test_impulse_range_per_image_alpha():
    cfg = parse_noise_style("impulse30_60")
    assert not cfg.fixed_alpha
    x = flat_batch(0.4, (16, 64, 64, 3))
    y, p = add_noise(jax.random.key(12), x, cfg)
    alpha = np.asarray(p["alpha"])
    assert alpha.shape == (16,)
    assert (alpha >= 0.3).all() and (alpha <= 0.6).all()
    changed = np.any(np.asarray(y) != 0.4, axis=-1)
    np.testing.assert_allclose(changed.reshape(16, -1).mean(axis=1), alpha,
                               atol=0.03)


def test_fixed_configs_unchanged_by_range_support():
    """The ranged-injector rewrite must keep fixed poisson/impulse noise
    bit-identical (the PSNR gates are calibrated on these streams)."""
    x = flat_batch(0.1, (4, 16, 16, 3))
    for style in ("poisson30", "impulse50"):
        cfg = parse_noise_style(style)
        y1, p1 = add_noise(jax.random.key(5), x, cfg)
        y2, _ = add_noise(jax.random.key(5), x, cfg)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        p = {k: np.asarray(v) for k, v in p1.items()}
        for v in p.values():
            assert v.shape == (4,) and (v == v[0]).all()


def test_parse_noise_style_ranges_and_roundtrip():
    from ssdn_tpu.config import NoiseConfig, TrainConfig, to_json
    from ssdn_tpu.config import train_config_from_json

    c = parse_noise_style("poisson5_50", blind=True)
    assert (c.lam, c.lam_max) == (5, 50) and not c.fixed_lam
    c2 = parse_noise_style("impulse30_60", blind=True)
    assert (c2.alpha, c2.alpha_max) == (0.3, 0.6) and not c2.fixed_alpha
    assert "[" in c.describe() and "[" in c2.describe()
    # JSON round-trip with the new optional fields, and with legacy
    # checkpoints that predate them
    cfg = TrainConfig(noise=c)
    rt = train_config_from_json(to_json(cfg))
    assert rt.noise == c
    import json
    d = json.loads(to_json(cfg))
    del d["noise"]["lam_max"], d["noise"]["alpha_max"]
    legacy = train_config_from_json(json.dumps(d))
    assert legacy.noise.fixed_lam and legacy.noise.fixed_alpha
