"""Per-level halo exchange tests (SURVEY.md §5.7 option (a); VERDICT r3
missing #4): sharded tiled inference must equal the untiled forward at
REAL eval image sizes — a 768-px-wide image over 8 devices, where the
clamped-window modes degenerate to all_gather — with strip-sized
per-device windows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssdn_tpu import parallel
from ssdn_tpu.config import (
    ModelConfig,
    Pipeline,
    TrainConfig,
    parse_noise_style,
)
from ssdn_tpu.infer import denoise_image, make_denoise_fn
from ssdn_tpu.infer.halo import perlevel_supported, tiled_denoise_perlevel
from ssdn_tpu.infer.tiled import tiled_denoise_sharded
from ssdn_tpu.train.step import init_state

TINY = dict(enc_features=8, dec_features=16, nin_a_features=32,
            nin_b_features=16, compute_dtype="float32")


def _cfg(noise="gauss25", blind=False, pipeline=Pipeline.SSDN):
    return TrainConfig(
        pipeline=pipeline,
        noise=parse_noise_style(noise, blind=blind),
        model=ModelConfig(in_channels=3, **TINY),
        iterations=10,
    )


def _mesh(n=8):
    return parallel.make_mesh(jax.devices()[:n], axis=parallel.TILE_AXIS)


def _problem(cfg, w=768, h=64, seed=11, param=25 / 255):
    params = init_state(cfg).params
    rng = np.random.default_rng(seed)
    noisy = rng.uniform(-0.5, 0.5, (h, w, 3)).astype(np.float32)
    pvec = jnp.full((1,), param, jnp.float32)
    ref = denoise_image(make_denoise_fn(cfg), params, noisy, pvec)
    return params, noisy, pvec, ref


def test_perlevel_exact_at_kodak_width():
    """768 px wide / 8 devices => strip 96: the window modes would
    all_gather here (2*320 > 96); per-level must be exact."""
    cfg = _cfg()
    params, noisy, pvec, ref = _problem(cfg)
    out = tiled_denoise_perlevel(cfg, params, noisy, pvec, _mesh())
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_auto_strategy_routes_to_perlevel():
    cfg = _cfg()
    assert perlevel_supported(cfg)
    params, noisy, pvec, ref = _problem(cfg, w=256, h=32, seed=12)
    out = tiled_denoise_sharded(cfg, params, noisy, pvec, _mesh(),
                                strategy="auto")
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_perlevel_ragged_width_pads_and_crops():
    cfg = _cfg()
    params, noisy, pvec, _ = _problem(cfg, w=768, h=64, seed=13)
    crop = noisy[:, :500]  # forces reflect pad to 512 = 8 * 64
    ref = denoise_image(make_denoise_fn(cfg), params, crop, pvec)
    out = tiled_denoise_perlevel(cfg, params, crop, pvec, _mesh())
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_perlevel_blind_sigma_global_estimate():
    """BLIND noise: sigma_hat is an image-global spatial mean — the pmean
    path must reproduce the untiled estimate exactly."""
    cfg = _cfg("gauss5_50", blind="variable")
    params, noisy, pvec, ref = _problem(cfg, w=512, h=32, seed=14)
    out = tiled_denoise_perlevel(cfg, params, noisy, pvec, _mesh())
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_perlevel_blind_impulse_global_estimate():
    cfg = _cfg("impulse50", blind="variable")
    params, noisy, pvec, ref = _problem(cfg, w=512, h=32, seed=15,
                                        param=0.5)
    out = tiled_denoise_perlevel(cfg, params, noisy, pvec, _mesh())
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_perlevel_blind_poisson_global_estimate():
    """The Poisson-blind per-level path maps lam = 0.5/s^2 onto the KNOWN
    variance form (halo.py _blind_eval_cfg) — the only blind model the
    original suite left unexercised (ADVICE r4)."""
    cfg = _cfg("poisson5_50", blind="variable")
    params, noisy, pvec, ref = _problem(cfg, w=512, h=32, seed=19,
                                        param=30.0)
    out = tiled_denoise_perlevel(cfg, params, noisy, pvec, _mesh())
    # atol 1e-3 (not 1e-4): the sharded global estimate is a pmean of
    # per-strip means while the untiled path is one spatial mean —
    # fp32 reduction-order noise that lam = 0.5/s^2 then amplifies.
    # Measured across hosts: <=1.8e-4 abs on <0.02% of elements
    # (round-5 session; cache-independent). Structural halo errors are
    # orders of magnitude larger, so the pin keeps its teeth.
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_perlevel_blind_const_learned_scalar():
    """BLIND_CONST: the learned free scalar (params['noise_scalar']['raw'])
    threads through runtime_noise_params under shard_map (halo.py strip_fn)
    — exercised for all three noise models (VERDICT r4 #6)."""
    for style, param in (("gauss25", 25 / 255), ("poisson30", 30.0),
                         ("impulse50", 0.5)):
        cfg = _cfg(style, blind="const")
        params, noisy, pvec, ref = _problem(cfg, w=512, h=32, seed=20,
                                            param=param)
        assert "noise_scalar" in params, style
        out = tiled_denoise_perlevel(cfg, params, noisy, pvec, _mesh())
        # atol 1e-3: same host-dependent fp32 reduction-order allowance
        # as the blind-poisson test above (the poisson30 case shares the
        # 0.5/s^2 reciprocal variance mapping).
        np.testing.assert_allclose(out, ref, atol=1e-3, err_msg=style)


def test_pallas_backends_fall_back_to_window(monkeypatch):
    """conv/head_backend='pallas' is outside perlevel_supported; 'auto'
    must route cleanly to the clamped-window modes and 'perlevel' must
    refuse (VERDICT r4 #6)."""
    import ssdn_tpu.infer.tiled as tiled_mod

    for field in ("conv_backend", "head_backend"):
        cfg = TrainConfig(
            pipeline=Pipeline.SSDN,
            noise=parse_noise_style("gauss25"),
            model=ModelConfig(in_channels=3, **TINY, **{field: "pallas"}),
            iterations=10,
        )
        assert not perlevel_supported(cfg), field
        params, noisy, pvec, _ = _problem(_cfg(), w=256, h=32, seed=21)
        with pytest.raises(ValueError, match="lax"):
            tiled_denoise_sharded(cfg, params, noisy, pvec, _mesh(),
                                  strategy="perlevel")
        # routing check without executing the pallas kernels on CPU:
        # stub both window-mode factories and assert auto lands on one
        calls = []

        def stub(name):
            def make(*a, **k):
                calls.append(name)
                return lambda params, y, nv: y
            return make

        monkeypatch.setattr(tiled_mod, "make_gather_fn", stub("gather"))
        monkeypatch.setattr(tiled_mod, "make_exchange_fn", stub("exchange"))
        out = tiled_denoise_sharded(cfg, params, noisy, pvec, _mesh(),
                                    strategy="auto")
        assert calls and out.shape == noisy.shape, field


def test_perlevel_mse_pipeline():
    cfg = _cfg(pipeline=Pipeline.SSDN_MSE)
    params, noisy, pvec, ref = _problem(cfg, w=256, h=32, seed=16)
    out = tiled_denoise_perlevel(cfg, params, noisy, pvec, _mesh())
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_perlevel_single_device_degenerates_to_untiled():
    cfg = _cfg()
    params, noisy, pvec, ref = _problem(cfg, w=256, h=32, seed=17)
    out = tiled_denoise_perlevel(cfg, params, noisy, pvec, _mesh(1))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_perlevel_unsupported_raises():
    cfg = TrainConfig(
        pipeline=Pipeline.N2C,
        noise=parse_noise_style("gauss25"),
        model=ModelConfig(in_channels=3, **TINY),
        iterations=10,
    )
    assert not perlevel_supported(cfg)
    params, noisy, pvec, _ = _problem(_cfg(), w=256, h=32, seed=18)
    with pytest.raises(ValueError):
        tiled_denoise_sharded(cfg, params, noisy, pvec, _mesh(),
                              strategy="perlevel")
