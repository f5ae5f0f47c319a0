"""Multi-dataset evaluation table (SURVEY.md §2.1 eval row, [B] config 5:
the reference's eval story is a PSNR *table* over Kodak/BSD68/Set14).

Drives the real CLIs end to end: a tiny training run, then evaluate over
two datasets (repeated flag + comma list) and check the combined JSON/table.
"""

import json

import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from ssdn_tpu.cli.train import main as train_main

    wd = tmp_path_factory.mktemp("evalcli")
    train_main([
        "--workdir", str(wd), "--train-data", "synthetic:8:64",
        "--eval-data", "synthetic:2:64", "--iterations", "4",
        "--batch-size", "2", "--patch-size", "32",
        "--eval-interval", "0", "--snapshot-interval", "4",
        "--log-interval", "0",
        "--enc-features", "8", "--dec-features", "16",
        "--nin-a-features", "32", "--nin-b-features", "16",
    ])
    return wd


def test_multi_dataset_table_json(workdir, tmp_path, capsys):
    from ssdn_tpu.cli.evaluate import main as eval_main

    out = tmp_path / "table.json"
    eval_main([
        "--workdir", str(workdir),
        "--dataset", "synthetic:2:64",
        "--dataset", "synthetic:3:64,synthetic:1:64",
        "--json-out", str(out),
    ])
    text = capsys.readouterr().out
    assert "PSNR table" in text
    payload = json.loads(out.read_text())
    table = payload["table"]
    assert set(table) == {"synthetic:2:64", "synthetic:3:64", "synthetic:1:64"}
    assert table["synthetic:3:64"]["n_images"] == 3
    for row in table.values():
        assert row["psnr_mean"] > 0 and row["noisy_psnr_mean"] > 0
    # per-image detail preserved per dataset
    assert len(payload["datasets"]["synthetic:1:64"]["psnr_per_image"]) == 1


def test_save_images_duplicate_spec_distinct_dirs(workdir, tmp_path):
    """Repeated identical --dataset specs must land in distinct indexed
    subdirs (datasets.index() collapsed both to index 0 and the second
    pass overwrote the first)."""
    from ssdn_tpu.cli.evaluate import main as eval_main

    imgdir = tmp_path / "imgs"
    eval_main([
        "--workdir", str(workdir),
        "--dataset", "synthetic:1:64",
        "--dataset", "synthetic:1:64",
        "--save-images", str(imgdir),
    ])
    subdirs = sorted(p.name for p in imgdir.iterdir() if p.is_dir())
    assert subdirs == ["00_synthetic_1_64", "01_synthetic_1_64"]
    for sub in subdirs:
        assert list((imgdir / sub).glob("*.png"))


def test_single_dataset_json_backward_compatible(workdir, tmp_path):
    from ssdn_tpu.cli.evaluate import main as eval_main

    out = tmp_path / "single.json"
    eval_main([
        "--workdir", str(workdir),
        "--dataset", "synthetic:2:64",
        "--json-out", str(out),
    ])
    payload = json.loads(out.read_text())
    # single-dataset payload keeps the flat round-1 schema
    assert "psnr_mean" in payload and "psnr_per_image" in payload


def test_batched_eval_matches_per_image(workdir):
    """eval_batch > 1 groups same-shaped images into one forward; per-image
    math is identical, so PSNRs must match the unbatched path closely."""
    import numpy as np

    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.infer import evaluate_dataset
    from ssdn_tpu.train.loop import load_config
    from ssdn_tpu.train.step import init_state

    cfg = load_config(str(workdir))
    params = init_state(cfg).params
    ds = open_dataset("synthetic:5:64")
    a = evaluate_dataset(cfg, params, ds, eval_batch=1)
    b = evaluate_dataset(cfg, params, ds, eval_batch=3)
    np.testing.assert_allclose(a["psnr_per_image"], b["psnr_per_image"],
                               atol=1e-3)
    assert b["n_images"] == 5


def test_data_parallel_eval_matches_serial(workdir):
    """DP eval: the image batch shards over the 8-device virtual mesh; each
    device denoises different images. Results must match serial eval."""
    import jax
    import numpy as np

    from ssdn_tpu import parallel
    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.infer import evaluate_dataset
    from ssdn_tpu.train.loop import load_config
    from ssdn_tpu.train.step import init_state

    cfg = load_config(str(workdir))
    params = init_state(cfg).params
    ds = open_dataset("synthetic:10:64")
    mesh = parallel.make_mesh(jax.devices()[:8])
    a = evaluate_dataset(cfg, params, ds, eval_batch=1)
    b = evaluate_dataset(cfg, params, ds, eval_batch=8, mesh=mesh)
    np.testing.assert_allclose(a["psnr_per_image"], b["psnr_per_image"],
                               atol=1e-3)


def test_batched_eval_poisson_and_impulse():
    """Regression: per-image (B,) noise-parameter vectors must broadcast as
    batch, not channels, in the Poisson/impulse estimators (found by the
    graded-config smoke: (4,) lam vs (4,H,W,3) raised; (1,) silently
    broadcast against channels)."""
    import numpy as np

    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.infer import evaluate_dataset
    from ssdn_tpu.train.step import init_state

    ds = open_dataset("synthetic:4:64")
    for style in ("poisson30", "impulse50"):
        cfg = TrainConfig(
            noise=parse_noise_style(style),
            model=ModelConfig(in_channels=3, enc_features=8, dec_features=16,
                              nin_a_features=32, nin_b_features=16,
                              compute_dtype="float32"),
            patch_size=32, batch_size=2, iterations=4,
        )
        params = init_state(cfg).params
        a = evaluate_dataset(cfg, params, ds, eval_batch=1)
        b = evaluate_dataset(cfg, params, ds, eval_batch=4)
        np.testing.assert_allclose(a["psnr_per_image"], b["psnr_per_image"],
                                   atol=1e-3, err_msg=style)


def test_noise_style_override_preserves_blind_const(tmp_path, capsys):
    """A --noise-style override on a BLIND_CONST checkpoint must keep the
    constant-blind estimator mode (the learned scalar), not silently
    rebuild the eval noise as KNOWN (VERDICT r3 weak #3)."""
    from ssdn_tpu.cli.evaluate import main as eval_main
    from ssdn_tpu.cli.train import main as train_main

    wd = tmp_path / "bc"
    train_main([
        "--workdir", str(wd), "--train-data", "synthetic:8:64",
        "--eval-data", "synthetic:2:64", "--iterations", "4",
        "--batch-size", "2", "--patch-size", "32",
        "--eval-interval", "0", "--snapshot-interval", "4",
        "--log-interval", "0", "--noise-style", "gauss25",
        "--blind", "const",
        "--enc-features", "8", "--dec-features", "16",
        "--nin-a-features", "32", "--nin-b-features", "16",
    ])
    capsys.readouterr()
    eval_main([
        "--workdir", str(wd),
        "--dataset", "synthetic:2:64",
        "--noise-style", "gauss30",
    ])
    text = capsys.readouterr().out
    # the override changed the injected sigma but kept the estimator mode
    assert "gauss sigma=30 (blind_const)" in text


def test_batched_eval_blind_modes():
    """Blind-parameter eval (sigma/lambda/alpha estimated by the net): the
    posterior consumes the network's own estimate, so batched and serial
    eval must agree with no true parameter fed in."""
    import numpy as np

    from ssdn_tpu.config import ModelConfig, TrainConfig, parse_noise_style
    from ssdn_tpu.data import open_dataset
    from ssdn_tpu.infer import evaluate_dataset
    from ssdn_tpu.train.step import init_state

    ds = open_dataset("synthetic:4:64")
    for style in ("gauss5_50", "poisson5_50", "impulse30_60"):
        cfg = TrainConfig(
            noise=parse_noise_style(style, blind=True),
            model=ModelConfig(in_channels=3, enc_features=8, dec_features=16,
                              nin_a_features=32, nin_b_features=16,
                              compute_dtype="float32"),
            patch_size=32, batch_size=2, iterations=4,
        )
        params = init_state(cfg).params
        a = evaluate_dataset(cfg, params, ds, eval_batch=1)
        b = evaluate_dataset(cfg, params, ds, eval_batch=4)
        np.testing.assert_allclose(a["psnr_per_image"], b["psnr_per_image"],
                                   atol=1e-3, err_msg=style)
