"""End-to-end test for the production denoise CLI: train a tiny model,
write actually-noisy PNGs to disk, run `ssdn_tpu.cli.denoise` on the folder,
and check the outputs exist and are closer to the clean images than the
noisy inputs were (i.e. real denoising happened through the file-based
surface, not just in-memory)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from ssdn_tpu.cli.train import main as train_main

    wd = tmp_path_factory.mktemp("denoisecli")
    # narrow net + few steps: this fixture only needs a model that beats
    # the noisy input, and it was the slowest item in the suite (VERDICT
    # r2: 426 s at full width / 60 iters)
    train_main([
        "--workdir", str(wd), "--train-data", "synthetic:16:64",
        "--iterations", "40", "--batch-size", "4", "--patch-size", "32",
        "--eval-interval", "0", "--snapshot-interval", "40",
        "--log-interval", "0",
        "--enc-features", "16", "--dec-features", "32",
        "--nin-a-features", "64", "--nin-b-features", "32",
    ])
    return wd


def _write_noisy(tmp_path, n=2, size=64, sigma=25.0, seed=7):
    from ssdn_tpu.data import synthetic_dataset
    from ssdn_tpu.utils import save_image

    rng = np.random.default_rng(seed)
    ds = synthetic_dataset(n=n, size=size, channels=3, seed=seed)
    indir = tmp_path / "noisy"
    cleans = []
    for i in range(n):
        clean = np.asarray(ds[i], np.float32) / 255.0
        noisy = clean + rng.normal(0, sigma / 255.0, clean.shape)
        save_image(str(indir / f"img{i}.png"),
                   (np.clip(noisy, 0, 1) * 255).round().astype(np.uint8))
        cleans.append(clean)
    return indir, cleans


def test_denoise_folder(trained, tmp_path):
    from ssdn_tpu.cli.denoise import main as denoise_main
    from ssdn_tpu.utils import load_image

    indir, cleans = _write_noisy(tmp_path)
    outdir = tmp_path / "out"
    denoise_main([
        "--workdir", str(trained), "--input", str(indir),
        "--output", str(outdir), "--param", "25",
    ])
    outs = sorted(outdir.glob("*_denoised.png"))
    assert len(outs) == len(cleans)
    for out, clean in zip(outs, cleans):
        den = np.asarray(load_image(str(out)), np.float32) / 255.0
        noisy = np.asarray(
            load_image(str(indir / out.name.replace("_denoised", ""))),
            np.float32) / 255.0
        mse_d = float(np.mean((den - clean) ** 2))
        mse_n = float(np.mean((noisy - clean) ** 2))
        # even a 60-step model must beat the raw noisy input
        assert mse_d < mse_n, (mse_d, mse_n)


def test_denoise_single_file_sequential(trained, tmp_path):
    from ssdn_tpu.cli.denoise import main as denoise_main

    indir, _ = _write_noisy(tmp_path, n=1)
    outdir = tmp_path / "out_seq"
    denoise_main([
        "--workdir", str(trained), "--input", str(indir / "img0.png"),
        "--output", str(outdir), "--tiled", "sequential",
        "--tile-w", "32", "--halo", "32",
    ])
    assert (outdir / "img0_denoised.png").exists()


def test_denoise_rerun_and_extension_collision(trained, tmp_path):
    """img.png + img.jpg in one folder uniquify (ADVICE r2); re-running
    into the same output dir must REFRESH the canonical paths, not
    redirect the new results away because last run's files exist."""
    import shutil

    from ssdn_tpu.cli.denoise import main as denoise_main

    indir, _ = _write_noisy(tmp_path, n=1)
    shutil.copyfile(indir / "img0.png", indir / "img0.jpg")
    outdir = tmp_path / "out_coll"
    args = ["--workdir", str(trained), "--input", str(indir),
            "--output", str(outdir), "--param", "25"]
    denoise_main(args)
    canonical = outdir / "img0_denoised.png"
    uniquified = {p.name for p in outdir.glob("*_denoised.png")} - {
        canonical.name}
    assert canonical.exists()
    assert len(uniquified) == 1  # the extension-tagged second output
    before = canonical.stat().st_mtime_ns
    denoise_main(args)
    # same two filenames, canonical rewritten in place
    assert {p.name for p in outdir.glob("*_denoised.png")} == (
        uniquified | {canonical.name})
    assert canonical.stat().st_mtime_ns > before


def test_denoise_default_param_from_config(trained, tmp_path):
    from ssdn_tpu.cli.denoise import main as denoise_main

    indir, _ = _write_noisy(tmp_path, n=1)
    outdir = tmp_path / "out_def"
    denoise_main([
        "--workdir", str(trained), "--input", str(indir),
        "--output", str(outdir),
    ])
    assert (outdir / "img0_denoised.png").exists()
