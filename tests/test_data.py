"""Dataset, sampler, tooling, and CLI-config tests (SURVEY.md §2.1 dataset
rows; §5.6 config axes)."""

import os

import numpy as np
import pytest

from ssdn_tpu.data import (
    ArrayDataset,
    FolderDataset,
    HDF5Dataset,
    PatchSampler,
    Prefetcher,
    make_images,
    open_dataset,
    synthetic_dataset,
    to_grayscale,
)
from ssdn_tpu.data.tooling import pack_folder
from ssdn_tpu.utils import save_image


def test_synthetic_images_deterministic():
    a = make_images(3, size=64, channels=3, seed=7)
    b = make_images(3, size=64, channels=3, seed=7)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
        assert x.shape == (64, 64, 3) and x.dtype == np.uint8
    c = make_images(1, size=64, channels=3, seed=8)
    assert np.any(c[0] != a[0])


def test_grayscale_conversion():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 0] = 255  # pure red
    g = to_grayscale(img)
    assert g.shape == (4, 4, 1)
    assert abs(int(g[0, 0, 0]) - 76) <= 1  # 0.299 * 255


def test_folder_dataset_roundtrip(tmp_path):
    imgs = make_images(3, size=32, channels=3, seed=0)
    for i, im in enumerate(imgs):
        save_image(str(tmp_path / f"im{i}.png"), im)
    ds = FolderDataset(str(tmp_path))
    assert len(ds) == 3
    np.testing.assert_array_equal(ds[0], imgs[0])
    gds = FolderDataset(str(tmp_path), grayscale=True)
    assert gds[0].shape == (32, 32, 1)


def test_hdf5_pack_and_read(tmp_path):
    imgs = make_images(4, size=32, channels=3, seed=1)
    for i, im in enumerate(imgs):
        save_image(str(tmp_path / f"im{i}.png"), im)
    out = str(tmp_path / "packed.h5")
    n = pack_folder(str(tmp_path), out)
    assert n == 4
    ds = HDF5Dataset(out)
    assert len(ds) == 4
    np.testing.assert_array_equal(ds[2], imgs[2])
    # uniform layout
    out2 = str(tmp_path / "packed_uniform.h5")
    pack_folder(str(tmp_path), out2, uniform=True)
    ds2 = HDF5Dataset(out2, grayscale=True)
    assert ds2[0].shape == (32, 32, 1)


def test_open_dataset_dispatch(tmp_path):
    assert len(open_dataset("synthetic:5:32")) == 5
    with pytest.raises(FileNotFoundError):
        open_dataset(str(tmp_path / "missing"))


def test_bundled_real_photo_dataset():
    """'bundled' = real photographs shipped inside installed packages —
    the only real-photo PSNR anchor on this zero-egress box (SURVEY.md §6:
    no Kodak/BSD68/Set14 on disk)."""
    from ssdn_tpu.data.datasets import _bundled_photo_paths

    if not _bundled_photo_paths():
        pytest.skip("no bundled sample photos on this box")
    ds = open_dataset("bundled")
    assert len(ds) >= 2
    for i in range(len(ds)):
        img = ds[i]
        assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[-1] == 3
        assert min(img.shape[:2]) >= 256  # real full-size photos, not icons
    g = open_dataset("bundled", grayscale=True)
    assert g[0].shape[-1] == 1


def test_patch_sampler_determinism_and_bounds():
    ds = synthetic_dataset(n=4, size=48, channels=3, seed=2)
    s = PatchSampler(ds, patch_size=32, batch_size=8, seed=5)
    a, b = s.sample(10), s.sample(10)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 32, 32, 3) and a.dtype == np.uint8
    assert np.any(s.sample(11) != a)


def test_patch_sampler_small_images_padded():
    ds = ArrayDataset([np.full((10, 10, 1), 7, np.uint8)])
    s = PatchSampler(ds, patch_size=32, batch_size=2, seed=0)
    out = s.sample(0)
    assert out.shape == (2, 32, 32, 1)
    assert (out == 7).all()


def test_prefetcher_yields_all_steps_in_order():
    ds = synthetic_dataset(n=2, size=48, channels=3, seed=3)
    s = PatchSampler(ds, patch_size=32, batch_size=2, seed=1)
    got = list(Prefetcher(s, start_step=3, n_steps=4))
    assert len(got) == 4
    np.testing.assert_array_equal(got[0], s.sample(3))
    np.testing.assert_array_equal(got[3], s.sample(6))


def test_prefetcher_multithreaded_order_all_thread_counts():
    # exact step order must hold for every n_threads, including counts
    # that do not divide n_steps (the round-robin sentinel edge case)
    ds = synthetic_dataset(n=2, size=48, channels=3, seed=3)
    s = PatchSampler(ds, patch_size=32, batch_size=2, seed=1)
    want = [s.sample(k) for k in range(5, 5 + 11)]
    for n_threads in (1, 2, 3, 4, 8, 16):
        got = list(Prefetcher(s, start_step=5, n_steps=11, depth=6,
                              n_threads=n_threads))
        assert len(got) == 11, n_threads
        for a, b in zip(got, want):
            np.testing.assert_array_equal(a, b)


def test_prefetcher_transform_runs_in_workers():
    ds = synthetic_dataset(n=2, size=48, channels=3, seed=3)
    s = PatchSampler(ds, patch_size=32, batch_size=2, seed=1)
    got = list(Prefetcher(s, 0, 6, n_threads=3,
                          transform=lambda b: b.astype(np.float32) + 1.0))
    assert all(g.dtype == np.float32 for g in got)
    np.testing.assert_array_equal(got[2], s.sample(2).astype(np.float32) + 1)


def test_prefetcher_worker_error_propagates():
    import pytest

    class Boom:
        def sample(self, step):
            if step == 3:
                raise RuntimeError("bad step")
            return np.zeros((1, 2, 2, 1), np.uint8)

    with pytest.raises(RuntimeError, match="bad step"):
        list(Prefetcher(Boom(), 0, 8, n_threads=2))


def test_prefetcher_close_unblocks_workers():
    s = PatchSampler(synthetic_dataset(n=2, size=48, seed=3), 32, 2, seed=1)
    p = Prefetcher(s, 0, 100, depth=4, n_threads=2)
    it = iter(p)
    next(it)
    p.close()  # workers blocked on full queues must exit, not hang
    for t in p.threads:
        t.join(timeout=5.0)
        assert not t.is_alive()


def test_train_cli_config_building():
    from ssdn_tpu.cli.train import build_parser, config_from_args
    from ssdn_tpu.config import NoiseModel, NoiseValue, Pipeline

    args = build_parser().parse_args(
        ["--workdir", "/tmp/x", "--algorithm", "n2n", "--noise-style",
         "poisson30", "--grayscale", "--patch-size", "32",
         "--compute-dtype", "float32"]
    )
    cfg = config_from_args(args)
    assert cfg.pipeline == Pipeline.N2N
    assert cfg.noise.model == NoiseModel.POISSON and cfg.noise.lam == 30
    assert cfg.model.in_channels == 1 and cfg.patch_size == 32
    args2 = build_parser().parse_args(
        ["--workdir", "/tmp/x", "--noise-style", "gauss5_50", "--blind"]
    )
    cfg2 = config_from_args(args2)
    assert cfg2.noise.value == NoiseValue.BLIND
    assert (cfg2.noise.sigma_min, cfg2.noise.sigma_max) == (5, 50)


def test_config_json_roundtrip():
    from ssdn_tpu.config import (
        ModelConfig,
        TrainConfig,
        parse_noise_style,
        to_json,
        train_config_from_json,
    )

    cfg = TrainConfig(
        noise=parse_noise_style("impulse50", blind=True),
        model=ModelConfig(in_channels=1, compute_dtype="float32"),
        patch_size=32,
        grayscale=True,
    )
    cfg2 = train_config_from_json(to_json(cfg))
    assert cfg2 == cfg
