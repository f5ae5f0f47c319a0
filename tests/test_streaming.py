"""Unbounded streaming procedural corpus (VERDICT r2 item 3): determinism,
freshness (no image reuse across steps), sampler routing, and the
eval-side guard."""

import numpy as np
import pytest

from ssdn_tpu.data import (
    StreamingPatchSampler,
    StreamingSyntheticDataset,
    open_dataset,
)
from ssdn_tpu.native import make_sampler


def test_open_dataset_inf_spec():
    ds = open_dataset("synthetic:inf:96")
    assert getattr(ds, "streaming", False)
    assert ds.size == 96
    img = ds[123]
    assert img.shape == (96, 96, 3) and img.dtype == np.uint8
    gray = open_dataset("synthetic:inf:64", grayscale=True)
    assert gray[5].shape == (64, 64, 1)


def test_generation_deterministic_and_distinct():
    a = StreamingSyntheticDataset(size=64)
    b = StreamingSyntheticDataset(size=64)
    np.testing.assert_array_equal(a[7], b[7])
    assert not np.array_equal(a[7], a[8])
    # cache returns the same content
    np.testing.assert_array_equal(a[7], a[7])


def test_sampler_pure_in_seed_step_and_fresh_across_steps():
    ds = StreamingSyntheticDataset(size=128)
    s1 = StreamingPatchSampler(ds, 64, 8, seed=3)
    s2 = StreamingPatchSampler(ds, 64, 8, seed=3)
    b1, b2 = s1.sample(11), s2.sample(11)
    np.testing.assert_array_equal(b1, b2)
    assert b1.shape == (8, 64, 64, 3)
    # different steps draw from disjoint image blocks: no patch can repeat
    b3 = s1.sample(12)
    assert not np.array_equal(b1, b3)
    # freshness: the image indices of steps 11 and 12 don't overlap
    n_imgs = -(-8 // s1.crops_per_image)
    i11 = (11 * n_imgs) % (len(ds) - n_imgs)
    i12 = (12 * n_imgs) % (len(ds) - n_imgs)
    assert set(range(i11, i11 + n_imgs)).isdisjoint(
        range(i12, i12 + n_imgs))
    s1.close(), s2.close()


def test_make_sampler_routes_streaming():
    ds = open_dataset("synthetic:inf:64")
    s = make_sampler(ds, 32, 4, seed=0, backend="auto")
    assert isinstance(s, StreamingPatchSampler)
    assert s.sample(0).shape == (4, 32, 32, 3)
    s.close()


def test_eval_rejects_streaming():
    from ssdn_tpu.config import TrainConfig
    from ssdn_tpu.infer import evaluate_dataset

    ds = open_dataset("synthetic:inf:64")
    with pytest.raises(ValueError, match="finite"):
        evaluate_dataset(TrainConfig(), None, ds)


def test_trainer_rejects_streaming_eval(tmp_path):
    # Fail-fast at construction — without this the ValueError would only
    # fire at the FIRST eval, potentially 10k steps into a chip run.
    from ssdn_tpu.config import TrainConfig
    from ssdn_tpu.train.loop import Trainer

    with pytest.raises(ValueError, match="streaming"):
        Trainer(TrainConfig(), str(tmp_path),
                train_data="synthetic:inf:64",
                eval_data="synthetic:inf:64")


def test_grayscale_streaming_sampler():
    ds = open_dataset("synthetic:inf:64", grayscale=True)
    s = make_sampler(ds, 32, 4, seed=0)
    b = s.sample(5)
    assert b.shape == (4, 32, 32, 1)
    s.close()
