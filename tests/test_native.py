"""Native C++ patch-gatherer tests: exact differential cross-check against a
Python mirror of the splitmix64 index computation, determinism, bounds,
fallback, and a throughput sanity bound."""

import time

import numpy as np
import pytest

from ssdn_tpu.data import ArrayDataset, synthetic_dataset
from ssdn_tpu.native import (
    NativePatchSampler,
    available,
    load_error,
    make_sampler,
)

pytestmark = pytest.mark.skipif(
    not available(), reason=f"native sampler unavailable: {load_error()}"
)

MASK = (1 << 64) - 1


def splitmix64(x):
    x = (x + 0x9E3779B97F4A7C15) & MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
    return x ^ (x >> 31)


def expected_indices(seed, step, j, n_images, hw, ps):
    s = splitmix64(seed ^ splitmix64(step ^ splitmix64(j)))
    r1 = splitmix64(s)
    r2 = splitmix64(r1)
    r3 = splitmix64(r2)
    img = r1 % n_images
    h, w = hw[img]
    return img, r2 % (h - ps + 1), r3 % (w - ps + 1)


def test_crops_match_python_mirror():
    ds = synthetic_dataset(n=5, size=48, channels=3, seed=0)
    s = NativePatchSampler(ds, patch_size=16, batch_size=32, seed=9)
    out = s.sample(3)
    hw = [(ds[i].shape[0], ds[i].shape[1]) for i in range(5)]
    for j in range(32):
        img, r, c = expected_indices(9, 3, j, 5, hw, 16)
        np.testing.assert_array_equal(
            out[j], ds[img][r : r + 16, c : c + 16],
            err_msg=f"sample {j} (img {img} @ {r},{c})",
        )


def test_determinism_and_step_variation():
    ds = synthetic_dataset(n=3, size=64, channels=1, seed=1)
    s = NativePatchSampler(ds, patch_size=32, batch_size=8, seed=4)
    np.testing.assert_array_equal(s.sample(7), s.sample(7))
    assert np.any(s.sample(8) != s.sample(7))


def test_small_images_padded():
    ds = ArrayDataset([np.full((10, 12, 3), 5, np.uint8)])
    s = NativePatchSampler(ds, patch_size=32, batch_size=4, seed=0)
    out = s.sample(0)
    assert out.shape == (4, 32, 32, 3)
    assert (out == 5).all()


def test_make_sampler_backends():
    from ssdn_tpu.data.sampler import PatchSampler

    ds = synthetic_dataset(n=2, size=48, channels=3, seed=2)
    assert isinstance(make_sampler(ds, 32, 4, backend="python"), PatchSampler)
    assert isinstance(
        make_sampler(ds, 32, 4, backend="native"), NativePatchSampler
    )
    auto = make_sampler(ds, 32, 4, backend="auto")
    assert isinstance(auto, NativePatchSampler)


def test_throughput_beats_python_loop():
    ds = synthetic_dataset(n=16, size=256, channels=3, seed=3)
    native = NativePatchSampler(ds, patch_size=64, batch_size=256, seed=0)
    from ssdn_tpu.data.sampler import PatchSampler

    python = PatchSampler(ds, patch_size=64, batch_size=256, seed=0)
    native.sample(0), python.sample(0)  # warm caches
    t0 = time.perf_counter()
    for i in range(20):
        native.sample(i)
    tn = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(20):
        python.sample(i)
    tp = time.perf_counter() - t0
    # the point of the native path: comfortably faster than Python slicing
    assert tn < tp, (tn, tp)
    print(f"native {20*256/tn:.0f} vs python {20*256/tp:.0f} patches/s")
