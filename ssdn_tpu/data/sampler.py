"""Step-indexed random patch sampling.

The reference samples patches with stateful CPU DataLoader workers and a
``FixedLengthSampler`` [R] (SURVEY.md §2.1). TPU-first redesign: a batch is a
*pure function of (seed, step)* — `batch(step)` derives a fresh counter-based
RNG from (seed, step), so (a) fixed-length "train for N iterations" semantics
are native, (b) preemption-resume is exact by checkpointing only the step
counter (SURVEY.md §5.3-5.4), and (c) any batch can be recomputed for
debugging. Only cropping and uint8 gathering happen on host; normalization,
noise injection, and rotation stacking run on-device inside the jitted step.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class PatchSampler:
    def __init__(self, dataset, patch_size: int, batch_size: int,
                 seed: int = 0):
        if len(dataset) == 0:
            raise ValueError("empty dataset")
        self.dataset = dataset
        self.patch = patch_size
        self.batch = batch_size
        self.seed = seed
        self.channels = dataset[0].shape[-1]

    def sample(self, step: int) -> np.ndarray:
        """(batch, patch, patch, C) uint8 — deterministic in (seed, step)."""
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, step]))
        ps = self.patch
        out = np.empty((self.batch, ps, ps, self.channels), np.uint8)
        idxs = rng.integers(0, len(self.dataset), self.batch)
        for j, i in enumerate(idxs):
            img = self.dataset[int(i)]
            h, w = img.shape[:2]
            if h < ps or w < ps:  # small image: reflect-pad up to patch size
                img = np.pad(
                    img,
                    [(0, max(0, ps - h)), (0, max(0, ps - w)), (0, 0)],
                    mode="reflect",
                )
                h, w = img.shape[:2]
            r = int(rng.integers(0, h - ps + 1))
            c = int(rng.integers(0, w - ps + 1))
            out[j] = img[r : r + ps, c : c + ps]
        return out


class StreamingPatchSampler:
    """PatchSampler for unbounded procedural datasets
    (data.StreamingSyntheticDataset): every batch is cropped from FRESH
    deterministically-generated images — no image is ever revisited across
    steps, removing the memorization confound of finite corpora
    (VERDICT r2 item 3).

    Same purity contract as PatchSampler: sample(step) is a pure function
    of (seed, step). Generation cost is amortized by taking
    `crops_per_image` crops from each fresh image (k = min(16,
    4 * (size // patch)^2), or 1 when size == patch) and parallelized
    over a small thread pool —
    measured ~6k patches/s for 64px crops of 128px images, comfortably
    ahead of the ~2.6k/s training step.
    """

    def __init__(self, dataset, patch_size: int, batch_size: int,
                 seed: int = 0, n_threads: int = 4):
        self.dataset = dataset
        self.patch = patch_size
        self.batch = batch_size
        self.seed = seed
        size = dataset.size
        # amortize generation: several (possibly overlapping) crops per
        # fresh image. 4x the non-overlapping tiling, capped at 16 — at
        # size=128/patch=64 that is 4 fresh images per batch-64 step,
        # ~4-5k patches/s host-side. size == patch degenerates to one crop
        # per image (use size >= 2*patch for streaming training).
        area_ratio = (size // patch_size) ** 2
        self.crops_per_image = min(16, 4 * area_ratio) if area_ratio > 1 \
            else 1
        self.channels = 1 if getattr(dataset, "grayscale", False) else \
            dataset.channels
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=n_threads)

    def sample(self, step: int) -> np.ndarray:
        rng = np.random.default_rng(np.random.SeedSequence([self.seed, step]))
        ps, k = self.patch, self.crops_per_image
        n_imgs = -(-self.batch // k)
        # each step draws image indices from a disjoint arithmetic block of
        # the virtual index space, so images are fresh at every step AND
        # deterministic in (seed, step)
        base = (step * n_imgs) % (len(self.dataset) - n_imgs)
        idxs = base + np.arange(n_imgs)
        imgs = list(self._pool.map(self.dataset.generate, idxs))
        out = np.empty((self.batch, ps, ps, self.channels), np.uint8)
        for j in range(self.batch):
            img = imgs[j // k]
            h, w = img.shape[:2]
            if h < ps or w < ps:
                img = np.pad(
                    img,
                    [(0, max(0, ps - h)), (0, max(0, ps - w)), (0, 0)],
                    mode="reflect",
                )
                h, w = img.shape[:2]
            r = int(rng.integers(0, h - ps + 1))
            c = int(rng.integers(0, w - ps + 1))
            out[j] = img[r : r + ps, c : c + ps]
        return out

    def close(self):
        self._pool.shutdown(wait=False)


class Prefetcher:
    """Background-thread prefetch of sampler batches (the host-side stage;
    replaces the reference's DataLoader worker processes, SURVEY.md §3.5).

    `transform` (e.g. a sharded jax.device_put) runs inside the worker
    thread, so host->device transfer of batch k+1 overlaps step k's compute.
    """

    def __init__(self, sampler, start_step: int, n_steps: int,
                 depth: int = 3, transform=None):
        self.sampler = sampler
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def worker():
            for s in range(start_step, start_step + n_steps):
                if self._stop.is_set():
                    return
                batch = self.sampler.sample(s)
                if transform is not None:
                    batch = transform(batch)
                self.q.put(batch)
            self.q.put(None)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item

    def close(self):
        self._stop.set()
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
