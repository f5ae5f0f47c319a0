"""Clean-image datasets (SURVEY.md §2.1 datasets row).

Reference equivalents: ``UnlabelledImageFolderDataset`` -> FolderDataset,
``HDF5Dataset`` -> HDF5Dataset [R]. The reference's ``NoiseWrappedDataset``
and ``FixedLengthSampler`` have no classes here by design: noise injection
moved on-device into the jitted step (noise/), and fixed-length step-indexed
sampling is the sampler's native semantics (sampler.py).

Protocol: len(ds) and ds[i] -> uint8 HWC numpy array (C = 1 or 3).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ssdn_tpu.data.synthetic import make_images
from ssdn_tpu.utils.images import list_images, load_image


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> uint8 HW1 (ITU-R BT.601 luma)."""
    if img.shape[-1] == 1:
        return img
    luma = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return np.clip(luma + 0.5, 0, 255).astype(np.uint8)[..., None]


class FolderDataset:
    """Folder of image files, loaded lazily with a small LRU-ish cache."""

    def __init__(self, folder: str, grayscale: bool = False,
                 cache_all: bool = True):
        self.paths = list_images(folder)
        if not self.paths:
            raise FileNotFoundError(f"no images in {folder}")
        self.grayscale = grayscale
        self._cache: Optional[List[Optional[np.ndarray]]] = (
            [None] * len(self.paths) if cache_all else None
        )

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, i: int) -> np.ndarray:
        if self._cache is not None and self._cache[i] is not None:
            return self._cache[i]
        img = load_image(self.paths[i], grayscale=self.grayscale)
        if self._cache is not None:
            self._cache[i] = img
        return img


class HDF5Dataset:
    """Pre-packed uint8 images in an HDF5 file (see tooling.pack_folder).

    Layout: either one dataset ``images`` of shape (N, H, W, C), or N
    datasets ``images/<i>`` for variable-size corpora.
    """

    def __init__(self, path: str, grayscale: bool = False):
        import h5py  # baked in

        self._f = h5py.File(path, "r")
        self.grayscale = grayscale
        obj = self._f["images"]
        self._group = isinstance(obj, h5py.Group)
        if self._group:  # group of per-image datasets (variable sizes)
            self._keys = sorted(obj.keys(), key=int)
            self._n = len(self._keys)
        else:  # one (N, H, W, C) dataset
            self._n = obj.shape[0]

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, i: int) -> np.ndarray:
        if self._group:
            img = np.asarray(self._f["images"][self._keys[i]], np.uint8)
        else:
            img = np.asarray(self._f["images"][i], np.uint8)
        if img.ndim == 2:
            img = img[..., None]
        return to_grayscale(img) if self.grayscale else img


class ArrayDataset:
    """In-memory list of uint8 HWC arrays (synthetic corpora, tests)."""

    def __init__(self, images: Sequence[np.ndarray], grayscale: bool = False):
        self.images = list(images)
        self.grayscale = grayscale

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, i: int) -> np.ndarray:
        img = self.images[i]
        return to_grayscale(img) if self.grayscale else img


def synthetic_dataset(
    n: int = 64, size: int = 128, channels: int = 3, seed: int = 0,
    grayscale: bool = False,
) -> ArrayDataset:
    return ArrayDataset(
        make_images(n, size=size, channels=channels, seed=seed),
        grayscale=grayscale and channels == 3,
    )


def open_dataset(spec: str, grayscale: bool = False):
    """Open a dataset from a path spec: an image folder, an .h5/.hdf5 file,
    or 'synthetic[:n[:size]]' for the procedural corpus."""
    if spec.startswith("synthetic"):
        parts = spec.split(":")
        n = int(parts[1]) if len(parts) > 1 else 64
        size = int(parts[2]) if len(parts) > 2 else 128
        ds = synthetic_dataset(n=n, size=size, channels=3)
        ds.grayscale = grayscale
        return ds
    if spec.endswith((".h5", ".hdf5")):
        return HDF5Dataset(spec, grayscale=grayscale)
    if os.path.isdir(spec):
        return FolderDataset(spec, grayscale=grayscale)
    raise FileNotFoundError(spec)
