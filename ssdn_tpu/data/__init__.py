from ssdn_tpu.data.datasets import (
    ArrayDataset,
    FolderDataset,
    HDF5Dataset,
    StreamingSyntheticDataset,
    bundled_dataset,
    open_dataset,
    synthetic_dataset,
    to_grayscale,
)
from ssdn_tpu.data.sampler import (
    PatchSampler,
    Prefetcher,
    StreamingPatchSampler,
)
from ssdn_tpu.data.synthetic import make_images

__all__ = [
    "ArrayDataset",
    "FolderDataset",
    "HDF5Dataset",
    "StreamingSyntheticDataset",
    "bundled_dataset",
    "open_dataset",
    "synthetic_dataset",
    "to_grayscale",
    "PatchSampler",
    "Prefetcher",
    "StreamingPatchSampler",
    "make_images",
]
