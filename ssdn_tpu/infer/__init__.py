from ssdn_tpu.infer.full import (
    denoise_image,
    evaluate_dataset,
    make_denoise_fn,
)
from ssdn_tpu.infer.tiled import (
    HALO_EXACT,
    tiled_denoise_sequential,
    tiled_denoise_sharded,
)

__all__ = [
    "denoise_image",
    "evaluate_dataset",
    "make_denoise_fn",
    "HALO_EXACT",
    "tiled_denoise_sequential",
    "tiled_denoise_sharded",
]
