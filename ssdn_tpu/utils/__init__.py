from ssdn_tpu.utils.images import (
    from_internal,
    list_images,
    load_image,
    pad_to_multiple,
    psnr,
    save_image,
    to_internal,
)

__all__ = [
    "from_internal",
    "list_images",
    "load_image",
    "pad_to_multiple",
    "psnr",
    "save_image",
    "to_internal",
]
