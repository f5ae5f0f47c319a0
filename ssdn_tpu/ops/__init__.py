from ssdn_tpu.ops.shifted import (
    conv2d,
    leaky_relu,
    maxpool_2x2,
    shift_down,
    shifted_maxpool_2x2,
    shifted_upsample_concat_conv,
    upsample_2x_nearest,
)
from ssdn_tpu.ops.rotation import rot90, rotation_stack, rotation_unstack

__all__ = [
    "conv2d",
    "leaky_relu",
    "maxpool_2x2",
    "shift_down",
    "shifted_maxpool_2x2",
    "shifted_upsample_concat_conv",
    "upsample_2x_nearest",
    "rot90",
    "rotation_stack",
    "rotation_unstack",
]
