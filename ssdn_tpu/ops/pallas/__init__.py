from ssdn_tpu.ops.pallas.shifted_conv import (
    fused_shifted_conv,
    shifted_conv3x3_bias_act,
)

__all__ = ["fused_shifted_conv", "shifted_conv3x3_bias_act"]
