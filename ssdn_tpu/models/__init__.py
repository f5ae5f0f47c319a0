from ssdn_tpu.models.blindspot_unet import (
    apply,
    init_params,
    layer_shapes,
    param_count,
    tree_cast,
)

__all__ = ["apply", "init_params", "layer_shapes", "param_count", "tree_cast"]
