from .conv import (
    conv2d_init,
    conv2d,
    conv_transpose2d_init,
    conv_transpose2d,
    max_pool2d,
    batchnorm_init,
    batchnorm,
)
from .blocks import (
    double_conv_init,
    double_conv,
    down_init,
    down,
    up_init,
    up,
    out_conv_init,
    out_conv,
    spatial_attention_init,
    spatial_attention,
)
from .convlstm import (
    convlstm_cell_init,
    convlstm_cell_step,
    convlstm_init,
    convlstm,
    convlstm_zero_state,
)
from .losses import compute_loss, masked_mse
from .normalize import NormStats, compute_norm_stats, normalize_x, normalize_y, denormalize_y, compute_mask
from .resize import area_resize

__all__ = [
    "conv2d_init", "conv2d", "conv_transpose2d_init", "conv_transpose2d",
    "max_pool2d", "batchnorm_init", "batchnorm",
    "double_conv_init", "double_conv", "down_init", "down",
    "up_init", "up", "out_conv_init", "out_conv",
    "spatial_attention_init", "spatial_attention",
    "convlstm_cell_init", "convlstm_cell_step", "convlstm_init", "convlstm",
    "convlstm_zero_state",
    "compute_loss", "masked_mse",
    "NormStats", "compute_norm_stats", "normalize_x", "normalize_y",
    "denormalize_y", "compute_mask",
    "area_resize",
]
