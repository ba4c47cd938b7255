from tdnet_tpu.ops.resize import resize_bilinear, resize_nearest, interp_matrix
from tdnet_tpu.ops.pool import (adaptive_avg_pool,
                                adaptive_avg_pool_multi, global_avg_pool,
                                grid_subsample, max_pool)
from tdnet_tpu.ops.norm import (batch_norm, fold_bn_eval,
                                init_batch_norm, layer_norm_2d,
                                init_layer_norm_2d)
from tdnet_tpu.ops.conv import (conv2d, init_conv_kaiming, init_conv_msra_out,
                                init_conv_torch_default)
from tdnet_tpu.ops.attention import scaled_dot_attention
from tdnet_tpu.ops.quant import conv2d_int8, quantize_act, quantize_weight

__all__ = [
    "resize_bilinear", "resize_nearest", "interp_matrix",
    "adaptive_avg_pool", "adaptive_avg_pool_multi", "global_avg_pool", "grid_subsample", "max_pool",
    "batch_norm", "fold_bn_eval", "init_batch_norm", "layer_norm_2d", "init_layer_norm_2d",
    "conv2d", "init_conv_kaiming", "init_conv_msra_out", "init_conv_torch_default",
    "scaled_dot_attention",
    "conv2d_int8", "quantize_act", "quantize_weight",
]
