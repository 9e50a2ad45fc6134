from memcnet_tpu.nn.layers import (
    avg_pool2d,
    batch_norm_eval,
    batch_norm_train,
    conv2d,
    conv_transpose2d,
    grid_sample_bilinear,
    leaky_relu,
    max_pool2d,
    p_bn,
    p_conv,
    p_conv_transpose,
    relu,
    replication_pad2d,
    sigmoid,
    upsample_bilinear,
)

__all__ = [
    "avg_pool2d", "batch_norm_eval", "batch_norm_train", "conv2d", "conv_transpose2d",
    "grid_sample_bilinear", "leaky_relu", "max_pool2d", "p_bn", "p_conv",
    "p_conv_transpose", "relu", "replication_pad2d", "sigmoid",
    "upsample_bilinear",
]
