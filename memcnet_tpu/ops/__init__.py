"""Warp-op library: vectorized XLA implementations of the reference's native ops
(ops.pallas documents why XLA is the fast path here and the planned r2 kernel).

Inventory mapping to the reference's native op library (SURVEY.md section 2.1):
  N1 FilterInterpolationLayer   -> warp.filter_interp_warp
  N2 FlowProjectionLayer        -> projection.flow_project
  N3 InterpolationLayer         -> warp.bilinear_warp
  N4 InterpolationChLayer       -> warp.bilinear_warp (channel-polymorphic)
  N5 SeparableConvLayer         -> sepconv.separable_conv
  N6 SeparableConvFlowLayer     -> sepconv.separable_conv_flow
  N7 DepthFlowProjectionLayer   -> projection.depth_flow_project
  N8 WeightedFlowProjectionLayer-> projection.weighted_flow_project
  N9 WeightLayer                -> mc.occlusion_weight
  N10 PixelValue/PixelWeight    -> mc.pixel_splat
  N11 ReliableWeightLayer       -> mc.reliable_weight
  N12/N13 (THC glue / CPU mirror) -> subsumed by JAX shape checks + these
    reference impls serving as the oracle for the Pallas kernels.
"""

from memcnet_tpu.ops.warp import bilinear_warp, bilinear_warp_ch, filter_interp_warp
from memcnet_tpu.ops.projection import (
    depth_flow_project,
    flow_project,
    weighted_flow_project,
)
from memcnet_tpu.ops.sepconv import separable_conv, separable_conv_flow
from memcnet_tpu.ops.mc import (
    occlusion_weight,
    pixel_splat,
    pixel_value,
    pixel_weight,
    reliable_weight,
)

__all__ = [
    "filter_interp_warp",
    "bilinear_warp",
    "bilinear_warp_ch",
    "flow_project",
    "depth_flow_project",
    "weighted_flow_project",
    "separable_conv",
    "separable_conv_flow",
    "occlusion_weight",
    "pixel_splat",
    "pixel_value",
    "pixel_weight",
    "reliable_weight",
]
