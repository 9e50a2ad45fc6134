"""memcnet_tpu — a TPU-native (JAX/XLA/Pallas) motion-estimation/motion-compensation
video framework with the full capability surface of baowenbo/MEMC-Net.

Workloads (reference: /root/reference/README.md:23-26):
  * video frame interpolation  (models: MEMC_Net, MEMC_Net_s, MEMC_Net_star)
  * video enhancement          (model:  MEMC_Net_VE — SRx4 / denoise sigma20 / deblock qp37)

Design stance (NOT a port): functional models under jit, a differentiable warp-op
library (pure-XLA reference impls + Pallas TPU kernels), and a mesh/sharding layer
for multi-chip scale, replacing the reference's Module/autograd-Function/cffi/CUDA
stack (reference my_package/*).
"""

__version__ = "0.1.0"

from memcnet_tpu import ops  # noqa: F401
