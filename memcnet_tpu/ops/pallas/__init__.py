"""Pallas TPU kernels for the warp-op library.

Two production kernels (both exact, both with in-graph XLA fallback for
inputs outside their plan budgets, both gradient-complete via custom_vjp at
their call sites):

* ``warp_kernel`` (r2) — halo-DMA filter-interpolation warp.  Replaces the
  XLA patch gather (~50 ns/descriptor, 16*C bytes/pixel of HBM traffic) with
  per-tile windowed DMA + offset-bucket FMAs: each source byte is read ~once
  for smooth flows.  Fast path of ``memcnet_tpu.ops.warp.filter_interp_warp``.
* ``scatter_kernel`` (r3) — banded bucket scatter for flow projection.
  Replaces the XLA scatter-add (~45-65 ns/update scalar loop, ~90 ms at 720p)
  with per-band offset buckets: masked payloads lane/sublane-rolled into
  window accumulators, then ONE ~1k-descriptor block scatter to combine.
  Fast path of ``memcnet_tpu.ops.projection._scatter4``.

The vectorized XLA implementations in memcnet_tpu.ops.{warp,projection}
remain the gradient-defining formulations and the non-TPU path; the numpy
oracles in tests/oracles.py define the semantics both kernels must reproduce
(tests/test_pallas_warp.py, tests/test_pallas_scatter.py).
"""
