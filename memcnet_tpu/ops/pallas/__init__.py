"""Pallas TPU kernels for the warp-op library.

Current state (r1, measured on v5e at 720p — see PERF.md and
tools/bench_pallas_scatter.py):

* The hot ops are NOT compute-bound; they are bound by the TPU's
  gather/scatter engines, which XLA's native gather/scatter already drive at
  their practical rates (patch gather ~80 GB/s; scatter ~45 ns/update).
* A Pallas dynamic-sublane scatter-accumulate prototype reached 70 ms vs
  XLA's 90 ms for the projection's 2M updates (1.3x) — per-element loop
  overhead bound, not adopted.
* The planned r2 kernel is a halo-DMA warp: per output row-band, async-DMA
  the source rows within a flow-bounded halo into VMEM double buffers and
  run the patch reduction on-chip, cutting the gather's HBM traffic from
  16*C bytes/pixel to ~C bytes/pixel for smooth flows.

The vectorized XLA implementations in memcnet_tpu.ops.{warp,projection} are
the production path; the numpy oracles in tests/oracles.py define the
semantics any kernel added here must reproduce.
"""
