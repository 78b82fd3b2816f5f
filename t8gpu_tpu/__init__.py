"""t8gpu_tpu — a TPU-native finite-volume AMR framework in JAX.

A ground-up rebuild of the capabilities of DLR-AMR/t8gpu (CUDA/C++/MPI)
designed for TPU hardware: sharded ``jax.Array`` storage over a device mesh,
gather/segment-sum flux accumulation (deterministic, no atomics), host-side
space-filling-curve forest management, and Pallas kernels on the hot paths.

Layer map (mirrors the reference architecture, reference SURVEY.md §1):

  utils/     — config, profiling, meta helpers        (ref: t8gpu/utils/)
  memory/    — enum-keyed SoA variable storage        (ref: t8gpu/memory/)
  mesh/      — forest, AMR, connectivity              (ref: t8gpu/mesh/)
  ops/       — numerics kernels: fluxes, RK3, subgrid (ref: t8gpu/timestepping + examples kernels)
  parallel/  — device-mesh sharding, halo exchange    (ref: CUDA IPC + MPI layer)
  models/    — bundled solvers (compressible Euler)   (ref: examples/)
  io/        — VTK export, checkpointing              (ref: VTK export paths)
"""

__version__ = "0.1.0"

from t8gpu_tpu.utils.config import EulerConfig, AMRConfig  # noqa: F401
