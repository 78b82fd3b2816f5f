"""Flagship benchmark: DOF-updates/sec/chip on the Kelvin-Helmholtz example.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): `vs_baseline` is measured
against a fixed nominal target of 1e9 element-updates/s/chip — a
rough engineering estimate of the CUDA reference's plain-element throughput
on an A100 (memory-bound per-face KEPES kernel + RK3 over ~1M elements).
vs_baseline > 1 means faster than that nominal A100 figure.
"""

import json
import time

import numpy as np


NOMINAL_A100_DOF_RATE = 1.0e9  # element-updates/s, see module docstring


def main():
    from t8gpu_tpu.mesh.uniform import uniform_mesh
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

    level, dim = 9, 2  # 512x512 = 262144 elements
    mesh = uniform_mesh(level=level, dim=dim, periodic=True)
    solver = CompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=dim),
        config=EulerConfig(), amr=AMRConfig(max_level=level))

    dt = solver.compute_timestep()

    # warmup (compile)
    for _ in range(3):
        solver.iterate(dt)
    solver.u.block_until_ready()

    steps = 50
    t0 = time.perf_counter()
    for _ in range(steps):
        solver.iterate(dt)
    solver.u.block_until_ready()
    wall = time.perf_counter() - t0

    assert np.isfinite(solver.conserved_state()).all()
    value = solver.n_elements * steps / wall
    print(json.dumps({
        "metric": "DOF-updates/sec/chip (2D Euler KH, plain elements)",
        "value": value,
        "unit": "element-updates/s",
        "vs_baseline": value / NOMINAL_A100_DOF_RATE,
    }))


if __name__ == "__main__":
    main()
