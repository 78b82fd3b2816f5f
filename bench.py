"""Flagship benchmark: DOF-updates/sec/chip on 3D Euler Kelvin-Helmholtz,
subgrid elements (the BASELINE.json north-star metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md): `vs_baseline` is measured
against a fixed nominal target of 1e9 cell-updates/s/chip — a rough
engineering estimate of the CUDA reference's subgrid throughput on an A100
(memory-bound KEPES stencils + RK3 over ~2M cells).  vs_baseline > 1 means
faster than that nominal A100 figure.
"""

import json
import time

import numpy as np

NOMINAL_A100_DOF_RATE = 1.0e9  # cell-updates/s, see module docstring


def main():
    from t8gpu_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    # 4096 elements x 8^3 cells = 2.1M DOF on the uniform 128^3 grid.
    # Subgrid<8,8,8> computes the IDENTICAL discretization as level-5
    # Subgrid<4,4,4> (cell-exact equivalence is tested) but 1.5x faster —
    # larger blocks amortize the outer-face work (BENCHMARKS.md).
    level, dim = 3, 3
    mesh = SubgridMesh.from_forest(Forest.uniform(level + 1, dim=dim),
                                   SubgridSpec((8,) * dim))
    solver = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=dim))
    n_cells = solver.n_elements * solver.spec.size

    dt = solver.compute_timestep()

    steps = 50
    # warmup (compile both the single-step and the fused-batch programs)
    solver.iterate(dt)
    solver.iterate_many(steps, dt)
    solver.u.block_until_ready()

    # one device dispatch for the whole batch: host<->device latency is
    # excluded from the per-step figure, as in a production run where
    # steps fuse between adapt events
    t0 = time.perf_counter()
    solver.iterate_many(steps, dt)
    solver.u.block_until_ready()
    wall = time.perf_counter() - t0

    assert np.isfinite(solver.conserved_state()).all()
    value = n_cells * steps / wall
    print(json.dumps({
        "metric": "DOF-updates/sec/chip (3D Euler KH, 2.1M cells, "
                  "Subgrid<8,8,8>)",
        "value": value,
        "unit": "cell-updates/s",
        "vs_baseline": value / NOMINAL_A100_DOF_RATE,
    }))


if __name__ == "__main__":
    main()
