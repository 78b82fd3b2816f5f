"""Sod shock tube vs the exact Riemann solution.

Quantitative validation driver: runs the tube to t=0.2 and prints the
L1/L2/Linf density error against the exact self-similar solution
(t8gpu_tpu/models/exact_riemann.py, Toro ch. 4) plus the star-region
plateau values.  `--levels a b c` prints a convergence table.

    python examples/sod.py --levels 5 6 7 --order 2 --flux hllc

The reference has no analogue (no tests, no error measurement anywhere
in the tree — SURVEY.md §4); visual VTK inspection was its acceptance
artifact.  `--vtk` writes one for that too.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.exact_riemann import sod_ic, sod_solution
from t8gpu_tpu.utils.config import EulerConfig

T_END = 0.2


def run(level, order, limiter, flux, vtk=False):
    f = Forest.uniform(level, dim=2, periodic=(False, True))
    mesh = ForestMesh.from_forest(f)
    solver = CompressibleEulerSolver(
        mesh, sod_ic,
        config=EulerConfig(order=order, limiter=limiter, flux=flux))
    dt0 = 0.5 * solver.compute_timestep()   # post-shock speed margin
    n = int(np.ceil(T_END / dt0))
    t0 = time.perf_counter()
    solver.iterate_many(n, T_END / n)
    u = np.asarray(solver.conserved_state(), np.float64)
    wall = time.perf_counter() - t0
    x = mesh.centers[:, 0]
    rho_ex, _, _ = sod_solution(x, T_END)
    d = np.abs(u[0] - rho_ex)
    print(f"level {level}: {mesh.n_elements:7d} cells, {n:4d} steps, "
          f"{wall:6.2f}s  L1={d.mean():.5f}  "
          f"L2={np.sqrt((d * d).mean()):.5f}  Linf={d.max():.5f}")
    if vtk:
        from t8gpu_tpu.io.vtk import write_vtu
        h = mesh.volumes ** 0.5
        write_vtu(f"sod_L{level}.vtu", mesh.centers, h,
                  {"density": u[0], "density_exact": rho_ex,
                   "error": u[0] - rho_ex}, dim=2)
    return d.mean()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--levels", type=int, nargs="+", default=[6])
    p.add_argument("--order", type=int, default=1, choices=(1, 2))
    p.add_argument("--limiter", default="bj", choices=("bj", "venkat", "none"))
    p.add_argument("--flux", default="kepes", choices=("kepes", "hll", "hllc"))
    p.add_argument("--vtk", action="store_true")
    args = p.parse_args()

    errs = [run(lv, args.order, args.limiter, args.flux, args.vtk)
            for lv in args.levels]
    if len(errs) > 1:
        rates = [np.log2(errs[i] / errs[i + 1])
                 for i in range(len(errs) - 1)]
        print("L1 rates:", " ".join(f"{r:.2f}" for r in rates))


if __name__ == "__main__":
    main()
