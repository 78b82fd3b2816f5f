"""Cylindrical dam break (2D shallow water) with dynamic AMR.

Third model family (models/shallow_water.py): a nonlinear 3-variable
system through the same PDE-agnostic seams as Euler and advection —
mesh/AMR/connectivity/RK/capacity-buckets all reused, only the Rusanov
flux is new.  `--sharded` runs the distributed solver over all devices
(physics supplied through the ShardedEulerSolver._flux_divergence hook).

    python examples/dam_break.py --level 6 --steps 400 --amr
    python examples/dam_break.py --sharded --steps 200
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from t8gpu_tpu.io.vtk import write_vtu
from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.models.shallow_water import ShallowWaterSolver
from t8gpu_tpu.utils.config import AMRConfig


def dam_break(centers):
    r2 = ((centers[:, 0] - 0.5) ** 2 + (centers[:, 1] - 0.5) ** 2)
    h = 1.0 + 0.5 * (r2 < 0.02)
    return np.stack([h, np.zeros_like(h), np.zeros_like(h)])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--g", type=float, default=9.81)
    p.add_argument("--amr", action="store_true")
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--max-level", type=int, default=8)
    p.add_argument("--adapt-every", type=int, default=25)
    p.add_argument("--adapt-lag", type=int, default=5)
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="dam_break")
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="2 = row-generic MUSCL + depth-positivity guard")
    p.add_argument("--limiter", default="bj",
                   choices=("bj", "venkat", "none"))
    args = p.parse_args()

    amr = AMRConfig(min_level=args.level - 1, max_level=args.max_level,
                    refine_threshold=0.2)
    if args.sharded:
        from t8gpu_tpu.parallel.shallow_water import ShardedShallowWaterSolver
        solver = ShardedShallowWaterSolver(Forest.uniform(args.level, dim=2),
                                           dam_break, g=args.g, amr=amr,
                                           order=args.order,
                                           limiter=args.limiter)
        args.amr = True
    elif args.amr:
        solver = ShallowWaterSolver(
            MeshManager(Forest.uniform(args.level, dim=2), amr),
            dam_break, g=args.g, order=args.order, limiter=args.limiter)
    else:
        solver = ShallowWaterSolver(
            ForestMesh.from_forest(Forest.uniform(args.level, dim=2)),
            dam_break, g=args.g, order=args.order, limiter=args.limiter)

    m0 = solver.compute_integral()
    print(f"elements={solver.n_elements} volume={m0:.6f}")

    t0 = time.perf_counter()
    done = 0
    lag = args.adapt_lag if args.amr else 0
    while done < args.steps:
        # device scalar straight into iterate_many — a float() here would
        # pay a D2H fetch per chunk (CLAUDE.md: keep CFL dt on device)
        dt = solver.compute_timestep_device()
        to_b = args.adapt_every - done % args.adapt_every
        n = min(args.steps - done, to_b if args.amr else args.steps - done)
        if lag and to_b > lag:
            n = min(n, to_b - lag)
        if args.vtk_every:
            # chunks must land on VTK boundaries or frames are skipped
            n = min(n, args.vtk_every - done % args.vtk_every)
        solver.iterate_many(n, dt)
        done += n
        if (lag and done % args.adapt_every == args.adapt_every - lag
                and done + lag < args.steps):
            solver.adapt_prefetch()
        if args.amr and done % args.adapt_every == 0 and done < args.steps:
            solver.adapt()
        if args.vtk_every and done % args.vtk_every == 0:
            u = solver.conserved_state()
            mesh_now = (solver.mesh if not args.sharded
                        else None)
            if mesh_now is not None:
                h_sz = np.asarray(mesh_now.volumes) ** 0.5
                write_vtu(f"{args.prefix}_{done:06d}.vtu", mesh_now.centers,
                          h_sz, {"depth": u[0], "momentum_x": u[1],
                                 "momentum_y": u[2]}, dim=2)
    wall = time.perf_counter() - t0
    m1 = solver.compute_integral()
    print(f"steps={args.steps} elements={solver.n_elements} "
          f"wall={wall:.2f}s volume drift={(m1 - m0) / m0:.2e}")


if __name__ == "__main__":
    main()
