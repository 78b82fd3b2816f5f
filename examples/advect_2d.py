"""Scalar advection of a Gaussian bump with dynamic AMR.

Demonstrates the second model family (models/advection.py): the
mesh/AMR/connectivity/RK layers are PDE-agnostic — this driver swaps
the physics while reusing every other subsystem (the reference states
that layering, SURVEY §1, but ships only Euler examples).

    python examples/advect_2d.py --level 5 --steps 400 --amr
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
from t8gpu_tpu.models.advection import AdvectionSolver
from t8gpu_tpu.utils.config import AMRConfig


def bump(centers):
    r2 = ((centers - 0.3) ** 2).sum(axis=1)
    return 1.0 + np.exp(-r2 / 0.005)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=5)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--velocity", type=float, nargs=2, default=(1.0, 0.5))
    p.add_argument("--amr", action="store_true")
    p.add_argument("--max-level", type=int, default=7)
    p.add_argument("--adapt-every", type=int, default=25)
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="advect")
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="2 = row-generic MUSCL (limited, bounds-preserving)")
    p.add_argument("--limiter", default="bj",
                   choices=("bj", "venkat", "none"))
    args = p.parse_args()

    if args.amr:
        mesh = MeshManager(Forest.uniform(args.level, dim=2),
                           AMRConfig(min_level=args.level - 1,
                                     max_level=args.max_level,
                                     refine_threshold=1.0))
    else:
        mesh = ForestMesh.from_forest(Forest.uniform(args.level, dim=2))
    solver = AdvectionSolver(mesh, bump, velocity=args.velocity,
                             order=args.order, limiter=args.limiter)
    dt = 0.25 * 0.5 ** (args.max_level if args.amr else args.level) \
        / float(np.linalg.norm(args.velocity))
    m0 = solver.compute_integral()
    print(f"elements={solver.n_elements} integral={m0:.6f} dt={dt:.3e}")

    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        n = args.steps - done
        if args.amr:
            n = min(n, args.adapt_every - done % args.adapt_every)
        if args.vtk_every:
            n = min(n, args.vtk_every - done % args.vtk_every)
        solver.iterate_many(n, dt)
        done += n
        if args.amr and done % args.adapt_every == 0 and done < args.steps:
            solver.adapt()
        if args.vtk_every and done % args.vtk_every == 0:
            m = solver.mesh
            h = np.asarray(m.volumes) ** 0.5
            write_vtu(f"{args.prefix}_{done:06d}.vtu", m.centers, h,
                      {"u": solver.state()}, dim=2)
    wall = time.perf_counter() - t0
    m1 = solver.compute_integral()
    print(f"steps={args.steps} elements={solver.n_elements} "
          f"wall={wall:.2f}s integral drift={(m1 - m0) / m0:.2e}")


if __name__ == "__main__":
    main()
