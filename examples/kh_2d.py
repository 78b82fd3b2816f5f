"""2D Kelvin-Helmholtz on a periodic unit square (plain elements).

TPU-native counterpart of the reference driver examples/subgrid/main_2d.cu
(uniform level-4 periodic square, KH shear layer, fixed dt, periodic VTK
dumps), on plain elements first.  Run:

    python examples/kh_2d.py --level 6 --steps 500 --vtk-every 0

With dynamic AMR (BASELINE config 2; ref adapts every 50 steps,
examples/subgrid/main_2d.cu):

    python examples/kh_2d.py --level 5 --amr --max-level 7 --adapt-every 50
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
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--dim", type=int, default=2, choices=(2, 3))
    p.add_argument("--flux", default="kepes", choices=("kepes", "hll", "hllc"))
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="2 = MUSCL reconstruction (ops/reconstruct.py)")
    p.add_argument("--limiter", default="bj",
                   choices=("bj", "venkat", "none"))
    p.add_argument("--mu", type=float, default=0.0,
                   help="dynamic viscosity: > 0 runs compressible "
                        "Navier-Stokes (ops/viscous.py)")
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="kh")
    p.add_argument("--amr", action="store_true",
                   help="dynamic AMR (gradient criteria, ref solver.cu:243-277)")
    p.add_argument("--max-level", type=int, default=0,
                   help="AMR refinement bound (default level+2)")
    p.add_argument("--adapt-every", type=int, default=50)
    p.add_argument("--refine-threshold", type=float, default=2.0)
    p.add_argument("--blocked", action="store_true",
                   help="step plain elements as Subgrid<8,...> blocks on "
                        "the fused Pallas kernels (models/blocked_euler) — "
                        "with --amr this is the block-granular dynamic-AMR "
                        "fast path (BASELINE config 2; refine-threshold "
                        "then speaks the subgrid H1 scale, ref b=0.02)")
    args = p.parse_args()

    if args.blocked:
        from t8gpu_tpu.models.blocked_euler import (BlockedAMREulerSolver,
                                                    BlockedUniformEulerSolver)
        if args.mu > 0:
            raise SystemExit("--blocked composes with inviscid configs; "
                             "use the gather path for --mu")
        cfg = EulerConfig(flux=args.flux, order=args.order,
                          limiter=args.limiter)
        forest = Forest.uniform(args.level, dim=args.dim)
        ic = lambda c: kh_planar(c, dim=args.dim)
        if args.amr:
            max_level = args.max_level or args.level + 2
            amr = AMRConfig(min_level=max(args.level - 1, 3),
                            max_level=max_level,
                            refine_threshold=args.refine_threshold)
            solver = BlockedAMREulerSolver(forest, ic, amr=amr, config=cfg)
        else:
            solver = BlockedUniformEulerSolver(forest, ic, config=cfg)
        run_loop(solver, args)
        return

    if args.amr:
        max_level = args.max_level or args.level + 2
        amr = AMRConfig(min_level=max(args.level - 1, 1), max_level=max_level,
                        refine_threshold=args.refine_threshold)
        mesh = MeshManager(Forest.uniform(args.level, dim=args.dim), amr)
    else:
        amr = AMRConfig(max_level=args.level)
        mesh = uniform_mesh(level=args.level, dim=args.dim, periodic=True)
    solver = CompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=args.dim),
        config=EulerConfig(flux=args.flux, order=args.order,
                           limiter=args.limiter, mu=args.mu), amr=amr)

    run_loop(solver, args)


def run_loop(solver, args):
    conn = getattr(solver, "conn", None)
    print(f"elements={solver.n_elements}"
          + (f" faces={conn.n_faces}" if conn is not None else ""))
    m0 = solver.compute_integral()
    dt = solver.compute_timestep()
    print(f"initial integral={m0:.6f} dt={dt:.3e}")

    cadences = [c for c in ((args.adapt_every if args.amr else 0),
                            args.vtk_every) if c]

    if args.vtk_every:
        from t8gpu_tpu.io.vtk import VTKSeries
        vtk_series = VTKSeries(f"{args.prefix}.pvd")

    t0 = time.perf_counter()
    it = 0
    while it < args.steps:
        n = args.steps - it
        for ev in cadences:
            n = min(n, ev - it % ev)
        solver.iterate_many(n, dt)   # one fused dispatch up to the event
        it += n
        if args.amr and it % args.adapt_every == 0 and it < args.steps:
            solver.adapt()
            dt = solver.compute_timestep()
        if args.vtk_every and it % args.vtk_every == 0:
            u = solver.conserved_state().reshape(5, -1)
            if hasattr(solver, "plain_forest"):      # blocked AMR facade
                pf = solver.plain_forest()
                centers, vols = pf.centers(), pf.volumes()
            elif args.blocked:
                from t8gpu_tpu.mesh.forest import ForestMesh
                fm = ForestMesh.from_forest(
                    Forest.uniform(args.level, dim=args.dim))
                centers, vols = fm.centers, fm.volumes
            else:
                mesh_now = solver.mesh
                centers, vols = mesh_now.centers, mesh_now.volumes
            h = np.asarray(vols) ** (1.0 / args.dim)
            vtk_series.add(
                write_vtu(f"{args.prefix}_{it:06d}.vtu", centers, h,
                          {"density": u[0], "energy": u[4],
                           "momentum": u[1:4]}, dim=args.dim),
                time=it * dt)
    solver.u.block_until_ready()
    dt_wall = time.perf_counter() - t0

    m1 = solver.compute_integral()
    dof_rate = solver.n_elements * args.steps / dt_wall
    print(f"steps={args.steps} wall={dt_wall:.3f}s "
          f"elem-updates/s={dof_rate:.3e} "
          f"integral drift={(m1 - m0) / m0:.2e}")


if __name__ == "__main__":
    main()
