"""Kelvin-Helmholtz on subgrid elements (2D Subgrid<4,4> / 3D Subgrid<4,4,4>).

TPU-native counterpart of the reference drivers examples/subgrid/main_2d.cu
and main_3d.cu: periodic unit square/cube, uniform starting forest, KH
shear layer, dynamic AMR with H1-seminorm criteria every --adapt-every
steps (ref: adapt every 50, 4000 steps, dt = 0.1 * 0.5^(max_level +
log2 extent), main_3d.cu:27-40).

    python examples/kh_subgrid.py --dim 2 --level 4 --steps 500 --amr
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
from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import (SubgridCompressibleEulerSolver,
                                            subgrid_manager)
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--dim", type=int, default=2, choices=(2, 3))
    p.add_argument("--extent", type=int, default=4)
    p.add_argument("--flux", default="kepes", choices=("kepes", "hll", "hllc"))
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="2 = per-axis MUSCL (XLA stencil path)")
    p.add_argument("--amr", action="store_true")
    p.add_argument("--max-level", type=int, default=0)
    p.add_argument("--min-level", type=int, default=0,
                   help="coarsening floor (0 = level-1; ref "
                        "subgrid_mesh_manager.h:276 uses 1)")
    p.add_argument("--adapt-every", type=int, default=50)
    p.add_argument("--adapt-lag", type=int, default=0,
                   help="[--amr] prefetch refinement criteria N steps "
                        "before each adapt boundary (AMR pipelining: the "
                        "D2H fetch overlaps stepping)")
    p.add_argument("--refine-threshold", type=float, default=0.02,
                   help="b in the adapt callback (ref subgrid_mesh_manager.inl:214)")
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="kh_subgrid")
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", default="",
                   help="checkpoint file to resume from")
    args = p.parse_args()

    if args.resume:
        from t8gpu_tpu.io.checkpoint import restore_solver
        solver, meta = restore_solver(args.resume)
        start = int(meta.get("step", 0))
        print(f"resumed from {args.resume} at step {start}", flush=True)
        run_loop(solver, args, SubgridSpec(tuple(meta["extents"])),
                 start=start)
        return

    spec = SubgridSpec((args.extent,) * args.dim)
    if args.amr:
        max_level = args.max_level or args.level + 2
        amr = AMRConfig(min_level=args.min_level or max(args.level - 1, 1),
                        max_level=max_level,
                        refine_threshold=args.refine_threshold)
        mesh = subgrid_manager(Forest.uniform(args.level, dim=args.dim), spec, amr)
    else:
        amr = AMRConfig(max_level=args.level)
        mesh = SubgridMesh.from_forest(Forest.uniform(args.level, dim=args.dim), spec)

    solver = SubgridCompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=args.dim),
        config=EulerConfig(flux=args.flux, order=args.order), amr=amr)
    run_loop(solver, args, spec)


def run_loop(solver, args, spec, start=0):
    n_cells = solver.n_elements * spec.size
    print(f"elements={solver.n_elements} cells={n_cells}", flush=True)
    m0 = solver.compute_integral()
    dt = solver.compute_timestep()
    print(f"initial integral={m0:.6f} dt={dt:.3e}", flush=True)

    cadences = [c for c in (args.adapt_every if args.amr else 0,
                            args.checkpoint_every, args.vtk_every) if c]

    lag = args.adapt_lag if args.amr else 0

    def chunk_until_event(it):
        n = args.steps - it
        for ev in cadences:
            n = min(n, ev - it % ev)
        if lag:
            to_b = args.adapt_every - it % args.adapt_every
            if to_b > lag:
                n = min(n, to_b - lag)
        return n

    if args.vtk_every:
        from t8gpu_tpu.io.vtk import VTKSeries
        vtk_series = VTKSeries(f"{args.prefix}.pvd")

    t0 = time.perf_counter()
    cell_steps = 0
    it = start
    ck_thread = None
    while it < args.steps:
        # fuse all steps up to the next adapt/IO event into ONE dispatch
        n = chunk_until_event(it)
        solver.iterate_many(n, dt)
        cell_steps += n * solver.n_elements * spec.size
        it += n
        if (lag and it % args.adapt_every == args.adapt_every - lag
                and it + lag < args.steps):
            solver.adapt_prefetch()
        if args.amr and it % args.adapt_every == 0 and it < args.steps:
            ta = time.perf_counter()
            solver.adapt()
            dt = solver.compute_timestep()
            print(f"step {it}: elements={solver.n_elements} "
                  f"cells={solver.n_elements * spec.size} dt={dt:.3e} "
                  f"adapt={time.perf_counter() - ta:.1f}s "
                  f"wall={time.perf_counter() - t0:.1f}s", flush=True)
        if args.checkpoint_every and it % args.checkpoint_every == 0:
            from t8gpu_tpu.io.checkpoint import save_solver_async
            if ck_thread is not None:
                ck_thread.join()
            ck_thread = save_solver_async(f"{args.prefix}_ck.npz", solver,
                                          step=it)
        if args.vtk_every and it % args.vtk_every == 0:
            u = solver.conserved_state().reshape(5, -1)
            mesh_now = solver.mesh if solver.manager is None else solver.manager.mesh
            cc = mesh_now.cell_centers()
            h = np.repeat((mesh_now.volumes ** (1 / args.dim)) / spec.extent,
                          spec.size)
            vtk_series.add(
                write_vtu(f"{args.prefix}_{it:06d}.vtu", cc, h,
                          {"density": u[0], "energy": u[4],
                           "momentum": u[1:4]}, dim=args.dim),
                time=it * dt)
    if ck_thread is not None:
        ck_thread.join()
    solver.u.block_until_ready()
    wall = time.perf_counter() - t0

    m1 = solver.compute_integral()
    print(f"steps={args.steps} wall={wall:.3f}s "
          f"cell-updates/s={cell_steps / wall:.3e} "
          f"final elements={solver.n_elements} "
          f"integral drift={(m1 - m0) / m0:.2e}")
    if args.amr:
        from t8gpu_tpu.utils.profiling import phase_report
        import sys as _sys
        phase_report(stream=_sys.stdout)


if __name__ == "__main__":
    main()
