"""Kelvin-Helmholtz on a prismed spherical shell (mixed tri/quad faces).

TPU-native counterpart of the reference flagship driver
examples/compressible_euler/main.cu: icosahedral shell cmesh
(t8_cmesh_new_prismed_spherical_shell_icosahedron(0.8, 0.2, 2, 1)),
KH-on-a-sphere initial condition in the tangent basis, fixed dt=5e-4,
20 000 steps, adapt every 100 (ref main.cu:20-38, solver.cu:243-277).

Two mesh modes:
  * default: uniform prismed shell (mesh/shell.py, vertices re-projected
    to the sphere at every subdivision level);
  * --amr: the adaptive prism forest (mesh/shell_forest.py, t8code-style
    linear refinement below the cmesh roots) with gradient-criteria
    refine/coarsen every --adapt-every steps — the reference flagship loop.

    python examples/kh_sphere.py --subdiv 3 --layers 2 --steps 500
    python examples/kh_sphere.py --amr --subdiv 2 --level 1 --max-level 3
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from t8gpu_tpu.io.vtk import write_forest_vtu, write_vtu
from t8gpu_tpu.mesh.shell import shell_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_sphere
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--subdiv", type=int, default=3)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--r-in", type=float, default=0.8)
    p.add_argument("--thickness", type=float, default=0.2)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--dt", type=float, default=5e-4,
                   help="fixed timestep (ref main.cu:30); 0 = CFL")
    p.add_argument("--flux", default="kepes", choices=("kepes", "hll", "hllc"))
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="2 = MUSCL reconstruction (ops/reconstruct.py)")
    p.add_argument("--limiter", default="bj",
                   choices=("bj", "venkat", "none"))
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="kh_sphere")
    p.add_argument("--blocked", action="store_true",
                   help="uniform-shell lattice fast path "
                        "(models/blocked_shell.py): intra-root fluxes as "
                        "stencil passes, only cross-root faces gathered; "
                        "static meshes only (incompatible with --amr)")
    # dynamic AMR on the shell (ref main.cu:32-35: adapt every 100 steps)
    p.add_argument("--amr", action="store_true",
                   help="adaptive prism forest with criteria-driven AMR")
    p.add_argument("--blocked-amr", action="store_true",
                   help="adaptive shell on the virtual-fine lattice fast "
                        "path (models/blocked_shell_amr.py): per-root "
                        "dense lattices + pooled parent updates, cell-exact "
                        "vs the gather path; first-order")
    p.add_argument("--level", type=int, default=1,
                   help="[--amr] initial uniform level below the roots")
    p.add_argument("--min-level", type=int, default=0)
    p.add_argument("--max-level", type=int, default=3)
    p.add_argument("--adapt-every", type=int, default=100)
    p.add_argument("--adapt-lag", type=int, default=0,
                   help="[--amr] prefetch the refinement criteria N steps "
                        "BEFORE each adapt boundary so the device->host "
                        "fetch overlaps stepping (AMR pipelining)")
    p.add_argument("--refine-threshold", type=float, default=10.0,
                   help="criteria threshold b (ref mesh_manager.inl:141)")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="[--amr] save a resumable checkpoint every N steps "
                        "(beyond-reference: the 20k-step flagship protocol "
                        "can survive interruption)")
    p.add_argument("--checkpoint-path", default="kh_sphere_ck.npz")
    p.add_argument("--resume", default="",
                   help="checkpoint to resume from (continues to --steps)")
    args = p.parse_args()
    if args.blocked and (args.amr or args.checkpoint_every or args.resume):
        p.error("--blocked is a static-mesh fast path: incompatible with "
                "--amr / --checkpoint-every / --resume")
    if args.blocked_amr and (args.blocked or args.order != 1):
        p.error("--blocked-amr is a first-order fast path "
                "(use --amr for the gather path / order 2)")
    if args.blocked_amr:
        args.amr = True     # share the adapt-loop plumbing below

    start = 0
    if args.resume:
        from t8gpu_tpu.io.checkpoint import restore_solver
        solver, meta = restore_solver(args.resume)
        start = int(meta.get("step", 0))
        args.amr = True     # checkpoints are forest-backed (AMR mode)
        if meta.get("model") == "blocked_shell_amr":
            print(f"blocked AMR lattice path: {solver.n_slots} slots for "
                  f"{solver.n_elements} elements")
        print(f"resumed from {args.resume} at step {start}")
    elif args.blocked_amr:
        from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
        from t8gpu_tpu.models.blocked_shell_amr import BlockedShellAMRSolver
        roots = shell_roots(subdiv=args.subdiv, r_in=args.r_in,
                            thickness=args.thickness, n_layers=args.layers)
        solver = BlockedShellAMRSolver(
            PrismForest.uniform(roots, args.level), kh_sphere,
            amr=AMRConfig(min_level=args.min_level,
                          max_level=args.max_level,
                          refine_threshold=args.refine_threshold),
            config=EulerConfig(flux=args.flux))
        print(f"blocked AMR lattice path: {solver.n_slots} slots for "
              f"{solver.n_elements} elements")
    elif args.amr:
        from t8gpu_tpu.mesh.shell_forest import shell_manager
        mgr = shell_manager(
            subdiv=args.subdiv, level=args.level,
            amr=AMRConfig(min_level=args.min_level, max_level=args.max_level,
                          refine_threshold=args.refine_threshold),
            r_in=args.r_in, thickness=args.thickness, n_layers=args.layers)
        solver = CompressibleEulerSolver(mgr, kh_sphere,
                                         config=EulerConfig(flux=args.flux, order=args.order, limiter=args.limiter))
    elif args.blocked:
        if args.order != 1:
            raise SystemExit("--blocked is a first-order fast path; "
                             "use the gather path for --order 2")
        from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
        from t8gpu_tpu.models.blocked_shell import BlockedShellEulerSolver
        roots = shell_roots(subdiv=args.subdiv, r_in=args.r_in,
                            thickness=args.thickness, n_layers=args.layers)
        solver = BlockedShellEulerSolver(
            PrismForest.uniform(roots, args.level), kh_sphere,
            config=EulerConfig(flux=args.flux, order=args.order, limiter=args.limiter))
        print(f"blocked lattice path: {solver.n_external_faces} "
              "cross-root/cap faces gathered, the rest stenciled")
    else:
        mesh = shell_mesh(subdiv=args.subdiv, r_in=args.r_in,
                          thickness=args.thickness, n_layers=args.layers)
        solver = CompressibleEulerSolver(mesh, kh_sphere,
                                         config=EulerConfig(flux=args.flux, order=args.order, limiter=args.limiter))
    conn = getattr(solver, "conn", None)
    print(f"elements={solver.n_elements}" + (
        f" faces={conn.n_faces} boundary={conn.n_boundary_faces}"
        if conn is not None else ""))
    m0 = solver.compute_integral()
    dt = args.dt or solver.compute_timestep()
    print(f"initial integral={m0:.6f} dt={dt:.3e}")

    t0 = time.perf_counter()
    done = start
    sim_t = start * dt       # exact for fixed --dt; monotone under --dt 0
    adapts = 0
    ck_thread = None
    if args.vtk_every:
        from t8gpu_tpu.io.vtk import VTKSeries
        vtk_series = VTKSeries(f"{args.prefix}.pvd")
    while done < args.steps:
        n = args.steps - done
        if args.amr:
            to_b = args.adapt_every - done % args.adapt_every
            n = min(n, to_b)
            if args.adapt_lag and to_b > args.adapt_lag:
                n = min(n, to_b - args.adapt_lag)
        if args.vtk_every:
            n = min(n, args.vtk_every - done % args.vtk_every)
        if args.checkpoint_every:
            n = min(n, args.checkpoint_every - done % args.checkpoint_every)
        solver.iterate_many(n, dt)
        done += n
        sim_t += n * dt
        if (args.amr and args.adapt_lag
                and done % args.adapt_every
                    == args.adapt_every - args.adapt_lag
                and done + args.adapt_lag < args.steps):
            # criteria D2H rides along with the next adapt_lag steps
            solver.adapt_prefetch()
        if args.amr and done % args.adapt_every == 0 and done < args.steps:
            t_a = time.perf_counter()
            solver.adapt()
            adapts += 1
            if args.dt == 0:
                dt = solver.compute_timestep()
            # element-count trajectory + per-adapt host cost for long runs
            print(f"  adapt {adapts}: step={done} "
                  f"elements={solver.n_elements} "
                  f"adapt_wall={time.perf_counter() - t_a:.2f}s "
                  f"total_wall={time.perf_counter() - t0:.1f}s",
                  flush=True)
        if args.checkpoint_every and done % args.checkpoint_every == 0:
            # async: the D2H gather + write overlap the next step batch
            # (atomic rename — a crash mid-write keeps the previous file)
            from t8gpu_tpu.io.checkpoint import save_solver_async
            if ck_thread is not None:
                ck_thread.join()
            ck_thread = save_solver_async(args.checkpoint_path, solver,
                                          step=done)
        if args.vtk_every and done % args.vtk_every == 0:
            u = solver.conserved_state()
            mesh_now = solver.mesh
            fields = {"density": u[0], "energy": u[4], "momentum": u[1:4]}
            forest = getattr(mesh_now, "forest", None)
            if forest is not None:
                # true prism geometry (VTK wedges), ref mesh_manager.inl:561
                f = write_forest_vtu(f"{args.prefix}_{done:06d}.vtu", forest,
                                     fields)
            else:
                h = np.asarray(mesh_now.volumes) ** (1.0 / 3.0)
                f = write_vtu(f"{args.prefix}_{done:06d}.vtu",
                              mesh_now.centers, h, fields, dim=3)
            vtk_series.add(f, time=sim_t)
    if ck_thread is not None:
        ck_thread.join()
    if hasattr(solver, "u"):
        solver.u.block_until_ready()
    else:
        solver.us[0].block_until_ready()    # blocked-AMR lattice tuple
    wall = time.perf_counter() - t0

    m1 = solver.compute_integral()
    print(f"steps={args.steps} adapts={adapts} elements={solver.n_elements} "
          f"wall={wall:.3f}s "
          f"elem-updates/s={solver.n_elements * (args.steps - start) / wall:.3e} "
          f"integral drift={(m1 - m0) / m0:.2e}")
    if adapts:
        # where the adapt cycles spent their wall time (host face walk vs
        # criteria D2H vs remap dispatch) — SURVEY §3.4's Amdahl term
        from t8gpu_tpu.utils.profiling import phase_report
        phase_report(stream=sys.stdout)


if __name__ == "__main__":
    main()
