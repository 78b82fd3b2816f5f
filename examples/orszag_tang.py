"""The Orszag-Tang vortex: ideal MHD with GLM divergence cleaning.

Fourth model family (models/mhd.py): nine variables, two rotating vector
fields, and a global cleaning speed — through the same PDE-agnostic
seams as Euler/advection/shallow-water (mesh/AMR/connectivity/RK/
capacity buckets all reused).  The standard 2D MHD benchmark: a smooth
periodic IC that steepens into interacting magnetosonic shocks and
current sheets.  `--sharded` runs the distributed solver (physics
supplied through the ShardedEulerSolver hooks incl. a pmax'd c_h);
`--amr` tracks the density fronts; `--subgrid EXT` runs the dense-block
scheme (models/subgrid_mhd.py: EXT^2 cells per leaf through the slab
exchange — composes with --amr).

    python examples/orszag_tang.py --level 7 --t-end 0.5 --vtk-every 50
    python examples/orszag_tang.py --sharded --level 6
    python examples/orszag_tang.py --amr --level 5 --max-level 7
    python examples/orszag_tang.py --subgrid 8 --level 4   # 128^2 cells
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
from t8gpu_tpu.models.mhd import MHDSolver, orszag_tang
from t8gpu_tpu.utils.config import AMRConfig

GAMMA = 5.0 / 3.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=7)
    p.add_argument("--t-end", type=float, default=0.5)
    p.add_argument("--glm-alpha", type=float, default=0.1)
    p.add_argument("--amr", action="store_true")
    p.add_argument("--sharded", action="store_true")
    p.add_argument("--subgrid", type=int, default=0, metavar="EXT",
                   help="dense Subgrid<EXT,EXT> blocks per leaf")
    p.add_argument("--max-level", type=int, default=8)
    p.add_argument("--adapt-every", type=int, default=25)
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="orszag_tang")
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="2 = row-generic MUSCL (plain/sharded paths)")
    p.add_argument("--limiter", default="bj",
                   choices=("bj", "venkat", "none"))
    args = p.parse_args()

    ic = lambda c: orszag_tang(c, gamma=GAMMA)
    amr = AMRConfig(min_level=args.level - 1, max_level=args.max_level,
                    refine_threshold=3.0)
    if args.sharded:
        # composes with --amr (the distributed adapt cycle) but does not
        # imply it: a plain sharded run stays at the requested level
        from t8gpu_tpu.parallel.mhd import ShardedMHDSolver
        solver = ShardedMHDSolver(Forest.uniform(args.level, dim=2), ic,
                                  gamma=GAMMA, glm_alpha=args.glm_alpha,
                                  amr=amr, order=args.order,
                                  limiter=args.limiter)
    elif args.subgrid:
        from t8gpu_tpu.memory.subgrid import SubgridSpec
        from t8gpu_tpu.mesh.subgrid import SubgridMesh
        from t8gpu_tpu.models.subgrid_euler import subgrid_manager
        from t8gpu_tpu.models.subgrid_mhd import SubgridMHDSolver
        spec = SubgridSpec((args.subgrid, args.subgrid))
        forest = Forest.uniform(args.level, dim=2)
        mesh = (subgrid_manager(forest, spec, amr) if args.amr
                else SubgridMesh.from_forest(forest, spec))
        # the block scheme's limiters are per-axis: minmod or none
        sg_limiter = "none" if args.limiter == "none" else "minmod"
        if sg_limiter != args.limiter:
            print(f"note: --limiter {args.limiter} is a plain-family "
                  f"limiter; the subgrid block scheme runs per-axis "
                  f"'{sg_limiter}' instead", flush=True)
        solver = SubgridMHDSolver(mesh, ic, gamma=GAMMA,
                                  glm_alpha=args.glm_alpha,
                                  order=args.order, limiter=sg_limiter)
    elif args.amr:
        solver = MHDSolver(MeshManager(Forest.uniform(args.level, dim=2),
                                       amr), ic,
                           gamma=GAMMA, glm_alpha=args.glm_alpha,
                           order=args.order, limiter=args.limiter)
    else:
        solver = MHDSolver(uniform_mesh(level=args.level, dim=2), ic,
                           gamma=GAMMA, glm_alpha=args.glm_alpha,
                           order=args.order, limiter=args.limiter)

    m0 = solver.compute_integral()
    print(f"elements={solver.n_elements} mass={m0:.6f}")

    def divb_stat():
        if args.sharded:
            return float("nan")         # diagnostic is single-device
        # ONE device scalar per print: full-state D2H fetches through the
        # TPU tunnel are latency-poison (CLAUDE.md measurement protocol)
        import jax.numpy as jnp

        if args.subgrid:
            from t8gpu_tpu.ops.subgrid_mhd import subgrid_divergence_b
            d = subgrid_divergence_b(solver.u, solver.volumes, solver.conn,
                                     solver.spec)
            vol = solver.volumes
            h = (jnp.where(vol > 0, vol, 1.0).min() ** 0.5
                 / solver.spec.extent)
            b = jnp.abs(solver.u[5:8]).max()
        else:
            from t8gpu_tpu.models.mhd import divergence_b
            d = divergence_b(solver.u, solver.conn, solver.volume)
            h = jnp.where(solver.volume > 0, solver.volume, 1.0).min() ** 0.5
            b = jnp.abs(solver.u[5:8, : solver.n_elements]).max()
        return float(jnp.abs(d).max() * h / jnp.maximum(b, 1e-12))

    t0 = time.perf_counter()
    t, it, frame = 0.0, 0, 0
    while t < args.t_end - 1e-12:
        dt = float(solver.compute_timestep())
        n = max(1, min(args.adapt_every if args.amr else 50,
                       int((args.t_end - t) / dt)))
        solver.iterate_many(n, dt)
        t += n * dt
        it += n
        if args.amr and t < args.t_end:
            solver.adapt()
        if args.vtk_every and it // args.vtk_every > frame:
            frame = it // args.vtk_every
            u = solver.conserved_state()
            mesh = solver.mesh if not args.sharded else None
            if mesh is not None and args.subgrid:
                # per-element block means at element centroids
                um = u.reshape(9, u.shape[1], -1).mean(axis=2)
                h = np.asarray(mesh.volumes) ** 0.5
                write_vtu(f"{args.prefix}_{it:06d}.vtu",
                          mesh.forest.centers(), h,
                          {"density": um[0], "B": um[5:8], "psi": um[8]},
                          dim=2)
            elif mesh is not None:
                h = np.asarray(mesh.volumes) ** 0.5
                write_vtu(f"{args.prefix}_{it:06d}.vtu", mesh.centers, h,
                          {"density": u[0],
                           "B": u[5:8],
                           "psi": u[8]}, dim=2)
        print(f"  t={t:.4f} steps={it} elements={solver.n_elements} "
              f"dt={dt:.2e} divB*h/|B|={divb_stat():.2e}", flush=True)

    wall = time.perf_counter() - t0
    m1 = solver.compute_integral()
    u = solver.conserved_state()
    print(f"steps={it} wall={wall:.2f}s elements={solver.n_elements} "
          f"mass drift={(m1 - m0) / m0:.2e} "
          f"rho in [{u[0].min():.3f}, {u[0].max():.3f}] "
          f"max|psi|={np.abs(u[8]).max():.3e}")


if __name__ == "__main__":
    main()
