"""Rayleigh-Taylor instability: heavy fluid over light under gravity.

Exercises the gravity source term (ops/source.py, beyond-reference — the
reference integrates the homogeneous Euler system only): a density
interface with a velocity seed becomes buoyantly unstable and rolls up
into the classic mushroom plumes.  Reflective walls, optional AMR
tracking the interface, optional second-order reconstruction.

    python examples/rayleigh_taylor.py --level 6 --steps 2000 --vtk-every 200
    python examples/rayleigh_taylor.py --amr --max-level 7 --order 2
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

GAMMA = 1.4


def rt_ic(c, atwood=1.0 / 3.0, g=0.1):
    """Heavy (rho=2) over light (rho=1), near-hydrostatic pressure, single-
    mode velocity seed at the interface (the textbook configuration)."""
    x, y = c[:, 0], c[:, 1]
    rho = np.where(y > 0.5, 2.0, 1.0)
    # hydrostatic: dp/dy = -rho g, anchored at p(0.5) = 2.5
    p = np.where(y > 0.5, 2.5 - 2.0 * g * (y - 0.5),
                 2.5 - 1.0 * g * (y - 0.5))
    vy = 0.02 * np.cos(2 * np.pi * x) * np.exp(-100 * (y - 0.5) ** 2)
    u = np.zeros((5, len(c)), np.float32)
    u[0] = rho
    u[2] = rho * vy
    u[4] = p / (GAMMA - 1) + 0.5 * rho * vy * vy
    return u


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--g", type=float, default=0.1)
    p.add_argument("--order", type=int, default=1, choices=(1, 2))
    p.add_argument("--limiter", default="bj",
                   choices=("bj", "venkat", "none"))
    p.add_argument("--flux", default="hllc",
                   choices=("kepes", "hll", "hllc"),
                   help="HLLC keeps the density interface sharp")
    p.add_argument("--amr", action="store_true")
    p.add_argument("--max-level", type=int, default=0)
    p.add_argument("--adapt-every", type=int, default=50)
    p.add_argument("--refine-threshold", type=float, default=1.0)
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="rt")
    args = p.parse_args()

    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

    cfg = EulerConfig(flux=args.flux, order=args.order,
                      limiter=args.limiter,
                      gravity=(0.0, -args.g, 0.0))
    ic = lambda c: rt_ic(c, g=args.g)
    if args.amr:
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.mesh.manager import MeshManager

        max_level = args.max_level or args.level + 1
        mgr = MeshManager(
            Forest.uniform(args.level, dim=2, periodic=False),
            AMRConfig(min_level=args.level - 1, max_level=max_level,
                      refine_threshold=args.refine_threshold))
        solver = CompressibleEulerSolver(mgr, ic, config=cfg)
    else:
        from t8gpu_tpu.mesh.uniform import uniform_mesh

        solver = CompressibleEulerSolver(
            uniform_mesh(args.level, dim=2, periodic=False), ic, config=cfg)

    m0 = solver.compute_integral()
    dt = 0.5 * solver.compute_timestep()
    print(f"elements={solver.n_elements} integral={m0:.6f} dt={dt:.3e}")

    if args.vtk_every:
        from t8gpu_tpu.io.vtk import VTKSeries, write_vtu
        series = VTKSeries(f"{args.prefix}.pvd")

    t0 = time.perf_counter()
    done = 0
    sim_t = 0.0        # accumulated across dt changes (adapt re-estimates)
    while done < args.steps:
        n = args.steps - done
        if args.amr:
            n = min(n, args.adapt_every - done % args.adapt_every)
        if args.vtk_every:
            n = min(n, args.vtk_every - done % args.vtk_every)
        solver.iterate_many(n, dt)
        done += n
        sim_t += n * dt
        if args.amr and done % args.adapt_every == 0 and done < args.steps:
            solver.adapt()
            dt = 0.5 * solver.compute_timestep()
        if args.vtk_every and done % args.vtk_every == 0:
            u = solver.conserved_state()
            mesh_now = (solver.mesh if solver.manager is None
                        else solver.manager.mesh)
            h = np.asarray(mesh_now.volumes) ** 0.5
            series.add(
                write_vtu(f"{args.prefix}_{done:06d}.vtu",
                          np.asarray(mesh_now.centers), h,
                          {"density": u[0], "momentum": u[1:4]}, dim=2),
                time=sim_t)
    wall = time.perf_counter() - t0

    m1 = solver.compute_integral()
    u = solver.conserved_state()
    # plume penetration: heavy fluid below / light above the interface
    mesh_now = solver.mesh if solver.manager is None else solver.manager.mesh
    y = np.asarray(mesh_now.centers)[:, 1]
    spike = float(y[(u[0] > 1.5) & (y < 0.5)].min()) if (
        (u[0] > 1.5) & (y < 0.5)).any() else 0.5
    print(f"steps={args.steps} wall={wall:.1f}s elements={solver.n_elements} "
          f"mass drift={abs(m1 - m0) / m0:.2e} spike front y={spike:.3f}")
    assert np.isfinite(u).all()


if __name__ == "__main__":
    main()
