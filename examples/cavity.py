"""Lid-driven cavity: the canonical wall-bounded Navier-Stokes benchmark.

Beyond-reference (the reference is inviscid with static reflective
walls): a square cavity whose TOP lid moves at speed U drives a steady
recirculating vortex, characterized by the centerline velocity profiles
of Ghia, Ghia & Shin (1982).  The lid is a per-face wall-velocity field
(EulerConfig.wall_velocity as a callable: only boundary faces on y = 1
move).  Run at low Mach (U = 0.1, c ~ 1.18 -> Ma ~ 0.085) so the
compressible solver approximates the incompressible reference:

    python examples/cavity.py --level 6 --re 100 --t-end 30

Prints u(y)/U on the vertical centerline with the Ghia Re=100 landmark
values for comparison (u/U = -0.2058 at y = 0.5; minimum ~ -0.211 near
y ~ 0.46).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.utils.config import EulerConfig

GAMMA = 1.4


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--re", type=float, default=100.0)
    p.add_argument("--u-lid", type=float, default=0.1)
    p.add_argument("--t-end", type=float, default=30.0)
    p.add_argument("--order", type=int, default=2, choices=(1, 2))
    p.add_argument("--report-every", type=float, default=5.0)
    args = p.parse_args()
    mu = args.u_lid / args.re          # Re = U L / nu with L = rho = 1

    def rest_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z,
                         np.full_like(rho, 1.0 / (GAMMA - 1))])

    def lid(face_centers):
        """Only the top wall (y = 1) moves: [3, Fb] per-face velocity."""
        on_lid = (face_centers[:, 1] > 1.0 - 1e-6).astype(np.float32)
        vw = np.zeros((3, len(face_centers)), np.float32)
        vw[0] = args.u_lid * on_lid
        return vw

    mesh = uniform_mesh(args.level, dim=2, periodic=False)
    solver = CompressibleEulerSolver(
        mesh, rest_ic,
        config=EulerConfig(mu=mu, wall="noslip", wall_velocity=lid,
                           order=args.order))
    print(f"elements={solver.n_elements} Re={args.re:.0f} mu={mu:.2e}")

    dt = solver.compute_timestep()
    n_chunk = max(int(round(args.report_every / dt)), 1)
    t = 0.0
    t0 = time.perf_counter()
    while t < args.t_end - 1e-9:
        n = min(n_chunk, max(int(round((args.t_end - t) / dt)), 1))
        solver.iterate_many(n, dt)
        t += n * dt
        u = solver.conserved_state()
        ke = float((0.5 * (u[1] ** 2 + u[2] ** 2) / u[0]).mean())
        print(f"t={t:7.2f} max|vx|={np.abs(u[1] / u[0]).max():.4f} "
              f"KE={ke:.4e}", flush=True)
    wall = time.perf_counter() - t0

    # vertical centerline profile u(y)/U at x ~ 0.5
    c = mesh.centers
    h = 0.5 ** args.level
    sel = np.abs(c[:, 0] - (0.5 - h / 2)) < h / 4
    y = c[sel, 1]
    u = solver.conserved_state()
    prof = (u[1] / u[0])[sel] / args.u_lid
    order = np.argsort(y)
    y, prof = y[order], prof[order]
    i_mid = int(np.argmin(np.abs(y - 0.5)))
    print(f"wall={wall:.1f}s  u/U(y=0.5) = {prof[i_mid]:+.4f} "
          f"(Ghia Re=100: -0.2058); min u/U = {prof.min():+.4f} at "
          f"y = {y[np.argmin(prof)]:.3f} (Ghia: ~-0.211 near y~0.46)")
    step = max(len(y) // 16, 1)
    for yy, pp in zip(y[::step], prof[::step]):
        print(f"  {yy:.4f} {pp:+8.4f}")


if __name__ == "__main__":
    main()
