"""Decaying Taylor-Green vortex: the canonical Navier-Stokes validation.

Beyond-reference physics (the reference is inviscid Euler only): a 2D
periodic vortex lattice whose exact incompressible solution decays as
exp(-2 nu k^2 t) in velocity — run at low Mach (V0 = 0.05), the
compressible solver must reproduce the decay rate and the vortex shape.

    python examples/taylor_green.py --level 6 --mu 2e-3 --t-end 1.0

Prints the kinetic-energy decay vs the exact exp(-4 nu k^2 t) and the
L2 velocity error against the exact field at t_end.
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
K = 2.0 * np.pi


def exact_velocity(c, t, v0, nu):
    decay = np.exp(-2.0 * nu * K * K * t)
    vx = v0 * np.cos(K * c[:, 0]) * np.sin(K * c[:, 1]) * decay
    vy = -v0 * np.sin(K * c[:, 0]) * np.cos(K * c[:, 1]) * decay
    return vx, vy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--mu", type=float, default=2e-3)
    p.add_argument("--v0", type=float, default=0.05)
    p.add_argument("--t-end", type=float, default=1.0)
    p.add_argument("--order", type=int, default=2, choices=(1, 2))
    args = p.parse_args()
    nu = args.mu  # rho = 1

    def tg_ic(c):
        vx, vy = exact_velocity(c, 0.0, args.v0, nu)
        rho = np.ones(len(c), np.float32)
        pr = (1.0 - 0.25 * args.v0 ** 2
              * (np.cos(2 * K * c[:, 0]) + np.cos(2 * K * c[:, 1])))
        e = pr / (GAMMA - 1) + 0.5 * rho * (vx * vx + vy * vy)
        z = np.zeros_like(rho)
        return np.stack([rho, rho * vx, rho * vy, z, e]).astype(np.float32)

    mesh = uniform_mesh(args.level, dim=2, periodic=True)
    solver = CompressibleEulerSolver(
        mesh, tg_ic, config=EulerConfig(mu=args.mu, order=args.order,
                                        limiter="none"))
    dt = solver.compute_timestep()
    n = int(round(args.t_end / dt))
    print(f"elements={solver.n_elements} dt={dt:.3e} steps={n} "
          f"Re={args.v0 / nu:.0f}")

    u0 = solver.conserved_state()
    m0 = solver.compute_integral()
    ke0 = float((0.5 * (u0[1] ** 2 + u0[2] ** 2) / u0[0]).mean())
    t0 = time.perf_counter()
    # the whole run is ONE dispatch that also records the per-step KE
    # history on device (models/observables.py) — the decay CURVE, not
    # just its endpoint, for one device fetch
    rows = np.asarray(solver.iterate_record(
        n, args.t_end / n, observables=("kinetic_energy",)))
    wall = time.perf_counter() - t0
    ts = args.t_end / n * np.arange(1, n + 1)
    fit = np.polyfit(ts, np.log(rows[:, 0]), 1)[0]
    print(f"fitted per-step KE decay rate {-fit:.5f} "
          f"exact {4.0 * nu * K * K:.5f} "
          f"(ratio {-fit / (4.0 * nu * K * K):.4f})")

    u1 = solver.conserved_state()
    ke1 = float((0.5 * (u1[1] ** 2 + u1[2] ** 2) / u1[0]).mean())
    decay = ke1 / ke0
    expected = float(np.exp(-4.0 * nu * K * K * args.t_end))
    vx_e, vy_e = exact_velocity(mesh.centers, args.t_end, args.v0, nu)
    err = np.sqrt(np.mean((u1[1] / u1[0] - vx_e) ** 2
                          + (u1[2] / u1[0] - vy_e) ** 2))
    ref = np.sqrt(np.mean(vx_e ** 2 + vy_e ** 2))
    print(f"KE decay {decay:.5f} exact {expected:.5f} "
          f"(ratio {decay / expected:.4f})")
    print(f"L2 velocity error {err:.3e} (relative {err / ref:.3e}) "
          f"wall={wall:.2f}s mass drift="
          f"{(solver.compute_integral() - m0) / m0:.2e}")


if __name__ == "__main__":
    main()
