"""Kelvin-Helmholtz on a prismed spherical shell (mixed tri/quad faces).

TPU-native counterpart of the reference flagship driver
examples/compressible_euler/main.cu: icosahedral shell cmesh
(t8_cmesh_new_prismed_spherical_shell_icosahedron(0.8, 0.2, 2, 1)),
KH-on-a-sphere initial condition in the tangent basis, fixed dt=5e-4,
20 000 steps (ref main.cu:20-38).  Dynamic shell AMR (the reference's
t8code prism refinement) is not yet implemented here.

    python examples/kh_sphere.py --subdiv 3 --layers 2 --steps 500
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
from t8gpu_tpu.mesh.shell import shell_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_sphere
from t8gpu_tpu.utils.config import EulerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--subdiv", type=int, default=3)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--r-in", type=float, default=0.8)
    p.add_argument("--thickness", type=float, default=0.2)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--dt", type=float, default=5e-4,
                   help="fixed timestep (ref main.cu:30); 0 = CFL")
    p.add_argument("--flux", default="kepes", choices=("kepes", "hll"))
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="kh_sphere")
    args = p.parse_args()

    mesh = shell_mesh(subdiv=args.subdiv, r_in=args.r_in,
                      thickness=args.thickness, n_layers=args.layers)
    solver = CompressibleEulerSolver(mesh, kh_sphere,
                                     config=EulerConfig(flux=args.flux))
    print(f"elements={solver.n_elements} faces={solver.conn.n_faces} "
          f"boundary={solver.conn.n_boundary_faces}")
    m0 = solver.compute_integral()
    dt = args.dt or solver.compute_timestep()
    print(f"initial integral={m0:.6f} dt={dt:.3e}")

    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        n = args.steps - done
        if args.vtk_every:
            n = min(n, args.vtk_every - done % args.vtk_every)
        solver.iterate_many(n, dt)
        done += n
        if args.vtk_every and done % args.vtk_every == 0:
            u = solver.conserved_state()
            h = np.asarray(mesh.volumes) ** (1.0 / 3.0)
            write_vtu(f"{args.prefix}_{done:06d}.vtu", mesh.centers, h,
                      {"density": u[0], "energy": u[4], "momentum": u[1:4]},
                      dim=3)
    solver.u.block_until_ready()
    wall = time.perf_counter() - t0

    m1 = solver.compute_integral()
    print(f"steps={args.steps} wall={wall:.3f}s "
          f"elem-updates/s={solver.n_elements * args.steps / wall:.3e} "
          f"integral drift={(m1 - m0) / m0:.2e}")


if __name__ == "__main__":
    main()
