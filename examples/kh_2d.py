"""2D Kelvin-Helmholtz on a periodic unit square (plain elements).

TPU-native counterpart of the reference driver examples/subgrid/main_2d.cu
(uniform level-4 periodic square, KH shear layer, fixed dt, periodic VTK
dumps), on plain elements first.  Run:

    python examples/kh_2d.py --level 6 --steps 500 --vtk-every 0
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from t8gpu_tpu.io.vtk import write_vtu
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=6)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--dim", type=int, default=2, choices=(2, 3))
    p.add_argument("--flux", default="kepes", choices=("kepes", "hll"))
    p.add_argument("--vtk-every", type=int, default=0)
    p.add_argument("--prefix", default="kh")
    args = p.parse_args()

    mesh = uniform_mesh(level=args.level, dim=args.dim, periodic=True)
    solver = CompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=args.dim),
        config=EulerConfig(flux=args.flux),
        amr=AMRConfig(max_level=args.level))

    print(f"elements={solver.n_elements} faces={mesh.conn.n_faces}")
    m0 = solver.compute_integral()
    dt = solver.compute_timestep()
    print(f"initial integral={m0:.6f} dt={dt:.3e}")

    t0 = time.perf_counter()
    for it in range(args.steps):
        solver.iterate(dt)
        if args.vtk_every and (it + 1) % args.vtk_every == 0:
            u = solver.conserved_state()
            h = np.asarray(mesh.volumes) ** (1.0 / args.dim)
            write_vtu(f"{args.prefix}_{it + 1:06d}.vtu", mesh.centers, h,
                      {"density": u[0], "energy": u[4], "momentum": u[1:4]},
                      dim=args.dim)
    solver.u.block_until_ready()
    dt_wall = time.perf_counter() - t0

    m1 = solver.compute_integral()
    dof_rate = solver.n_elements * args.steps / dt_wall
    print(f"steps={args.steps} wall={dt_wall:.3f}s "
          f"elem-updates/s={dof_rate:.3e} "
          f"integral drift={(m1 - m0) / m0:.2e}")


if __name__ == "__main__":
    main()
