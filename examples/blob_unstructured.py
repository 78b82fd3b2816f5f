"""Acoustic blob on unstructured simplex meshes (tri / tet) with AMR.

Demonstrates the general element classes beyond quads/hexes/prisms
(ref README.md:8: any t8code element class through general-normal
fluxes): a pressure blob in the unit square (triangles, 1->4 midpoint
refinement) or unit cube (tetrahedra, Bey red 1->8 over the Kuhn split),
with criteria-driven refine/coarsen tracking the wavefront and
reflective walls.

    python examples/blob_unstructured.py --elements tri --steps 200
    python examples/blob_unstructured.py --elements tet --steps 100
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def ic_blob(c):
    u = np.zeros((5, len(c)), np.float32)
    r2 = ((c - 0.5) ** 2).sum(axis=1)
    u[0] = 1.0 + 0.5 * np.exp(-r2 / 0.01)
    u[4] = 2.5 * u[0]
    return u


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--elements", default="tri", choices=("tri", "tet"))
    p.add_argument("--level", type=int, default=None)
    p.add_argument("--max-level", type=int, default=None)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--adapt-every", type=int, default=25)
    p.add_argument("--refine-threshold", type=float, default=0.05)
    p.add_argument("--flux", default="kepes", choices=("kepes", "hll", "hllc"))
    args = p.parse_args()

    if args.elements == "tri":
        from t8gpu_tpu.mesh.tri import tri_manager
        level = args.level if args.level is not None else 4
        max_level = args.max_level if args.max_level is not None else level + 2
        mgr = tri_manager(level=level,
                          amr=AMRConfig(min_level=max(level - 1, 0),
                                        max_level=max_level,
                                        refine_threshold=args.refine_threshold))
    else:
        from t8gpu_tpu.mesh.tet import tet_manager
        level = args.level if args.level is not None else 2
        max_level = args.max_level if args.max_level is not None else level + 2
        mgr = tet_manager(level=level,
                          amr=AMRConfig(min_level=max(level - 1, 0),
                                        max_level=max_level,
                                        refine_threshold=args.refine_threshold))

    solver = CompressibleEulerSolver(mgr, ic_blob,
                                     config=EulerConfig(flux=args.flux))
    print(f"{args.elements}: elements={solver.n_elements} "
          f"faces={solver.conn.n_faces} boundary={solver.conn.n_boundary_faces}")
    m0 = solver.compute_integral()
    dt = solver.compute_timestep_device()

    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        n = min(args.steps - done, args.adapt_every)
        solver.iterate_many(n, dt)
        done += n
        if done < args.steps:
            solver.adapt()
            dt = solver.compute_timestep_device()
    solver.u.block_until_ready()
    wall = time.perf_counter() - t0

    m1 = solver.compute_integral()
    print(f"steps={args.steps} elements={solver.n_elements} "
          f"max_level={int(mgr.forest.level.max())} wall={wall:.2f}s "
          f"integral drift={(m1 - m0) / m0:.2e}")


if __name__ == "__main__":
    main()
