"""Euler on USER-SUPPLIED coarse meshes + the mixed-class forest.

The reference accepts any t8code cmesh (main.cu:23) and mixes element
classes freely (README.md:8); this driver demonstrates the rebuild's
counterpart (mesh/cmesh.py):

  * --mesh quad    an acoustic blob on a SKEWED 3-quad user cmesh
                   (bilinear roots) with criteria-driven AMR;
  * --mesh hex     the 3D analogue on a skewed 2-hex cmesh (trilinear
                   roots, non-planar faces) with AMR;
  * --mesh hybrid  ONE forest mixing quad and triangle elements
                   (cross-class faces + 2:1 balance across the
                   interface) with AMR;
  * --mesh hybrid3d  the 3D counterpart: ONE forest mixing hex and tet
                   elements (interface quad faces triangulated by the
                   tets, matched as half-triangles) with AMR.

    python examples/cmesh_demo.py --mesh hybrid --steps 200 --amr
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


def blob_ic(c):
    u = np.zeros((5, len(c)), np.float32)
    r2 = ((c[:, :2] - 0.4) ** 2).sum(axis=1)
    u[0] = 1.0 + 0.5 * np.exp(-r2 / 0.01)
    u[4] = 2.5 * u[0]
    return u


def build(args):
    from t8gpu_tpu.mesh.cmesh import (CmeshForestMesh, HexForest,
                                      HybridForest, QuadForest, hex_manager,
                                      hex_roots, hybrid_manager, quad_manager,
                                      quad_roots, unit_square_hybrid_roots)

    amr = AMRConfig(min_level=max(args.level - 1, 0),
                    max_level=args.max_level or args.level + 2,
                    refine_threshold=args.refine_threshold)
    if args.mesh == "quad":
        verts = np.array([[0.0, 0.0], [0.45, 0.1], [1.0, 0.0],
                          [-0.1, 0.9], [0.55, 1.05], [1.1, 1.0],
                          [0.5, 1.9], [1.4, 2.0]])
        quads = np.array([[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7]])
        roots = quad_roots(verts, quads)
        if args.amr:
            return quad_manager(roots, level=args.level, amr=amr)
        return CmeshForestMesh.from_forest(
            QuadForest.uniform(roots, args.level))
    if args.mesh == "hex":
        verts = np.array([
            [0.0, 0.0, 0.0], [1.0, 0.1, 0.0], [2.1, 0.0, 0.1],
            [0.1, 1.0, 0.1], [1.1, 1.2, 0.0], [2.0, 1.0, 0.0],
            [0.0, 0.1, 1.0], [0.9, 0.0, 1.1], [2.0, 0.2, 1.0],
            [0.1, 1.1, 1.0], [1.0, 1.0, 1.2], [2.2, 1.1, 1.1]])
        hexes = np.array([[0, 1, 3, 4, 6, 7, 9, 10],
                          [1, 2, 4, 5, 7, 8, 10, 11]])
        roots = hex_roots(verts, hexes)
        if args.amr:
            return hex_manager(roots, level=args.level, amr=amr)
        return CmeshForestMesh.from_forest(
            HexForest.uniform(roots, args.level))
    if args.mesh == "hybrid3d":
        from t8gpu_tpu.mesh.cmesh import (Hybrid3DForest, hybrid3d_manager,
                                          unit_cube_hybrid3d_roots)
        tr3, hr3, kind = unit_cube_hybrid3d_roots()
        if args.amr:
            return hybrid3d_manager(tr3, hr3, kind, level=args.level,
                                    amr=amr)
        return CmeshForestMesh.from_forest(
            Hybrid3DForest.uniform(tr3, hr3, kind, args.level))
    # hybrid: left half quad root, right half two tri roots
    tr, qr = unit_square_hybrid_roots()
    if args.amr:
        return hybrid_manager(tr, qr, level=args.level, amr=amr)
    return CmeshForestMesh.from_forest(HybridForest.uniform(tr, qr,
                                                            args.level))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", default="hybrid",
                   choices=("quad", "hex", "hybrid", "hybrid3d"))
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--max-level", type=int, default=0)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--amr", action="store_true")
    p.add_argument("--adapt-every", type=int, default=25)
    p.add_argument("--refine-threshold", type=float, default=0.02)
    p.add_argument("--flux", default="kepes",
                   choices=("kepes", "hll", "hllc"))
    p.add_argument("--vtk", default="", help="write a .vtu at the end")
    args = p.parse_args()

    mesh = build(args)
    solver = CompressibleEulerSolver(mesh, blob_ic,
                                     config=EulerConfig(flux=args.flux))
    m0 = solver.compute_integral()
    dt = 0.5 * solver.compute_timestep()
    print(f"{args.mesh}: elements={solver.n_elements} "
          f"integral={m0:.6f} dt={dt:.3e}", flush=True)

    t0 = time.perf_counter()
    it = 0
    while it < args.steps:
        n = (min(args.adapt_every - it % args.adapt_every, args.steps - it)
             if args.amr else args.steps - it)
        solver.iterate_many(n, dt)
        it += n
        if args.amr and it % args.adapt_every == 0 and it < args.steps:
            solver.adapt()
            dt = 0.5 * solver.compute_timestep()
            print(f"step {it}: elements={solver.n_elements} dt={dt:.3e}",
                  flush=True)
    wall = time.perf_counter() - t0
    m1 = solver.compute_integral()
    print(f"steps={args.steps} wall={wall:.2f}s "
          f"final elements={solver.n_elements} "
          f"mass drift={(m1 - m0) / m0:.2e}")
    if args.vtk:
        from t8gpu_tpu.io.vtk import write_vtu
        u = solver.conserved_state()
        mesh_now = solver.mesh if solver.manager is None \
            else solver.manager.mesh
        dim = 3 if args.mesh in ("hex", "hybrid3d") else 2
        h = np.asarray(mesh_now.volumes) ** (1.0 / dim)
        write_vtu(args.vtk, np.asarray(mesh_now.centers), h,
                  {"density": u[0]}, dim=dim)
        print(f"wrote {args.vtk}")


if __name__ == "__main__":
    main()
