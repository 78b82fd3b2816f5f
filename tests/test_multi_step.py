"""iterate_many (fused lax.fori_loop batch) == repeated iterate."""

import numpy as np

from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver


def test_plain_iterate_many_matches_loop():
    ic = lambda c: kh_planar(c, dim=2)
    mesh = uniform_mesh(4, dim=2)
    s1 = CompressibleEulerSolver(mesh, ic)
    s2 = CompressibleEulerSolver(mesh, ic)
    for _ in range(5):
        s1.iterate(1e-3)
    s2.iterate_many(5, 1e-3)
    np.testing.assert_allclose(s1.conserved_state(), s2.conserved_state(),
                               rtol=1e-6, atol=1e-7)


def test_subgrid_iterate_many_matches_loop():
    ic = lambda c: kh_planar(c, dim=2)
    mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2), SUBGRID_4x4)
    s1 = SubgridCompressibleEulerSolver(mesh, ic)
    s2 = SubgridCompressibleEulerSolver(mesh, ic)
    for _ in range(5):
        s1.iterate(1e-3)
    s2.iterate_many(5, 1e-3)
    np.testing.assert_allclose(s1.conserved_state(), s2.conserved_state(),
                               rtol=1e-6, atol=1e-7)
