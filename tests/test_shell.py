"""Spherical-shell mesh (mixed tri/quad faces, prism elements)."""

import numpy as np
import pytest

from t8gpu_tpu.mesh.shell import shell_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_sphere


def test_shell_geometry():
    mesh = shell_mesh(subdiv=2, r_in=0.8, thickness=0.2, n_layers=2)
    assert mesh.n_elements == 20 * 16 * 2
    # total volume close to the analytic shell volume (faceted sphere is
    # slightly smaller)
    exact = 4.0 / 3.0 * np.pi * (1.0**3 - 0.8**3)
    total = float(mesh.volumes.sum())
    assert 0.95 * exact < total < exact
    # all faces carry unit normals
    F = mesh.conn.n_faces
    nrm = np.asarray(mesh.conn.normal)[:, :F]
    np.testing.assert_allclose((nrm**2).sum(axis=0), 1.0, rtol=1e-5)
    # caps: 2 boundary faces per (triangle, inner/outer)
    assert mesh.conn.n_boundary_faces == 2 * 20 * 16


def test_shell_solver_conserves_mass():
    """KH-on-a-sphere (ref examples/compressible_euler) on the shell mesh:
    the general-normal flux path + reflective caps conserve mass."""
    mesh = shell_mesh(subdiv=2, r_in=0.8, thickness=0.2, n_layers=1)
    solver = CompressibleEulerSolver(mesh, kh_sphere)
    m0 = solver.compute_integral()
    dt = solver.compute_timestep()
    for _ in range(10):
        solver.iterate(dt)
    m1 = solver.compute_integral()
    assert np.isfinite(solver.conserved_state()).all()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def test_shell_solver_runs_hll():
    mesh = shell_mesh(subdiv=1, n_layers=1)
    from t8gpu_tpu.utils.config import EulerConfig
    solver = CompressibleEulerSolver(mesh, kh_sphere,
                                     config=EulerConfig(flux="hll"))
    for _ in range(5):
        solver.iterate(1e-4)
    assert np.isfinite(solver.conserved_state()).all()
