"""Isentropic-vortex order verification (exact nonlinear solution).

The vortex advects without deformation on the periodic square, so the
exact solution at any t is the IC with a shifted center — a genuinely
2D, nonlinear, non-grid-aligned exact solution of the full Euler
system.  Verifies the MUSCL path at design order on something harder
than the grid-aligned advected wave of tests/test_convergence.py.
"""

import numpy as np

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import isentropic_vortex
from t8gpu_tpu.utils.config import EulerConfig

T_END = 0.15


def _vortex_error(level, order, limiter="none"):
    mesh = uniform_mesh(level=level, dim=2, periodic=True)
    solver = CompressibleEulerSolver(
        mesh, isentropic_vortex,
        config=EulerConfig(order=order, limiter=limiter))
    dt0 = 0.8 * solver.compute_timestep()
    n = int(np.ceil(T_END / dt0))
    solver.iterate_many(n, T_END / n)
    u = np.asarray(solver.conserved_state(), np.float64)
    ex = np.asarray(isentropic_vortex(mesh.centers, t=T_END), np.float64)
    d = u[0] - ex[0]
    return float(np.sqrt(np.mean(d * d)))


def test_vortex_order2_convergence():
    e5 = _vortex_error(5, order=2)
    e6 = _vortex_error(6, order=2)
    rate = np.log2(e5 / e6)
    assert rate > 1.6, (e5, e6, rate)


def test_vortex_order2_beats_order1():
    e1 = _vortex_error(5, order=1)
    e2 = _vortex_error(5, order=2)
    assert e2 < 0.4 * e1, (e1, e2)


def test_vortex_limited_still_converges():
    """Venkatakrishnan limiting on smooth flow must not clip to first
    order (the smooth-flow property the limiter is chosen for)."""
    e5 = _vortex_error(5, order=2, limiter="venkat")
    e6 = _vortex_error(6, order=2, limiter="venkat")
    rate = np.log2(e5 / e6)
    assert rate > 1.3, (e5, e6, rate)
