"""Sod shock tube vs the EXACT Riemann solution.

The classic quantitative validation for a compressible-Euler code: the
computed shock / contact / rarefaction structure is compared against the
exact self-similar solution (models/exact_riemann.py, Toro ch. 4).  The
reference ships no such test (SURVEY.md §4: no tests at all); its only
acceptance artifact is visual VTK inspection.
"""

import numpy as np
import pytest

from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.exact_riemann import (sod_ic, sod_solution, star_state)
from t8gpu_tpu.utils.config import EulerConfig

T_END = 0.2
GAMMA = 1.4


def test_star_state_golden():
    """Known star-region values for the Sod problem (Toro table 4.2):
    p* = 0.30313, u* = 0.92745."""
    p_s, u_s = star_state(1.0, 0.0, 1.0, 0.125, 0.0, 0.1, GAMMA)
    assert abs(p_s - 0.30313) < 2e-5, p_s
    assert abs(u_s - 0.92745) < 2e-5, u_s


def test_exact_sampler_regions():
    """The sampled solution reproduces the analytic plateau values and
    the correct wave positions at t = 0.2."""
    x = np.array([0.1, 0.4, 0.6, 0.75, 0.95])
    rho, u, p = sod_solution(x, T_END)
    # pre-wave states
    assert abs(rho[0] - 1.0) < 1e-12 and abs(p[0] - 1.0) < 1e-12
    assert abs(rho[4] - 0.125) < 1e-12 and abs(p[4] - 0.1) < 1e-12
    # left star (between rarefaction tail ~0.486 and contact ~0.685)
    assert abs(rho[2] - 0.42632) < 1e-4, rho[2]
    # right star (between contact and shock ~0.850)
    assert abs(rho[3] - 0.26557) < 1e-4, rho[3]
    assert abs(p[2] - 0.30313) < 1e-4 and abs(p[3] - 0.30313) < 1e-4
    assert abs(u[2] - 0.92745) < 1e-4 and abs(u[3] - 0.92745) < 1e-4


def _run_sod(level, order=1, limiter="bj", flux="kepes"):
    f = Forest.uniform(level, dim=2, periodic=(False, True))
    mesh = ForestMesh.from_forest(f)
    solver = CompressibleEulerSolver(
        mesh, sod_ic,
        config=EulerConfig(order=order, limiter=limiter, flux=flux))
    # post-shock speeds exceed the initial CFL estimate by ~1.45x;
    # a fixed 0.5x margin keeps the whole run inside the stable region
    dt0 = 0.5 * solver.compute_timestep()
    n = int(np.ceil(T_END / dt0))
    solver.iterate_many(n, T_END / n)
    u = np.asarray(solver.conserved_state(), np.float64)
    x = mesh.centers[:, 0]
    rho_ex, u_ex, p_ex = sod_solution(x, T_END)
    err_l1 = np.mean(np.abs(u[0] - rho_ex))
    return x, u, rho_ex, err_l1


def test_sod_first_order_matches_exact():
    x, u, rho_ex, err = _run_sod(level=6, order=1)
    assert np.all(np.isfinite(u)), "NaN in Sod run"
    # L1 density error at 64 cells/axis, first order: measured ~0.016
    assert err < 0.030, err
    # right-star plateau (between contact ~0.685 and shock ~0.850)
    window = (x > 0.72) & (x < 0.82)
    rho_star = u[0][window].mean()
    assert abs(rho_star / 0.26557 - 1.0) < 0.04, rho_star
    # star pressure on the same window
    pres = (GAMMA - 1.0) * (u[4] - 0.5 * (u[1]**2 + u[2]**2) / u[0])
    assert abs(pres[window].mean() / 0.30313 - 1.0) < 0.04
    # undisturbed states ahead of the waves survive (the rarefaction
    # head at x~0.263 smears ~4 cells upstream at this resolution)
    assert abs(u[0][x < 0.12].mean() - 1.0) < 2e-3
    assert abs(u[0][x > 0.92].mean() - 0.125) < 2e-3


def test_sod_order2_beats_order1():
    """MUSCL + limiter sharpens the contact/shock: L1 error drops."""
    _, u1, _, err1 = _run_sod(level=6, order=1)
    _, u2, _, err2 = _run_sod(level=6, order=2, limiter="bj")
    assert np.all(np.isfinite(u2))
    assert err2 < 0.8 * err1, (err1, err2)


def test_sod_hllc_resolves_contact():
    """HLLC on the tube stays finite and accurate (the contact-restoring
    flux is the textbook choice for this problem)."""
    _, u, _, err = _run_sod(level=6, order=2, flux="hllc")
    assert np.all(np.isfinite(u))
    assert err < 0.020, err


def test_sod_converges_under_refinement():
    _, _, _, e5 = _run_sod(level=5)
    _, _, _, e6 = _run_sod(level=6)
    # shock-dominated: L1 convergence rate ~0.55 measured (plateaus
    # converge at order 1, the smeared discontinuities at ~1/2)
    assert e6 < e5 * 0.75, (e5, e6)


def test_sod_subgrid_matches_plain():
    """The dense-block (subgrid) scheme on the tube: level 3 with 8x8
    blocks is the same 64-cell/axis discretization as plain level 6 —
    cell-exact equivalence on uniform meshes is the repo invariant, so
    the tube (walls + shock + contact) must match the plain result."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    x_p, u_p, _, err_p = _run_sod(level=6, order=1)

    f = Forest.uniform(3, dim=2, periodic=(False, True))
    spec = SubgridSpec((8, 8))
    mesh = SubgridMesh.from_forest(f, spec)
    solver = SubgridCompressibleEulerSolver(mesh, sod_ic,
                                            config=EulerConfig())
    dt0 = 0.5 * solver.compute_timestep()
    n = int(np.ceil(T_END / dt0))
    solver.iterate_many(n, T_END / n)
    u_s = np.asarray(solver.conserved_state(), np.float64).reshape(5, -1)
    x_s = mesh.cell_centers()[:, 0]
    rho_ex, _, _ = sod_solution(x_s, T_END)
    err_s = np.mean(np.abs(u_s[0] - rho_ex))
    assert np.all(np.isfinite(u_s))
    # same discretization, same scheme -> same error (dt differs only
    # by the ceil rounding of n)
    assert abs(err_s - err_p) < 0.1 * err_p, (err_s, err_p)
