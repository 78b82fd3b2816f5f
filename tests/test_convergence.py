"""Spatial convergence of the FV scheme on an exact Euler solution.

A density wave advected by a uniform flow (rho = 1 + 0.2 sin(2 pi (x - t)),
u = 1, p = const) is an exact solution of the Euler equations; the
first-order FV discretization with KEPES/HLL dissipation must converge
with order ~1 as the mesh refines.  This validates the full
flux/accumulate/RK pipeline quantitatively — beyond conservation checks —
for both the plain and the subgrid schemes (the reference ships no
quantitative accuracy tests at all, SURVEY.md §4).
"""

import numpy as np
import pytest

from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

GAMMA = 1.4
T_END = 0.1


def wave_ic(x):
    rho = 1.0 + 0.2 * np.sin(2 * np.pi * x)
    p = np.ones_like(x)
    u = np.ones_like(x)
    rho_e = p / (GAMMA - 1.0) + 0.5 * rho * u * u
    return np.stack([rho, rho * u, np.zeros_like(x), np.zeros_like(x), rho_e]
                    ).astype(np.float32)


def exact_rho(x, t):
    return 1.0 + 0.2 * np.sin(2 * np.pi * (x - t))


def _advance(solver, h):
    dt = 0.2 * h / 2.4          # CFL-safe for |u|+a ~ 2.2
    n = int(round(T_END / dt))
    solver.iterate_many(n, T_END / n)
    return solver


def test_plain_first_order_convergence():
    errs = []
    for level in (4, 5, 6):
        mesh = uniform_mesh(level, dim=2, periodic=True)
        s = CompressibleEulerSolver(mesh, lambda c: wave_ic(c[:, 0]))
        _advance(s, mesh.h)
        rho = s.conserved_state()[0]
        err = np.sqrt(np.mean(
            (rho - exact_rho(mesh.centers[:, 0], T_END)) ** 2))
        errs.append(err)
    order = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    assert min(order) > 0.75, (errs, order)


def test_subgrid_first_order_convergence():
    errs = []
    for level in (2, 3, 4):
        mesh = SubgridMesh.from_forest(Forest.uniform(level, dim=2),
                                       SUBGRID_4x4)
        s = SubgridCompressibleEulerSolver(mesh, lambda c: wave_ic(c[:, 0]))
        h = 0.5 ** level / 4
        _advance(s, h)
        rho = s.conserved_state()[0].reshape(-1)
        cc = mesh.cell_centers()
        err = np.sqrt(np.mean((rho - exact_rho(cc[:, 0], T_END)) ** 2))
        errs.append(err)
    order = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    assert min(order) > 0.75, (errs, order)
