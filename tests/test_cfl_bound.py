"""Axis-summed CFL bound (ops/euler.cfl_sum_speed).

Round-3 stability finding (BENCHMARKS.md round-3e): the per-face
max-speed bound the reference uses (solver.cu:213-229) is von-Neumann
unstable for the dim-summed flux divergence — a 1e-6 noise-seeded 3D KH
at that dt blows up in ~20 RK3 steps (at EVERY mu in [0, 1e-3]; the
canonical planar-KH states survive only because they are exactly
y-invariant).  These tests pin the fix: the recommended dt now uses
max over cells of sum_a |v_a| + dim * c, and a noise-seeded run at the
recommended dt stays finite.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
from t8gpu_tpu.ops.euler import cfl_sum_speed

GAMMA = 1.4


def _sum_speed_numpy(u, dim):
    rho = u[0]
    v = u[1:4] / rho
    p = (GAMMA - 1.0) * (u[4] - 0.5 * (u[1:4] * v).sum(0))
    c = np.sqrt(GAMMA * np.maximum(p, 0.0) / rho)
    return (np.abs(v[:dim]).sum(0) + dim * c).max()


def test_cfl_sum_speed_formula():
    """cfl_sum_speed == the hand-evaluated max_cells(sum_a |v_a| + dim c),
    live-masked."""
    rng = np.random.default_rng(3)
    u = np.empty((5, 40), np.float32)
    u[0] = 1.0 + 0.5 * rng.random(40)
    u[1:4] = rng.standard_normal((3, 40)).astype(np.float32)
    ke = 0.5 * (u[1:4] ** 2).sum(0) / u[0]
    u[4] = ke + (1.0 + rng.random(40)).astype(np.float32) / (GAMMA - 1)
    live = np.ones(40, bool)
    live[-6:] = False
    u[:, ~live] = 77.0            # garbage on dead slots must not leak

    for dim in (2, 3):
        got = float(cfl_sum_speed(jnp.asarray(u), GAMMA, dim,
                                  live=jnp.asarray(live)))
        want = _sum_speed_numpy(u[:, live].astype(np.float64), dim)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_recommended_dt_uses_summed_speed():
    """The subgrid solver's compute_timestep == cfl * h / sum-speed —
    NOT the ~2.5x larger per-face max-speed dt that is noise-unstable."""
    spec = SubgridSpec((8, 8, 8))
    mesh = SubgridMesh.from_forest(Forest.uniform(1, dim=3), spec)
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=3))
    n = s.n_elements
    u = np.asarray(s.u[..., :n], np.float64).reshape(5, -1)
    h = 0.5 ** s.mesh.max_level / spec.extent
    want = s.config.cfl * h / _sum_speed_numpy(u, 3)
    np.testing.assert_allclose(s.compute_timestep(), want, rtol=1e-5)


@pytest.mark.parametrize("mu", [0.0, 1e-4])
def test_noise_seeded_kh_stable_at_recommended_dt(mu):
    """1e-6 noise-seeded 3D KH stays finite for 120 steps at the
    recommended dt (the old max-speed dt NaNs by ~step 20-60 on this
    exact configuration — measured, BENCHMARKS.md round-3e)."""
    from t8gpu_tpu.utils.config import EulerConfig

    spec = SubgridSpec((8, 8, 8))
    mesh = SubgridMesh.from_forest(Forest.uniform(1, dim=3), spec)
    rng = np.random.default_rng(0)

    def noisy_ic(c):
        u = kh_planar(c, dim=3)
        return u + 1e-6 * rng.standard_normal(u.shape).astype(np.float32)

    s = SubgridCompressibleEulerSolver(mesh, noisy_ic,
                                       config=EulerConfig(mu=mu))
    dt = s.compute_timestep()
    s.iterate_many(120, dt)
    assert np.isfinite(s.conserved_state()).all()
