"""Gravity source terms (ops/source.py): exact uniform-acceleration
solution, conservation, sharded == single device, all solver paths.

Beyond-reference: the reference integrates the homogeneous Euler system
only; gravity enables buoyancy-driven flows (Rayleigh-Taylor,
stratified KH — examples/rayleigh_taylor.py).
"""

import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.utils.config import EulerConfig

GAMMA = 1.4
G = (0.0, -1.5, 0.0)


def uniform_ic(c):
    u = np.zeros((5, len(c)), np.float32)
    u[0] = 1.0
    u[4] = 2.5
    return u


class TestExactAcceleration:
    """Uniform state + periodic domain: fluxes cancel, so the evolution
    is the exact ODE m_y(t) = rho g t, E(t) = E0 + rho g^2 t^2 / 2 —
    linear/quadratic in t, integrated EXACTLY by SSP-RK3."""

    def test_plain(self):
        mesh = uniform_mesh(3, dim=2, periodic=True)
        s = CompressibleEulerSolver(mesh, uniform_ic,
                                    config=EulerConfig(gravity=G))
        dt, n = 1e-2, 20
        for _ in range(n):
            s.iterate(dt)
        t = dt * n
        u = s.conserved_state()
        np.testing.assert_allclose(u[2], G[1] * t, rtol=1e-5)
        np.testing.assert_allclose(u[4], 2.5 + 0.5 * G[1] ** 2 * t * t,
                                   rtol=1e-5)
        np.testing.assert_allclose(u[0], 1.0, rtol=1e-6)   # mass untouched

    def test_plain_order2(self):
        mesh = uniform_mesh(3, dim=2, periodic=True)
        s = CompressibleEulerSolver(
            mesh, uniform_ic, config=EulerConfig(gravity=G, order=2))
        dt, n = 1e-2, 20
        for _ in range(n):
            s.iterate(dt)
        np.testing.assert_allclose(s.conserved_state()[2], G[1] * dt * n,
                                   rtol=1e-5)

    def test_subgrid(self):
        from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.mesh.subgrid import SubgridMesh
        from t8gpu_tpu.models.subgrid_euler import (
            SubgridCompressibleEulerSolver)

        mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2),
                                       SUBGRID_4x4)

        s = SubgridCompressibleEulerSolver(
            mesh, uniform_ic, config=EulerConfig(gravity=G))
        dt, n = 1e-2, 20
        s.iterate_many(n, dt)
        u = s.conserved_state().reshape(5, -1)
        np.testing.assert_allclose(u[2], G[1] * dt * n, rtol=1e-5)
        np.testing.assert_allclose(u[0], 1.0, rtol=1e-6)


class TestConservationAndCoupling:
    def test_mass_conserved_kh(self):
        """Nontrivial flow + gravity: mass still exactly conserved (the
        source has no density row)."""
        mesh = uniform_mesh(4, dim=2, periodic=True)
        s = CompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2),
                                    config=EulerConfig(gravity=G))
        m0 = s.compute_integral()
        dt = 0.5 * s.compute_timestep()
        for _ in range(20):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()

    def test_sharded_matches_single_device(self):
        from t8gpu_tpu.mesh.forest import Forest, ForestMesh
        from t8gpu_tpu.parallel.solver import ShardedEulerSolver

        forest = Forest.uniform(4, dim=2)
        ic = lambda c: kh_planar(c, dim=2)
        cfg = EulerConfig(gravity=G)
        ref = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic,
                                      config=cfg)
        sh = ShardedEulerSolver(forest, ic, config=cfg)
        dt = 1e-3
        for _ in range(5):
            ref.iterate(dt)
            sh.iterate(dt)
        np.testing.assert_allclose(sh.conserved_state(),
                                   ref.conserved_state(),
                                   rtol=2e-5, atol=2e-6)

    def test_sharded_subgrid_matches_single_device(self):
        from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.mesh.subgrid import SubgridMesh
        from t8gpu_tpu.models.subgrid_euler import (
            SubgridCompressibleEulerSolver)
        from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

        f = Forest.uniform(3, dim=2)
        ic = lambda c: kh_planar(c, dim=2)
        cfg = EulerConfig(gravity=G)
        ref = SubgridCompressibleEulerSolver(
            SubgridMesh.from_forest(f, SUBGRID_4x4), ic, config=cfg)
        sh = ShardedSubgridEulerSolver(f, SUBGRID_4x4, ic, config=cfg)
        dt = 1e-3
        for _ in range(5):
            ref.iterate(dt)
            sh.iterate(dt)
        np.testing.assert_allclose(
            sh.conserved_state().reshape(5, -1),
            ref.conserved_state().reshape(5, -1), rtol=2e-5, atol=2e-6)

    def test_rayleigh_taylor_instability_grows(self):
        """Heavy-over-light with gravity and a seed perturbation: the
        interface deforms (y-momentum variance grows from ~0) and the run
        stays finite — the buoyancy physics the source enables."""
        def rt_ic(c):
            x, y = c[:, 0], c[:, 1]
            rho = np.where(y > 0.5, 2.0, 1.0)
            # hydrostatic-ish pressure + tiny velocity seed at the interface
            p = 2.5 + 0.1 * (0.75 - y)
            vy = 0.01 * np.cos(4 * np.pi * x) * np.exp(-200 *
                                                       (y - 0.5) ** 2)
            u = np.zeros((5, len(c)), np.float32)
            u[0] = rho
            u[2] = rho * vy
            u[4] = p / (GAMMA - 1) + 0.5 * rho * vy * vy
            return u

        mesh = uniform_mesh(5, dim=2, periodic=False)
        s = CompressibleEulerSolver(
            mesh, rt_ic, config=EulerConfig(gravity=(0.0, -0.1, 0.0)))
        my0 = float(np.abs(s.conserved_state()[2]).mean())
        dt = 0.5 * s.compute_timestep()
        for _ in range(50):
            s.iterate(dt)
        u = s.conserved_state()
        assert np.isfinite(u).all()
        assert float(np.abs(u[2]).mean()) > 2 * my0   # buoyant acceleration


def test_subgrid_gravity_fused_matches_stencil():
    """T8GPU_PALLAS=interpret: the IN-KERNEL unsplit gravity source of
    the RK-fused stage kernels (ops/pallas_kernels._fused_rk_kernel —
    every first-order config now rides the fused path) == the XLA
    with_gravity closure, on a nontrivial KH state; and the exact
    uniform-acceleration solution holds through the kernels."""
    import os

    import jax

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    cfg = EulerConfig(gravity=G)
    mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2),
                                   SubgridSpec((8, 8)))
    s0 = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2),
                                        config=cfg)
    for _ in range(3):
        s0.iterate(1e-3)
    u_ref = s0.conserved_state()

    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        s1 = SubgridCompressibleEulerSolver(
            mesh, lambda c: kh_planar(c, dim=2), config=cfg)
        for _ in range(3):
            s1.iterate(1e-3)
        u_kern = s1.conserved_state()

        s2 = SubgridCompressibleEulerSolver(mesh, uniform_ic, config=cfg)
        dt, n = 1e-2, 20
        s2.iterate_many(n, dt)
        u2 = s2.conserved_state().reshape(5, -1)
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    np.testing.assert_allclose(u_kern.reshape(5, -1), u_ref.reshape(5, -1),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(u2[2], G[1] * dt * n, rtol=1e-5)
    np.testing.assert_allclose(u2[0], 1.0, rtol=1e-6)
