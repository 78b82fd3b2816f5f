"""Second-order MUSCL reconstruction (ops/reconstruct.py): gradient
exactness, order-2 convergence, conservation, limiter monotonicity, and
every element class (brick / hanging AMR / shell prisms / tris / tets).

Beyond-reference capability: the reference consumes cell states at faces
directly (kernels.cu:150-172) and is strictly first order.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.ops.reconstruct import green_gauss_gradients
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

GAMMA = 1.4


def wave_ic(x):
    rho = 1.0 + 0.2 * np.sin(2 * np.pi * x)
    p = np.ones_like(x)
    u = np.ones_like(x)
    return np.stack([rho, rho * u, 0 * x, 0 * x,
                     p / (GAMMA - 1) + 0.5 * rho * u * u]).astype(np.float32)


def exact_rho(x, t):
    return 1.0 + 0.2 * np.sin(2 * np.pi * (x - t))


class TestGreenGauss:
    def test_linear_field_exact_gradient(self):
        """Green-Gauss with centroid-bisecting faces is exact for linear
        fields: interior elements of a uniform mesh recover the slope to
        roundoff."""
        mesh = uniform_mesh(4, dim=2, periodic=False)
        cap = mesh.conn.inc_slot.shape[0]
        n = mesh.conn.n_elements
        x, y = mesh.centers[:, 0], mesh.centers[:, 1]
        u = np.zeros((5, cap), np.float32)
        u[0, :n] = 2.0 + 3.0 * x - 1.5 * y
        u[4, :n] = 10.0
        inv = np.zeros(cap, np.float32)
        inv[:n] = 1.0 / mesh.volumes
        g = np.asarray(green_gauss_gradients(
            jnp.asarray(u), mesh.conn, jnp.asarray(inv)))
        interior = (x > 0.1) & (x < 0.9) & (y > 0.1) & (y < 0.9)
        gi = g[0][:, :n][:, interior]
        np.testing.assert_allclose(gi[0], 3.0, atol=1e-4)
        np.testing.assert_allclose(gi[1], -1.5, atol=1e-4)
        np.testing.assert_allclose(gi[2], 0.0, atol=1e-4)

    def test_periodic_wrap_displacements(self):
        """On periodic meshes the face displacements are minimal-image
        wrapped: a linear-in-sin field's gradient stays consistent across
        the wrap (no O(1) displacement blowup)."""
        mesh = uniform_mesh(4, dim=2, periodic=True)
        d_r = np.asarray(mesh.conn.d_right)
        # every displacement magnitude is at most one cell
        h = mesh.h
        assert np.abs(d_r).max() <= h * 0.51


class TestConvergence:
    def test_second_order_unlimited(self):
        errs = []
        for level in (4, 5, 6):
            mesh = uniform_mesh(level, dim=2, periodic=True)
            s = CompressibleEulerSolver(
                mesh, lambda c: wave_ic(c[:, 0]),
                config=EulerConfig(order=2, limiter="none"))
            dt = 0.2 * mesh.h / 2.4
            n = int(round(0.1 / dt))
            s.iterate_many(n, 0.1 / n)
            rho = s.conserved_state()[0]
            errs.append(float(np.sqrt(np.mean(
                (rho - exact_rho(mesh.centers[:, 0], 0.1)) ** 2))))
        orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
        assert min(orders) > 1.8, (errs, orders)

    def test_second_order_bj_limited(self):
        """Barth-Jespersen clips at smooth extrema; order still well above
        first order (~1.7+)."""
        errs = []
        for level in (4, 5, 6):
            mesh = uniform_mesh(level, dim=2, periodic=True)
            s = CompressibleEulerSolver(
                mesh, lambda c: wave_ic(c[:, 0]),
                config=EulerConfig(order=2, limiter="bj"))
            dt = 0.2 * mesh.h / 2.4
            n = int(round(0.1 / dt))
            s.iterate_many(n, 0.1 / n)
            rho = s.conserved_state()[0]
            errs.append(float(np.sqrt(np.mean(
                (rho - exact_rho(mesh.centers[:, 0], 0.1)) ** 2))))
        orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
        assert min(orders) > 1.5, (errs, orders)

    def test_second_order_venkat(self):
        """Venkatakrishnan: smooth relaxation of BJ — keeps ~order 1.85
        on the smooth wave (BJ tails off to ~1.77) with only slight,
        bounded overshoot at jumps (checked below)."""
        errs = []
        for level in (4, 5, 6):
            mesh = uniform_mesh(level, dim=2, periodic=True)
            s = CompressibleEulerSolver(
                mesh, lambda c: wave_ic(c[:, 0]),
                config=EulerConfig(order=2, limiter="venkat"))
            dt = 0.2 * mesh.h / 2.4
            n = int(round(0.1 / dt))
            s.iterate_many(n, 0.1 / n)
            rho = s.conserved_state()[0]
            errs.append(float(np.sqrt(np.mean(
                (rho - exact_rho(mesh.centers[:, 0], 0.1)) ** 2))))
        orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
        assert min(orders) > 1.75, (errs, orders)

    def test_venkat_bounded_on_discontinuity(self):
        mesh = uniform_mesh(5, dim=2, periodic=True)

        def step_ic(c):
            x = c[:, 0]
            rho = np.where((x > 0.25) & (x < 0.75), 2.0, 1.0)
            p = np.ones_like(x)
            return np.stack([rho, rho, 0 * x, 0 * x,
                             p / (GAMMA - 1) + 0.5 * rho]).astype(np.float32)

        s = CompressibleEulerSolver(
            mesh, step_ic, config=EulerConfig(order=2, limiter="venkat"))
        dt = s.compute_timestep()
        for _ in range(30):
            s.iterate(dt)
        rho = s.conserved_state()[0]
        assert rho.min() > 0.9 and rho.max() < 2.1

    def test_order2_beats_order1(self):
        mesh = uniform_mesh(6, dim=2, periodic=True)
        errs = {}
        for order in (1, 2):
            s = CompressibleEulerSolver(
                mesh, lambda c: wave_ic(c[:, 0]),
                config=EulerConfig(order=order))
            dt = 0.2 * mesh.h / 2.4
            n = int(round(0.1 / dt))
            s.iterate_many(n, 0.1 / n)
            rho = s.conserved_state()[0]
            errs[order] = float(np.sqrt(np.mean(
                (rho - exact_rho(mesh.centers[:, 0], 0.1)) ** 2)))
        assert errs[2] < errs[1] / 5, errs


class TestConservationAndStability:
    @pytest.mark.parametrize("periodic", [True, False])
    def test_mass_conserved(self, periodic):
        mesh = uniform_mesh(4, dim=2, periodic=periodic)
        s = CompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2),
                                    config=EulerConfig(order=2))
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(25):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()

    def test_bj_monotone_on_discontinuity(self):
        """A limited scheme must not create new extrema from a step
        profile (1-D Riemann-ish density jump advected)."""
        mesh = uniform_mesh(5, dim=2, periodic=True)

        def step_ic(c):
            x = c[:, 0]
            rho = np.where((x > 0.25) & (x < 0.75), 2.0, 1.0)
            p = np.ones_like(x)
            return np.stack([rho, rho, 0 * x, 0 * x,
                             p / (GAMMA - 1) + 0.5 * rho]).astype(np.float32)

        s = CompressibleEulerSolver(mesh, step_ic,
                                    config=EulerConfig(order=2))
        dt = s.compute_timestep()
        for _ in range(30):
            s.iterate(dt)
        rho = s.conserved_state()[0]
        # contact advection: density must stay within the initial bounds
        # up to a small acoustic-transient tolerance
        assert rho.min() > 1.0 - 0.05
        assert rho.max() < 2.0 + 0.05

    def test_hanging_face_amr_mesh(self):
        from t8gpu_tpu.mesh.forest import Forest, ForestMesh

        f = Forest.uniform(3, dim=2)
        c = f.centers()
        flags = np.where((c[:, 1] > 0.4) & (c[:, 1] < 0.6), 1, 0)
        f2, _ = f.adapt(f.balance_flags(flags.astype(np.int32)))
        s = CompressibleEulerSolver(
            ForestMesh.from_forest(f2), lambda cc: kh_planar(cc, dim=2),
            config=EulerConfig(order=2))
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(20):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()


class TestElementClasses:
    def test_shell_free_stream_order2(self):
        """Uniform state => zero gradients => order 2 reduces to order 1;
        free-stream preserved to roundoff on the prism shell."""
        from t8gpu_tpu.mesh.shell_forest import shell_manager

        mgr = shell_manager(subdiv=1, level=1,
                            amr=AMRConfig(min_level=0, max_level=2))

        def uniform_ic(c):
            u = np.zeros((5, len(c)), np.float32)
            u[0] = 1.0
            u[4] = 2.5
            return u

        s = CompressibleEulerSolver(mgr, uniform_ic,
                                    config=EulerConfig(order=2))
        u0 = s.conserved_state().copy()
        for _ in range(5):
            s.iterate(1e-4)
        assert np.abs(s.conserved_state() - u0).max() < 1e-5

    def test_shell_kh_order2(self):
        from t8gpu_tpu.mesh.shell_forest import shell_manager
        from t8gpu_tpu.models.initial_conditions import kh_sphere

        mgr = shell_manager(subdiv=1, level=1,
                            amr=AMRConfig(min_level=0, max_level=2))
        s = CompressibleEulerSolver(mgr, kh_sphere,
                                    config=EulerConfig(order=2))
        m0 = s.compute_integral()
        for _ in range(20):
            s.iterate(5e-4)
        assert abs(s.compute_integral() - m0) / m0 < 1e-4
        assert np.isfinite(s.conserved_state()).all()

    def test_tri_order2(self):
        from t8gpu_tpu.mesh.tri import (TriForest, TriForestMesh,
                                        unit_square_roots)

        tm = TriForestMesh.from_forest(
            TriForest.uniform(unit_square_roots(), 3))
        s = CompressibleEulerSolver(tm, lambda cc: kh_planar(cc, dim=2),
                                    config=EulerConfig(order=2))
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(15):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()

    def test_tet_order2(self):
        from t8gpu_tpu.mesh.tet import (TetForest, TetForestMesh,
                                        unit_cube_roots)

        tm = TetForestMesh.from_forest(
            TetForest.uniform(unit_cube_roots(), 2))
        s = CompressibleEulerSolver(tm, lambda cc: kh_planar(cc, dim=3),
                                    config=EulerConfig(order=2))
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(10):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()


class TestAdaptCycle:
    def test_order2_through_adapt(self):
        """A full AMR cycle rebuilds the connectivity including the MUSCL
        displacement geometry (Forest.connectivity passes face centroids);
        order 2 keeps running across adapts."""
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.mesh.manager import MeshManager

        mgr = MeshManager(Forest.uniform(3, dim=2),
                          AMRConfig(min_level=2, max_level=4,
                                    refine_threshold=1.0))
        s = CompressibleEulerSolver(mgr, lambda c: kh_planar(c, dim=2),
                                    config=EulerConfig(order=2))
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(3):
            for _ in range(5):
                s.iterate(dt)
            s.adapt()
            dt = s.compute_timestep()
        assert abs(s.compute_integral() - m0) / m0 < 1e-4
        assert np.isfinite(s.conserved_state()).all()

    def test_static_shell_order2(self):
        """Regression: the STATIC uniform shell (mesh/shell.py, the
        kh_sphere default mode) must carry face-centroid geometry too —
        round-3 review caught it crashing order=2."""
        from t8gpu_tpu.mesh.shell import shell_mesh
        from t8gpu_tpu.models.initial_conditions import kh_sphere

        s = CompressibleEulerSolver(shell_mesh(subdiv=1), kh_sphere,
                                    config=EulerConfig(order=2))
        m0 = s.compute_integral()
        for _ in range(10):
            s.iterate(5e-4)
        assert abs(s.compute_integral() - m0) / m0 < 1e-4
        assert np.isfinite(s.conserved_state()).all()
