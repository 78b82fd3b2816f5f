"""Adjoint (reverse-mode AD) rollouts: gradients through the FV solvers
verified against central finite differences.

The reference has no analogue (its step is in-place CUDA kernels +
atomicAdd + MPI barriers, solver.cu:75-175); differentiability is a
capability the functional TPU design gets structurally.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models import adjoint
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def _plain_solver(level=3, dim=2, dtype="float32"):
    mesh = uniform_mesh(level=level, dim=dim, periodic=True)
    return CompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=dim),
        config=EulerConfig(dtype=dtype), amr=AMRConfig(max_level=level))


def _subgrid_solver(level=1, dim=2, extent=4):
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    mesh = SubgridMesh.from_forest(Forest.uniform(level, dim=dim),
                                   SubgridSpec((extent,) * dim))
    return SubgridCompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=dim))


def _directional_fd_check(objective, u0, rng, rel_eps, tol):
    """Compare grad . v against a central finite difference along a random
    direction v (the standard gradient check: one direction probes every
    component the loss couples to)."""
    val, g = jax.value_and_grad(objective)(u0)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()

    v = jnp.asarray(rng.standard_normal(u0.shape), u0.dtype)
    eps = u0.dtype.type(rel_eps)
    f_p = float(objective(u0 + eps * v))
    f_m = float(objective(u0 - eps * v))
    fd = (f_p - f_m) / (2 * float(eps))
    ad = float((g * v).sum())
    assert fd != 0.0
    np.testing.assert_allclose(ad, fd, rtol=tol)
    return val, g


class TestPlainAdjoint:
    def test_grad_matches_fd_f64(self):
        """f64 plain path: AD directional derivative == central FD to
        tight tolerance (f64 kills FD roundoff noise)."""
        with jax.enable_x64(True):
            s = _plain_solver(level=3, dtype="float64")
            dt = 0.3 * s.compute_timestep()
            target = s.u * 1.01

            def objective(u0):
                uT = adjoint.rollout(s, dt, n_steps=4, u0=u0)
                return ((uT - target) ** 2).sum()

            _directional_fd_check(objective, s.u, np.random.default_rng(0),
                                  rel_eps=1e-6, tol=1e-6)

    def test_grad_matches_fd_viscous_f64(self):
        """Gradients flow through the Navier-Stokes terms (the viscous
        face flux is pure jnp, so reverse-mode applies unchanged)."""
        with jax.enable_x64(True):
            mesh = uniform_mesh(level=3, dim=2, periodic=True)
            s = CompressibleEulerSolver(
                mesh, lambda c: kh_planar(c, dim=2),
                config=EulerConfig(dtype="float64", mu=2e-3),
                amr=AMRConfig(max_level=3))
            dt = 0.3 * s.compute_timestep()
            target = s.u * 1.01

            def objective(u0):
                uT = adjoint.rollout(s, dt, n_steps=3, u0=u0)
                return ((uT - target) ** 2).sum()

            _directional_fd_check(objective, s.u, np.random.default_rng(2),
                                  rel_eps=1e-6, tol=1e-6)

    def test_grad_matches_fd_f32(self):
        """f32 (production dtype): looser FD tolerance."""
        s = _plain_solver(level=3)
        dt = 0.3 * s.compute_timestep()

        def objective(u0):
            uT = adjoint.rollout(s, dt, n_steps=3, u0=u0)
            return (uT[0] ** 2).sum()

        _directional_fd_check(objective, s.u, np.random.default_rng(1),
                              rel_eps=3e-4, tol=5e-3)

    def test_remat_matches_no_remat(self):
        """jax.checkpoint changes memory, not values: gradients with and
        without rematerialization agree to roundoff."""
        s = _plain_solver(level=3)
        dt = 0.3 * s.compute_timestep()

        def make(remat):
            return jax.grad(lambda u0: (adjoint.rollout(
                s, dt, n_steps=3, u0=u0, remat=remat)[0] ** 2).sum())

        g1 = make(True)(s.u)
        g2 = make(False)(s.u)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=2e-5, atol=1e-6)

    def test_grad_wrt_dt(self):
        """Sensitivity to the timestep itself (scalar chain through every
        RK stage)."""
        with jax.enable_x64(True):
            s = _plain_solver(level=3, dtype="float64")
            dt0 = 0.3 * s.compute_timestep()

            def objective(dt):
                uT = adjoint.rollout(s, dt, n_steps=3)
                return (uT[0] ** 2).sum()

            g = jax.grad(objective)(jnp.float64(dt0))
            eps = 1e-7 * dt0
            fd = (float(objective(jnp.float64(dt0 + eps)))
                  - float(objective(jnp.float64(dt0 - eps)))) / (2 * eps)
            np.testing.assert_allclose(float(g), fd, rtol=1e-5)

    def test_loss_and_grad_helper(self):
        s = _plain_solver(level=3)
        dt = 0.3 * s.compute_timestep()
        val, g = adjoint.loss_and_grad(
            s, lambda uT: (uT[0] ** 2).sum(), dt, n_steps=2)
        assert np.isfinite(float(val))
        assert g.shape == s.u.shape
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestShardedAdjoint:
    def _pair(self, level=3, periodic=True):
        from t8gpu_tpu.mesh.forest import Forest, ForestMesh
        from t8gpu_tpu.parallel.solver import ShardedEulerSolver

        f = Forest.uniform(level, dim=2, periodic=periodic)
        ic = lambda c: kh_planar(c, dim=2)
        ref = CompressibleEulerSolver(ForestMesh.from_forest(f), ic,
                                      config=EulerConfig())
        sh = ShardedEulerSolver(f, ic, devices=jax.devices()[:4])
        return ref, sh, f

    def test_primal_matches_single_device(self):
        """rollout_sharded's forward trajectory == the single-device
        rollout on the shared elements (padding slots differ)."""
        ref, sh, f = self._pair()
        dt = 0.3 * ref.compute_timestep()
        uT_ref = np.asarray(adjoint.rollout(ref, dt, n_steps=3))
        uT_sh = adjoint.rollout(sh, dt, n_steps=3)
        # unshard: state is [5, S*CL]; real elements sit in per-shard
        # prefixes — use the solver's own readout for the comparison
        sh.u = uT_sh
        np.testing.assert_allclose(sh.conserved_state(),
                                   uT_ref[:, : f.n_elements],
                                   rtol=2e-5, atol=2e-6)

    def test_grad_matches_single_device(self):
        """The multi-chip adjoint (shard_map + scan + checkpoint) agrees
        with the single-device gradient: the collective transposes
        (psum/ppermute adjoints) preserve the chain rule across the
        mesh axis."""
        ref, sh, f = self._pair()
        dt = 0.3 * ref.compute_timestep()
        n = f.n_elements

        def obj_ref(u0):
            uT = adjoint.rollout(ref, dt, n_steps=2, u0=u0)
            return ((uT[:, :n] - 1.0) ** 2).sum()

        g_ref = np.asarray(jax.grad(obj_ref)(ref.u))[:, :n]

        CL = sh.local_capacity
        live = np.zeros((1, sh.n_shards * CL), np.float32)
        for s_i in range(sh.n_shards):
            lo, hi = sh.bounds[s_i], sh.bounds[s_i + 1]
            live[0, s_i * CL: s_i * CL + (hi - lo)] = 1.0
        live_j = jnp.asarray(live)

        def obj_sh(u0):
            uT = adjoint.rollout(sh, dt, n_steps=2, u0=u0)
            return (((uT - 1.0) ** 2) * live_j).sum()

        g_sh = np.asarray(jax.grad(obj_sh)(sh.u))
        # gather the live columns back into global element order
        parts = []
        for s_i in range(sh.n_shards):
            lo, hi = sh.bounds[s_i], sh.bounds[s_i + 1]
            parts.append(g_sh[:, s_i * CL: s_i * CL + (hi - lo)])
        g_sh_global = np.concatenate(parts, axis=1)
        np.testing.assert_allclose(g_sh_global, g_ref, rtol=2e-4,
                                   atol=2e-5)


class TestSubgridAdjoint:
    def test_grad_matches_fd_f32(self):
        """Subgrid XLA-stencil path is differentiable end-to-end (the
        Pallas kernels have no VJP; adjoint.rollout forces the stencil)."""
        s = _subgrid_solver(level=1, dim=2, extent=4)
        dt = 0.3 * s.compute_timestep()

        def objective(u0):
            uT = adjoint.rollout(s, dt, n_steps=3, u0=u0)
            return (uT[0] ** 2).sum()

        # f32 central FD vs AD: ~1.4% at the (smaller) axis-summed CFL
        # dt — less signal per step, same f32 noise floor; the f64
        # checks above pin the gradient tightly
        _directional_fd_check(objective, s.u, np.random.default_rng(2),
                              rel_eps=3e-4, tol=2e-2)

    def test_param_gradient_recovers_ic_amplitude(self):
        """End-to-end parameter estimation: gradient descent on a scalar
        IC-perturbation amplitude recovers the value that generated a
        target trajectory (the data-assimilation workflow)."""
        s = _subgrid_solver(level=1, dim=2, extent=4)
        dt = 0.5 * s.compute_timestep()
        base = s.u

        def simulate(amp):
            u0 = base.at[1].mul(1.0 + amp)        # scale x-momentum
            return adjoint.rollout(s, dt, n_steps=4, u0=u0)

        true_amp = 0.07
        target = simulate(jnp.float32(true_amp))

        @jax.jit
        def loss_g(amp):
            return jax.value_and_grad(
                lambda a: ((simulate(a) - target) ** 2).sum())(amp)

        # secant iteration on dL/damp = 0 (1-D smooth objective)
        amp0, amp1 = 0.0, 0.02
        _, g0 = loss_g(jnp.float32(amp0))
        g0 = float(g0)
        for _ in range(25):
            val1, g1 = loss_g(jnp.float32(amp1))
            g1 = float(g1)
            if g1 == g0:
                break
            amp0, g0, amp1 = amp1, g1, amp1 - g1 * (amp1 - amp0) / (g1 - g0)
            if abs(amp1 - amp0) < 1e-6:
                break
        assert abs(amp1 - true_amp) < 5e-3


class TestOrder2Adjoint:
    def test_grad_matches_fd_muscl_unlimited_f64(self):
        """Reverse-mode through the second-order MUSCL path (unlimited —
        smooth objective, tight f64 FD check)."""
        with jax.enable_x64(True):
            s = _plain_solver(level=3, dtype="float64")
            s.config = EulerConfig(dtype="float64", order=2,
                                   limiter="none")
            dt = 0.3 * s.compute_timestep()

            def objective(u0):
                uT = adjoint.rollout(s, dt, n_steps=3, u0=u0)
                return (uT[0] ** 2).sum()

            _directional_fd_check(objective, s.u, np.random.default_rng(3),
                                  rel_eps=1e-6, tol=1e-6)

    def test_grad_finite_muscl_bj(self):
        """With the BJ limiter (min/clip kinks) gradients stay finite and
        nonzero — a.e.-exact like any limited scheme's adjoint."""
        s = _plain_solver(level=3)
        s.config = EulerConfig(order=2, limiter="bj")
        dt = 0.3 * s.compute_timestep()
        g = jax.grad(lambda u0: (adjoint.rollout(
            s, dt, n_steps=3, u0=u0)[0] ** 2).sum())(s.u)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0
