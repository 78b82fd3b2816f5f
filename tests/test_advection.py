"""The second model family (scalar upwind advection, models/advection.py):
proof that the mesh/connectivity/RK/AMR layers are PDE-agnostic
(SURVEY §1 "the library knows nothing about the PDE")."""

import numpy as np
import pytest

from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.models.advection import AdvectionSolver
from t8gpu_tpu.utils.config import AMRConfig


def bump(centers):
    r2 = ((centers - 0.35) ** 2).sum(axis=1)
    return 1.0 + np.exp(-r2 / 0.01)


def test_conservation_periodic():
    mesh = ForestMesh.from_forest(Forest.uniform(5, dim=2))
    s = AdvectionSolver(mesh, bump, velocity=(1.0, 0.5))
    m0 = s.compute_integral()
    s.iterate_many(50, s.compute_timestep())
    assert np.isfinite(s.state()).all()
    assert abs(s.compute_integral() - m0) < 1e-5 * abs(m0)


def test_free_stream_periodic():
    """Constant field is an exact steady state on closed (periodic)
    meshes: the per-element flux sum telescopes to u * a . (sum A n) = 0."""
    mesh = ForestMesh.from_forest(Forest.uniform(4, dim=2))
    s = AdvectionSolver(mesh, lambda c: np.full(len(c), 2.5),
                        velocity=(0.7, -0.3))
    s.iterate_many(20, 1e-2)
    np.testing.assert_allclose(s.state(), 2.5, rtol=1e-6)


def test_translation_convergence():
    """L1 error vs the exact translated profile shrinks under refinement
    (first-order upwind)."""
    errs = []
    for level in (4, 5):
        mesh = ForestMesh.from_forest(Forest.uniform(level, dim=2))
        s = AdvectionSolver(mesh, bump, velocity=(1.0, 0.0))
        dt = 0.25 * 0.5**level           # CFL 0.25
        n = int(round(0.25 / dt))        # advect distance 0.25 in x
        s.iterate_many(n, dt)
        exact = bump(np.asarray(mesh.centers) - np.array([0.25, 0.0]))
        vol = np.asarray(mesh.volumes)
        errs.append((np.abs(s.state() - exact) * vol).sum())
    assert errs[1] < 0.7 * errs[0]


def test_amr_cycle_conserves_and_tracks():
    mgr = MeshManager(Forest.uniform(4, dim=2),
                      AMRConfig(min_level=3, max_level=6,
                                refine_threshold=1.0))
    s = AdvectionSolver(mgr, bump, velocity=(1.0, 0.25))
    m0 = s.compute_integral()
    n0 = s.n_elements
    for _ in range(4):
        s.iterate_many(8, 0.5 * 0.5**6)
        s.adapt_prefetch()           # AMR pipelining through the same seam
        s.iterate_many(2, 0.5 * 0.5**6)
        s.adapt()
    assert np.isfinite(s.state()).all()
    assert s.n_elements > n0             # refined around the bump
    assert abs(s.compute_integral() - m0) < 1e-5 * abs(m0)
    lv = mgr.forest.level
    assert lv.max() > 4 and lv.min() >= 3


def test_sharded_advection_matches_single_device():
    """ShardedAdvectionSolver (distribution machinery inherited unchanged
    from the Euler sharded solver; only the flux hook overridden) ==
    single-device AdvectionSolver through stepping AND a distributed AMR
    cycle — the multi-chip half of the PDE-agnosticism proof."""
    import jax

    from t8gpu_tpu.parallel.advection import ShardedAdvectionSolver

    amr = AMRConfig(min_level=3, max_level=5, refine_threshold=1.0)
    vel = (1.0, 0.25)
    ref = AdvectionSolver(MeshManager(Forest.uniform(4, dim=2), amr),
                          bump, velocity=vel)
    sh = ShardedAdvectionSolver(Forest.uniform(4, dim=2), bump, vel,
                                devices=jax.devices(), amr=amr)
    dt = 0.5 * 0.5**5
    m0 = sh.compute_integral()
    for _ in range(2):
        for _ in range(5):
            ref.iterate(dt)
            sh.iterate(dt)
        ref.adapt()
        sh.adapt_prefetch()
        sh.adapt()
        assert sh.n_elements == ref.n_elements
    np.testing.assert_allclose(sh.state(), ref.state(),
                               rtol=5e-6, atol=1e-7)
    np.testing.assert_allclose(sh.compute_integral(), m0, rtol=1e-5)


def test_hanging_faces_conservative():
    """Pre-refined (2:1 hanging) mesh: upwind accumulation stays exactly
    conservative across the refinement jumps."""
    f = Forest.uniform(3, dim=2)
    flags = np.zeros(f.n_elements, np.int8)
    flags[: f.n_elements // 4] = 1
    f2, _ = f.adapt(f.balance_flags(flags))
    mesh = ForestMesh.from_forest(f2)
    s = AdvectionSolver(mesh, bump, velocity=(0.8, 0.6))
    m0 = s.compute_integral()
    s.iterate_many(30, 0.25 * 0.5**4)
    assert abs(s.compute_integral() - m0) < 1e-5 * abs(m0)


def test_shell_mesh_runs():
    """The same solver on the prism shell (general normals, outflow
    walls): runs, stays finite, loses mass only through the walls."""
    from t8gpu_tpu.mesh.shell import shell_mesh

    mesh = shell_mesh(subdiv=1, r_in=0.8, thickness=0.2, n_layers=1)
    s = AdvectionSolver(mesh, lambda c: np.full(len(c), 1.0),
                        velocity=(0.3, 0.1, 0.2))
    m0 = s.compute_integral()
    s.iterate_many(20, 1e-3)
    assert np.isfinite(s.state()).all()
    assert s.compute_integral() <= m0 + 1e-6 * abs(m0)   # outflow only


def test_record_maximum_principle_and_sharded():
    """iterate_record on the advection family: integral column constant
    (periodic), min non-decreasing / max non-increasing (the upwind
    scheme's maximum principle, audited per step), l2 non-increasing;
    the sharded solver (min/max ride lax.pmin/pmax) records the same
    history."""
    import jax

    from t8gpu_tpu.parallel.advection import ShardedAdvectionSolver

    obs = ("integral", "l2", "min", "max")
    vel = (1.0, 0.5)
    a = AdvectionSolver(ForestMesh.from_forest(Forest.uniform(4, dim=2)),
                        bump, velocity=vel)
    sh = ShardedAdvectionSolver(Forest.uniform(4, dim=2), bump, vel,
                                devices=jax.devices())
    dt = 0.5 * float(a.compute_timestep())

    rows = np.asarray(a.iterate_record(10, dt, observables=obs))
    assert rows.shape == (10, 4)
    integral, l2, mn, mx = rows.T
    assert np.abs(integral - integral[0]).max() < 1e-5 * abs(integral[0])
    assert (np.diff(l2) < 1e-6 * abs(l2[0])).all()
    assert (np.diff(mn) > -1e-6).all()
    assert (np.diff(mx) < 1e-6).all()
    assert mn.min() > 1.0 - 1e-5 and mx.max() < 2.0 + 1e-5

    rows_sh = np.asarray(sh.iterate_record(10, dt, observables=obs))
    np.testing.assert_allclose(rows_sh, rows, rtol=3e-5)

    with pytest.raises(ValueError, match="unknown observables"):
        a.iterate_record(2, dt, observables=("mass",))   # Euler-only name


def test_order2_accuracy_and_bounds():
    """order=2 (row-generic MUSCL, C=1): the smooth-profile error drops
    well below first order at equal resolution, and the BJ limiter keeps
    a step profile inside its initial bounds (the limited reconstruction
    never leaves the neighbor min/max envelope)."""
    from t8gpu_tpu.mesh.uniform import uniform_mesh

    vel = (1.0, 0.5)
    smooth = lambda c: (np.sin(2 * np.pi * c[:, 0])
                        * np.cos(2 * np.pi * c[:, 1]))
    errs = {}
    for order in (1, 2):
        mesh = uniform_mesh(level=5, dim=2, periodic=True)
        s = AdvectionSolver(mesh, smooth, velocity=vel, order=order)
        n = 128
        s.iterate_many(n, 1.0 / n)     # x shifts by 1 (periodic), y by 0.5
        c = np.asarray(mesh.centers)
        exact = (np.sin(2 * np.pi * (c[:, 0] - 1.0))
                 * np.cos(2 * np.pi * (c[:, 1] - 0.5)))
        errs[order] = float(np.abs(s.state() - exact).mean())
    assert errs[2] < 0.35 * errs[1], errs

    mesh = uniform_mesh(level=5, dim=2, periodic=True)
    step = lambda c: (c[:, 0] < 0.5).astype(np.float32)
    s = AdvectionSolver(mesh, step, velocity=vel, order=2)
    s.iterate_many(64, 1.0 / 128)
    st = s.state()
    assert st.min() > -5e-3 and st.max() < 1.0 + 5e-3


def test_sharded_order2_matches_single_device():
    """ShardedAdvectionSolver(order=2) == AdvectionSolver(order=2): the
    grad+alpha second halo round reconstructs identical interface states
    on both sides of a shard cut."""
    from t8gpu_tpu.mesh.uniform import uniform_mesh
    from t8gpu_tpu.parallel.advection import ShardedAdvectionSolver

    vel = (1.0, 0.5)
    smooth = lambda c: (np.sin(2 * np.pi * c[:, 0])
                        * np.cos(2 * np.pi * c[:, 1]))
    sh = ShardedAdvectionSolver(Forest.uniform(4, dim=2), smooth,
                                velocity=vel, order=2)
    ref = AdvectionSolver(uniform_mesh(level=4, dim=2, periodic=True),
                          smooth, velocity=vel, order=2)
    for _ in range(5):
        sh.iterate(1e-2)
        ref.iterate(1e-2)
    np.testing.assert_allclose(sh.state(), ref.state(), rtol=2e-5,
                               atol=1e-6)
