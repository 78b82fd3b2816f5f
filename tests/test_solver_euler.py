"""End-to-end tests of the plain-element Euler solver: conservation,
stability, CFL plumbing (the checks the reference only does by eye +
compute_integral, SURVEY.md §4)."""

import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def make_solver(level=4, dim=2, periodic=True, flux="kepes", mode="gather"):
    mesh = uniform_mesh(level=level, dim=dim, periodic=periodic)
    ic = lambda centers: kh_planar(centers, dim=dim)
    return CompressibleEulerSolver(
        mesh, ic, config=EulerConfig(flux=flux),
        amr=AMRConfig(max_level=level), accumulation=mode)


def make_solver_f64(level=3, dim=2):
    mesh = uniform_mesh(level=level, dim=dim, periodic=True)
    return CompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=dim),
        config=EulerConfig(dtype="float64"), amr=AMRConfig(max_level=level))


class TestConservation:
    @pytest.mark.parametrize("mode", ["gather", "segment_sum"])
    def test_mass_conserved_periodic(self, mode):
        s = make_solver(level=4, mode=mode)
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(25):
            s.iterate(dt)
        m1 = s.compute_integral()
        assert abs(m1 - m0) / m0 < 1e-5

    def test_all_variables_conserved_periodic(self):
        s = make_solver(level=4)
        u0 = s.conserved_state()
        v = s.mesh.volumes
        before = (u0 * v).sum(axis=1)
        dt = s.compute_timestep()
        for _ in range(25):
            s.iterate(dt)
        after = (s.conserved_state() * v).sum(axis=1)
        # mass & energy exactly-ish; momenta are conserved too on periodic
        scale = np.maximum(np.abs(before), 1.0)
        np.testing.assert_allclose(after / scale, before / scale, atol=2e-5)

    def test_float64_solver_path(self):
        """EulerConfig(dtype="float64") runs the whole plain path in f64
        (the reference's variable_traits::float_type hook, which it only
        ever instantiates as float, memory_manager.h:27-42) — mass then
        conserves to f64 roundoff, ~7 digits past f32."""
        import jax
        import jax.numpy as jnp

        with jax.enable_x64(True):
            s = make_solver_f64()
            assert s.u.dtype == jnp.float64
            m0 = s.compute_integral()
            dt = s.compute_timestep()
            for _ in range(10):
                s.iterate(dt)
            assert s.u.dtype == jnp.float64
            assert np.isfinite(s.conserved_state()).all()
            assert abs(s.compute_integral() - m0) / m0 < 1e-11

    def test_mass_conserved_reflective(self):
        s = make_solver(level=4, periodic=False)
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(25):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5


class TestStability:
    def test_kh_run_stays_finite_and_positive(self):
        s = make_solver(level=4)
        dt = s.compute_timestep()
        for _ in range(50):
            s.iterate(dt)
        u = s.conserved_state()
        assert np.isfinite(u).all()
        assert (u[0] > 0).all()
        # pressure positivity
        ke = 0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / u[0]
        p = 0.4 * (u[4] - ke)
        assert (p > 0).all()

    def test_entropy_nonincreasing_kepes(self):
        """The KEPES flux is entropy-stable (Chandrashekar 2013; the
        scheme the reference implements, kernels.cu:38-133): the total
        entropy integral must be non-increasing on a periodic domain.
        compute_entropy exposes the diagnostic the reference names its
        scheme after but never checks."""
        s = make_solver(level=4)
        dt = s.compute_timestep()
        ent = [s.compute_entropy()]
        for _ in range(5):
            for _ in range(5):
                s.iterate(dt)
            ent.append(s.compute_entropy())
        scale = abs(ent[0])
        for a, b in zip(ent, ent[1:]):
            assert b <= a + 1e-6 * scale, ent

    def test_entropy_nonincreasing_subgrid(self):
        """Same entropy-stability check through the subgrid kernels."""
        from t8gpu_tpu.memory.subgrid import SubgridSpec
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.mesh.subgrid import SubgridMesh
        from t8gpu_tpu.models.subgrid_euler import (
            SubgridCompressibleEulerSolver)

        mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2),
                                       SubgridSpec((8, 8)))
        s = SubgridCompressibleEulerSolver(
            mesh, lambda c: kh_planar(c, dim=2))
        dt = s.compute_timestep()
        ent = [s.compute_entropy()]
        for _ in range(4):
            for _ in range(5):
                s.iterate(dt)
            ent.append(s.compute_entropy())
        scale = abs(ent[0])
        for a, b in zip(ent, ent[1:]):
            assert b <= a + 1e-6 * scale, ent

    def test_hll_matches_kepes_on_smooth_short_run(self):
        """On a smooth density-wave advection both schemes must agree
        closely (the KH IC is discontinuous, so it is unsuitable here)."""

        def smooth_ic(centers):
            x = centers[:, 0]
            rho = 1.0 + 0.2 * np.sin(2 * np.pi * x)
            v1 = np.ones_like(x)
            p = np.ones_like(x)
            e = p / 0.4 + 0.5 * rho * v1**2
            z = np.zeros_like(x)
            return np.stack([rho, rho * v1, z, z, e]).astype(np.float32)

        mesh = uniform_mesh(level=4, dim=2, periodic=True)
        s1 = CompressibleEulerSolver(mesh, smooth_ic, config=EulerConfig(flux="kepes"),
                                     amr=AMRConfig(max_level=4))
        s2 = CompressibleEulerSolver(mesh, smooth_ic, config=EulerConfig(flux="hll"),
                                     amr=AMRConfig(max_level=4))
        dt = min(s1.compute_timestep(), s2.compute_timestep())
        for _ in range(5):
            s1.iterate(dt)
            s2.iterate(dt)
        a, b = s1.conserved_state(), s2.conserved_state()
        assert np.abs(a - b).max() < 2e-2

    def test_solution_actually_evolves(self):
        s = make_solver(level=4)
        u0 = s.conserved_state().copy()
        dt = s.compute_timestep()
        for _ in range(10):
            s.iterate(dt)
        assert np.abs(s.conserved_state() - u0).max() > 1e-4


class TestTimestep:
    def test_cfl_formula(self):
        s = make_solver(level=4)
        dt = s.compute_timestep()
        # cfl * 0.5^max_level / speed with speed >= sound speed at p=2.5
        assert 0 < dt < 0.7 * 0.5**4
        s.iterate(dt)
        dt2 = s.compute_timestep()
        assert 0 < dt2 < 0.7 * 0.5**4

    def test_timestep_convergence_invariance(self):
        """Two half steps ~ one full step (2nd order sanity on smooth data)."""
        s1 = make_solver(level=3)
        s2 = make_solver(level=3)
        dt = s1.compute_timestep()
        s1.iterate(dt)
        s2.iterate(dt / 2)
        s2.iterate(dt / 2)
        a, b = s1.conserved_state(), s2.conserved_state()
        # discontinuous KH data: local-error bound is loose but tight enough
        # to catch a mis-weighted RK stage (that gives O(1e-1) differences)
        assert np.abs(a - b).max() < 1e-2


def test_blocked_uniform_solver_matches_plain():
    """The blocked fast path (plain elements as degenerate subgrid cells,
    models/blocked_euler.py) == the gather-path plain solver, cell-exact
    ordering restored: same state after stepping, same integral, same CFL
    timestep.  BASELINE config 1's production path."""
    import numpy as np

    from t8gpu_tpu.mesh.forest import Forest, ForestMesh
    from t8gpu_tpu.models.blocked_euler import (BlockedUniformEulerSolver,
                                                can_block)
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar

    for dim, level in ((2, 4), (3, 3)):
        forest = Forest.uniform(level, dim=dim)
        assert can_block(forest)
        ic = lambda c: kh_planar(c, dim=dim)
        ref = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic)
        blk = BlockedUniformEulerSolver(forest, ic)
        assert blk.n_elements == ref.n_elements
        np.testing.assert_allclose(blk.conserved_state(),
                                   ref.conserved_state(),
                                   rtol=1e-6, atol=1e-7)
        dt = 1e-3
        for _ in range(3):
            ref.iterate(dt)
            blk.iterate(dt)
        np.testing.assert_allclose(blk.conserved_state(),
                                   ref.conserved_state(),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(blk.compute_integral(),
                                   ref.compute_integral(), rtol=1e-5)
        np.testing.assert_allclose(blk.compute_timestep(),
                                   ref.compute_timestep(), rtol=1e-4)

    # non-qualifying forests are rejected
    assert not can_block(Forest.uniform(2, dim=2))          # level < 3
    assert not can_block(Forest.uniform(4, dim=2, periodic=False))
    f = Forest.uniform(4, dim=2)
    flags = np.zeros(f.n_elements, np.int8)
    flags[0] = 1
    f, _ = f.adapt(f.balance_flags(flags))
    assert not can_block(f)                                 # non-uniform


def test_sharded_blocked_solver_matches_single_device():
    """ShardedBlockedEulerSolver (blocked fast path under shard_map) ==
    the single-device blocked solver == the plain gather path, state
    restored to plain Morton order.  Multi-chip BASELINE config 1."""
    import numpy as np

    from t8gpu_tpu.mesh.forest import Forest, ForestMesh
    from t8gpu_tpu.models.blocked_euler import (BlockedUniformEulerSolver,
                                                ShardedBlockedEulerSolver)
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar

    for dim, level in ((2, 4), (3, 3)):
        forest = Forest.uniform(level, dim=dim)
        ic = lambda c: kh_planar(c, dim=dim)
        single = BlockedUniformEulerSolver(forest, ic)
        sharded = ShardedBlockedEulerSolver(forest, ic)
        plain = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic)
        dt = 1e-3
        for _ in range(2):
            single.iterate(dt)
            plain.iterate(dt)
        sharded.iterate_many(2, dt)
        np.testing.assert_allclose(sharded.conserved_state(),
                                   single.conserved_state(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sharded.conserved_state(),
                                   plain.conserved_state(),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(sharded.compute_integral(),
                                   single.compute_integral(), rtol=1e-5)
        np.testing.assert_allclose(sharded.compute_timestep(),
                                   single.compute_timestep(), rtol=1e-4)


def test_blocked_amr_solver_matches_plain_on_adapted_mesh():
    """BlockedAMREulerSolver (plain-element dynamic AMR at block
    granularity, riding the fused subgrid kernels) == the gather-path
    plain solver on the EQUIVALENT element-granular forest
    (`plain_forest()`), including across 2:1 level boundaries — the fix
    for the plain-path AMR cliff (BASELINE config 2, ref
    kernels.cu:135-309 pays no such cliff)."""
    import numpy as np

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest, ForestMesh
    from t8gpu_tpu.mesh.subgrid import cell_centers
    from t8gpu_tpu.models.blocked_euler import (BlockedAMREulerSolver,
                                                _zorder_to_raster)
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.utils.config import AMRConfig

    dim, level = 2, 6
    forest = Forest.uniform(level, dim=dim)
    ic = lambda c: kh_planar(c, dim=dim)
    amr = AMRConfig(min_level=5, max_level=7, refine_threshold=2e-4)
    blk = BlockedAMREulerSolver(forest, ic, amr=amr)
    assert blk.n_elements == forest.n_elements

    dt = 1e-3
    blk.iterate_many(3, dt)
    blk.adapt()             # criteria-driven refine/coarsen of blocks
    lv = blk._inner.mesh.forest.level
    assert lv.min() != lv.max(), "expected a non-uniform adapted mesh"

    # the element-granular equivalent forest + order mapping sanity
    pf = blk.plain_forest()
    assert pf.n_elements == blk.n_elements
    spec = SubgridSpec((8,) * dim)
    perm = _zorder_to_raster(8, dim)
    cc = cell_centers(blk._inner.mesh.forest, spec)      # raster order
    cc_z = cc.reshape(-1, 8**dim, dim)[:, perm].reshape(-1, dim)
    np.testing.assert_allclose(cc_z, pf.centers(), atol=1e-12)

    u_blk = blk.conserved_state()
    plain = CompressibleEulerSolver(ForestMesh.from_forest(pf),
                                    lambda c: u_blk)
    np.testing.assert_allclose(plain.conserved_state(), u_blk,
                               rtol=1e-6, atol=1e-7)

    m0 = blk.compute_integral()
    for _ in range(3):
        blk.iterate(dt)
        plain.iterate(dt)
    np.testing.assert_allclose(blk.conserved_state(),
                               plain.conserved_state(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(blk.compute_integral(), m0, rtol=1e-5)
    np.testing.assert_allclose(blk.compute_timestep(),
                               plain.compute_timestep(), rtol=1e-4)

    # a second adapt cycle keeps stepping + conservation intact
    blk.iterate_many(3, dt)
    blk.adapt()
    blk.iterate_many(3, dt)
    assert np.isfinite(blk.conserved_state()).all()
    np.testing.assert_allclose(blk.compute_integral(), m0, rtol=1e-4)


def test_sharded_blocked_amr_matches_single_device():
    """ShardedBlockedAMREulerSolver == single-device BlockedAMREulerSolver
    through an adapt cycle (multi-chip BASELINE config 2)."""
    import jax
    import numpy as np

    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.blocked_euler import (BlockedAMREulerSolver,
                                                ShardedBlockedAMREulerSolver)
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.utils.config import AMRConfig

    dim, level = 2, 6
    forest = Forest.uniform(level, dim=dim)
    ic = lambda c: kh_planar(c, dim=dim)
    amr = AMRConfig(min_level=5, max_level=7, refine_threshold=2e-4)
    single = BlockedAMREulerSolver(forest, ic, amr=amr)
    sharded = ShardedBlockedAMREulerSolver(forest, ic, amr=amr,
                                           devices=jax.devices()[:4])
    dt = 1e-3
    single.iterate_many(3, dt)
    sharded.iterate_many(3, dt)
    single.adapt()
    sharded.adapt()
    assert sharded.n_elements == single.n_elements
    single.iterate_many(2, dt)
    sharded.iterate_many(2, dt)
    np.testing.assert_allclose(sharded.conserved_state(),
                               single.conserved_state(),
                               rtol=2e-4, atol=2e-5)
