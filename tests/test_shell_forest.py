"""Dynamic AMR on the prismed icosahedral shell (mesh/shell_forest.py) —
the reference flagship capability (examples/compressible_euler/main.cu:32-35
adapts the shell every 100 steps via t8code's prism scheme).

Safety net (docs/shell_amr_design.md): volume conservation under adapt,
per-element face closure (free-stream), solver mass conservation across
shell adapts, and the 2:1 invariant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from t8gpu_tpu.mesh.shell_forest import (PrismForest, ShellForestMesh,
                                         shell_manager, shell_roots)
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.utils.config import AMRConfig


@pytest.fixture(scope="module")
def roots():
    return shell_roots(subdiv=1)


def closure_residual(forest):
    """max_e |sum over e's flux faces of outward area vectors| — zero iff
    the scheme is free-stream preserving on this mesh."""
    faces = forest.build_faces()
    net = np.zeros((forest.n_elements, 3))
    nv = faces["normal"].T.astype(np.float64) * faces["area"][:, None]
    np.add.at(net, faces["left"], nv)
    np.add.at(net, faces["right"], -nv)
    bn = faces["b_normal"].T.astype(np.float64) * faces["b_area"][:, None]
    np.add.at(net, faces["b_elem"], bn)
    return np.abs(net).max()


def refined_forest(roots, n_refine=40, level=1):
    f = PrismForest.uniform(roots, level)
    flags = np.zeros(f.n_elements, np.int8)
    flags[:n_refine] = 1
    flags = f.balance_flags(flags)
    return f.adapt(flags)


class TestPrismForest:
    def test_uniform_counts_and_nested_volumes(self, roots):
        f0 = PrismForest.uniform(roots, 0)
        f2 = PrismForest.uniform(roots, 2)
        assert f0.n_elements == roots.n_roots
        assert f2.n_elements == roots.n_roots * 64
        # linear refinement tiles the roots exactly
        np.testing.assert_allclose(f2.volumes().sum(), f0.volumes().sum(),
                                   rtol=1e-12)

    def test_face_closure_uniform(self, roots):
        f = PrismForest.uniform(roots, 1)
        assert closure_residual(f) < 1e-7

    def test_face_closure_hanging(self, roots):
        f2, _ = refined_forest(roots)
        assert (f2.level.max() - f2.level.min()) == 1  # really mixed
        assert closure_residual(f2) < 1e-7

    def test_adapt_conserves_volume(self, roots):
        f = PrismForest.uniform(roots, 1)
        f2, _ = refined_forest(roots)
        np.testing.assert_allclose(f2.volumes().sum(), f.volumes().sum(),
                                   rtol=1e-12)

    def test_two_to_one_balance(self, roots):
        f = PrismForest.uniform(roots, 1)
        # aggressive single-element refine twice: balance must ripple
        for _ in range(2):
            flags = np.zeros(f.n_elements, np.int8)
            flags[0] = 1
            flags = f.balance_flags(flags)
            f, _ = f.adapt(flags)
        faces = f.build_faces()
        lv = f.level.astype(int)
        assert np.abs(lv[faces["left"]] - lv[faces["right"]]).max() <= 1

    def test_coarsen_roundtrip(self, roots):
        f, _ = refined_forest(roots)
        n_fine = f.n_elements
        flags = np.where(f.level == 2, -1, 0).astype(np.int8)
        flags = f.balance_flags(flags)
        f3, remap = f.adapt(flags)
        assert f3.n_elements < n_fine
        np.testing.assert_allclose(f3.volumes().sum(), f.volumes().sum(),
                                   rtol=1e-12)

    def test_family_heads_complete(self, roots):
        f = PrismForest.uniform(roots, 1)
        heads = f.family_heads()
        # a uniform level-1 forest is exactly one family per root prism
        assert heads.sum() == roots.n_roots

    def test_hanging_faces_emitted_by_finer_side(self, roots):
        f2, _ = refined_forest(roots)
        faces = f2.build_faces()
        lv = f2.level.astype(int)
        d = lv[faces["left"]] - lv[faces["right"]]
        assert (d >= 0).all()  # left (emitter) is never the coarser side


def ic_uniform(c):
    u = np.zeros((5, len(c)), np.float32)
    u[0] = 1.0
    u[4] = 2.5
    return u


def ic_wave(c):
    r = np.linalg.norm(c, axis=1)
    u = np.zeros((5, len(c)), np.float32)
    u[0] = 1.0 + 0.2 * np.sin(8.0 * np.arctan2(c[:, 1], c[:, 0])) * (r > 0)
    u[4] = 2.5 * u[0]
    return u


class TestShellSolverAMR:
    def test_free_stream_preserved_on_hanging_mesh(self, roots):
        f2, _ = refined_forest(roots)
        mesh = ShellForestMesh.from_forest(f2)
        s = CompressibleEulerSolver(mesh, ic_uniform)
        dt = s.compute_timestep()
        for _ in range(3):
            s.iterate(dt)
        u = s.conserved_state()
        np.testing.assert_allclose(u[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(u[1:4], 0.0, atol=1e-5)

    def test_full_amr_cycle_conserves_mass(self):
        mgr = shell_manager(subdiv=1, level=1,
                            amr=AMRConfig(min_level=0, max_level=3,
                                          refine_threshold=0.2))
        s = CompressibleEulerSolver(mgr, ic_wave)
        m0 = s.compute_integral()
        n0 = s.n_elements
        dt = s.compute_timestep()
        for cycle in range(3):
            for _ in range(5):
                s.iterate(dt)
            s.adapt()
            dt = s.compute_timestep()
        assert s.n_elements != n0          # the mesh actually adapted
        assert int(mgr.forest.level.max()) >= 2
        m1 = s.compute_integral()
        assert abs(m1 - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()

    def test_weighted_restriction_recovers_constant(self, roots):
        """refine -> coarsen roundtrip of a constant field is exact even
        with unequal prism child volumes (volume-weighted restriction)."""
        from t8gpu_tpu.ops.amr import apply_remap_weighted, pad_remap

        f = PrismForest.uniform(roots, 1)
        flags = np.ones(f.n_elements, np.int8)
        f2, r2 = f.adapt(flags)
        flags2 = -np.ones(f2.n_elements, np.int8)
        f3, r3 = f2.adapt(flags2)
        assert f3.n_elements == f.n_elements

        rng = np.random.default_rng(5)
        u = rng.uniform(1.0, 2.0, (5, f.n_elements)).astype(np.float32)
        start, count = pad_remap(r2.src_start, r2.src_count, f2.n_elements)
        u2 = apply_remap_weighted(jnp.asarray(u), start, count,
                                  jnp.asarray(f.volumes().astype(np.float32)),
                                  k=8, capacity=f2.n_elements)
        start, count = pad_remap(r3.src_start, r3.src_count, f3.n_elements)
        u3 = apply_remap_weighted(u2, start, count,
                                  jnp.asarray(f2.volumes().astype(np.float32)),
                                  k=8, capacity=f3.n_elements)
        np.testing.assert_allclose(np.asarray(u3), u, rtol=1e-6)

    def test_weighted_restriction_conserves_mass_exactly(self, roots):
        from t8gpu_tpu.ops.amr import apply_remap_weighted, pad_remap

        f, remap = refined_forest(roots)
        f_c = PrismForest.uniform(roots, 1)
        rng = np.random.default_rng(6)
        u = rng.uniform(1.0, 2.0, (5, f_c.n_elements)).astype(np.float32)
        start, count = pad_remap(remap.src_start, remap.src_count,
                                 f.n_elements)
        u2 = apply_remap_weighted(
            jnp.asarray(u), start, count,
            jnp.asarray(f_c.volumes().astype(np.float32)),
            k=8, capacity=f.n_elements)
        m_before = (u[0] * f_c.volumes()).sum()
        m_after = (np.asarray(u2)[0] * f.volumes()).sum()
        np.testing.assert_allclose(m_after, m_before, rtol=1e-6)


def test_blocked_shell_matches_gather_path():
    """BlockedShellEulerSolver (uniform-shell lattice fast path) == the
    general gather path cell-for-cell: same state after stepping, same
    integral, same CFL dt — the config-4 counterpart of the brick blocked
    equivalence (tests/test_solver_euler.py)."""
    from t8gpu_tpu.mesh.shell_forest import (PrismForest, ShellForestMesh,
                                             shell_roots)
    from t8gpu_tpu.models.blocked_shell import (BlockedShellEulerSolver,
                                                can_block_shell)
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    for subdiv, level, layers in ((1, 2, 2), (1, 1, 1)):
        forest = PrismForest.uniform(shell_roots(subdiv=subdiv,
                                                 n_layers=layers), level)
        assert can_block_shell(forest)
        ref = CompressibleEulerSolver(ShellForestMesh.from_forest(forest),
                                      kh_sphere)
        blk = BlockedShellEulerSolver(forest, kh_sphere)
        assert blk.n_elements == ref.n_elements
        np.testing.assert_allclose(blk.conserved_state(),
                                   ref.conserved_state(),
                                   rtol=1e-6, atol=1e-7)
        dt = 2e-4
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

    # AMR / non-uniform shells must be rejected
    f = PrismForest.uniform(shell_roots(subdiv=1), 1)
    flags = np.zeros(f.n_elements, np.int8)
    flags[0] = 1
    f2, _ = f.adapt(f.balance_flags(flags))
    assert not can_block_shell(f2)


def test_blocked_shell_conservation_and_batching():
    """iterate_many == repeated iterate; mass conserved to fp roundoff
    (the shell is closed: caps are walls, laterals interior)."""
    from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
    from t8gpu_tpu.models.blocked_shell import BlockedShellEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    forest = PrismForest.uniform(shell_roots(subdiv=1), 1)
    a = BlockedShellEulerSolver(forest, kh_sphere)
    b = BlockedShellEulerSolver(forest, kh_sphere)
    m0 = a.compute_integral()
    dt = 2e-4
    for _ in range(4):
        a.iterate(dt)
    b.iterate_many(4, dt)
    np.testing.assert_allclose(a.conserved_state(), b.conserved_state(),
                               rtol=1e-6, atol=1e-7)
    assert abs(a.compute_integral() - m0) / abs(m0) < 1e-5
    assert np.isfinite(a.conserved_state()).all()


def test_sharded_blocked_shell_matches_single_device():
    """ShardedBlockedShellEulerSolver (root axis over the device mesh,
    packed-boundary all-gather as the ghost exchange) == single device —
    multi-chip config 4 on the lattice fast path."""
    import jax

    from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
    from t8gpu_tpu.models.blocked_shell import (
        BlockedShellEulerSolver, ShardedBlockedShellEulerSolver)
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    forest = PrismForest.uniform(shell_roots(subdiv=1, n_layers=2), 2)
    single = BlockedShellEulerSolver(forest, kh_sphere)
    sharded = ShardedBlockedShellEulerSolver(forest, kh_sphere,
                                             devices=jax.devices())
    assert sharded.n_shards == len(jax.devices())
    dt = 2e-4
    single.iterate_many(3, dt)
    sharded.iterate_many(3, dt)
    np.testing.assert_allclose(sharded.conserved_state(),
                               single.conserved_state(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(sharded.compute_timestep(),
                               single.compute_timestep(), rtol=1e-5)
