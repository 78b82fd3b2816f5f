"""AMR cycle tests: device remap, refinement criteria, full solver adapt.

Covers the TPU equivalents of `adapt_variables_and_volume`
(ref t8gpu/mesh/mesh_manager.inl:164-193), `estimate_gradient`
(ref examples/compressible_euler/kernels.cu:471-501) and the solver adapt
cycle (ref examples/compressible_euler/solver.cu:243-277).
"""

import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import bucket_capacity
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.ops.amr import apply_remap, estimate_gradient, pad_remap
from t8gpu_tpu.utils.config import AMRConfig


def _mass(u, volumes, n):
    return float((np.asarray(u)[0, :n] * volumes).sum())


def test_apply_remap_refine_then_coarsen_roundtrip():
    """Prolongation copy followed by restriction mean is the identity on
    piecewise-constant data."""
    forest = Forest.uniform(2, dim=2)
    n = forest.n_elements
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(5, bucket_capacity(n))).astype(np.float32))

    fine, r1 = forest.adapt(np.ones(n, np.int8))
    cap_f = bucket_capacity(fine.n_elements)
    s1, c1 = pad_remap(r1.src_start, r1.src_count, cap_f)
    u_f = apply_remap(u, s1, c1, k=4, capacity=cap_f)
    # children copy the parent value
    np.testing.assert_allclose(
        np.asarray(u_f)[:, : fine.n_elements],
        np.asarray(u)[:, np.repeat(np.arange(n), 4)], rtol=1e-6)

    back, r2 = fine.adapt(-np.ones(fine.n_elements, np.int8))
    cap_b = bucket_capacity(back.n_elements)
    s2, c2 = pad_remap(r2.src_start, r2.src_count, cap_b)
    u_b = apply_remap(u_f, s2, c2, k=4, capacity=cap_b)
    np.testing.assert_allclose(np.asarray(u_b)[:, :n], np.asarray(u)[:, :n],
                               rtol=1e-6)


def test_remap_conserves_mass():
    forest = Forest.uniform(3, dim=2)
    n = forest.n_elements
    rng = np.random.default_rng(2)
    u = jnp.asarray(
        np.pad(rng.uniform(1, 2, size=(5, n)).astype(np.float32),
               [(0, 0), (0, bucket_capacity(n) - n)]))
    m0 = _mass(u, forest.volumes(), n)

    flags = rng.integers(-1, 2, n).astype(np.int8)
    new, remap = forest.adapt(flags)
    new, r2 = new.balance()
    remap = remap.compose(r2)
    cap = bucket_capacity(new.n_elements)
    s, c = pad_remap(remap.src_start, remap.src_count, cap)
    u_new = apply_remap(u, s, c, k=4, capacity=cap)
    m1 = _mass(u_new, new.volumes(), new.n_elements)
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def test_estimate_gradient_flat_state_is_zero():
    forest = Forest.uniform(3, dim=2)
    mesh = forest
    from t8gpu_tpu.mesh.forest import ForestMesh
    fm = ForestMesh.from_forest(forest)
    cap = fm.conn.inc_slot.shape[0]
    u = jnp.ones((5, cap))
    g = estimate_gradient(u, fm.conn)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_estimate_gradient_detects_jump():
    """Density jump across the layer shows up only in layer-adjacent cells."""
    forest = Forest.uniform(3, dim=2)
    from t8gpu_tpu.mesh.forest import ForestMesh
    fm = ForestMesh.from_forest(forest)
    cap = fm.conn.inc_slot.shape[0]
    c = forest.centers()
    rho = np.where(c[:, 1] > 0.5, 2.0, 1.0).astype(np.float32)
    u = jnp.asarray(np.pad(np.stack([rho] + [np.zeros_like(rho)] * 4),
                           [(0, 0), (0, cap - len(rho))]))
    g = np.asarray(estimate_gradient(u, fm.conn))[: forest.n_elements]
    near = (np.abs(c[:, 1] - 0.5) < forest.edge_lengths()) | \
           (c[:, 1] < forest.edge_lengths()) | (c[:, 1] > 1 - forest.edge_lengths())
    assert (g[near & (np.abs(c[:, 1] - 0.5) < forest.edge_lengths())] > 0.5).all()
    assert np.allclose(g[~near], 0.0, atol=1e-7)


def test_solver_amr_cycle_conserves_mass():
    """Full AMR loop on the KH problem: iterate + adapt cycles keep the mesh
    2:1 balanced and conserve mass through remaps."""
    amr = AMRConfig(min_level=3, max_level=5, refine_threshold=2.0)
    manager = MeshManager(Forest.uniform(4, dim=2), amr)
    solver = CompressibleEulerSolver(manager, lambda cc: kh_planar(cc, dim=2))
    m0 = solver.compute_integral()
    n_hist = [solver.n_elements]
    for cycle in range(3):
        dt = solver.compute_timestep()
        for _ in range(5):
            solver.iterate(dt)
        solver.adapt()
        n_hist.append(solver.n_elements)
        assert np.abs(manager.forest.build_faces()["level_difference"]).max() <= 1
        assert manager.forest.level.max() <= amr.max_level
        assert manager.forest.level.min() >= amr.min_level
    m1 = solver.compute_integral()
    np.testing.assert_allclose(m1, m0, rtol=2e-4)
    # the shear layer must trigger some refinement
    assert max(n_hist) > n_hist[0]


def test_adapt_prefetch_pipelined_cycle():
    """AMR pipelining: adapt_prefetch() at the boundary == plain adapt()
    (identical mesh + state), and a lagged prefetch (criteria from a few
    steps earlier, D2H overlapping stepping) still yields a valid
    2:1-balanced cycle with conserved mass."""
    amr = AMRConfig(min_level=3, max_level=5, refine_threshold=2.0)

    def build():
        manager = MeshManager(Forest.uniform(4, dim=2), amr)
        s = CompressibleEulerSolver(manager, lambda cc: kh_planar(cc, dim=2))
        for _ in range(5):
            s.iterate(1e-3)
        return s

    # zero-lag prefetch is exactly equivalent to a plain adapt
    s_plain, s_pre = build(), build()
    s_plain.adapt()
    s_pre.adapt_prefetch()
    s_pre.adapt()
    assert s_plain.n_elements == s_pre.n_elements
    np.testing.assert_array_equal(np.asarray(s_plain.conserved_state()),
                                  np.asarray(s_pre.conserved_state()))

    # lagged prefetch: criteria from 3 steps before the boundary
    s = build()
    m0 = s.compute_integral()
    s.adapt_prefetch()
    for _ in range(3):
        s.iterate(1e-3)
    s.adapt()
    assert s._crit_pending is None
    assert np.abs(
        s.manager.forest.build_faces()["level_difference"]).max() <= 1
    np.testing.assert_allclose(s.compute_integral(), m0, rtol=2e-4)
    assert np.isfinite(s.conserved_state()).all()


def test_solver_amr_cycle_3d():
    """3D plain-element AMR cycle (k=8 families, octant remaps)."""
    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=1.0)
    manager = MeshManager(Forest.uniform(3, dim=3), amr)
    solver = CompressibleEulerSolver(manager, lambda cc: kh_planar(cc, dim=3))
    m0 = solver.compute_integral()
    for _ in range(2):
        dt = solver.compute_timestep()
        for _ in range(3):
            solver.iterate(dt)
        solver.adapt()
        assert np.abs(
            manager.forest.build_faces()["level_difference"]).max() <= 1
    np.testing.assert_allclose(solver.compute_integral(), m0, rtol=2e-4)
    assert np.isfinite(solver.conserved_state()).all()
