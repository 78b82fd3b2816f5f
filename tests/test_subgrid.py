"""Subgrid (block-structured) scheme tests.

The load-bearing check is cell-exact equivalence with the plain-element
solver on uniform meshes: a level-l forest of Subgrid<4,4> blocks is the
same discretization as a plain level-(l+2) mesh, so flux divergence and
RK3 steps must agree cell-for-cell.  This cross-validates the inner-flux
stencils, the outer-face index maps, and the axis-permutation rotation
against the general-basis plain path (ref kernels.cu:174-193 vs
kernels.inl:717-758).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from t8gpu_tpu.memory.subgrid import SUBGRID_4x4, SUBGRID_4x4x4, SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh, cell_centers
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import (SubgridCompressibleEulerSolver,
                                            subgrid_manager)
from t8gpu_tpu.ops import subgrid as sg
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def _cell_to_plain_perm(forest, spec, plain_mesh):
    """Permutation mapping flat subgrid cells -> plain mesh elements with
    identical centers."""
    cc = cell_centers(forest, spec)
    pc = plain_mesh.centers
    # match by rounded coordinates
    scale = 1 << 20
    key_c = [tuple(r) for r in np.round(cc * scale).astype(np.int64)]
    key_p = {tuple(r): i for i, r in
             enumerate(np.round(pc * scale).astype(np.int64))}
    return np.array([key_p[k] for k in key_c])


@pytest.mark.parametrize("dim,level,spec", [
    (2, 2, SUBGRID_4x4),
    (2, 3, SUBGRID_4x4),
    (3, 1, SUBGRID_4x4x4),
])
@pytest.mark.parametrize("flux", ["kepes", "hll"])
def test_uniform_subgrid_matches_plain(dim, level, spec, flux):
    """Subgrid solver on a uniform forest == plain solver at the same
    effective resolution, cell for cell, after full RK3 steps."""
    forest = Forest.uniform(level, dim=dim)
    smesh = SubgridMesh.from_forest(forest, spec)
    plain = uniform_mesh(level + spec.log2_extent, dim=dim, periodic=True)
    perm = _cell_to_plain_perm(forest, spec, plain)

    cfg = EulerConfig(flux=flux)
    s_sub = SubgridCompressibleEulerSolver(
        smesh, lambda c: kh_planar(c, dim=dim), config=cfg)
    s_plain = CompressibleEulerSolver(
        plain, lambda c: kh_planar(c, dim=dim), config=cfg)

    dt = 1e-3
    for _ in range(3):
        s_sub.iterate(dt)
        s_plain.iterate(dt)

    u_sub = s_sub.conserved_state().reshape(5, -1)     # [5, N*B] flat cells
    u_plain = s_plain.conserved_state()                # [5, N_plain]
    np.testing.assert_allclose(u_sub, u_plain[:, perm], rtol=2e-4, atol=2e-5)
    # CFL timesteps agree (same h_min, same max wave speed)
    np.testing.assert_allclose(s_sub.compute_timestep(),
                               s_plain.compute_timestep(), rtol=1e-4)


def test_subgrid_conservation_hanging_faces():
    """Mass is conserved exactly (fp) across hanging faces."""
    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    flags = forest.balance_flags(flags)
    forest, _ = forest.adapt(flags)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    solver = SubgridCompressibleEulerSolver(
        smesh, lambda c: kh_planar(c, dim=2))
    m0 = solver.compute_integral()
    dt = solver.compute_timestep()
    for _ in range(20):
        solver.iterate(dt)
    m1 = solver.compute_integral()
    assert np.isfinite(solver.conserved_state()).all()
    np.testing.assert_allclose(m1, m0, rtol=1e-5)


def test_subgrid_reflective_walls_conserve_mass():
    forest = Forest.uniform(2, dim=2, periodic=False)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    solver = SubgridCompressibleEulerSolver(
        smesh, lambda c: kh_planar(c, dim=2))
    m0 = solver.compute_integral()
    for _ in range(20):
        solver.iterate(1e-3)
    np.testing.assert_allclose(solver.compute_integral(), m0, rtol=1e-5)


def test_subgrid_remap_refine_coarsen_roundtrip():
    """Refine-all then coarsen-all reproduces the original blocks."""
    forest = Forest.uniform(1, dim=2)
    spec = SUBGRID_4x4
    smesh = SubgridMesh.from_forest(forest, spec)
    rng = np.random.default_rng(3)
    n = forest.n_elements
    cap = smesh.conn.element_capacity
    # element-minor layout [5, ext, ext, cap]
    u = jnp.asarray(rng.normal(size=(5, 4, 4, cap)).astype(np.float32))

    fine, remap = forest.adapt(np.ones(n, np.int8))
    cap_f = smesh.conn.element_capacity  # may differ; compute fresh
    from t8gpu_tpu.memory.store import bucket_capacity
    cap_f = bucket_capacity(fine.n_elements)

    def pad(remap, cap):
        m = len(remap.src_start)
        src = np.zeros(cap, np.int32); src[:m] = remap.src_start
        ref = np.zeros(cap, bool); ref[:m] = remap.level_change > 0
        ch = np.zeros(cap, np.int32); ch[:m] = remap.child_id
        co = np.zeros(cap, bool); co[:m] = remap.src_count > 1
        return (jnp.asarray(src), jnp.asarray(ref), jnp.asarray(ch),
                jnp.asarray(co))

    u_f = sg.apply_subgrid_remap(u, *pad(remap, cap_f), spec=spec,
                                 capacity=cap_f)
    # child block (i,j) samples the parent octant at half resolution
    # (ref subgrid_mesh_manager.inl:318-331)
    uf = np.asarray(u_f)
    uo = np.asarray(u)
    for e in range(fine.n_elements):
        s = remap.src_start[e]
        c = remap.child_id[e]
        I, J = c & 1, (c >> 1) & 1
        for i in range(4):
            for j in range(4):
                assert uf[0, i, j, e] == uo[0, I * 2 + i // 2, J * 2 + j // 2, s]

    back, remap2 = fine.adapt(-np.ones(fine.n_elements, np.int8))
    cap_b = bucket_capacity(back.n_elements)
    u_b = sg.apply_subgrid_remap(u_f, *pad(remap2, cap_b), spec=spec,
                                 capacity=cap_b)
    np.testing.assert_allclose(np.asarray(u_b)[..., :n], uo[..., :n],
                               rtol=1e-6)


def test_subgrid_remap_conserves_mass():
    forest = Forest.uniform(2, dim=2)
    amr = AMRConfig(min_level=1, max_level=4, refine_threshold=0.02)
    manager = subgrid_manager(forest, SUBGRID_4x4, amr)
    solver = SubgridCompressibleEulerSolver(
        manager, lambda c: kh_planar(c, dim=2))
    m0 = solver.compute_integral()
    solver.adapt()
    assert solver.n_elements != forest.n_elements  # KH layer refines
    np.testing.assert_allclose(solver.compute_integral(), m0, rtol=1e-5)


def test_h1_criteria():
    forest = Forest.uniform(1, dim=2)
    spec = SUBGRID_4x4
    smesh = SubgridMesh.from_forest(forest, spec)
    cap = smesh.conn.element_capacity
    u = jnp.ones((5, 4, 4, cap))
    crit = sg.h1_criteria(u, jnp.asarray(
        np.pad(smesh.volumes, (0, cap - forest.n_elements))), spec)
    np.testing.assert_allclose(np.asarray(crit), 0.0, atol=1e-7)

    # known pattern: rho = i (x index) in element 0
    rho = np.zeros((4, 4, cap), np.float32)
    rho[:, :, 0] = np.arange(4, dtype=np.float32)[:, None]
    u = jnp.asarray(np.broadcast_to(rho, (5, 4, 4, cap)).copy())
    crit = np.asarray(sg.h1_criteria(u, jnp.asarray(
        np.pad(smesh.volumes, (0, cap - forest.n_elements))), spec))
    V = smesh.volumes[0]
    h = np.sqrt(V) / 4
    # 3 x-interfaces x 4 rows, each diff 1 -> sum = 12 * h
    np.testing.assert_allclose(crit[0], 12 * h / V, rtol=1e-6)


def test_subgrid_full_amr_loop():
    """End-to-end: iterate + adapt cycles on KH, mass conserved, 2:1 kept."""
    amr = AMRConfig(min_level=1, max_level=3, refine_threshold=0.05)
    manager = subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4, amr)
    solver = SubgridCompressibleEulerSolver(
        manager, lambda c: kh_planar(c, dim=2))
    m0 = solver.compute_integral()
    for _ in range(3):
        dt = solver.compute_timestep()
        for _ in range(5):
            solver.iterate(dt)
        solver.adapt()
        assert np.abs(
            manager.forest.build_faces()["level_difference"]).max() <= 1
    np.testing.assert_allclose(solver.compute_integral(), m0, rtol=5e-4)
    assert np.isfinite(solver.conserved_state()).all()


def test_subgrid_adapt_prefetch_equivalent():
    """Subgrid AMR pipelining: a zero-lag adapt_prefetch() + adapt() is
    bit-identical to a plain adapt(); a lagged prefetch still conserves
    mass through the cycle."""
    amr = AMRConfig(min_level=1, max_level=3, refine_threshold=0.05)

    def build():
        manager = subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4, amr)
        s = SubgridCompressibleEulerSolver(
            manager, lambda c: kh_planar(c, dim=2))
        for _ in range(4):
            s.iterate(1e-3)
        return s

    s_plain, s_pre = build(), build()
    s_plain.adapt()
    s_pre.adapt_prefetch()
    s_pre.adapt()
    assert s_plain.n_elements == s_pre.n_elements
    np.testing.assert_array_equal(np.asarray(s_plain.conserved_state()),
                                  np.asarray(s_pre.conserved_state()))

    s = build()
    m0 = s.compute_integral()
    s.adapt_prefetch()
    for _ in range(3):
        s.iterate(1e-3)
    s.adapt()
    assert s._crit_pending is None
    np.testing.assert_allclose(s.compute_integral(), m0, rtol=5e-4)
    assert np.isfinite(s.conserved_state()).all()


def test_uniform_subgrid_ext8_matches_plain():
    """Subgrid<8,8> == plain solver at equal resolution (the larger block
    is the recommended performance configuration, BENCHMARKS.md)."""
    spec = SubgridSpec((8, 8))
    forest = Forest.uniform(2, dim=2)
    smesh = SubgridMesh.from_forest(forest, spec)
    plain = uniform_mesh(2 + spec.log2_extent, dim=2, periodic=True)
    perm = _cell_to_plain_perm(forest, spec, plain)

    s_sub = SubgridCompressibleEulerSolver(
        smesh, lambda c: kh_planar(c, dim=2))
    s_plain = CompressibleEulerSolver(plain, lambda c: kh_planar(c, dim=2))
    for _ in range(3):
        s_sub.iterate(1e-3)
        s_plain.iterate(1e-3)
    np.testing.assert_allclose(s_sub.conserved_state().reshape(5, -1),
                               s_plain.conserved_state()[:, perm],
                               rtol=2e-4, atol=2e-5)


def test_float64_subgrid_path():
    """EulerConfig(dtype="float64") on the SUBGRID solver (VERDICT r3
    item 7): the whole stepping path runs in f64 (the fused Pallas
    kernels are f32-only, so _fused_path routes f64 onto the XLA
    stencil), mass conserves to f64 roundoff, and the f64 trajectory
    matches the f32 one to f32 tolerance — on a uniform AND a hanging
    (2:1) mesh."""
    import jax
    import jax.numpy as jnp

    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.subgrid_euler import (SubgridCompressibleEulerSolver,
                                                subgrid_manager)
    from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

    with jax.enable_x64(True):
        for flags_first in (False, True):
            forest = Forest.uniform(2, dim=2)
            if flags_first:        # refine one family -> hanging faces
                flags = np.zeros(forest.n_elements, np.int8)
                flags[0] = 1
                forest, _ = forest.adapt(forest.balance_flags(flags))
            mesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
            ic = lambda c: kh_planar(c, dim=2)
            s64 = SubgridCompressibleEulerSolver(
                mesh, ic, config=EulerConfig(dtype="float64"))
            s32 = SubgridCompressibleEulerSolver(
                mesh, ic, config=EulerConfig())
            assert s64.u.dtype == jnp.float64
            assert s32.u.dtype == jnp.float32
            m0 = s64.compute_integral()
            dt = 1e-3
            for _ in range(10):
                s64.iterate(dt)
                s32.iterate(dt)
            assert s64.u.dtype == jnp.float64
            assert np.isfinite(s64.conserved_state()).all()
            assert abs(s64.compute_integral() - m0) / m0 < 1e-12
            np.testing.assert_allclose(s64.conserved_state(),
                                       s32.conserved_state(),
                                       rtol=5e-4, atol=5e-5)

        # iterate_many + AMR cycle stay f64 end-to-end
        manager = subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4,
                                  AMRConfig(min_level=1, max_level=3,
                                            refine_threshold=2e-4))
        s = SubgridCompressibleEulerSolver(
            manager, lambda c: kh_planar(c, dim=2),
            config=EulerConfig(dtype="float64"))
        m0 = s.compute_integral()
        s.iterate_many(5, 1e-3)
        s.adapt()
        s.iterate_many(5, 1e-3)
        assert s.u.dtype == jnp.float64
        assert abs(s.compute_integral() - m0) / m0 < 1e-11
