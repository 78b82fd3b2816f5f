"""Subgrid (dense-block) GLM-MHD tests.

The load-bearing check mirrors the subgrid Euler suite: on a uniform
forest a level-l Subgrid<4,4> mesh is the same discretization as a plain
level-(l+2) mesh, so full RK3 steps must match models/mhd.MHDSolver cell
for cell — cross-validating the 9-row permutation rotation, the slab
exchange and the threaded GLM c_h against the plain gather/incidence
path.  Plus: conservation across hanging 2:1 faces, conductor-wall
steadiness, div-B control on Orszag-Tang, and an AMR cycle.
"""

import numpy as np
import pytest

from t8gpu_tpu.memory.subgrid import SUBGRID_4x4, SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh, cell_centers
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.mhd import (MHDSolver, alfven_period, cp_alfven_wave,
                                  mhd_state, orszag_tang)
from t8gpu_tpu.models.subgrid_mhd import SubgridMHDSolver
from t8gpu_tpu.models.subgrid_euler import subgrid_manager
from t8gpu_tpu.utils.config import AMRConfig

GAMMA = 5.0 / 3.0


def _blob_ic(centers):
    """Dense blob in a uniform oblique field (generic AMR/conservation IC)."""
    d2 = ((centers - 0.5) ** 2).sum(axis=1)
    rho = 1.0 + 1.5 * np.exp(-d2 / 0.02)
    v = np.stack([0.3 * np.ones_like(rho), -0.2 * np.ones_like(rho),
                  np.zeros_like(rho)])
    B = np.stack([0.5 * np.ones_like(rho), 0.3 * np.ones_like(rho),
                  np.zeros_like(rho)])
    return mhd_state(rho, v, np.full_like(rho, 1.0), B, gamma=GAMMA)


def _cell_to_plain_perm(forest, spec, plain_mesh):
    cc = cell_centers(forest, spec)
    pc = plain_mesh.centers
    scale = 1 << 20
    key_c = [tuple(r) for r in np.round(cc * scale).astype(np.int64)]
    key_p = {tuple(r): i for i, r in
             enumerate(np.round(pc * scale).astype(np.int64))}
    return np.array([key_p[k] for k in key_c])


def test_uniform_subgrid_mhd_matches_plain():
    """Subgrid GLM-MHD on a uniform forest == plain MHDSolver at the same
    effective resolution, cell for cell, after full RK3 steps."""
    forest = Forest.uniform(2, dim=2)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    plain = uniform_mesh(4, dim=2, periodic=True)
    perm = _cell_to_plain_perm(forest, SUBGRID_4x4, plain)

    s_sub = SubgridMHDSolver(smesh, cp_alfven_wave, gamma=GAMMA)
    s_plain = MHDSolver(plain, cp_alfven_wave, gamma=GAMMA)

    dt = 1e-3
    s_sub.iterate_many(3, dt)
    for _ in range(3):
        s_plain.iterate(dt)

    u_sub = s_sub.conserved_state().reshape(9, -1)
    u_plain = s_plain.conserved_state()
    np.testing.assert_allclose(u_sub, u_plain[:, perm], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(s_sub.compute_timestep(),
                               s_plain.compute_timestep(), rtol=1e-4)


def test_subgrid_mhd_conservation_hanging_faces():
    """All 8 conserved rows are conserved to fp across hanging 2:1 faces
    (psi is not conserved — the damping drains it by design)."""
    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    flags = forest.balance_flags(flags)
    forest, _ = forest.adapt(flags)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    solver = SubgridMHDSolver(smesh, _blob_ic, gamma=GAMMA)

    cell_vol = np.repeat(np.asarray(smesh.volumes) / SUBGRID_4x4.size,
                         SUBGRID_4x4.size)
    u0 = solver.conserved_state().reshape(9, -1)
    tot0 = (u0[:8] * cell_vol).sum(axis=1)
    dt = solver.compute_timestep()
    solver.iterate_many(20, dt)
    u1 = solver.conserved_state().reshape(9, -1)
    assert np.isfinite(u1).all()
    tot1 = (u1[:8] * cell_vol).sum(axis=1)
    scale = np.abs(tot0) + np.abs(u0[:8] * cell_vol).sum(axis=1) + 1e-12
    assert (np.abs(tot1 - tot0) / scale < 1e-5).all()


def test_subgrid_mhd_uniform_field_steady_on_walls():
    """A uniform field at rest between perfect-conductor walls is an exact
    steady state (ghost == own, every interface flux cancels)."""
    forest = Forest.uniform(2, dim=2, periodic=False)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)

    def ic(centers):
        n = len(centers)
        one = np.ones(n)
        return mhd_state(one, np.stack([0 * one, 0 * one, 0 * one]),
                         0.8 * one,
                         np.stack([0.6 * one, 0.4 * one, 0.2 * one]),
                         gamma=GAMMA)

    solver = SubgridMHDSolver(smesh, ic, gamma=GAMMA)
    u0 = solver.conserved_state()
    solver.iterate_many(10, 1e-3)
    u1 = solver.conserved_state()
    np.testing.assert_allclose(u1, u0, rtol=1e-6, atol=1e-6)


def test_subgrid_divergence_b_and_orszag_tang():
    """Orszag-Tang on 8x8 blocks: the discrete IC is exactly
    divergence-free through the Green-Gauss diagnostic (B_x varies only
    along y and vice versa), and after shock formation the normalized
    divB error h |div B| / |B| stays at truncation level."""
    forest = Forest.uniform(3, dim=2)
    spec = SubgridSpec((8, 8))
    smesh = SubgridMesh.from_forest(forest, spec)
    solver = SubgridMHDSolver(smesh, orszag_tang, gamma=GAMMA)

    db0 = solver.compute_divergence_b()
    assert np.abs(db0).max() < 1e-5
    dt = solver.compute_timestep()
    for _ in range(5):
        solver.iterate_many(10, dt)
    u = solver.conserved_state()
    assert np.isfinite(u).all()
    db1 = solver.compute_divergence_b()
    h_cell = 0.5 ** 3 / 8
    b_scale = np.abs(u[5:8]).max()
    assert np.abs(db1).max() * h_cell / b_scale < 0.1


def test_subgrid_glm_cleaning_reduces_dirty_divb():
    """A deliberately divergence-DIRTY field on subgrid blocks: GLM
    transports + damps the error (the plain-path cleaning test mirrored
    onto the block scheme)."""
    def dirty(c):
        bx = 0.5 + 0.4 * np.exp(-((c[:, 0] - 0.5) ** 2
                                  + (c[:, 1] - 0.5) ** 2) / 0.02)
        return mhd_state(np.ones(len(c)), (0.0, 0.0, 0.0), 1.0,
                         (bx, 0.3, 0.0), gamma=GAMMA)

    forest = Forest.uniform(3, dim=2)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    solver = SubgridMHDSolver(smesh, dirty, gamma=GAMMA)
    d0 = float(np.abs(solver.compute_divergence_b()).max())
    assert d0 > 1e-2                      # the IC really is dirty
    dt = solver.compute_timestep()
    solver.iterate_many(120, dt)
    u = solver.conserved_state()
    assert np.isfinite(u).all()
    d1 = float(np.abs(solver.compute_divergence_b()).max())
    assert d1 < 0.5 * d0, f"cleaning failed: divB {d0} -> {d1}"
    assert np.abs(u[8]).max() < 1.0       # psi bounded (damped)


def test_subgrid_mhd_amr_cycle_conserves():
    """Dynamic AMR cycle on the subgrid MHD solver: refine/coarsen with
    the row-generic remap keeps mass exact and the state finite."""
    amr = AMRConfig(min_level=1, max_level=3, refine_threshold=0.02)
    mgr = subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4, amr)
    solver = SubgridMHDSolver(mgr, _blob_ic, gamma=GAMMA)

    m0 = solver.compute_integral()
    dt = solver.compute_timestep()
    for _ in range(3):
        solver.iterate_many(5, dt)
        solver.adapt_prefetch()
        solver.iterate_many(2, dt)
        solver.adapt()
    assert np.isfinite(solver.conserved_state()).all()
    np.testing.assert_allclose(solver.compute_integral(), m0, rtol=2e-5)
    assert solver.n_elements != 16   # the blob actually triggered refinement


def test_subgrid_mhd_record_observables():
    """Per-step observable history: conserved columns flat, psi_energy
    finite; trajectory matches per-step stepping."""
    forest = Forest.uniform(2, dim=2)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    solver = SubgridMHDSolver(smesh, cp_alfven_wave, gamma=GAMMA)
    dt = 1e-3
    rows = np.asarray(solver.iterate_record(
        5, dt, observables=("mass", "total_energy", "psi_energy")))
    assert rows.shape == (5, 3)
    assert np.isfinite(rows).all()
    np.testing.assert_allclose(rows[:, 0], rows[0, 0], rtol=1e-6)
    np.testing.assert_allclose(rows[:, 1], rows[0, 1], rtol=1e-6)


def test_cp_alfven_subgrid_one_period():
    """The circularly polarized Alfven wave (exact nonlinear solution)
    returns to itself after one period on the subgrid scheme, and the
    error shrinks under refinement."""
    errs = []
    for level in (2, 3):
        forest = Forest.uniform(level, dim=2)
        smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
        solver = SubgridMHDSolver(smesh, cp_alfven_wave, gamma=GAMMA)
        u0 = solver.conserved_state().reshape(9, -1)
        period = alfven_period()
        n = {2: 256, 3: 512}[level]
        solver.iterate_many(n, period / n)
        u1 = solver.conserved_state().reshape(9, -1)
        errs.append(float(np.sqrt(((u1[6] - u0[6]) ** 2).mean())))
    assert errs[1] < 0.7 * errs[0]


def test_subgrid_mhd_order2_unlimited_matches_plain_order2():
    """Order-2 UNLIMITED subgrid MHD on a uniform forest == the plain
    MHDSolver(order=2, limiter="none") cell for cell: on a Cartesian mesh
    the plain path's Green-Gauss gradient is exactly the central
    difference, i.e. the same reconstruction as the block scheme's
    unlimited per-axis slope — two independent implementations
    (row-generic ops/reconstruct vs ops/subgrid.muscl_core_rows)
    cross-validate (the Euler analogue is tests/test_subgrid_muscl.py)."""
    forest = Forest.uniform(2, dim=2)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    plain = uniform_mesh(4, dim=2, periodic=True)
    perm = _cell_to_plain_perm(forest, SUBGRID_4x4, plain)

    s_sub = SubgridMHDSolver(smesh, cp_alfven_wave, gamma=GAMMA,
                             order=2, limiter="none")
    s_plain = MHDSolver(plain, cp_alfven_wave, gamma=GAMMA,
                        order=2, limiter="none")
    dt = 1e-3
    s_sub.iterate_many(3, dt)
    for _ in range(3):
        s_plain.iterate(dt)
    u_sub = s_sub.conserved_state().reshape(9, -1)
    u_plain = s_plain.conserved_state()
    np.testing.assert_allclose(u_sub, u_plain[:, perm], rtol=1e-5, atol=5e-7)


def test_subgrid_mhd_order2_conserves_on_hanging_mesh():
    """Order-2 minmod: all 8 conserved rows exact across hanging 2:1
    faces (the first-order closure at level jumps is shared-expression
    conservative like the first-order path)."""
    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    solver = SubgridMHDSolver(smesh, _blob_ic, gamma=GAMMA, order=2)

    cell_vol = np.repeat(np.asarray(smesh.volumes) / SUBGRID_4x4.size,
                         SUBGRID_4x4.size)
    u0 = solver.conserved_state().reshape(9, -1)
    tot0 = (u0[:8] * cell_vol).sum(axis=1)
    dt = solver.compute_timestep()
    solver.iterate_many(10, dt)
    u1 = solver.conserved_state().reshape(9, -1)
    assert np.isfinite(u1).all()
    tot1 = (u1[:8] * cell_vol).sum(axis=1)
    scale = np.abs(u0[:8] * cell_vol).sum(axis=1).max()
    assert (np.abs(tot1 - tot0) / scale < 1e-5).all()


def test_cp_alfven_subgrid_order2_beats_first_order():
    """The CP Alfven one-period error at order 2 sits well below first
    order at the same resolution (the decisive accuracy payoff; the
    plain-path analogue is in tests/test_mhd.py)."""
    period = alfven_period()
    errs = {}
    for order, lim in ((1, "minmod"), (2, "none")):
        forest = Forest.uniform(2, dim=2)
        smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
        s = SubgridMHDSolver(smesh, cp_alfven_wave, gamma=GAMMA,
                             order=order, limiter=lim)
        u0 = s.conserved_state().reshape(9, -1)
        n = 256
        s.iterate_many(n, period / n)
        u1 = s.conserved_state().reshape(9, -1)
        errs[order] = float(np.sqrt(((u1[6] - u0[6]) ** 2).mean()))
    assert errs[2] < 0.4 * errs[1], errs


def test_subgrid_mhd_checkpoint_roundtrip():
    """save_solver / restore_solver rebuild the SUBGRID MHD family
    exactly (model="mhd" + extents dispatches to SubgridMHDSolver)."""
    import os
    import tempfile

    from t8gpu_tpu.io.checkpoint import restore_solver, save_solver

    amr = AMRConfig(min_level=1, max_level=3, refine_threshold=0.02)
    mgr = subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4, amr)
    s = SubgridMHDSolver(mgr, _blob_ic, gamma=GAMMA, glm_alpha=0.2, cfl=0.4,
                         order=2)
    s.iterate_many(5, 1e-3)
    s.adapt()
    s.iterate_many(5, 1e-3)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sg_mhd.npz")
        save_solver(path, s, step=10)
        r, meta = restore_solver(path)
    assert meta["step"] == 10
    assert isinstance(r, SubgridMHDSolver)
    assert r.gamma == s.gamma and r.glm_alpha == s.glm_alpha
    # order/limiter survive the roundtrip (a restored order-2 run must
    # NOT silently continue first-order)
    assert r.order == 2 and r.limiter == s.limiter
    np.testing.assert_array_equal(r.conserved_state(), s.conserved_state())
    r.iterate_many(3, 1e-3)
    s.iterate_many(3, 1e-3)
    np.testing.assert_allclose(r.conserved_state(), s.conserved_state(),
                               rtol=1e-6, atol=1e-7)


# -- distributed (8 CPU shards) ------------------------------------------------


def test_sharded_subgrid_mhd_matches_single_device():
    """ShardedSubgridMHDSolver == SubgridMHDSolver on a hanging 2:1 forest
    (the halo-extended interface engine + pmax'd c_h vs single device)."""
    from t8gpu_tpu.parallel.subgrid_mhd import ShardedSubgridMHDSolver

    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[[0, 5]] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))

    ref = SubgridMHDSolver(SubgridMesh.from_forest(forest, SUBGRID_4x4),
                           _blob_ic, gamma=GAMMA)
    sh = ShardedSubgridMHDSolver(forest, SUBGRID_4x4, _blob_ic, gamma=GAMMA)
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(), ref.conserved_state(),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(sh.compute_timestep(), ref.compute_timestep(),
                               rtol=1e-5)
    np.testing.assert_allclose(sh.compute_divergence_b(),
                               ref.compute_divergence_b(),
                               rtol=1e-4, atol=1e-5)


def test_sharded_subgrid_mhd_order2_matches_single_device():
    """ShardedSubgridMHDSolver(order=2) == SubgridMHDSolver(order=2) on a
    hanging 2:1 forest AND a conductor-walled forest: the halo already
    ships whole elements, so the MUSCL layers need no extra round and
    every mesh face evaluates identically on both sides of a shard cut."""
    from t8gpu_tpu.parallel.subgrid_mhd import ShardedSubgridMHDSolver

    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[[0, 5]] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))
    ref = SubgridMHDSolver(SubgridMesh.from_forest(forest, SUBGRID_4x4),
                           _blob_ic, gamma=GAMMA, order=2)
    sh = ShardedSubgridMHDSolver(forest, SUBGRID_4x4, _blob_ic,
                                 gamma=GAMMA, order=2)
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(), ref.conserved_state(),
                               rtol=2e-5, atol=1e-6)

    wf = Forest.uniform(2, dim=2, periodic=False)
    refw = SubgridMHDSolver(SubgridMesh.from_forest(wf, SUBGRID_4x4),
                            _blob_ic, gamma=GAMMA, order=2)
    shw = ShardedSubgridMHDSolver(wf, SUBGRID_4x4, _blob_ic,
                                  gamma=GAMMA, order=2)
    for _ in range(3):
        refw.iterate(dt)
        shw.iterate(dt)
    np.testing.assert_allclose(shw.conserved_state(), refw.conserved_state(),
                               rtol=2e-5, atol=1e-6)


def test_sharded_subgrid_mhd_amr_and_walls():
    """Distributed subgrid MHD AMR cycle == single-device (same forests,
    close state); conductor walls (periodic=False) conserve mass."""
    from t8gpu_tpu.parallel.subgrid_mhd import ShardedSubgridMHDSolver

    amr = AMRConfig(min_level=1, max_level=3, refine_threshold=0.02)
    ref = SubgridMHDSolver(
        subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4, amr),
        _blob_ic, gamma=GAMMA)
    sh = ShardedSubgridMHDSolver(Forest.uniform(2, dim=2), SUBGRID_4x4,
                                 _blob_ic, gamma=GAMMA, amr=amr)
    dt = 1e-3
    for _ in range(2):
        for _ in range(5):
            ref.iterate(dt)
            sh.iterate(dt)
        ref.adapt()
        sh.adapt()
        np.testing.assert_array_equal(sh.forest.level,
                                      ref.manager.forest.level)
    np.testing.assert_allclose(sh.conserved_state(), ref.conserved_state(),
                               rtol=5e-5, atol=2e-6)

    # conductor walls, sharded
    wforest = Forest.uniform(2, dim=2, periodic=False)
    sw = ShardedSubgridMHDSolver(wforest, SUBGRID_4x4, _blob_ic, gamma=GAMMA)
    m0 = sw.compute_integral()
    sw.iterate_many(10, 1e-3)
    assert np.isfinite(sw.conserved_state()).all()
    np.testing.assert_allclose(sw.compute_integral(), m0, rtol=1e-5)


def test_sharded_subgrid_mhd_record_and_checkpoint():
    """MHD observable registry through the sharded recorder; sharded
    checkpoint restores as ShardedSubgridMHDSolver."""
    import os
    import tempfile

    from t8gpu_tpu.io.checkpoint import (restore_sharded_solver,
                                         save_solver)
    from t8gpu_tpu.parallel.subgrid_mhd import ShardedSubgridMHDSolver

    sh = ShardedSubgridMHDSolver(Forest.uniform(2, dim=2), SUBGRID_4x4,
                                 _blob_ic, gamma=GAMMA, glm_alpha=0.2)
    rows = np.asarray(sh.iterate_record(
        4, 1e-3, observables=("mass", "magnetic_energy", "max_signal")))
    assert rows.shape == (4, 3) and np.isfinite(rows).all()
    np.testing.assert_allclose(rows[:, 0], rows[0, 0], rtol=1e-6)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sg_mhd_sharded.npz")
        save_solver(path, sh, step=4)
        r, meta = restore_sharded_solver(path)
    assert isinstance(r, ShardedSubgridMHDSolver)
    assert r.glm_alpha == sh.glm_alpha
    np.testing.assert_allclose(r.conserved_state(), sh.conserved_state(),
                               rtol=1e-6, atol=1e-7)
    r.iterate_many(2, 1e-3)
    sh.iterate_many(2, 1e-3)
    np.testing.assert_allclose(r.conserved_state(), sh.conserved_state(),
                               rtol=1e-6, atol=1e-7)


def test_subgrid_mhd_3d_steady_and_conservation():
    """3D blocks (Subgrid<4,4,4>): a uniform oblique field in uniform
    motion is exactly steady on the periodic forest (all interface
    differences vanish), and a 3D blob conserves all 8 rows across
    hanging 2:1 faces."""
    from t8gpu_tpu.memory.subgrid import SUBGRID_4x4x4

    forest = Forest.uniform(1, dim=3)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4x4)
    ic_u = lambda c: mhd_state(np.ones(len(c)), (0.1, -0.05, 0.2), 1.0,
                               (0.4, 0.25, -0.3), gamma=GAMMA)
    s = SubgridMHDSolver(smesh, ic_u, gamma=GAMMA)
    u0 = s.conserved_state()
    s.iterate_many(5, 1e-3)
    np.testing.assert_allclose(s.conserved_state(), u0, rtol=2e-6, atol=2e-6)

    f2 = Forest.uniform(1, dim=3)
    flags = np.zeros(f2.n_elements, np.int8)
    flags[0] = 1
    f2, _ = f2.adapt(f2.balance_flags(flags))
    sm2 = SubgridMesh.from_forest(f2, SUBGRID_4x4x4)
    s2 = SubgridMHDSolver(sm2, _blob_ic, gamma=GAMMA)
    cv = np.repeat(np.asarray(sm2.volumes) / SUBGRID_4x4x4.size,
                   SUBGRID_4x4x4.size)
    u0 = s2.conserved_state().reshape(9, -1)
    tot0 = (u0[:8] * cv).sum(axis=1)
    dt = s2.compute_timestep()
    s2.iterate_many(10, dt)
    u1 = s2.conserved_state().reshape(9, -1)
    assert np.isfinite(u1).all()
    tot1 = (u1[:8] * cv).sum(axis=1)
    # zero-sum rows (m_z here) drift only by roundoff of cancelling O(1)
    # interface fluxes — judge every row against the state's global scale
    scale = np.abs(u0[:8] * cv).sum(axis=1).max()
    assert (np.abs(tot1 - tot0) / scale < 1e-5).all()


# -- fused Pallas MHD kernel (interpret mode) ----------------------------------


def _mhd_kernel_vs_engine(forest, ext=4):
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.ops.subgrid_mhd import mhd_subgrid_divergence

    dim = forest.dim
    spec = SubgridSpec((ext,) * dim)
    smesh = SubgridMesh.from_forest(forest, spec)
    s = SubgridMHDSolver(smesh, _blob_ic, gamma=GAMMA)
    D0, sp0 = mhd_subgrid_divergence(s.u, s.volumes, s.conn, spec,
                                     GAMMA, 0.1, use_pallas=False)

    import jax.numpy as jnp

    from t8gpu_tpu.models.mhd import glm_ch
    from t8gpu_tpu.ops.pallas_kernels import fused_mhd_flux_pallas
    from t8gpu_tpu.ops.subgrid_mhd import (_conductor_ghost,
                                           _interface_engine,
                                           _rusanov_stack, axis_unrotate9,
                                           mhd_side_inputs)

    live = s.volumes > 0
    ch = jnp.maximum(glm_ch(s.u, GAMMA, live), 1e-12)
    others, weights = mhd_side_inputs(s.u, s.conn, spec, s.volumes, ch)
    D1, sp_e = fused_mhd_flux_pallas(s.u, weights, others, gamma=GAMMA,
                                     interpret=True)
    sp1 = sp_e.max()
    if any(s.conn.has_fine):
        iface = lambda l, r: _rusanov_stack(l, r, GAMMA, ch)
        D2, sp_f = _interface_engine(s.u, s.volumes, s.conn, spec, 9,
                                     iface, axis_unrotate9,
                                     _conductor_ghost, fine_only=True)
        D1 = D1 + D2
        sp1 = jnp.maximum(sp1, sp_f)
    # add the damping row exactly as the dispatcher does
    h_cell = (jnp.where(live, s.volumes, 1.0) ** (1.0 / dim)) / ext
    D1 = D1.at[8].add(-0.1 * ch * s.u[8]
                      * ((s.volumes / spec.size) / h_cell) * live)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(sp1), float(sp0), rtol=1e-5)


@pytest.mark.parametrize("dim,ext", [(2, 4), (2, 8), (3, 4), (3, 8)])
def test_fused_mhd_kernel_uniform(dim, ext):
    """Fused MHD kernel == interface engine on uniform periodic meshes."""
    _mhd_kernel_vs_engine(Forest.uniform(2 if dim == 2 else 1, dim=dim),
                          ext=ext)


def test_fused_mhd_kernel_hanging_and_walls():
    """Fused MHD kernel + XLA fine pass == engine on a hanging 2:1 mesh;
    conductor walls in-kernel == engine on a walled mesh."""
    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[[0, 7]] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))
    _mhd_kernel_vs_engine(forest, ext=4)

    _mhd_kernel_vs_engine(Forest.uniform(2, dim=2, periodic=False), ext=4)


def test_mhd_dispatch_interpret_end_to_end(monkeypatch):
    """The auto-dispatch (T8GPU_PALLAS=interpret) steps the solver through
    the fused kernel and matches the XLA engine stepping."""
    import jax

    forest = Forest.uniform(2, dim=2)
    smesh = SubgridMesh.from_forest(forest, SUBGRID_4x4)
    s_ref = SubgridMHDSolver(smesh, _blob_ic, gamma=GAMMA)
    s_ref.iterate_many(3, 1e-3)

    monkeypatch.setenv("T8GPU_PALLAS", "interpret")
    jax.clear_caches()
    try:
        s_k = SubgridMHDSolver(smesh, _blob_ic, gamma=GAMMA)
        s_k.iterate_many(3, 1e-3)
    finally:
        monkeypatch.delenv("T8GPU_PALLAS")
        jax.clear_caches()
    np.testing.assert_allclose(s_k.conserved_state(), s_ref.conserved_state(),
                               rtol=2e-5, atol=2e-6)


def test_sharded_mhd_kernel_dispatch_interpret(monkeypatch):
    """The SHARDED dispatch takes the fused-kernel path inside shard_map
    (interpret mode; halo-extended side layers) and matches the sharded
    XLA engine on a hanging 2:1 forest."""
    import jax

    from t8gpu_tpu.parallel.subgrid_mhd import ShardedSubgridMHDSolver

    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))

    ref = ShardedSubgridMHDSolver(forest, SUBGRID_4x4, _blob_ic,
                                  gamma=GAMMA)
    ref.iterate_many(2, 1e-3)

    monkeypatch.setenv("T8GPU_PALLAS", "interpret")
    jax.clear_caches()
    try:
        k = ShardedSubgridMHDSolver(forest, SUBGRID_4x4, _blob_ic,
                                    gamma=GAMMA)
        k.iterate_many(2, 1e-3)
    finally:
        monkeypatch.delenv("T8GPU_PALLAS")
        jax.clear_caches()
    np.testing.assert_allclose(k.conserved_state(), ref.conserved_state(),
                               rtol=2e-5, atol=2e-6)


def _mhd_muscl_kernel_vs_stencil(forest, ext=4, limiter="minmod"):
    """Fused MHD MUSCL kernel (interpret) == the XLA stencil engine for
    the FULL order-2 divergence (kernel interior/equal + shared
    first-order closure)."""
    import jax.numpy as jnp

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.ops.subgrid_mhd import mhd_subgrid_divergence_muscl

    dim = forest.dim
    spec = SubgridSpec((ext,) * dim)
    smesh = SubgridMesh.from_forest(forest, spec)
    s = SubgridMHDSolver(smesh, _blob_ic, gamma=GAMMA, order=2,
                         limiter=limiter)
    # stencil reference (kernel_mode is off on the CPU mesh by default)
    D0, sp0 = mhd_subgrid_divergence_muscl(s.u, s.volumes, s.conn, spec,
                                           GAMMA, 0.1, limiter=limiter)

    from t8gpu_tpu.models.mhd import glm_ch
    from t8gpu_tpu.ops import subgrid as sg
    from t8gpu_tpu.ops.pallas_kernels import fused_mhd_muscl_pallas
    from t8gpu_tpu.ops.subgrid_mhd import (_conductor_ghost,
                                           _interface_engine,
                                           _rusanov_stack, axis_unrotate9)

    live = s.volumes > 0
    ch = jnp.maximum(glm_ch(s.u, GAMMA, live), 1e-12)
    others, weights = sg.muscl_side_inputs(s.u, s.conn, spec, s.volumes)
    weights = weights.at[7].set(ch)
    D1, sp_e = fused_mhd_muscl_pallas(s.u, weights, others, gamma=GAMMA,
                                      limiter=limiter, interpret=True)
    sp1 = sp_e.max()
    iface = lambda l, r: _rusanov_stack(l, r, GAMMA, ch)
    D2, sp2 = _interface_engine(s.u, s.volumes, s.conn, spec, 9, iface,
                                axis_unrotate9, _conductor_ghost,
                                exclude_equal=True)
    D1 = D1 + D2
    sp1 = jnp.maximum(sp1, sp2)
    h_cell = (jnp.where(live, s.volumes, 1.0) ** (1.0 / dim)) / ext
    D1 = D1.at[8].add(-0.1 * ch * s.u[8]
                      * ((s.volumes / spec.size) / h_cell) * live)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(sp1), float(sp0), rtol=1e-5)


@pytest.mark.parametrize("dim,ext", [(2, 4), (2, 8), (3, 4)])
def test_fused_mhd_muscl_kernel_uniform(dim, ext):
    """Round 4 (ADVICE r3): order-2 subgrid MHD now has a fused Pallas
    path; kernel == stencil on uniform periodic meshes."""
    _mhd_muscl_kernel_vs_stencil(Forest.uniform(2 if dim == 2 else 1,
                                                dim=dim), ext=ext)


def test_fused_mhd_muscl_kernel_hanging_walls_unlimited():
    """Kernel == stencil with hanging 2:1 faces + conductor walls (the
    first-order closure stays XLA-side, eq weights mask the kernel), and
    with the unlimited central slope."""
    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[[0, 7]] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))
    _mhd_muscl_kernel_vs_stencil(forest, ext=4)
    _mhd_muscl_kernel_vs_stencil(Forest.uniform(2, dim=2, periodic=False),
                                 ext=4)
    _mhd_muscl_kernel_vs_stencil(Forest.uniform(2, dim=2), ext=4,
                                 limiter="none")
