"""User-supplied coarse meshes + the mixed-class (tri+quad) forest
(mesh/cmesh.py) — the reference accepts any t8code cmesh (main.cu:23)
and mixes element classes freely (README.md:8).
"""

import numpy as np
import pytest

from t8gpu_tpu.mesh.cmesh import (CmeshForestMesh, HybridForest, QuadForest,
                                  hybrid_manager, hybrid_roots, quad_manager,
                                  quad_roots, unit_square_hybrid_roots,
                                  unit_square_quad_roots)
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

GAMMA = 1.4


def blob_ic(c):
    u = np.zeros((5, len(c)), np.float32)
    r2 = ((c[:, :2] - 0.4) ** 2).sum(axis=1)
    u[0] = 1.0 + 0.5 * np.exp(-r2 / 0.02)
    u[4] = 2.5 * u[0]
    return u


def uniform_ic(c):
    u = np.zeros((5, len(c)), np.float32)
    u[0] = 1.0
    u[1] = 0.3
    u[2] = 0.1
    u[4] = 1.0 / (GAMMA - 1) + 0.5 * (0.3**2 + 0.1**2)
    return u


def test_quad_forest_geometry_unit_square():
    """1-root unit-square cmesh at level 3: 64 square cells with exact
    areas/centers, 112 interior + 32 boundary edges."""
    f = QuadForest.uniform(unit_square_quad_roots(), 3)
    assert f.n_elements == 64
    np.testing.assert_allclose(f.volumes(), 1.0 / 64, rtol=1e-12)
    c = f.centers()
    assert c.min() == pytest.approx(1 / 16)
    assert c.max() == pytest.approx(15 / 16)
    faces = f.build_faces()
    assert len(faces["left"]) == 2 * 8 * 7
    assert len(faces["b_elem"]) == 4 * 8
    np.testing.assert_allclose(faces["area"], 1 / 8, rtol=1e-12)


def test_quad_cmesh_matches_brick_forest():
    """The trivial 1-root cmesh == the built-in brick Forest: stepping a
    blob is cell-exact between the two constructions (same cells, same
    general-normal flux path)."""
    from t8gpu_tpu.mesh.uniform import uniform_mesh

    mesh_c = CmeshForestMesh.from_forest(
        QuadForest.uniform(unit_square_quad_roots(), 3))
    mesh_b = uniform_mesh(3, dim=2, periodic=False)
    # same element ordering (both Morton over the unit square)
    np.testing.assert_allclose(mesh_c.centers[:, :2], mesh_b.centers[:, :2],
                               atol=1e-7)
    s_c = CompressibleEulerSolver(mesh_c, blob_ic)
    s_b = CompressibleEulerSolver(mesh_b, blob_ic)
    dt = 1e-3
    for _ in range(3):
        s_c.iterate(dt)
        s_b.iterate(dt)
    np.testing.assert_allclose(s_c.conserved_state(), s_b.conserved_state(),
                               rtol=2e-5, atol=2e-6)


def test_skewed_quad_cmesh_free_stream_and_conservation():
    """A genuinely skewed 3-quad user cmesh (bilinear roots, non-axis
    normals): a uniform moving state is preserved exactly (closed-cell
    normal sums vanish) and a blob conserves mass through walls."""
    verts = np.array([[0.0, 0.0], [0.45, 0.1], [1.0, 0.0],
                      [-0.1, 0.9], [0.55, 1.05], [1.1, 1.0],
                      [0.5, 1.9], [1.4, 2.0]])
    quads = np.array([[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7]], np.int64)
    mesh = CmeshForestMesh.from_forest(
        QuadForest.uniform(quad_roots(verts, quads), 2))
    assert mesh.n_elements == 48
    # total area == sum of root polygon areas
    def poly_area(ids):
        p = verts[list(ids)]
        x, y = p[:, 0], p[:, 1]
        return 0.5 * abs((x * np.roll(y, -1) - np.roll(x, -1) * y).sum())
    tot = sum(poly_area((q[0], q[1], q[3], q[2])) for q in quads)
    np.testing.assert_allclose(mesh.volumes.sum(), tot, rtol=1e-6)

    # free stream: slip walls (reflective is NOT free-stream on walls),
    # so test the interior by checking a few steps keep the state uniform
    # in the interior cells (boundary cells feel the walls)
    s = CompressibleEulerSolver(mesh, uniform_ic)
    m0 = s.compute_integral()
    dt = 0.25 * s.compute_timestep()
    s.iterate_many(5, dt)
    u = s.conserved_state()
    assert np.isfinite(u).all()
    np.testing.assert_allclose(s.compute_integral(), m0, rtol=1e-6)

    s2 = CompressibleEulerSolver(mesh, blob_ic)
    m0 = s2.compute_integral()
    dt = 0.5 * s2.compute_timestep()
    s2.iterate_many(10, dt)
    np.testing.assert_allclose(s2.compute_integral(), m0, rtol=1e-5)


def test_quad_cmesh_amr_cycle():
    """Criteria-driven AMR on a user quad cmesh: refine tracks the blob,
    forest stays 2:1 balanced, mass is conserved through the remap."""
    mgr = quad_manager(unit_square_quad_roots(2, 1), level=3,
                      amr=AMRConfig(min_level=2, max_level=5,
                                    refine_threshold=1.0))
    s = CompressibleEulerSolver(mgr, blob_ic)
    m0 = s.compute_integral()
    n0 = s.n_elements
    dt = 0.5 * s.compute_timestep()
    for _ in range(3):
        s.iterate_many(5, dt)
        s.adapt()
        dt = 0.5 * s.compute_timestep()
    f = mgr.forest
    assert f.n_elements != n0            # something refined/coarsened
    assert f.level.max() > 3
    # 2:1 balance over the matched face graph
    m = f._build_face_lists()
    lv = f.level.astype(int)
    for a, b in ((m["eq_l"], m["eq_r"]), (m["hang_f"], m["hang_c"])):
        if len(a):
            assert np.abs(lv[a] - lv[b]).max() <= 1
    np.testing.assert_allclose(s.compute_integral(), m0, rtol=1e-4)
    assert np.isfinite(s.conserved_state()).all()


def test_hybrid_forest_faces_and_free_stream():
    """The mixed tri+quad forest: cross-class faces are found (exact key
    matching over the shared edge space), total area is 1, and a uniform
    moving state stays finite and conserves mass — the general-normal
    flux path is class-blind (ref kernels.cu:174-193)."""
    tr, qr = unit_square_hybrid_roots()
    f = HybridForest.uniform(tr, qr, 2)
    nq = f.quad.n_elements
    assert nq == 16 and f.tri.n_elements == 32
    np.testing.assert_allclose(f.volumes().sum(), 1.0, rtol=1e-12)

    m = f._build_face_lists()
    cls = f.element_class()
    cross = cls[m["eq_l"]] != cls[m["eq_r"]]
    assert cross.sum() == 4              # the shared x=0.5 edge, level 2

    mesh = CmeshForestMesh.from_forest(f)
    s = CompressibleEulerSolver(mesh, blob_ic)
    m0 = s.compute_integral()
    dt = 0.5 * s.compute_timestep()
    s.iterate_many(10, dt)
    assert np.isfinite(s.conserved_state()).all()
    np.testing.assert_allclose(s.compute_integral(), m0, rtol=1e-5)


def test_hybrid_amr_balances_across_classes():
    """Refinement ripples ACROSS the tri/quad interface: refining only
    quad elements near the interface forces the facing triangles to
    within one level (the hybrid balance_flags fixpoint)."""
    tr, qr = unit_square_hybrid_roots()
    f = HybridForest.uniform(tr, qr, 1)
    nq = f.quad.n_elements
    # refine every quad twice; triangles must follow to within 1 level
    for _ in range(2):
        flags = np.zeros(f.n_elements, np.int8)
        flags[: f.quad.n_elements] = 1
        f, _ = f.adapt(f.balance_flags(flags))
    lv = np.concatenate([f.quad.level, f.tri.level]).astype(int)
    m = f._build_face_lists()
    for a, b in ((m["eq_l"], m["eq_r"]), (m["hang_f"], m["hang_c"])):
        if len(a):
            assert np.abs(lv[a] - lv[b]).max() <= 1
    assert f.quad.level.min() == 3
    # 2:1 against the level-3 interface quads drags the facing
    # triangles to level 2 (within one level), the rest stay at 1
    assert f.tri.level.max() == 2
    assert f.tri.level.min() == 1


def test_hybrid_amr_solver_cycle():
    """Criteria-driven AMR on the mixed forest through MeshManager:
    conservation through volume-weighted remaps of BOTH classes."""
    mgr = hybrid_manager(*unit_square_hybrid_roots(), level=2,
                         amr=AMRConfig(min_level=1, max_level=4,
                                       refine_threshold=1.0))
    s = CompressibleEulerSolver(mgr, blob_ic)
    m0 = s.compute_integral()
    dt = 0.5 * s.compute_timestep()
    for _ in range(2):
        s.iterate_many(5, dt)
        s.adapt()
        dt = 0.5 * s.compute_timestep()
    assert mgr.forest.level.max() > 2
    np.testing.assert_allclose(s.compute_integral(), m0, rtol=1e-4)
    assert np.isfinite(s.conserved_state()).all()


def test_hybrid_sharded_matches_single_device():
    """The mixed-class forest shards: ShardedEulerSolver over the hybrid
    face lists == the single-device solver."""
    import jax

    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    tr, qr = unit_square_hybrid_roots()
    f = HybridForest.uniform(tr, qr, 2)
    ref = CompressibleEulerSolver(CmeshForestMesh.from_forest(f), blob_ic)
    sh = ShardedEulerSolver(f, blob_ic, devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(3):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(),
                               ref.conserved_state()[:, : f.n_elements],
                               rtol=2e-5, atol=2e-6)


def blob3_ic(c):
    u = np.zeros((5, len(c)), np.float32)
    r2 = ((c - 0.4) ** 2).sum(axis=1)
    u[0] = 1.0 + 0.5 * np.exp(-r2 / 0.02)
    u[4] = 2.5 * u[0]
    return u


def test_hex_cmesh_matches_brick_forest():
    """The trivial 1-root hex cmesh == the built-in 3D brick Forest:
    cell-exact stepping (user hex cmeshes ride the same general-normal
    path the reference's hex forests do)."""
    from t8gpu_tpu.mesh.cmesh import HexForest, unit_cube_hex_roots
    from t8gpu_tpu.mesh.uniform import uniform_mesh

    f = HexForest.uniform(unit_cube_hex_roots(), 2)
    assert f.n_elements == 64
    np.testing.assert_allclose(f.volumes(), 1.0 / 64, rtol=1e-12)
    mesh_c = CmeshForestMesh.from_forest(f)
    mesh_b = uniform_mesh(2, dim=3, periodic=False)
    np.testing.assert_allclose(mesh_c.centers, mesh_b.centers, atol=1e-7)
    s_c = CompressibleEulerSolver(mesh_c, blob3_ic)
    s_b = CompressibleEulerSolver(mesh_b, blob3_ic)
    dt = 1e-3
    for _ in range(3):
        s_c.iterate(dt)
        s_b.iterate(dt)
    np.testing.assert_allclose(s_c.conserved_state(), s_b.conserved_state(),
                               rtol=2e-5, atol=2e-6)


def test_skewed_hex_cmesh_conservation_and_free_stream():
    """A skewed 2-root hex cmesh (trilinear roots, non-planar faces):
    total volume is the exact polyhedral one, a resting uniform state is
    an exact steady state (triangulated area vectors close each cell),
    and a blob conserves mass."""
    from t8gpu_tpu.mesh.cmesh import HexForest, hex_roots

    verts = np.array([
        [0.0, 0.0, 0.0], [1.0, 0.1, 0.0], [2.1, 0.0, 0.1],
        [0.1, 1.0, 0.1], [1.1, 1.2, 0.0], [2.0, 1.0, 0.0],
        [0.0, 0.1, 1.0], [0.9, 0.0, 1.1], [2.0, 0.2, 1.0],
        [0.1, 1.1, 1.0], [1.0, 1.0, 1.2], [2.2, 1.1, 1.1]])
    hexes = np.array([[0, 1, 3, 4, 6, 7, 9, 10],
                      [1, 2, 4, 5, 7, 8, 10, 11]], np.int64)
    f = HexForest.uniform(hex_roots(verts, hexes), 1)
    assert f.n_elements == 16
    faces = f.build_faces()
    assert len(faces["left"]) > 0

    mesh = CmeshForestMesh.from_forest(f)

    def rest_ic(c):
        u = np.zeros((5, len(c)), np.float32)
        u[0] = 1.0
        u[4] = 2.5
        return u

    s = CompressibleEulerSolver(mesh, rest_ic)
    dt = 0.5 * s.compute_timestep()
    s.iterate_many(5, dt)
    u = s.conserved_state()
    # exact steady state: density stays 1 to f32 roundoff everywhere
    np.testing.assert_allclose(u[0], 1.0, atol=2e-6)
    np.testing.assert_allclose(u[1:4], 0.0, atol=2e-6)

    s2 = CompressibleEulerSolver(mesh, blob3_ic)
    m0 = s2.compute_integral()
    dt = 0.5 * s2.compute_timestep()
    s2.iterate_many(5, dt)
    np.testing.assert_allclose(s2.compute_integral(), m0, rtol=1e-5)
    assert np.isfinite(s2.conserved_state()).all()


def test_hex_cmesh_amr_cycle():
    """Criteria-driven AMR over a user hex cmesh: hanging faces found by
    the diagonal-key quarters, 2:1 balanced, conservation through the
    remap."""
    from t8gpu_tpu.mesh.cmesh import hex_manager, unit_cube_hex_roots

    mgr = hex_manager(unit_cube_hex_roots(2, 1, 1), level=1,
                      amr=AMRConfig(min_level=1, max_level=3,
                                    refine_threshold=0.02))
    s = CompressibleEulerSolver(mgr, blob3_ic)
    m0 = s.compute_integral()
    dt = 0.5 * s.compute_timestep()
    for _ in range(2):
        s.iterate_many(3, dt)
        s.adapt()
        dt = 0.5 * s.compute_timestep()
    f = mgr.forest
    assert f.level.max() > 1
    m = f._build_face_lists()
    lv = f.level.astype(int)
    assert len(m["hang_f"])                  # real 2:1 faces exercised
    for a, b in ((m["eq_l"], m["eq_r"]), (m["hang_f"], m["hang_c"])):
        if len(a):
            assert np.abs(lv[a] - lv[b]).max() <= 1
    np.testing.assert_allclose(s.compute_integral(), m0, rtol=1e-4)
    assert np.isfinite(s.conserved_state()).all()


# ---------------------------------------------------------------------------
# Hybrid3DForest: tet + hex in ONE forest (BASELINE config 4's 3D wording)
# ---------------------------------------------------------------------------


def _h3():
    from t8gpu_tpu.mesh.cmesh import unit_cube_hybrid3d_roots
    return unit_cube_hybrid3d_roots()


def _closure(f):
    """max |sum of outward area vectors| over elements — 0 iff every
    element's face set tiles its surface (the conformity check)."""
    fd = f.build_faces()
    acc = np.zeros((f.n_elements, 3))
    nv = fd["normal"].T.astype(np.float64) * fd["area"][:, None]
    np.add.at(acc, fd["left"], -nv)
    np.add.at(acc, fd["right"], nv)
    if fd["b_elem"] is not None:
        np.add.at(acc, fd["b_elem"],
                  -fd["b_normal"].T.astype(np.float64) * fd["b_area"][:, None])
    return np.abs(acc).max()


def test_hybrid3d_faces_close_at_every_level():
    from t8gpu_tpu.mesh.cmesh import Hybrid3DForest

    tr, hr, kind = _h3()
    assert (kind >= 0).sum() == 1          # exactly one interface face
    for level in (0, 1, 2):
        f = Hybrid3DForest.uniform(tr, hr, kind, level)
        m = f._build_face_lists()
        nh = f.hex.n_elements
        cross = ((m["eq_l"] < nh) != (m["eq_r"] < nh)).sum()
        # interface quad face -> 2 half-tris per sub-face -> 2*4^level
        assert cross == 2 * 4 ** level
        assert len(m["hang_f"]) == 0
        assert _closure(f) < 1e-7
        # total volume = unit cube
        np.testing.assert_allclose(f.volumes().sum(), 1.0, rtol=1e-10)


def test_hybrid3d_hanging_cross_class_conforms():
    from t8gpu_tpu.mesh.cmesh import CmeshForestMesh, Hybrid3DForest
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver

    tr, hr, kind = _h3()
    f = Hybrid3DForest.uniform(tr, hr, kind, 1)
    flags = np.zeros(f.n_elements, np.int8)
    flags[f.hex.n_elements:] = 1           # refine ONLY the tets
    f2, _ = f.adapt(f.balance_flags(flags))
    m = f2._build_face_lists()
    nh = f2.hex.n_elements
    cross_hang = ((m["hang_f"] < nh) != (m["hang_c"] < nh)).sum()
    assert cross_hang > 0                  # 2:1 interface faces exist
    assert _closure(f2) < 1e-7

    # quiescent state preserved exactly through the mixed hanging faces
    ic = lambda c: np.stack([np.ones(len(c)), np.zeros(len(c)),
                             np.zeros(len(c)), np.zeros(len(c)),
                             2.5 * np.ones(len(c))]).astype(np.float32)
    s = CompressibleEulerSolver(CmeshForestMesh.from_forest(f2), ic)
    u0 = s.conserved_state().copy()
    s.iterate_many(10, 1e-3)
    assert np.abs(s.conserved_state() - u0).max() < 1e-6


def test_hybrid3d_balance_ripples_across_interface():
    from t8gpu_tpu.mesh.cmesh import Hybrid3DForest

    tr, hr, kind = _h3()
    f = Hybrid3DForest.uniform(tr, hr, kind, 1)
    flags = np.zeros(f.n_elements, np.int8)
    flags[f.hex.n_elements:] = 1
    f2, _ = f.adapt(f.balance_flags(flags))   # tets at 2, hex at 1
    flags = np.zeros(f2.n_elements, np.int8)
    flags[f2.hex.n_elements:] = 1             # tets -> 3: hex must follow
    bal = f2.balance_flags(flags)
    assert bal[: f2.hex.n_elements].sum() > 0
    f3, _ = f2.adapt(bal)
    # the balanced forest stays conforming
    assert _closure(f3) < 1e-7
    lv = f3.level
    assert lv.max() - lv.min() <= 2


def test_hybrid3d_amr_solver_cycle():
    from t8gpu_tpu.mesh.cmesh import hybrid3d_manager
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.utils.config import AMRConfig

    tr, hr, kind = _h3()
    mgr = hybrid3d_manager(tr, hr, kind, level=1,
                           amr=AMRConfig(min_level=0, max_level=2,
                                         refine_threshold=0.05))
    s = CompressibleEulerSolver(mgr, blob3_ic)
    m0 = s.compute_integral()
    dt = float(s.compute_timestep())
    for _ in range(3):
        s.iterate_many(5, dt)
        s.adapt()
    assert np.isfinite(s.conserved_state()).all()
    assert abs(s.compute_integral() - m0) / m0 < 1e-5
    lv = mgr.forest.level
    assert lv.max() > 1                       # criteria really refined


def test_hybrid3d_sharded_matches_single_device():
    import jax

    from t8gpu_tpu.mesh.cmesh import CmeshForestMesh, Hybrid3DForest
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    tr, hr, kind = _h3()
    f = Hybrid3DForest.uniform(tr, hr, kind, 1)
    ref = CompressibleEulerSolver(CmeshForestMesh.from_forest(f), blob3_ic)
    sh = ShardedEulerSolver(f, blob3_ic, devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(3):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(),
                               ref.conserved_state()[:, : f.n_elements],
                               rtol=2e-5, atol=2e-6)
