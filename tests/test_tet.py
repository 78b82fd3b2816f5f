"""3D tetrahedral element class (mesh/tet.py): Bey red refinement over a
Kuhn-split unit cube, general-normal plain solver with dynamic AMR —
completing the reference's any-element-class coverage (README.md:8)."""

import numpy as np

from t8gpu_tpu.mesh.tet import (TetForest, TetForestMesh, tet_manager,
                                unit_cube_roots)
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.utils.config import AMRConfig


def closure_residual(forest):
    faces = forest.build_faces()
    net = np.zeros((forest.n_elements, 3))
    nv = faces["normal"].T.astype(np.float64) * faces["area"][:, None]
    np.add.at(net, faces["left"], nv)
    np.add.at(net, faces["right"], -nv)
    bn = faces["b_normal"].T.astype(np.float64) * faces["b_area"][:, None]
    np.add.at(net, faces["b_elem"], bn)
    return np.abs(net).max()


def refined(level=2, n=30):
    f = TetForest.uniform(unit_cube_roots(), level)
    flags = np.zeros(f.n_elements, np.int8)
    flags[:n] = 1
    flags = f.balance_flags(flags)
    return f.adapt(flags)[0]


class TestTetForest:
    def test_uniform_tiles_cube(self):
        f = TetForest.uniform(unit_cube_roots(), 2)
        assert f.n_elements == 6 * 64
        np.testing.assert_allclose(f.volumes().sum(), 1.0, rtol=1e-12)
        assert closure_residual(f) < 1e-7

    def test_bey_children_equal_volume(self):
        f0 = TetForest.uniform(unit_cube_roots(), 1)
        f1, _ = f0.adapt(np.ones(f0.n_elements, np.int8))
        v = f1.volumes()
        np.testing.assert_allclose(v, v[0], rtol=1e-12)

    def test_adapt_closure_balance(self):
        f = refined()
        assert np.isclose(f.volumes().sum(), 1.0)
        assert closure_residual(f) < 1e-7
        faces = f.build_faces()
        lv = f.level.astype(int)
        assert np.abs(lv[faces["left"]] - lv[faces["right"]]).max() <= 1

    def test_coarsen_roundtrip_exact(self):
        f0 = TetForest.uniform(unit_cube_roots(), 1)
        f1, _ = f0.adapt(np.ones(f0.n_elements, np.int8))
        f2, _ = f1.adapt(-np.ones(f1.n_elements, np.int8))
        assert f2.n_elements == f0.n_elements
        np.testing.assert_array_equal(f2.verts, f0.verts)

    def test_boundary_faces_on_cube_surface(self):
        f = refined()
        faces = f.build_faces()
        X, _, centers = f._geometry()
        # boundary face normals are axis-aligned (cube walls)
        n2 = faces["b_normal"]
        assert np.allclose(np.abs(n2).max(axis=0), 1.0, atol=1e-6)


def ic_blob(c):
    u = np.zeros((5, len(c)), np.float32)
    r2 = ((c - 0.5) ** 2).sum(axis=1)
    u[0] = 1.0 + 0.5 * np.exp(-r2 / 0.02)
    u[4] = 2.5 * u[0]
    return u


def ic_uniform(c):
    u = np.zeros((5, len(c)), np.float32)
    u[0] = 1.0
    u[4] = 2.5
    return u


class TestTetSolver:
    def test_free_stream_on_hanging_tet_mesh(self):
        mesh = TetForestMesh.from_forest(refined())
        s = CompressibleEulerSolver(mesh, ic_uniform)
        dt = s.compute_timestep()
        for _ in range(3):
            s.iterate(dt)
        u = s.conserved_state()
        np.testing.assert_allclose(u[0], 1.0, atol=1e-5)
        np.testing.assert_allclose(u[1:4], 0.0, atol=1e-5)

    def test_tet_amr_cycle(self):
        mgr = tet_manager(level=1, amr=AMRConfig(min_level=0, max_level=3,
                                                 refine_threshold=0.3))
        s = CompressibleEulerSolver(mgr, ic_blob)
        m0 = s.compute_integral()
        n0 = s.n_elements
        for _ in range(3):
            dt = s.compute_timestep()
            for _ in range(5):
                s.iterate(dt)
            s.adapt()
        assert s.n_elements != n0
        assert np.isfinite(s.conserved_state()).all()
        np.testing.assert_allclose(s.compute_integral(), m0, rtol=1e-5)
