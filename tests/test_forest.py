"""Tests for the adaptive Morton forest (t8gpu_tpu/mesh/forest.py).

Validates the t8code-replacement semantics the reference relies on:
adapt-callback flags (mesh_manager.inl:137-161), family coarsening,
2:1 balance (t8_forest_set_balance), SFC ordering, the face dedup rule
(mesh_manager.inl:396-424) and the hanging-face metadata
(subgrid_mesh_manager.h:486-488).
"""

import numpy as np
import pytest

from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.mesh.uniform import uniform_mesh


def canonical_faces(left, right, normal, area):
    """Order-independent canonical face multiset for comparison."""
    rows = []
    for i in range(len(left)):
        axis = int(np.argmax(np.abs(normal[:, i])))
        sign = int(np.sign(normal[axis, i]))
        rows.append((int(left[i]), int(right[i]), axis, sign, float(area[i])))
    return sorted(rows)


@pytest.mark.parametrize("dim,level", [(2, 2), (2, 3), (3, 2)])
@pytest.mark.parametrize("periodic", [True, False])
def test_uniform_forest_matches_uniform_mesh(dim, level, periodic):
    forest = Forest.uniform(level, dim=dim, periodic=periodic)
    f = forest.build_faces()
    um = uniform_mesh(level, dim=dim, periodic=periodic)

    n = forest.n_elements
    assert n == (1 << level) ** dim
    np.testing.assert_allclose(forest.volumes().sum(), 1.0, rtol=1e-12)

    # same interior face multiset (uniform mesh emits all +axis faces; the
    # forest emits per the dedup rule — same faces up to normal sign)
    def undirected(rows):
        out = []
        for l, r, axis, sign, area in rows:
            if sign < 0:
                # flipping the normal swaps the roles of left/right only for
                # comparison purposes when l==r it is identical
                out.append((min(l, r), max(l, r), axis, round(area, 12), l == r))
            else:
                out.append((min(l, r), max(l, r), axis, round(area, 12), l == r))
        return sorted(out)

    F = um.conn.n_faces
    rows_u = canonical_faces(
        np.asarray(um.conn.left)[:F], np.asarray(um.conn.right)[:F],
        np.asarray(um.conn.normal)[:, :F], np.asarray(um.conn.area)[:F])
    rows_f = canonical_faces(f["left"], f["right"], f["normal"], f["area"])
    assert len(rows_f) == len(rows_u)
    assert undirected(rows_f) == undirected(rows_u)

    if not periodic:
        assert f["b_elem"] is not None
        assert len(f["b_elem"]) == 2 * dim * (1 << level) ** (dim - 1)


@pytest.mark.parametrize("dim", [2, 3])
def test_refine_all_gives_uniform(dim):
    forest = Forest.uniform(1, dim=dim)
    fine, remap = forest.adapt(np.ones(forest.n_elements, np.int8))
    ref = Forest.uniform(2, dim=dim, max_refine_level=forest.L)
    assert fine.n_elements == ref.n_elements
    np.testing.assert_array_equal(fine.anchor, ref.anchor)
    np.testing.assert_array_equal(fine.level, ref.level)
    # each new element copies from its parent
    k = 1 << dim
    np.testing.assert_array_equal(remap.src_count, 1)
    np.testing.assert_array_equal(remap.src_start, np.repeat(np.arange(forest.n_elements), k))


@pytest.mark.parametrize("dim", [2, 3])
def test_coarsen_all_gives_uniform(dim):
    forest = Forest.uniform(2, dim=dim)
    coarse, remap = forest.adapt(-np.ones(forest.n_elements, np.int8))
    ref = Forest.uniform(1, dim=dim, max_refine_level=forest.L)
    assert coarse.n_elements == ref.n_elements
    np.testing.assert_array_equal(coarse.anchor, ref.anchor)
    k = 1 << dim
    np.testing.assert_array_equal(remap.src_count, k)
    np.testing.assert_array_equal(remap.src_start, np.arange(coarse.n_elements) * k)


def test_partial_coarsen_requires_full_family():
    forest = Forest.uniform(1, dim=2)  # exactly one family of 4
    flags = np.array([-1, -1, -1, 0], np.int8)
    new, remap = forest.adapt(flags)
    # family incomplete -> nothing happens
    assert new.n_elements == 4
    np.testing.assert_array_equal(remap.src_count, 1)


def test_volume_conservation_under_adapt():
    rng = np.random.default_rng(0)
    forest = Forest.uniform(2, dim=2)
    for _ in range(5):
        flags = rng.integers(-1, 2, forest.n_elements).astype(np.int8)
        forest, _ = forest.adapt(flags)
        forest, _ = forest.balance()
        np.testing.assert_allclose(forest.volumes().sum(), 1.0, rtol=1e-12)
        # SFC order maintained
        assert (np.diff(forest.code.astype(np.int64)) > 0).all()


@pytest.mark.parametrize("dim", [2, 3])
def test_balance_enforces_2to1(dim):
    forest = Forest.uniform(1, dim=dim)
    # refine element 0 twice -> level-3 elements adjacent to level-1
    for _ in range(2):
        flags = np.zeros(forest.n_elements, np.int8)
        flags[0] = 1
        forest, _ = forest.adapt(flags)
    balanced, _ = forest.balance()
    f = balanced.build_faces()
    assert np.abs(f["level_difference"]).max() <= 1
    np.testing.assert_allclose(balanced.volumes().sum(), 1.0, rtol=1e-12)


def test_face_dedup_hanging_faces():
    """After refining one element, its faces split into subfaces emitted by
    the finer side, with level_difference=1 and correct areas."""
    forest = Forest.uniform(1, dim=2)
    flags = np.zeros(4, np.int8)
    flags[0] = 1
    forest, _ = forest.adapt(flags)
    assert forest.n_elements == 7
    f = forest.build_faces()
    # per-element surface closure: interior faces hit each side once
    areas = np.zeros(forest.n_elements)
    np.add.at(areas, f["left"], f["area"])
    np.add.at(areas, f["right"], f["area"])
    h = forest.edge_lengths()
    np.testing.assert_allclose(areas, 4 * h, rtol=1e-6)
    # hanging faces have ldiff = 1 and the finer element's face area:
    # each of the 4 children has 2 faces toward a coarse neighbor
    # (periodic wrap makes every side of the refined quad hanging)
    hang = f["level_difference"] == 1
    assert hang.sum() == 8
    np.testing.assert_allclose(f["area"][hang], 0.25, rtol=1e-6)


def test_flags_from_criteria_semantics():
    forest = Forest.uniform(1, dim=2)
    crit = np.array([20.0, 0.0, 0.0, 0.0])
    flags = forest.flags_from_criteria(crit, b=10.0, min_level=0, max_level=4)
    # element 0 refines; family NOT coarsened because one member refines
    np.testing.assert_array_equal(flags, [1, 0, 0, 0])
    crit = np.zeros(4)
    flags = forest.flags_from_criteria(crit, b=10.0, min_level=0, max_level=4)
    np.testing.assert_array_equal(flags, [-1, -1, -1, -1])
    # at min_level no coarsening
    flags = forest.flags_from_criteria(crit, b=10.0, min_level=1, max_level=4)
    np.testing.assert_array_equal(flags, [0, 0, 0, 0])
    # at max_level no refinement
    crit = np.full(4, 100.0)
    flags = forest.flags_from_criteria(crit, b=10.0, min_level=0, max_level=1)
    np.testing.assert_array_equal(flags, [0, 0, 0, 0])


def test_neighbor_offset_hanging():
    """neighbor_offset points at the face-adjacent probe cell inside the
    coarse neighbor, tangentially at the fine element's anchor."""
    forest = Forest.uniform(1, dim=2)
    flags = np.zeros(4, np.int8)
    flags[0] = 1  # refine lower-left
    forest, _ = forest.adapt(flags)
    f = forest.build_faces()
    size = forest.sizes()
    for i in range(len(f["left"])):
        l, r = f["left"][i], f["right"][i]
        off = f["neighbor_offset"][i]
        # offset lies inside the right element
        assert (off >= 0).all() and (off < size[r]).all()
        ax = f["axis"][i]
        if f["sign"][i] > 0:
            assert off[ax] == 0
        else:
            assert off[ax] == size[r] - 1


def test_forest_mesh_adapter_runs_solver_smoke():
    """ForestMesh plugs into the plain Euler solver (uniform forest)."""
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar

    forest = Forest.uniform(3, dim=2)
    mesh = ForestMesh.from_forest(forest)
    solver = CompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2))
    m0 = solver.compute_integral()
    for _ in range(5):
        solver.iterate(1e-3)
    assert abs(solver.compute_integral() - m0) < 1e-4 * abs(m0)


def test_write_mesh_vtu(tmp_path):
    """Mesh debug export (level / element_id / shard fields)."""
    from t8gpu_tpu.io.vtk import write_mesh_vtu
    from t8gpu_tpu.parallel.partition import partition_elements

    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))
    mesh = ForestMesh.from_forest(forest)
    bounds = partition_elements(forest.n_elements, 4)
    p = write_mesh_vtu(str(tmp_path / "mesh.vtu"), mesh, bounds)
    text = open(p).read()
    assert "level" in text and "shard" in text


def test_per_axis_periodicity_channel():
    """periodic=(True, False) builds a channel: x wraps (no x-walls),
    y has reflective walls; face counts are exact, adapt/balance preserve
    the mixed periodicity, and checkpoints round-trip it."""
    import numpy as np

    from t8gpu_tpu.mesh.forest import Forest

    f = Forest.uniform(3, dim=2, periodic=(True, False))
    faces = f.build_faces()
    # 8x8 grid: 64 x-faces (wrapped) + 56 y-faces interior, 16 y-walls
    assert len(faces["left"]) == 120
    assert len(faces["b_elem"]) == 16
    assert f.periodic_axes == (True, False)

    flags = np.zeros(f.n_elements, np.int8)
    flags[0] = 1
    f2, _ = f.adapt(f.balance_flags(flags))
    assert f2.periodic_axes == (True, False)

    import os
    import tempfile

    from t8gpu_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    u = np.random.default_rng(0).random((5, f2.n_elements)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "chan.npz")
        save_checkpoint(p, f2, u, {"step": 1})
        f3, u3, meta = load_checkpoint(p)
    assert f3.periodic_axes == (True, False)
    assert np.array_equal(u3, u)

    # legacy bool encodings still round-trip
    assert Forest.uniform(2, dim=3, periodic=False).periodic_axes == \
        (False, False, False)
