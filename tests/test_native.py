"""Native (C++) forest core vs NumPy fallback: bit-identical outputs.

Builds native/libt8forest.so if a compiler is available and compares face
enumeration + flag balancing on randomized adapted forests.
"""

import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
LIB = REPO / "native" / "libt8forest.so"


@pytest.fixture(scope="module")
def native_lib():
    from t8gpu_tpu.mesh import _native
    if not _native.available():
        # missing OR stale (built before a symbol was added): (re)build
        try:
            subprocess.run(["sh", str(REPO / "native" / "build.sh")],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            pytest.skip(f"native build unavailable: {e}")
        _native._LIB, _native._TRIED = None, False
    if not _native.available():
        pytest.skip("native lib not loadable")
    return _native


def _random_forest(dim, seed, periodic=True):
    from t8gpu_tpu.mesh.forest import Forest
    rng = np.random.default_rng(seed)
    forest = Forest.uniform(2, dim=dim, periodic=periodic)
    for _ in range(3):
        flags = rng.integers(-1, 2, forest.n_elements).astype(np.int8)
        flags = _numpy_balance(forest, flags)
        forest, _ = forest.adapt(flags)
    return forest


def _numpy_balance(forest, flags):
    """Call the NumPy balance path regardless of native availability."""
    from t8gpu_tpu.mesh import _native
    saved, _native._LIB = _native._LIB, None
    try:
        return forest.balance_flags(flags)
    finally:
        _native._LIB = saved


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [True, False])
def test_faces_core_matches_numpy(native_lib, dim, periodic):
    for seed in range(3):
        forest = _random_forest(dim, seed, periodic)
        ours = native_lib.faces_core(forest.anchor, forest.level, forest.code,
                                     forest.L, forest.dim, forest.periodic)
        ref = forest._faces_core_numpy()
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("dim", [2, 3])
def test_balance_flags_matches_numpy(native_lib, dim):
    for seed in range(3):
        forest = _random_forest(dim, seed)
        rng = np.random.default_rng(100 + seed)
        flags = rng.integers(-1, 2, forest.n_elements).astype(np.int8)
        ours = native_lib.balance_flags(forest.anchor, forest.level,
                                        forest.code, forest.L, forest.dim,
                                        forest.periodic, flags)
        ref = _numpy_balance(forest, flags)
        np.testing.assert_array_equal(ours, ref)
        # and the adapt result is actually balanced
        new, _ = forest.adapt(ours)
        assert np.abs(new.build_faces()["level_difference"]).max() <= 1


def test_native_speedup_smoke(native_lib):
    """Native face walk handles a large forest quickly (sanity, not a perf
    assertion)."""
    import time
    from t8gpu_tpu.mesh.forest import Forest
    forest = Forest.uniform(9, dim=2)  # 262k elements
    t0 = time.perf_counter()
    native_lib.faces_core(forest.anchor, forest.level, forest.code,
                          forest.L, forest.dim, forest.periodic)
    assert time.perf_counter() - t0 < 5.0


def _match_numpy(forest_cls, own_cols, sub_cols):
    return forest_cls._match_core_numpy(own_cols, sub_cols)


def _hanging_shell(seed, rounds=3, p=0.4):
    from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
    rng = np.random.default_rng(seed)
    f = PrismForest.uniform(shell_roots(subdiv=1), 1)
    for _ in range(rounds):
        flags = (rng.uniform(size=f.n_elements) < p).astype(np.int8)
        flags = f.balance_flags(flags)
        f, _ = f.adapt(flags)
    return f


def _face_dict_with(native, forest):
    """Build the face dict with the native path forced on or off."""
    from t8gpu_tpu.mesh import _native
    saved_lib, saved_tried = _native._LIB, _native._TRIED
    env = os.environ.get("T8GPU_TPU_NATIVE")
    try:
        os.environ["T8GPU_TPU_NATIVE"] = "1" if native else "0"
        _native._LIB, _native._TRIED = None, False
        forest._faces = None
        forest._face_dict = None
        return forest.build_faces()
    finally:
        _native._LIB, _native._TRIED = saved_lib, saved_tried
        if env is None:
            os.environ.pop("T8GPU_TPU_NATIVE", None)
        else:
            os.environ["T8GPU_TPU_NATIVE"] = env


def _assert_face_dicts_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        if isinstance(a[k], dict):
            _assert_face_dicts_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)


def test_match_records_shell_bit_identical(native_lib):
    """t8f_match_records == the NumPy sort-based core on hanging prism
    shells: the whole face dict (pair order included) is bit-identical."""
    for seed in range(3):
        f = _hanging_shell(seed)
        _assert_face_dicts_equal(_face_dict_with(False, f),
                                 _face_dict_with(True, f))


@pytest.mark.parametrize("kind", ["tri", "tet"])
def test_match_records_simplex_bit_identical(native_lib, kind):
    """tri/tet forests share PrismForest._match_records; the native path
    must match on their hanging meshes (incl. domain-hull boundaries)."""
    if kind == "tri":
        from t8gpu_tpu.mesh.tri import TriForest, unit_square_roots
        f = TriForest.uniform(unit_square_roots(), 1)
    else:
        from t8gpu_tpu.mesh.tet import TetForest, unit_cube_roots
        f = TetForest.uniform(unit_cube_roots(), 1)
    rng = np.random.default_rng(7)
    for _ in range(3):
        flags = (rng.uniform(size=f.n_elements) < 0.4).astype(np.int8)
        flags = f.balance_flags(flags)
        f, _ = f.adapt(flags)
    _assert_face_dicts_equal(_face_dict_with(False, f),
                             _face_dict_with(True, f))


def test_match_records_triple_key_raises(native_lib):
    """A face key shared by >2 rows is a broken mesh: both paths raise."""
    from t8gpu_tpu.mesh import _native
    own = np.ascontiguousarray(
        np.tile(np.array([[5], [6], [7], [8]], np.int64), (1, 3)))
    sub = np.zeros((4, 0), np.int64)
    with pytest.raises(AssertionError):
        _native.match_records(own, sub)
    from t8gpu_tpu.mesh.shell_forest import PrismForest
    with pytest.raises(AssertionError):
        PrismForest._match_core_numpy(own, sub)
