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
    if not LIB.exists():
        try:
            subprocess.run(["sh", str(REPO / "native" / "build.sh")],
                           check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            pytest.skip(f"native build unavailable: {e}")
    from t8gpu_tpu.mesh import _native
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
