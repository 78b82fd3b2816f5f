"""Tests for the enum-keyed SoA VariableStore (ref MemoryManager parity)."""

import enum

import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import VariableStore, bucket_capacity


class Var(enum.IntEnum):
    Rho = 0
    Rho_v1 = 1
    Rho_e = 2


class Step(enum.IntEnum):
    Prev = 0
    Next = 1


def test_bucket_capacity_monotone_geometric():
    caps = [bucket_capacity(n) for n in [1, 100, 256, 257, 1000, 5000, 50000]]
    assert caps == sorted(caps)
    assert all(c >= n for c, n in zip(caps, [1, 100, 256, 257, 1000, 5000, 50000]))
    # few distinct buckets under repeated small growth (recompile bound)
    ns = np.unique([bucket_capacity(n) for n in range(1, 20000)])
    assert len(ns) < 15


def test_set_get_roundtrip():
    s = VariableStore.create(Var, Step, n_elements=100)
    rho = jnp.arange(100, dtype=jnp.float32)
    s = s.set(Step.Prev, Var.Rho, rho)
    np.testing.assert_array_equal(np.asarray(s.get(Step.Prev, Var.Rho))[:100], rho)
    # other fields untouched
    assert float(s.get(Step.Next, Var.Rho).sum()) == 0.0
    # multi-variable get (ref variadic accessor get(Rho, Rho_v1, ...))
    multi = s.get(Step.Prev, [Var.Rho, Var.Rho_e])
    assert multi.shape == (2, s.capacity)


def test_volume_and_mask():
    s = VariableStore.create(Var, Step, n_elements=10)
    s = s.set_volume(jnp.ones(10))
    assert float(s.get_volume().sum()) == 10.0
    mask = s.element_mask()
    assert mask.sum() == 10 and mask.shape == (s.capacity,)


def test_resize_changes_capacity_only_when_bucket_crossed():
    s = VariableStore.create(Var, Step, n_elements=100)
    cap0 = s.capacity
    s2 = s.resize(cap0)  # still fits in the same bucket
    assert s2.capacity == cap0
    s3 = s.resize(cap0 + 1)
    assert s3.capacity > cap0
    # contents not preserved across bucket change (reference contract)
    assert float(s3.data.sum()) == 0.0


def test_store_is_pytree():
    import jax

    s = VariableStore.create(Var, Step, n_elements=4)
    leaves = jax.tree_util.tree_leaves(s)
    assert len(leaves) == 2  # data + volume; n_elements is static
    out = jax.jit(lambda st: st.get(Step.Prev, Var.Rho).sum())(s)
    assert float(out) == 0.0


def test_solver_store_views():
    """Solvers expose enum-keyed VariableStore snapshots (MemoryManager
    API parity, memory_manager.h:350-457)."""
    import numpy as np

    from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.mesh.uniform import uniform_mesh
    from t8gpu_tpu.models.compressible_euler import (
        CompressibleEulerSolver, StepList, VariableList)
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    ic = lambda c: kh_planar(c, dim=2)
    s = CompressibleEulerSolver(uniform_mesh(3, dim=2), ic)
    store = s.as_store()
    np.testing.assert_allclose(
        np.asarray(store.get(StepList.Prev, VariableList.Rho))[: s.n_elements],
        s.conserved_state()[0], rtol=1e-6)
    np.testing.assert_allclose(float(store.get_volume().sum()), 1.0, rtol=1e-5)

    s2 = SubgridCompressibleEulerSolver(
        SubgridMesh.from_forest(Forest.uniform(2, dim=2), SUBGRID_4x4), ic)
    store2 = s2.as_store()
    np.testing.assert_allclose(
        np.asarray(store2.get(StepList.Prev, VariableList.Rho))[
            : s2.n_elements * 16],
        s2.conserved_state()[0].reshape(-1), rtol=1e-6)
    np.testing.assert_allclose(float(store2.get_volume().sum()), 1.0, rtol=1e-5)
