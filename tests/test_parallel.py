"""Multi-device SPMD tests on the 8-virtual-device CPU mesh.

Validates the TPU-native replacement of the reference's MPI+CUDA-IPC
distribution (SURVEY.md §2.4): SFC partition, halo all_gather exchange,
shard-local accumulation, pmax CFL reduction, and the distributed AMR
adapt->repartition->reshard cycle, by comparing against the single-device
solver bit-for-bit-ish (same math, different summation order tolerances).
"""

import jax
import numpy as np
import pytest

from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.parallel.partition import (build_sharded_connectivity,
                                          partition_elements, shard_array,
                                          unshard_array)
from t8gpu_tpu.parallel.solver import ShardedEulerSolver
from t8gpu_tpu.utils.config import AMRConfig


def test_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 100)).astype(np.float32)
    bounds = partition_elements(100, 8)
    stacked = shard_array(x, bounds, 32)
    np.testing.assert_array_equal(unshard_array(stacked, bounds), x)


@pytest.mark.parametrize("periodic", [True, False])
def test_sharded_matches_single_device(periodic):
    """8-shard solver == single-device solver on the same uniform forest."""
    forest = Forest.uniform(4, dim=2, periodic=periodic)
    ic = lambda c: kh_planar(c, dim=2)

    ref = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic)
    sharded = ShardedEulerSolver(forest, ic)
    assert sharded.n_shards == 8

    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sharded.iterate(dt)

    u_ref = ref.conserved_state()
    u_sh = sharded.conserved_state()
    np.testing.assert_allclose(u_sh, u_ref, rtol=2e-5, atol=1e-6)
    # CFL speeds agree (pmax over shards == global max)
    np.testing.assert_allclose(sharded.compute_timestep(),
                               ref.compute_timestep(), rtol=1e-5)


def test_sharded_adapted_forest():
    """Sharded stepping on a hanging-node forest matches single device."""
    forest = Forest.uniform(3, dim=2)
    c = forest.centers()
    flags = (np.abs(c[:, 1] - 0.5) < 0.15).astype(np.int8)
    flags = forest.balance_flags(flags)
    forest, _ = forest.adapt(flags)

    ic = lambda c: kh_planar(c, dim=2)
    ref = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic)
    sharded = ShardedEulerSolver(forest, ic)
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sharded.iterate(dt)
    np.testing.assert_allclose(sharded.conserved_state(),
                               ref.conserved_state(), rtol=2e-5, atol=1e-6)


def test_sharded_amr_cycle():
    """Distributed adapt -> repartition -> reshard conserves mass and keeps
    stepping stable."""
    amr = AMRConfig(min_level=3, max_level=5, refine_threshold=2.0)
    solver = ShardedEulerSolver(Forest.uniform(4, dim=2),
                                lambda c: kh_planar(c, dim=2), amr=amr)
    m0 = solver.compute_integral()
    n0 = solver.n_elements
    for _ in range(2):
        dt = solver.compute_timestep()
        for _ in range(5):
            solver.iterate(dt)
        solver.adapt()
    assert solver.n_elements > n0      # the shear layer refines
    assert np.isfinite(solver.conserved_state()).all()
    np.testing.assert_allclose(solver.compute_integral(), m0, rtol=2e-4)


def test_halo_exchange_collective_layout():
    """The sharded connectivity references every remote element through the
    halo pool; pool slots resolve to the correct global elements."""
    forest = Forest.uniform(3, dim=2)
    conn, bounds = build_sharded_connectivity(
        forest.build_faces(), forest.n_elements, 8)
    CL, H = conn.local_capacity, conn.halo_size
    send = np.asarray(conn.send_idx)
    starts = bounds[:-1]
    # reconstruct: extended index CL + s*H + p  ->  global element
    left = np.asarray(conn.left)
    area = np.asarray(conn.area)
    f = forest.build_faces()
    global_faces = set()
    for i in range(len(f["left"])):
        a = int(np.argmax(np.abs(f["normal"][:, i])))
        global_faces.add((int(f["left"][i]), int(f["right"][i]), a,
                          int(np.sign(f["normal"][a, i]))))
    for s in range(8):
        for j in range(left.shape[1]):
            if area[s, j] == 0:
                continue
            li = left[s, j]
            if li < CL:
                g = starts[s] + li
            else:
                r, p = divmod(li - CL, H)
                g = starts[r] + send[r, p]
            assert 0 <= g < forest.n_elements


def test_sharded_iterate_many_matches_loop():
    forest = Forest.uniform(3, dim=2)
    ic = lambda c: kh_planar(c, dim=2)
    s1 = ShardedEulerSolver(forest, ic)
    s2 = ShardedEulerSolver(forest, ic)
    for _ in range(4):
        s1.iterate(1e-3)
    s2.iterate_many(4, 1e-3)
    np.testing.assert_allclose(s1.conserved_state(), s2.conserved_state(),
                               rtol=1e-6, atol=1e-7)
