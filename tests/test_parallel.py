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
    """Neighbor-scoped halo plan: every remote reference resolves to a
    valid received-round slot, and extended indices stay inside
    CL + halo_size (the received pool, NOT an all-gather of every shard)."""
    forest = Forest.uniform(3, dim=2)
    conn, bounds = build_sharded_connectivity(
        forest.build_faces(), forest.n_elements, 8)
    CL, H = conn.local_capacity, conn.halo_size
    left = np.asarray(conn.left)
    right = np.asarray(conn.right)
    area = np.asarray(conn.area)
    for s in range(8):
        live = area[s] > 0
        assert left[s, live].max(initial=0) < CL + H
        assert right[s, live].max(initial=0) < CL + H
    # with a 1-D SFC split of a periodic 2D mesh, only a handful of shard
    # offsets carry traffic (adjacent shards + SFC jumps) — neighbor
    # scoping, ref ghost layer mesh_manager.h:189-229
    assert 1 <= len(conn.halo_rounds) <= 6


def test_halo_pool_stays_local_as_shards_grow():
    """The received halo pool is O(local boundary), not O(S * boundary):
    it stays within a small factor of the actual per-shard remote need
    (bucket rounding) and far below the round-1 all-gather pool."""
    from t8gpu_tpu.memory.store import bucket_capacity

    forest = Forest.uniform(5, dim=2)
    faces = forest.build_faces()
    for S in (4, 8):
        conn, bounds = build_sharded_connectivity(
            faces, forest.n_elements, S)
        owner = np.searchsorted(bounds, np.arange(forest.n_elements),
                                side="right") - 1
        gl, gr = faces["left"], faces["right"]
        ol, orr = owner[gl], owner[gr]
        need = 0
        for t in range(S):
            sel = (ol == t) | (orr == t)
            refs = np.unique(np.concatenate(
                [gl[sel & (ol != t)], gr[sel & (orr != t)]]))
            need = max(need, len(refs))
        # pool within bucket-rounding of the actual need...
        assert conn.halo_size <= 4 * bucket_capacity(need, base=16)
        # ...and far below the all-gather pool S * bucket(need)
        assert conn.halo_size < S * bucket_capacity(need, base=64)


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


# ---------------------------------------------------------------------------
# Non-brick forests over the device mesh: the reference flagship is an MPI
# program on the prismed icosahedral shell (main.cu:6-47) — every element
# class is distributed there, so every forest kind must shard here.
# ---------------------------------------------------------------------------


def test_sharded_shell_matches_single_device():
    """8-shard solver on the prism shell == single-device solver."""
    from t8gpu_tpu.mesh.shell_forest import (PrismForest, ShellForestMesh,
                                             shell_roots)
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    forest = PrismForest.uniform(shell_roots(1), 1)
    ref = CompressibleEulerSolver(ShellForestMesh.from_forest(forest),
                                  kh_sphere)
    sharded = ShardedEulerSolver(forest, kh_sphere)
    assert sharded.n_shards == 8

    dt = 5e-4
    for _ in range(5):
        ref.iterate(dt)
        sharded.iterate(dt)
    np.testing.assert_allclose(sharded.conserved_state(),
                               ref.conserved_state(), rtol=2e-5, atol=1e-6)
    # CFL timesteps agree (cfl_h + pmax speed == single-device estimate)
    np.testing.assert_allclose(sharded.compute_timestep(),
                               ref.compute_timestep(), rtol=1e-5)


def test_sharded_shell_amr_cycle_matches_single_device():
    """Distributed shell AMR cycle (criteria -> balanced adapt -> device
    remap -> reshard) produces the same mesh and state as single-device."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.mesh.shell_forest import (PrismForest, ShellForestMesh,
                                             shell_roots)
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    amr = AMRConfig(min_level=0, max_level=2, refine_threshold=8.0)
    forest = PrismForest.uniform(shell_roots(1), 1)
    mgr = MeshManager(forest, amr, mesh_factory=ShellForestMesh.from_forest)
    ref = CompressibleEulerSolver(mgr, kh_sphere)
    sharded = ShardedEulerSolver(forest, kh_sphere, amr=amr)

    dt = 5e-4
    m0 = sharded.compute_integral()
    for _ in range(2):
        for _ in range(5):
            ref.iterate(dt)
            sharded.iterate(dt)
        ref.adapt()
        # zero-lag prefetch == plain adapt (exercises the pipelined path)
        sharded.adapt_prefetch()
        sharded.adapt()
    assert sharded.n_elements == ref.n_elements
    np.testing.assert_allclose(sharded.conserved_state(),
                               ref.conserved_state(), rtol=5e-5, atol=1e-6)
    # mass conserved through the distributed remaps
    np.testing.assert_allclose(sharded.compute_integral(), m0, rtol=2e-4)


def test_sharded_tri_and_tet():
    """Planar-tri and tet forests step + adapt over the device mesh."""
    from t8gpu_tpu.mesh.tet import TetForest, unit_cube_roots
    from t8gpu_tpu.mesh.tri import TriForest, unit_square_roots

    ic2 = lambda c: kh_planar(c, dim=2)
    ic3 = lambda c: kh_planar(c, dim=3)
    for forest, ic in ((TriForest.uniform(unit_square_roots(), 3), ic2),
                       (TetForest.uniform(unit_cube_roots(), 1), ic3)):
        solver = ShardedEulerSolver(
            forest, ic,
            amr=AMRConfig(min_level=0, max_level=4, refine_threshold=1.0))
        m0 = solver.compute_integral()
        dt = float(solver.compute_timestep())
        for _ in range(3):
            solver.iterate(dt)
        solver.adapt()
        solver.iterate(dt)
        assert np.isfinite(solver.conserved_state()).all()
        np.testing.assert_allclose(solver.compute_integral(), m0, rtol=2e-4)


class TestShardedOrder2:
    """Sharded MUSCL (halo.sharded_flux_divergence_muscl): cross-shard
    faces are duplicated, gradients/alpha are owner-computed and shipped
    in a second halo round — the result must match the single-device
    order-2 path (ops/reconstruct.py) to summation-order tolerance."""

    @pytest.mark.parametrize("periodic", [True, False])
    def test_matches_single_device(self, periodic):
        from t8gpu_tpu.utils.config import EulerConfig

        forest = Forest.uniform(4, dim=2, periodic=periodic)
        ic = lambda c: kh_planar(c, dim=2)
        cfg = EulerConfig(order=2)

        ref = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic,
                                      config=cfg)
        sharded = ShardedEulerSolver(forest, ic, config=cfg)
        dt = 1e-3
        for _ in range(5):
            ref.iterate(dt)
            sharded.iterate(dt)
        np.testing.assert_allclose(sharded.conserved_state(),
                                   ref.conserved_state(),
                                   rtol=2e-5, atol=2e-6)

    def test_venkat_matches_single_device(self):
        from t8gpu_tpu.utils.config import EulerConfig

        forest = Forest.uniform(4, dim=2)
        ic = lambda c: kh_planar(c, dim=2)
        cfg = EulerConfig(order=2, limiter="venkat")
        ref = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic,
                                      config=cfg)
        sharded = ShardedEulerSolver(forest, ic, config=cfg)
        dt = 1e-3
        for _ in range(5):
            ref.iterate(dt)
            sharded.iterate(dt)
        np.testing.assert_allclose(sharded.conserved_state(),
                                   ref.conserved_state(),
                                   rtol=2e-5, atol=2e-6)

    def test_hanging_forest_matches_single_device(self):
        from t8gpu_tpu.utils.config import EulerConfig

        forest = Forest.uniform(3, dim=2)
        c = forest.centers()
        flags = forest.balance_flags(
            (np.abs(c[:, 1] - 0.5) < 0.15).astype(np.int8))
        forest, _ = forest.adapt(flags)

        ic = lambda c: kh_planar(c, dim=2)
        cfg = EulerConfig(order=2)
        ref = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic,
                                      config=cfg)
        sharded = ShardedEulerSolver(forest, ic, config=cfg)
        dt = 1e-3
        for _ in range(5):
            ref.iterate(dt)
            sharded.iterate(dt)
        np.testing.assert_allclose(sharded.conserved_state(),
                                   ref.conserved_state(),
                                   rtol=2e-5, atol=2e-6)

    def test_shell_order2_sharded(self):
        """Order-2 on the sharded prism shell: mass conserved, finite."""
        from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
        from t8gpu_tpu.models.initial_conditions import kh_sphere
        from t8gpu_tpu.utils.config import EulerConfig

        forest = PrismForest.uniform(shell_roots(subdiv=1), 1)
        solver = ShardedEulerSolver(forest, kh_sphere,
                                    config=EulerConfig(order=2))
        m0 = solver.compute_integral()
        for _ in range(10):
            solver.iterate(5e-4)
        m1 = solver.compute_integral()
        assert abs(m1 - m0) / m0 < 1e-5
        assert np.isfinite(solver.conserved_state()).all()
