"""Sharded subgrid solver vs single-device subgrid solver (8 CPU shards)."""

import numpy as np
import pytest

from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver
from t8gpu_tpu.utils.config import AMRConfig


@pytest.mark.parametrize("periodic", [True, False])
def test_sharded_subgrid_matches_single(periodic):
    forest = Forest.uniform(3, dim=2, periodic=periodic)
    ic = lambda c: kh_planar(c, dim=2)
    ref = SubgridCompressibleEulerSolver(
        SubgridMesh.from_forest(forest, SUBGRID_4x4), ic)
    sh = ShardedSubgridEulerSolver(forest, SUBGRID_4x4, ic)
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    u_ref = ref.conserved_state()
    u_sh = sh.conserved_state()
    np.testing.assert_allclose(u_sh, u_ref, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(sh.compute_timestep(), ref.compute_timestep(),
                               rtol=1e-5)


def test_sharded_subgrid_hanging_faces_match():
    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[[0, 5]] = 1
    flags = forest.balance_flags(flags)
    forest, _ = forest.adapt(flags)

    ic = lambda c: kh_planar(c, dim=2)
    ref = SubgridCompressibleEulerSolver(
        SubgridMesh.from_forest(forest, SUBGRID_4x4), ic)
    sh = ShardedSubgridEulerSolver(forest, SUBGRID_4x4, ic)
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(), ref.conserved_state(),
                               rtol=2e-5, atol=1e-6)


def test_sharded_subgrid_amr_cycle_matches_single():
    """The distributed AMR cycle produces the same forest and (close) state
    as the single-device cycle."""
    from t8gpu_tpu.models.subgrid_euler import subgrid_manager

    amr = AMRConfig(min_level=1, max_level=3, refine_threshold=0.02)
    ic = lambda c: kh_planar(c, dim=2)
    ref = SubgridCompressibleEulerSolver(
        subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4, amr), ic)
    sh = ShardedSubgridEulerSolver(Forest.uniform(2, dim=2), SUBGRID_4x4,
                                   ic, amr=amr)
    m0 = sh.compute_integral()
    dt = 2e-3
    for _ in range(2):
        for _ in range(5):
            ref.iterate(dt)
            sh.iterate(dt)
        ref.adapt()
        # zero-lag prefetch == plain adapt (exercises the pipelined path)
        sh.adapt_prefetch()
        sh.adapt()
        ref_forest = ref.manager.forest
        np.testing.assert_array_equal(sh.forest.level, ref_forest.level)
        np.testing.assert_array_equal(sh.forest.anchor, ref_forest.anchor)
    np.testing.assert_allclose(sh.conserved_state(), ref.conserved_state(),
                               rtol=5e-5, atol=2e-6)
    assert np.isfinite(sh.conserved_state()).all()
    np.testing.assert_allclose(sh.compute_integral(), m0, rtol=5e-4)


def test_sharded_subgrid_iterate_many_matches_loop():
    forest = Forest.uniform(2, dim=2)
    ic = lambda c: kh_planar(c, dim=2)
    s1 = ShardedSubgridEulerSolver(forest, SUBGRID_4x4, ic)
    s2 = ShardedSubgridEulerSolver(forest, SUBGRID_4x4, ic)
    for _ in range(4):
        s1.iterate(1e-3)
    s2.iterate_many(4, 1e-3)
    np.testing.assert_allclose(s1.conserved_state(), s2.conserved_state(),
                               rtol=1e-6, atol=1e-7)


def test_sharded_subgrid_3d_matches_single():
    from t8gpu_tpu.memory.subgrid import SUBGRID_4x4x4

    forest = Forest.uniform(2, dim=3)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))

    ic = lambda c: kh_planar(c, dim=3)
    ref = SubgridCompressibleEulerSolver(
        SubgridMesh.from_forest(forest, SUBGRID_4x4x4), ic)
    sh = ShardedSubgridEulerSolver(forest, SUBGRID_4x4x4, ic)
    dt = 1e-3
    for _ in range(3):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(), ref.conserved_state(),
                               rtol=2e-5, atol=1e-6)


def test_sharded_fused_glue_amr_walls_interpret():
    """The sharded RK-fused path with walls + hanging-fine extras
    (T8GPU_PALLAS=interpret, the glue TPU multichip runs take) == the XLA
    stencil path, on a NON-periodic pre-adapted forest."""
    import os

    import jax
    import numpy as np

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

    forest = Forest.uniform(2, dim=2, periodic=False)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))
    spec = SubgridSpec((8, 8))
    ic = lambda c: kh_planar(c, dim=2)

    def run(n=3):
        s = ShardedSubgridEulerSolver(forest, spec, ic,
                                      devices=jax.devices()[:4])
        s.iterate_many(n, 5e-4)
        return s.conserved_state()

    u_ref = run()                       # XLA path (kernel off on CPU)
    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        u_k = run()
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                               rtol=2e-5, atol=2e-6)


class TestShardedSubgridOrder2:
    """Sharded subgrid MUSCL (sharded_subgrid_flux_divergence_muscl): the
    whole-element halo already carries the neighbor layers the slopes
    need, so no extra halo round — must match the single-device order-2
    subgrid path exactly (same math, same inputs on both face sides)."""

    def test_matches_single_device(self):
        from t8gpu_tpu.utils.config import EulerConfig

        spec = SUBGRID_4x4
        cfg = EulerConfig(order=2)
        f = Forest.uniform(3, dim=2)
        ic = lambda c: kh_planar(c, dim=2)
        ref = SubgridCompressibleEulerSolver(
            SubgridMesh.from_forest(f, spec), ic, config=cfg)
        sh = ShardedSubgridEulerSolver(f, spec, ic, config=cfg)
        dt = 1e-3
        for _ in range(5):
            ref.iterate(dt)
            sh.iterate(dt)
        np.testing.assert_allclose(
            sh.conserved_state().reshape(5, -1),
            ref.conserved_state().reshape(5, -1), rtol=2e-5, atol=2e-6)

    def test_hanging_matches_single_device(self):
        """2:1 faces (first-order closure) + equal faces (second order)
        across shard boundaries == single device."""
        import numpy as _np

        from t8gpu_tpu.utils.config import EulerConfig

        f = Forest.uniform(2, dim=2)
        c = f.centers()
        flags = _np.where((c[:, 1] > 0.4) & (c[:, 1] < 0.6), 1, 0)
        f, _ = f.adapt(f.balance_flags(flags.astype(_np.int8)))
        spec = SUBGRID_4x4
        cfg = EulerConfig(order=2)
        ic = lambda cc: kh_planar(cc, dim=2)
        ref = SubgridCompressibleEulerSolver(
            SubgridMesh.from_forest(f, spec), ic, config=cfg)
        sh = ShardedSubgridEulerSolver(f, spec, ic, config=cfg)
        dt = 5e-4
        m0 = sh.compute_integral()
        for _ in range(5):
            ref.iterate(dt)
            sh.iterate(dt)
        np.testing.assert_allclose(
            sh.conserved_state().reshape(5, -1),
            ref.conserved_state().reshape(5, -1), rtol=2e-5, atol=2e-6)
        assert abs(sh.compute_integral() - m0) / m0 < 1e-5

    def test_fused_glue_interpret_matches_xla(self):
        """The sharded fused-MUSCL dispatch (T8GPU_PALLAS=interpret, the
        glue TPU multichip order-2 runs take: muscl_side_inputs gathering
        from the halo-extended axis + fused_muscl_pallas inside shard_map)
        == the shared muscl_core stencil, on a hanging non-periodic
        forest."""
        import os

        import jax
        import numpy as _np

        from t8gpu_tpu.memory.subgrid import SubgridSpec
        from t8gpu_tpu.utils.config import EulerConfig

        f = Forest.uniform(2, dim=2, periodic=False)
        flags = _np.zeros(f.n_elements, _np.int8)
        flags[0] = 1
        f, _ = f.adapt(f.balance_flags(flags))
        spec = SubgridSpec((8, 8))
        cfg = EulerConfig(order=2)
        ic = lambda c: kh_planar(c, dim=2)

        def run(n=3):
            s = ShardedSubgridEulerSolver(f, spec, ic, config=cfg,
                                          devices=jax.devices()[:4])
            s.iterate_many(n, 5e-4)
            return s.conserved_state()

        u_ref = run()                   # XLA path (kernel off on CPU)
        os.environ["T8GPU_PALLAS"] = "interpret"
        jax.clear_caches()
        try:
            u_k = run()
        finally:
            os.environ.pop("T8GPU_PALLAS", None)
            jax.clear_caches()
        np.testing.assert_allclose(np.asarray(u_k), np.asarray(u_ref),
                                   rtol=2e-5, atol=2e-6)
