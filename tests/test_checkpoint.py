"""Checkpoint / resume round-trips (an extension over the reference, which
has no persistence — SURVEY.md §5)."""

import numpy as np

from t8gpu_tpu.io.checkpoint import (load_checkpoint, restore_solver,
                                     save_checkpoint, save_solver)
from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import (SubgridCompressibleEulerSolver,
                                            subgrid_manager)
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def test_forest_roundtrip(tmp_path):
    forest = Forest.uniform(3, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[:4] = [1, 0, 1, 0]
    flags = forest.balance_flags(flags)
    forest, _ = forest.adapt(flags)
    u = np.random.default_rng(0).normal(
        size=(5, forest.n_elements)).astype(np.float32)

    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, forest, u, {"step": 7})
    f2, u2, meta = load_checkpoint(p)
    assert meta["step"] == 7
    np.testing.assert_array_equal(f2.anchor, forest.anchor)
    np.testing.assert_array_equal(f2.level, forest.level)
    assert f2.L == forest.L and f2.periodic == forest.periodic
    np.testing.assert_array_equal(u2, u)


def test_plain_solver_resume_identical(tmp_path):
    """Save mid-run, restore, continue: trajectories match exactly."""
    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=2.0)
    s1 = CompressibleEulerSolver(MeshManager(Forest.uniform(3, dim=2), amr),
                                 lambda c: kh_planar(c, dim=2),
                                 config=EulerConfig(flux="hll"))
    dt = 1e-3
    for _ in range(3):
        s1.iterate(dt)
    p = str(tmp_path / "run.npz")
    save_solver(p, s1, step=3)

    s2, meta = restore_solver(p)
    assert meta["step"] == 3
    assert s2.config.flux == "hll"
    for s in (s1, s2):
        for _ in range(3):
            s.iterate(dt)
    np.testing.assert_array_equal(s1.conserved_state(), s2.conserved_state())


def test_async_checkpoint_consistent_under_stepping(tmp_path):
    """save_solver_async snapshots the state at CALL time: stepping and
    even adapting while the writer thread runs must not corrupt the
    checkpoint (device-copy defeats buffer donation; the shallow-copied
    manager freezes the forest binding).  The file equals a synchronous
    save taken at the same moment, and restoring resumes exactly."""
    from t8gpu_tpu.io.checkpoint import save_solver_async

    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=2.0)
    s = CompressibleEulerSolver(MeshManager(Forest.uniform(3, dim=2), amr),
                                lambda c: kh_planar(c, dim=2))
    dt = 1e-3
    for _ in range(3):
        s.iterate(dt)
    p_sync = str(tmp_path / "sync.npz")
    p_async = str(tmp_path / "async.npz")
    save_solver(p_sync, s, step=3)
    t = save_solver_async(p_async, s, step=3)
    # keep running — donation invalidates the old buffer, adapt rebinds
    # the forest — while the writer works
    for _ in range(3):
        s.iterate(dt)
    s.adapt()
    t.join()

    f_sync, u_sync, m_sync = __import__(
        "t8gpu_tpu.io.checkpoint", fromlist=["load_checkpoint"]
    ).load_checkpoint(p_sync)
    f_async, u_async, m_async = __import__(
        "t8gpu_tpu.io.checkpoint", fromlist=["load_checkpoint"]
    ).load_checkpoint(p_async)
    np.testing.assert_array_equal(u_sync, u_async)
    np.testing.assert_array_equal(f_sync.level, f_async.level)
    assert m_sync["step"] == m_async["step"] == 3
    # and the async checkpoint restores to a working solver
    s2, _ = restore_solver(p_async)
    s2.iterate(dt)
    assert np.isfinite(s2.conserved_state()).all()


def test_subgrid_solver_resume_identical(tmp_path):
    amr = AMRConfig(min_level=1, max_level=3, refine_threshold=0.05)
    s1 = SubgridCompressibleEulerSolver(
        subgrid_manager(Forest.uniform(2, dim=2), SUBGRID_4x4, amr),
        lambda c: kh_planar(c, dim=2))
    dt = s1.compute_timestep()
    for _ in range(3):
        s1.iterate(dt)
    s1.adapt()   # checkpoint an adapted state
    p = str(tmp_path / "run_sg.npz")
    save_solver(p, s1, step=3)

    s2, meta = restore_solver(p)
    assert meta["extents"] == [4, 4]
    assert s2.n_elements == s1.n_elements
    for s in (s1, s2):
        for _ in range(3):
            s.iterate(dt)
    np.testing.assert_array_equal(s1.conserved_state(), s2.conserved_state())


def test_checkpoint_shell_forest_roundtrip(tmp_path):
    """Shell prism / tri / tet forests checkpoint and restore exactly
    (format v2: any forest kind)."""
    import numpy as np

    from t8gpu_tpu.io.checkpoint import restore_solver, save_solver
    from t8gpu_tpu.mesh.shell_forest import shell_manager
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.utils.config import AMRConfig

    def ic(c):
        u = np.zeros((5, len(c)), np.float32)
        u[0] = 1.0 + 0.1 * c[:, 0]
        u[4] = 2.5 * u[0]
        return u

    mgr = shell_manager(subdiv=1, level=1,
                        amr=AMRConfig(min_level=0, max_level=2,
                                      refine_threshold=0.5))
    s = CompressibleEulerSolver(mgr, ic)
    dt = s.compute_timestep()
    s.iterate(dt)
    s.adapt()
    s.iterate(dt)

    path = str(tmp_path / "shell.npz")
    save_solver(path, s, step=2)
    s2, meta = restore_solver(path)
    assert meta["step"] == 2
    assert s2.n_elements == s.n_elements
    np.testing.assert_array_equal(s2.conserved_state(), s.conserved_state())
    # restored solver keeps stepping and adapting
    s2.iterate(s2.compute_timestep())
    assert np.isfinite(s2.conserved_state()).all()


def test_checkpoint_tet_forest_roundtrip(tmp_path):
    import numpy as np

    from t8gpu_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from t8gpu_tpu.mesh.tet import TetForest, unit_cube_roots

    f = TetForest.uniform(unit_cube_roots(), 1)
    flags = np.zeros(f.n_elements, np.int8)
    flags[0] = 1
    f, _ = f.adapt(f.balance_flags(flags))
    u = np.random.default_rng(0).normal(size=(5, f.n_elements)).astype(np.float32)
    path = str(tmp_path / "tet.npz")
    save_checkpoint(path, f, u, {"k": 1})
    f2, u2, meta = load_checkpoint(path)
    assert meta["k"] == 1
    np.testing.assert_array_equal(f2.verts, f.verts)
    np.testing.assert_array_equal(u2, u)
    np.testing.assert_allclose(f2.volumes(), f.volumes())


def test_sharded_solver_checkpoint_roundtrip(tmp_path):
    """Sharded (multi-chip) save -> restore, both plain and subgrid: the
    state re-shards by construction and stepping continues identically to
    the original solver (checkpoints are layout-portable)."""
    import numpy as np

    from t8gpu_tpu.io.checkpoint import restore_sharded_solver, save_solver
    from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver
    from t8gpu_tpu.utils.config import AMRConfig

    ic = lambda c: kh_planar(c, dim=2)

    amr = AMRConfig(min_level=3, max_level=5, refine_threshold=2.0)
    s = ShardedEulerSolver(Forest.uniform(4, dim=2), ic, amr=amr)
    dt = float(s.compute_timestep())
    s.iterate(dt)
    s.adapt()          # checkpoint an ADAPTED (non-uniform) mesh
    s.iterate(dt)
    path = str(tmp_path / "sharded_plain.npz")
    save_solver(path, s, step=2)
    s2, meta = restore_sharded_solver(path)
    assert meta["step"] == 2
    assert s2.n_elements == s.n_elements
    np.testing.assert_array_equal(s2.conserved_state(), s.conserved_state())
    s.iterate(dt)
    s2.iterate(dt)
    np.testing.assert_allclose(s2.conserved_state(), s.conserved_state(),
                               rtol=1e-6, atol=1e-7)

    amr_sg = AMRConfig(min_level=1, max_level=3, refine_threshold=0.02)
    sg = ShardedSubgridEulerSolver(Forest.uniform(2, dim=2), SUBGRID_4x4,
                                   ic, amr=amr_sg)
    dt = float(sg.compute_timestep())
    sg.iterate(dt)
    sg.adapt()
    sg.iterate(dt)
    path = str(tmp_path / "sharded_subgrid.npz")
    save_solver(path, sg, step=2)
    sg2, meta = restore_sharded_solver(path)
    assert meta["extents"] == [4, 4]
    assert sg2.n_elements == sg.n_elements
    np.testing.assert_array_equal(sg2.conserved_state(),
                                  sg.conserved_state())
    sg.iterate(dt)
    sg2.iterate(dt)
    np.testing.assert_allclose(sg2.conserved_state(), sg.conserved_state(),
                               rtol=1e-6, atol=1e-7)


def test_checkpoint_preserves_float64(tmp_path):
    """EulerConfig(dtype="float64") checkpoints must not truncate to f32:
    a save/restore roundtrip stays bit-identical in f64 (the exact-restart
    contract holds for every supported dtype)."""
    import jax
    import jax.numpy as jnp

    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=2.0)
    with jax.enable_x64(True):
        s = CompressibleEulerSolver(
            MeshManager(Forest.uniform(3, dim=2), amr),
            lambda c: kh_planar(c, dim=2),
            config=EulerConfig(dtype="float64"))
        for _ in range(3):
            s.iterate(1e-3)
        p = str(tmp_path / "f64.npz")
        save_solver(p, s, step=3)
        _, u, _ = load_checkpoint(p)
        assert u.dtype == np.float64
        np.testing.assert_array_equal(u, s.conserved_state())
        s2, _ = restore_solver(p)
        assert s2.u.dtype == jnp.float64
        np.testing.assert_array_equal(s2.conserved_state(),
                                      s.conserved_state())


def test_async_checkpoint_failure_is_raised(tmp_path):
    """A failed async write must be LOUD: join() re-raises, so a run can
    never believe it checkpointed when the writer thread died."""
    import pytest

    from t8gpu_tpu.io.checkpoint import save_solver_async

    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=2.0)
    s = CompressibleEulerSolver(MeshManager(Forest.uniform(3, dim=2), amr),
                                lambda c: kh_planar(c, dim=2))
    bad = str(tmp_path / "no_such_dir" / "ck.npz")
    t = save_solver_async(bad, s, step=0)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        t.join()


def test_shallow_water_checkpoint_roundtrip(tmp_path):
    """The non-Euler families checkpoint too: a ShallowWaterSolver
    save/restore resumes exactly (model dispatch via the meta tag)."""
    from t8gpu_tpu.mesh.manager import MeshManager as MM
    from t8gpu_tpu.models.shallow_water import ShallowWaterSolver

    def dam(c):
        h = 1.0 + 0.5 * (((c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.5) ** 2) < 0.02)
        return np.stack([h, np.zeros_like(h), np.zeros_like(h)])

    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=0.2)
    s = ShallowWaterSolver(MM(Forest.uniform(3, dim=2), amr), dam, g=9.81)
    s.iterate_many(3, 1e-3)
    s.adapt()
    s.iterate(1e-3)
    p = str(tmp_path / "sw.npz")
    save_solver(p, s, step=4)
    s2, meta = restore_solver(p)
    assert meta["model"] == "shallow_water" and meta["step"] == 4
    assert type(s2).__name__ == "ShallowWaterSolver"
    np.testing.assert_allclose(s2.conserved_state(), s.conserved_state(),
                               rtol=1e-6, atol=1e-7)
    s.iterate(1e-3)
    s2.iterate(1e-3)
    np.testing.assert_allclose(s2.conserved_state(), s.conserved_state(),
                               rtol=1e-6, atol=1e-7)


def test_advection_checkpoint_roundtrip(tmp_path):
    """AdvectionSolver roundtrip incl. the velocity in the metadata;
    the sharded restore rebuilds a ShardedAdvectionSolver."""
    import jax

    from t8gpu_tpu.io.checkpoint import restore_sharded_solver
    from t8gpu_tpu.mesh.manager import MeshManager as MM
    from t8gpu_tpu.models.advection import AdvectionSolver

    bump = lambda c: np.exp(-80.0 * ((c[:, 0] - 0.4) ** 2
                                     + (c[:, 1] - 0.5) ** 2))
    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=1.0)
    s = AdvectionSolver(MM(Forest.uniform(3, dim=2), amr), bump, (1.0, 0.25))
    s.iterate_many(3, 1e-3)
    p = str(tmp_path / "adv.npz")
    save_solver(p, s, step=3)
    s2, meta = restore_solver(p)
    assert meta["model"] == "advection"
    assert meta["velocity"][:2] == [1.0, 0.25]
    np.testing.assert_allclose(s2.state(), s.state(), rtol=1e-6, atol=1e-7)

    sh, _ = restore_sharded_solver(p, devices=jax.devices())
    assert type(sh).__name__ == "ShardedAdvectionSolver"
    np.testing.assert_allclose(sh.state(), s.state(), rtol=1e-6, atol=1e-7)
    s2.iterate(1e-3)
    sh.iterate(1e-3)
    np.testing.assert_allclose(sh.state(), s2.state(), rtol=1e-5, atol=1e-6)
