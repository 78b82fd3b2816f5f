"""Device-side per-step observable recording (models/observables.py).

`iterate_record` must produce EXACTLY the trajectory of `iterate_many`
plus per-step global reductions — one [n_steps, K] device array per
batch (the tunnel-latency-free replacement for per-step host sampling;
the reference's only diagnostic is an on-demand host integral,
solver.cu:190-211).
"""

import numpy as np
import pytest

from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.utils.config import EulerConfig

N_STEPS = 12


def _solver(**cfg):
    mesh = ForestMesh.from_forest(Forest.uniform(4, dim=2))
    return CompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2),
                                   config=EulerConfig(**cfg))


def test_record_matches_stepwise():
    """The recorded columns equal the per-step host-sampled diagnostics
    of an identically-stepped twin solver."""
    a, b = _solver(), _solver()
    dt = 0.5 * float(a.compute_timestep())

    rows = np.asarray(a.iterate_record(
        N_STEPS, dt, observables=("mass", "total_energy", "entropy")))
    assert rows.shape == (N_STEPS, 3)

    expect = []
    for _ in range(N_STEPS):
        b.iterate(dt)
        expect.append((b.compute_integral(),
                       float((np.asarray(b.u[4]) *
                              np.asarray(b.volume)).sum()),
                       b.compute_entropy()))
    np.testing.assert_allclose(rows, np.array(expect), rtol=2e-5)

    # and the final states agree: recording does not perturb stepping
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                               rtol=1e-5, atol=1e-6)


def test_record_conservation_and_entropy():
    """Mass/momentum/energy columns are constant to f32 roundoff on the
    periodic domain and the entropy column is non-increasing (the
    KEPES entropy-stability audit, now as a per-step history)."""
    s = _solver()
    dt = 0.5 * float(s.compute_timestep())
    rows = np.asarray(s.iterate_record(
        30, dt, observables=("mass", "momentum_x", "total_energy",
                             "entropy", "max_mach")))
    mass, momx, en, ent, mach = rows.T
    assert np.abs(mass - mass[0]).max() < 1e-5 * abs(mass[0])
    assert np.abs(en - en[0]).max() < 1e-5 * abs(en[0])
    # net x-momentum starts at ~0 (antisymmetric shear layer): bound the
    # drift against the characteristic momentum scale rho*|v|*V ~ mass/2
    assert np.abs(momx - momx[0]).max() < 1e-5 * abs(mass[0])
    assert (np.diff(ent) < 1e-4 * abs(ent[0])).all()   # non-increasing
    assert np.isfinite(mach).all() and (mach > 0).all()


def test_record_unknown_observable_raises():
    s = _solver()
    with pytest.raises(ValueError, match="unknown observables"):
        s.iterate_record(2, 1e-4, observables=("massy",))
    with pytest.raises(ValueError, match="at least one observable"):
        s.iterate_record(2, 1e-4, observables=())


def test_sharded_record_matches_single():
    """ShardedEulerSolver.iterate_record == the single-device history
    (the reductions ride psum/pmax inside shard_map) — including the
    max-reduced column."""
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    obs = ("mass", "total_energy", "max_mach")
    forest = Forest.uniform(4, dim=2)
    ic = lambda c: kh_planar(c, dim=2)
    single = CompressibleEulerSolver(ForestMesh.from_forest(forest), ic)
    sharded = ShardedEulerSolver(forest, ic)
    dt = 0.5 * float(single.compute_timestep())

    r1 = np.asarray(single.iterate_record(N_STEPS, dt, observables=obs))
    r2 = np.asarray(sharded.iterate_record(N_STEPS, dt, observables=obs))
    np.testing.assert_allclose(r2, r1, rtol=3e-5)


def test_sharded_subgrid_record_matches_single():
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

    obs = ("mass", "kinetic_energy", "entropy")
    forest = Forest.uniform(2, dim=2)
    spec = SubgridSpec((8, 8))
    ic = lambda c: kh_planar(c, dim=2)
    single = SubgridCompressibleEulerSolver(
        SubgridMesh.from_forest(forest, spec), ic)
    sharded = ShardedSubgridEulerSolver(forest, spec, ic)
    dt = 0.5 * float(single.compute_timestep())

    r1 = np.asarray(single.iterate_record(N_STEPS, dt, observables=obs))
    r2 = np.asarray(sharded.iterate_record(N_STEPS, dt, observables=obs))
    np.testing.assert_allclose(r2, r1, rtol=3e-5)


def test_subgrid_record():
    """The subgrid solver records the same histories: mass constant,
    final mass equals compute_integral, KE finite and positive."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2),
                                   SubgridSpec((8, 8)))
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2))
    dt = 0.5 * float(s.compute_timestep())
    rows = np.asarray(s.iterate_record(
        N_STEPS, dt, observables=("mass", "kinetic_energy")))
    assert rows.shape == (N_STEPS, 2)
    mass, ke = rows.T
    assert np.abs(mass - mass[0]).max() < 1e-5 * abs(mass[0])
    assert (ke > 0).all() and np.isfinite(ke).all()
    assert abs(mass[-1] - s.compute_integral()) < 1e-5 * abs(mass[0])


def test_blocked_record_matches_stepwise():
    """BlockedUniformEulerSolver.iterate_record (the config-1 fast path)
    equals the per-step host-sampled diagnostics of an identically
    stepped twin — the recording API survives the blocked layout."""
    from t8gpu_tpu.models.blocked_euler import BlockedUniformEulerSolver

    ic = lambda c: kh_planar(c, dim=2)
    a = BlockedUniformEulerSolver(Forest.uniform(4, dim=2), ic)
    b = BlockedUniformEulerSolver(Forest.uniform(4, dim=2), ic)
    dt = 0.5 * float(a.compute_timestep())

    rows = np.asarray(a.iterate_record(
        6, dt, observables=("mass", "total_energy")))
    assert rows.shape == (6, 2)
    expect = []
    for _ in range(6):
        b.iterate(dt)
        u = np.asarray(b.u)                           # [5, *ext, E]
        cell_vol = (np.asarray(b._inner.volumes)      # [E] -> per cell
                    / b._inner.spec.size)
        expect.append((b.compute_integral(),
                       float((u[4] * cell_vol).sum())))
    np.testing.assert_allclose(rows, np.array(expect), rtol=2e-5)
    # recording does not perturb stepping
    np.testing.assert_allclose(a.conserved_state(), b.conserved_state(),
                               rtol=1e-5, atol=1e-6)


def test_blocked_shell_record():
    """BlockedShellEulerSolver.iterate_record: mass column constant to
    roundoff (closed shell), trajectory identical to iterate_many, and
    the GSPMD-sharded subclass records the same history."""
    import jax

    from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
    from t8gpu_tpu.models.blocked_shell import (
        BlockedShellEulerSolver, ShardedBlockedShellEulerSolver)
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    forest = PrismForest.uniform(shell_roots(subdiv=1, n_layers=2), 2)
    a = BlockedShellEulerSolver(forest, kh_sphere)
    b = BlockedShellEulerSolver(forest, kh_sphere)
    sh = ShardedBlockedShellEulerSolver(forest, kh_sphere,
                                        devices=jax.devices())
    dt = 2e-4
    rows = np.asarray(a.iterate_record(
        5, dt, observables=("mass", "total_energy", "max_mach")))
    assert rows.shape == (5, 3)
    mass = rows[:, 0]
    assert np.abs(mass - mass[0]).max() < 1e-5 * abs(mass[0])
    assert np.isfinite(rows).all() and (rows[:, 2] > 0).all()

    b.iterate_many(5, dt)
    np.testing.assert_allclose(a.conserved_state(), b.conserved_state(),
                               rtol=1e-6, atol=1e-7)

    rows_sh = np.asarray(sh.iterate_record(
        5, dt, observables=("mass", "total_energy", "max_mach")))
    np.testing.assert_allclose(rows_sh, rows, rtol=3e-5)
