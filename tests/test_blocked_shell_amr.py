"""Blocked shell AMR path (models/blocked_shell_amr.py): the virtual-fine
lattice stepping must be cell-exact plain FV on the adapted prism forest —
equivalence vs the gather path is the safety net, like every other fast
path in this repo (CLAUDE.md invariants)."""

import numpy as np
import pytest

from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.mesh.shell_forest import (PrismForest, ShellForestMesh,
                                         shell_roots)
from t8gpu_tpu.models.blocked_shell_amr import BlockedShellAMRSolver
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_sphere
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

AMR = AMRConfig(min_level=1, max_level=3)


def _uniform(subdiv=1, level=1, n_layers=1):
    roots = shell_roots(subdiv=subdiv, r_in=0.8, thickness=0.2,
                        n_layers=n_layers)
    return PrismForest.uniform(roots, level)


def _banded(forest, half_width=0.3):
    """One criteria-driven refinement band -> balanced forest with
    hanging faces."""
    c = forest.centers()
    flags = forest.balance_flags(
        (np.abs(c[:, 2]) < half_width).astype(np.int8))
    f2, _ = forest.adapt(flags)
    return f2


def _pair(forest, flux="kepes"):
    cfg = EulerConfig(flux=flux)
    mgr = MeshManager(forest, AMR, mesh_factory=ShellForestMesh.from_forest)
    g = CompressibleEulerSolver(mgr, kh_sphere, config=cfg)
    b = BlockedShellAMRSolver(forest, kh_sphere, amr=AMR, config=cfg)
    return g, b


def _rel_err(g, b):
    ug, ub = g.conserved_state(), b.conserved_state()
    return np.abs(ug - ub).max() / np.abs(ug).max()


def test_uniform_matches_gather_path():
    g, b = _pair(_uniform())
    assert _rel_err(g, b) == 0.0          # embedding roundtrip is exact
    for _ in range(2):
        g.iterate(1e-3)
        b.iterate(1e-3)
    assert _rel_err(g, b) < 5e-6


def test_adapted_hanging_matches_gather_path():
    f2 = _banded(_uniform())
    assert f2.level.min() < f2.level.max()    # really has hanging faces
    g, b = _pair(f2)
    for _ in range(2):
        g.iterate(1e-3)
        b.iterate(1e-3)
    assert _rel_err(g, b) < 5e-6


def test_three_level_mixed_classes_matches_gather_path():
    f2 = _banded(_uniform())
    c2 = f2.centers()
    flags = f2.balance_flags(
        ((np.abs(c2[:, 2]) < 0.12) & (f2.level == 2)).astype(np.int8))
    f3, _ = f2.adapt(flags)
    assert set(np.unique(f3.level)) == {1, 2, 3}
    g, b = _pair(f3)
    for _ in range(2):
        g.iterate(1e-3)
        b.iterate(1e-3)
    assert _rel_err(g, b) < 5e-6
    # multiple lattice classes really in play (columns at different m)
    assert sum(ch.n_cols > 0 for ch in b._classes_meta) >= 2


def test_hll_flux_variant():
    f2 = _banded(_uniform())
    g, b = _pair(f2, flux="hll")
    for _ in range(2):
        g.iterate(1e-3)
        b.iterate(1e-3)
    assert _rel_err(g, b) < 5e-6


def test_mass_conservation_through_steps_and_adapt():
    b = BlockedShellAMRSolver(_uniform(), kh_sphere, amr=AMR)
    m0 = b.compute_integral()
    b.iterate_many(10, 1e-3)
    b.adapt()
    b.iterate_many(10, 1e-3)
    m1 = b.compute_integral()
    assert abs(m1 - m0) / m0 < 1e-4       # caps are walls: mass conserved
    assert np.isfinite(b.conserved_state()).all()


def test_adapt_trajectory_matches_gather_path():
    """Same criteria/flags pipeline on both paths -> same forests and
    matching states through a full AMR cycle."""
    g, b = _pair(_uniform())
    dt = 1e-3
    for _ in range(2):
        g.iterate_many(5, dt)
        b.iterate_many(5, dt)
        g.adapt()
        b.adapt()
        assert g.n_elements == b.n_elements
        assert np.array_equal(g.manager.forest.level, b.forest.level)
    assert _rel_err(g, b) < 2e-5


def test_timestep_device_matches_gather_path():
    f2 = _banded(_uniform())
    g, b = _pair(f2)
    dtg = float(g.compute_timestep_device())
    dtb = float(b.compute_timestep_device())
    assert dtg == pytest.approx(dtb, rel=1e-5)


def test_multi_layer_shell():
    f = _uniform(subdiv=0, level=1, n_layers=2)
    g, b = _pair(_banded(f, half_width=0.5))
    for _ in range(2):
        g.iterate(1e-3)
        b.iterate(1e-3)
    assert _rel_err(g, b) < 5e-6
