"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(halo exchange, partition, pmax reductions) is exercised without a TPU
slice — the strategy SURVEY.md §4 prescribes.

The platform forcing lives in t8gpu_tpu_test_bootstrap.py (a -p plugin in
pyproject addopts): it re-execs pytest with a scrubbed environment because
the container's sitecustomize eagerly initializes a TPU backend before any
conftest runs, and it must act before pytest's fd capture starts.
"""

import jax

jax.config.update("jax_enable_x64", False)  # float32 like the reference (memory_manager.h:29)

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
    "tests expect an 8-device virtual CPU mesh; got "
    f"{jax.default_backend()} x {len(jax.devices())}"
)

# -- smoke subset -------------------------------------------------------------
# `pytest -m smoke` runs ONE fast test per subsystem (~5 min on the 1-core
# CI box) vs the full suite's 60-80 CPU-min.  Curated here, not with
# per-file decorators, so the list is maintained in one place.
_SMOKE = {
    "tests/test_mesh_uniform.py::test_morton_roundtrip",
    "tests/test_forest.py::test_refine_all_gives_uniform",
    "tests/test_euler_ops.py::test_dispatch",
    "tests/test_memory_store.py::test_set_get_roundtrip",
    "tests/test_solver_euler.py::test_blocked_uniform_solver_matches_plain",
    "tests/test_subgrid.py::test_subgrid_conservation_hanging_faces",
    "tests/test_amr.py::test_remap_conserves_mass",
    "tests/test_checkpoint.py::test_plain_solver_resume_identical",
    "tests/test_native.py::test_faces_core_matches_numpy",
    "tests/test_vtk.py::test_vtu_roundtrip_2d",
    "tests/test_parallel.py::test_sharded_matches_single_device",
    "tests/test_parallel_subgrid.py::test_sharded_subgrid_matches_single",
    "tests/test_mhd.py::test_uniform_field_is_steady",
    "tests/test_shallow_water.py::test_lake_at_rest_stays_at_rest",
    "tests/test_advection.py::test_conservation_periodic",
    "tests/test_viscous.py::test_shear_decay_rate_exact",
    "tests/test_observables.py::test_record_matches_stepwise",
    "tests/test_supervise.py::test_crash_is_restarted",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        base = item.nodeid.split("[")[0]
        if base in _SMOKE:
            item.add_marker(pytest.mark.smoke)


def pytest_sessionfinish(session, exitstatus):
    """Verifiable run artifact: the round-4 full-suite log ended at
    `[100%]` with no summary (the bootstrap re-exec + fd redirection can
    swallow pytest's final report).  Emit an explicit machine-checkable
    summary line AND write it to a sidecar file so the result survives
    any output truncation."""
    import pathlib
    import time

    tr = session.config.pluginmanager.get_plugin("terminalreporter")
    counts = {}
    if tr is not None:
        for key in ("passed", "failed", "error", "skipped", "xfailed",
                    "xpassed"):
            counts[key] = len(tr.stats.get(key, []))
    line = (f"T8GPU-SUITE-RESULT exit={int(exitstatus)} "
            + " ".join(f"{k}={v}" for k, v in counts.items())
            + f" collected={session.testscollected}"
            + time.strftime(" finished=%Y-%m-%dT%H:%M:%S"))
    print("\n" + line, flush=True)
    try:
        out = pathlib.Path(__file__).resolve().parent.parent / "runs"
        out.mkdir(exist_ok=True)
        (out / "pytest_last_summary.txt").write_text(line + "\n")
    except OSError:
        pass
