"""Flagship benchmark: DOF-updates/sec/chip on 3D Euler Kelvin-Helmholtz,
subgrid elements (the BASELINE.json north-star metric).

Default invocation prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`--config amr` / `--config sphere` / `--config all` additionally measure
the dynamic-AMR cycle (BASELINE config 2/3+AMR: steps with adapt-every-50
included, so host forest work + recompile churn show up) and the
spherical-shell flagship (BASELINE config 4), one JSON line each.

The reference publishes no numbers (BASELINE.md): `vs_baseline` is measured
against a fixed nominal target of 1e9 cell-updates/s/chip — a rough
engineering estimate of the CUDA reference's subgrid throughput on an A100
(memory-bound KEPES stencils + RK3 over ~2M cells).  vs_baseline > 1 means
faster than that nominal A100 figure.
"""

import argparse
import json
import time

import numpy as np

NOMINAL_A100_DOF_RATE = 1.0e9  # cell-updates/s, see module docstring


def _slope_per_step(run_and_fetch, n1=10, n2=210, trials=3):
    """Per-step seconds as a slope over fused batches:
    (time(run(n2)+fetch) - time(run(n1)+fetch)) / (n2 - n1), min of
    `trials` — the measurement protocol from BENCHMARKS.md.  Through the
    TPU tunnel, dispatch and D2H fetch latencies are random (0.5 s to
    minutes) and `block_until_ready` is unreliable; the slope cancels
    them, the min rides out tunnel weather."""
    def one(n_lo, n_hi):
        t0 = time.perf_counter()
        run_and_fetch(n_lo)
        t1 = time.perf_counter()
        run_and_fetch(n_hi)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n_hi - n_lo)

    slopes = [one(n1, n2) for _ in range(trials)]
    pos = [s for s in slopes if s > 0]
    if pos:
        return min(pos)
    # a tunnel stall swamped every delta: widen the batch spread once.
    # Warm the wide program FIRST — a fresh static-n_steps batch size
    # means a fresh XLA compile (30-300 s) that must stay out of the
    # timed region.
    wide = n1 + 4 * (n2 - n1)
    run_and_fetch(wide)
    return max(one(n1, wide), 1e-12)


def bench_flagship():
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    # 4096 elements x 8^3 cells = 2.1M DOF on the uniform 128^3 grid.
    # Subgrid<8,8,8> computes the IDENTICAL discretization as level-5
    # Subgrid<4,4,4> (cell-exact equivalence is tested) but faster —
    # larger blocks amortize the outer-face work (BENCHMARKS.md).
    level, dim = 3, 3
    mesh = SubgridMesh.from_forest(Forest.uniform(level + 1, dim=dim),
                                   SubgridSpec((8,) * dim))
    solver = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=dim))
    n_cells = solver.n_elements * solver.spec.size

    dt = solver.compute_timestep()

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])      # result-dependent scalar fetch

    # warmup: compile both batch-size programs before timing
    run_and_fetch(10)
    run_and_fetch(210)

    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = n_cells / per_step
    print(json.dumps({
        "metric": "DOF-updates/sec/chip (3D Euler KH, 2.1M cells, "
                  "Subgrid<8,8,8>)",
        "value": value,
        "unit": "cell-updates/s",
        "vs_baseline": value / NOMINAL_A100_DOF_RATE,
    }))


def bench_plain():
    """Plain-element throughput (BASELINE config 1): 2D Euler KH, uniform
    periodic, level 8 = 65 536 elements.  Uses the production path for
    this mesh — the blocked fast lane (models/blocked_euler.py: plain
    elements as degenerate Subgrid<8,8> cells riding the fused Pallas
    kernels); the gather path remains the general-mesh fallback and is
    measured in BENCHMARKS.md."""
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.blocked_euler import BlockedUniformEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar

    forest = Forest.uniform(8, dim=2)
    solver = BlockedUniformEulerSolver(forest, lambda c: kh_planar(c, dim=2))
    dt = solver.compute_timestep()

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(410)
    per_step = _slope_per_step(run_and_fetch, n1=10, n2=410)
    assert np.isfinite(solver.conserved_state()).all()
    value = solver.n_elements / per_step
    print(json.dumps({
        "metric": "elem-updates/sec/chip (2D Euler KH, 65k plain elements, "
                  "blocked fast path)",
        "value": value,
        "unit": "elem-updates/s",
        "vs_baseline": value / 15.0e6,   # round-1 target for config 1
    }))


def bench_amr_plain():
    """Plain-element stepping on an ADAPTED mesh (BASELINE config 2's
    essence): 2D KH, dynamic AMR level 6->8 at block granularity
    (models/blocked_euler.BlockedAMREulerSolver), then the pure stepping
    slope on the adapted mesh — the path that used to fall off the
    10.8 M elem-upd/s gather cliff the moment one adapt fired
    (round-3 VERDICT item 1; the reference pays no such cliff,
    kernels.cu:135-309)."""
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.blocked_euler import BlockedAMREulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.utils.config import AMRConfig

    solver = BlockedAMREulerSolver(
        Forest.uniform(6, dim=2), lambda c: kh_planar(c, dim=2),
        amr=AMRConfig(min_level=5, max_level=8, refine_threshold=2e-4))
    dt = solver.compute_timestep_device()
    # develop the shear band + adapt twice -> a real refined band
    for _ in range(2):
        solver.iterate_many(50, dt)
        solver.adapt()
        dt = solver.compute_timestep_device()
    lv = solver._inner.mesh.forest.level
    assert lv.min() != lv.max(), "expected a non-uniform adapted mesh"

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(210)
    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = solver.n_elements / per_step
    print(json.dumps({
        "metric": "elem-updates/sec/chip (2D Euler KH, ADAPTED plain mesh "
                  f"levels {int(lv.min()) + 3}-{int(lv.max()) + 3}, "
                  f"{solver.n_elements} elements, blocked AMR path)",
        "value": value,
        "unit": "elem-updates/s",
        "vs_baseline": value / 15.0e6,   # same config-1 target
    }))


def bench_order2(limiter: str = "bj"):
    """Second-order MUSCL throughput on the flagship config (2.1M cells,
    Subgrid<8,8,8>): the fused MUSCL Pallas kernel
    (ops/pallas_kernels.fused_muscl_pallas — reconstruction + interface
    fields + fluxes VMEM-resident).  Beyond-reference physics quality at
    a measured cost multiple of the first-order flagship number.
    limiter "bj-prim" A/Bs the primitive-space reconstruction
    (ops/euler.prim_rows — the round-5 op-count restructure)."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
    from t8gpu_tpu.utils.config import EulerConfig

    level, dim = 3, 3
    mesh = SubgridMesh.from_forest(Forest.uniform(level + 1, dim=dim),
                                   SubgridSpec((8,) * dim))
    solver = SubgridCompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=dim),
        config=EulerConfig(order=2, limiter=limiter))
    n_cells = solver.n_elements * solver.spec.size
    dt = solver.compute_timestep()

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(210)
    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = n_cells / per_step
    print(json.dumps({
        "metric": "order-2 MUSCL DOF-updates/sec/chip (3D Euler KH, "
                  f"2.1M cells, fused MUSCL kernel, limiter {limiter})",
        "value": value,
        "unit": "cell-updates/s",
        "vs_baseline": value / NOMINAL_A100_DOF_RATE,
    }))


def bench_ns():
    """Viscous Navier-Stokes throughput on the flagship config (2.1M
    cells, Subgrid<8,8,8>, mu=1e-4): the in-VMEM viscous divergence rides
    the RK-fused stage kernels (ops/pallas_kernels._tile_viscous_divergence)
    — beyond-reference physics (the reference subgrid kernels are
    inviscid, examples/subgrid/kernels.inl:335-911)."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
    from t8gpu_tpu.utils.config import EulerConfig

    level, dim = 3, 3
    mesh = SubgridMesh.from_forest(Forest.uniform(level + 1, dim=dim),
                                   SubgridSpec((8,) * dim))
    solver = SubgridCompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=dim), config=EulerConfig(mu=1e-4))
    n_cells = solver.n_elements * solver.spec.size
    dt = solver.compute_timestep()

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(210)
    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = n_cells / per_step
    print(json.dumps({
        "metric": "viscous NS DOF-updates/sec/chip (3D KH, 2.1M cells, "
                  "mu=1e-4, fused viscous kernels)",
        "value": value,
        "unit": "cell-updates/s",
        "vs_baseline": value / NOMINAL_A100_DOF_RATE,
    }))


def bench_mhd():
    """GLM-MHD throughput (fourth model family, beyond-reference): the
    Orszag-Tang vortex on the 2D gather path at level 8 = 65 536
    elements, nine rows per element.  vs_baseline is the fraction of the
    EULER gather-path rate on the same mesh (10.8 M elem-upd/s,
    BENCHMARKS.md config 1 fallback) — i.e. what the 9-row MHD physics
    costs relative to the 5-row Euler arithmetic on identical mesh
    machinery."""
    from t8gpu_tpu.mesh.uniform import uniform_mesh
    from t8gpu_tpu.models.mhd import MHDSolver, orszag_tang

    solver = MHDSolver(uniform_mesh(level=8, dim=2), orszag_tang)
    dt = 0.5 * solver.compute_timestep()     # fixed dt across the batch

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(210)
    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = solver.n_elements / per_step
    print(json.dumps({
        "metric": "GLM-MHD elem-updates/sec/chip (Orszag-Tang, 65k "
                  "elements, 9 rows)",
        "value": value,
        "unit": "elem-updates/s",
        "vs_baseline": value / 10.8e6,
    }))


def bench_mhd_subgrid():
    """GLM-MHD on the dense-block scheme: Orszag-Tang on Subgrid<8,8>
    blocks at forest level 7 = 1.05 M cells (the same mesh as the 2D
    Euler subgrid config).  vs_baseline is cell-updates/s against the
    1e9 nominal, same semantics as the flagship — what the 9-row MHD
    physics sustains when the interior interfaces are dense slab-exchange
    stencils instead of per-face gathers (ops/subgrid_mhd.py)."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.mhd import orszag_tang
    from t8gpu_tpu.models.subgrid_mhd import SubgridMHDSolver

    spec = SubgridSpec((8, 8))
    mesh = SubgridMesh.from_forest(Forest.uniform(7, dim=2), spec)
    solver = SubgridMHDSolver(mesh, orszag_tang)
    dt = 0.5 * solver.compute_timestep()     # fixed dt across the batch

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(210)
    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = solver.n_elements * spec.size / per_step
    print(json.dumps({
        "metric": "GLM-MHD cell-updates/sec/chip (Orszag-Tang, "
                  "Subgrid<8,8>, 1.05M cells)",
        "value": value,
        "unit": "cell-updates/s",
        "vs_baseline": value / 1.0e9,
    }))


def bench_amr():
    """Dynamic-AMR cycle throughput (BASELINE config 2/3+AMR): 300 steps
    with adapt every 50 on the 3D subgrid solver, wall-clock INCLUDING the
    host forest work, remaps and any recompiles."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import (SubgridCompressibleEulerSolver,
                                                subgrid_manager)
    from t8gpu_tpu.utils.config import AMRConfig

    # Subgrid<8,8,8> at one level coarser == the reference's 4^3 config
    # cell-for-cell (equivalence tested); exercises the fused D-kernel +
    # XLA hanging-fine pass across adapts.
    amr = AMRConfig(min_level=2, max_level=4, refine_threshold=0.02)
    mgr = subgrid_manager(Forest.uniform(3, dim=3), SubgridSpec((8, 8, 8)),
                          amr)
    solver = SubgridCompressibleEulerSolver(mgr, lambda c: kh_planar(c, dim=3))
    dt = solver.compute_timestep_device()   # keep dt on device: no D2H

    # warm the initial bucket
    solver.iterate_many(50, dt)
    solver.u.block_until_ready()

    steps, adapt_every, lag = 300, 50, 5
    cells_advanced = 0
    t0 = time.perf_counter()
    for _ in range(steps // adapt_every):
        # AMR pipelining: criteria are computed `lag` steps before the
        # boundary and their D2H fetch overlaps the last stepping batch
        solver.iterate_many(adapt_every - lag, dt)
        solver.adapt_prefetch()
        solver.iterate_many(lag, dt)
        cells_advanced += (solver.n_elements * solver.spec.size) * adapt_every
        solver.adapt()
        dt = solver.compute_timestep_device()   # the mesh may have refined
    solver.u.block_until_ready()
    wall = time.perf_counter() - t0
    assert np.isfinite(solver.conserved_state()).all()
    print(json.dumps({
        "metric": "AMR-cycle throughput (3D KH subgrid, adapt every 50, "
                  f"{solver.n_elements} elems final)",
        "value": cells_advanced / wall,
        "unit": "cell-updates/s (incl. adapt cycles)",
        "vs_baseline": cells_advanced / wall / NOMINAL_A100_DOF_RATE,
    }))


def bench_sphere():
    """Spherical-shell flagship (BASELINE config 4): plain elements on the
    prismed icosahedral shell with dynamic AMR every 100 steps
    (ref main.cu:23-38)."""
    from t8gpu_tpu.mesh.shell_forest import shell_manager
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_sphere
    from t8gpu_tpu.utils.config import AMRConfig

    mgr = shell_manager(subdiv=2, level=1,
                        amr=AMRConfig(min_level=0, max_level=2,
                                      refine_threshold=10.0))
    solver = CompressibleEulerSolver(mgr, kh_sphere)
    dt = 5e-4                      # ref main.cu:30
    solver.iterate_many(100, dt)
    solver.u.block_until_ready()

    steps, adapt_every, lag = 300, 100, 5
    elems_advanced = 0
    t0 = time.perf_counter()
    for _ in range(steps // adapt_every):
        solver.iterate_many(adapt_every - lag, dt)
        solver.adapt_prefetch()     # D2H overlaps the last `lag` steps
        solver.iterate_many(lag, dt)
        elems_advanced += solver.n_elements * adapt_every
        solver.adapt()
    solver.u.block_until_ready()
    wall = time.perf_counter() - t0
    assert np.isfinite(solver.conserved_state()).all()
    print(json.dumps({
        "metric": "shell flagship (prismed icosahedral shell, AMR every "
                  f"100, {solver.n_elements} prisms final)",
        "value": elems_advanced / wall,
        "unit": "elem-updates/s (incl. adapt cycles)",
        "vs_baseline": elems_advanced / wall / NOMINAL_A100_DOF_RATE,
    }))


def bench_sphere_blocked():
    """Uniform-shell lattice fast path slope (models/blocked_shell.py):
    the prismed icosahedral shell at the 20k-protocol scale (subdiv 2,
    level 2, 2 layers = 40 960 prisms) stepped as per-root lattices —
    pure stepping rate, no AMR (round-4 VERDICT weak item 4: this path
    had no published TPU number)."""
    from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
    from t8gpu_tpu.models.blocked_shell import BlockedShellEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    roots = shell_roots(subdiv=2, r_in=0.8, thickness=0.2, n_layers=2)
    solver = BlockedShellEulerSolver(PrismForest.uniform(roots, 2),
                                     kh_sphere)
    dt = 5e-4                      # ref main.cu:30

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.u[0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(210)
    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = solver.n_elements / per_step
    print(json.dumps({
        "metric": f"elem-updates/sec/chip (UNIFORM shell lattice path, "
                  f"{solver.n_elements} prisms, subdiv 2 level 2)",
        "value": value,
        "unit": "elem-updates/s",
        "vs_baseline": value / 11.6e6,   # the round-2 gather-path figure
    }))


def bench_sphere_blocked_amr():
    """ADAPTED-shell lattice fast path slope (models/blocked_shell_amr.py):
    the 20k-protocol mesh after real criteria-driven adapt cycles
    (hanging faces, mixed per-root classes), stepped on the virtual-fine
    lattices — the round-4 VERDICT's missing item 2 (the north-star
    KH-sphere-with-AMR config used to step on the ~10-11 M elem-upd/s
    gather path; the reference pays no per-mesh-kind cliff,
    kernels.cu:135-309)."""
    from t8gpu_tpu.mesh.shell_forest import PrismForest, shell_roots
    from t8gpu_tpu.models.blocked_shell_amr import BlockedShellAMRSolver
    from t8gpu_tpu.models.initial_conditions import kh_sphere
    from t8gpu_tpu.utils.config import AMRConfig

    roots = shell_roots(subdiv=2, r_in=0.8, thickness=0.2, n_layers=2)
    solver = BlockedShellAMRSolver(
        PrismForest.uniform(roots, 2), kh_sphere,
        amr=AMRConfig(min_level=1, max_level=4, refine_threshold=10.0))
    dt = 5e-4                      # ref main.cu:30
    # develop the shear layer + adapt -> a real adapted shell
    for _ in range(2):
        solver.iterate_many(100, dt)
        solver.adapt()
    lv = solver.forest.level
    assert lv.min() != lv.max(), "expected a non-uniform adapted shell"

    def run_and_fetch(n):
        solver.iterate_many(n, dt)
        float(solver.us[-1][0].ravel()[0])

    run_and_fetch(10)
    run_and_fetch(210)
    per_step = _slope_per_step(run_and_fetch)
    assert np.isfinite(solver.conserved_state()).all()
    value = solver.n_elements / per_step
    print(json.dumps({
        "metric": "elem-updates/sec/chip (ADAPTED shell, levels "
                  f"{int(lv.min())}-{int(lv.max())}, {solver.n_elements} "
                  f"prisms / {solver.n_slots} lattice slots, blocked "
                  "shell AMR path)",
        "value": value,
        "unit": "elem-updates/s",
        "vs_baseline": value / 11.6e6,   # the round-2 gather-path figure
    }))


def _arm_stall_guard(seconds: float = 900.0):
    """Abort (stderr + exit 3, stdout untouched) if the first device op
    hasn't completed within `seconds`.  The container's TPU relay can wedge
    a client forever before its first transfer (CLAUDE.md measurement
    protocol); a clean fast failure beats an eternal hang — and beats
    printing a bogus number.  Disarmed once the device answers."""
    import os
    import sys
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(seconds):
            print(f"bench.py: no device response in {seconds:.0f}s — "
                  "TPU tunnel down, aborting", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()

    def probe():
        import jax.numpy as jnp
        float(jnp.arange(4.0).sum())     # first transfer + trivial compile
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    return done


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="flagship",
                   choices=("flagship", "plain", "amr-plain", "order2", "ns",
                            "mhd", "mhd-subgrid", "amr", "sphere", "order2-prim",
                            "sphere-blocked", "sphere-blocked-amr", "all"))
    args = p.parse_args()

    from t8gpu_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    _arm_stall_guard()

    if args.config in ("flagship", "all"):
        bench_flagship()
    if args.config in ("plain", "all"):
        bench_plain()
    if args.config in ("amr-plain", "all"):
        bench_amr_plain()
    if args.config in ("order2", "all"):
        bench_order2()
    if args.config == "order2-prim":
        bench_order2("bj-prim")
    if args.config in ("ns", "all"):
        bench_ns()
    if args.config in ("mhd", "all"):
        bench_mhd()
    if args.config in ("mhd-subgrid", "all"):
        bench_mhd_subgrid()
    if args.config in ("amr", "all"):
        bench_amr()
    if args.config in ("sphere", "all"):
        bench_sphere()
    if args.config in ("sphere-blocked", "all"):
        bench_sphere_blocked()
    if args.config in ("sphere-blocked-amr", "all"):
        bench_sphere_blocked_amr()


def _outer():
    """Run main() in a child process, retrying on failure.

    A TPU-worker crash ("UNAVAILABLE: TPU worker process crashed or
    restarted") poisons the PJRT client — every later op in the same
    process fails — but the worker itself usually restarts between
    clients, so a FRESH process often succeeds.  Relaunch up to 3 times
    until the child both exits 0 and printed at least one JSON line;
    forward the child's stdout verbatim (the driver parses it)."""
    import os
    import subprocess
    import sys

    last_rc = 1
    for attempt in range(3):
        if attempt:
            print(f"bench.py: attempt {attempt} failed (rc={last_rc}), "
                  "relaunching", file=sys.stderr, flush=True)
            time.sleep(60)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env={**os.environ, "T8GPU_BENCH_INNER": "1"},
            stdout=subprocess.PIPE, text=True)
        sys.stdout.write(r.stdout)
        sys.stdout.flush()
        last_rc = r.returncode
        if r.returncode == 0 and '"metric"' in r.stdout:
            return 0
    return last_rc or 1


if __name__ == "__main__":
    import os
    import sys

    if os.environ.get("T8GPU_BENCH_INNER") == "1":
        main()
    else:
        sys.exit(_outer())
