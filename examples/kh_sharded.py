"""Multi-chip Kelvin-Helmholtz: the distributed solvers end-to-end.

The reference's multi-rank deployment is `mpirun -n N` over CUDA MPS
(README.md:46-58); here one process drives a 1-D `jax.sharding.Mesh`
over all visible devices — elements SFC-partitioned, halo `ppermute`
rounds per flux evaluation, `pmax` CFL, distributed AMR with device-side
remap + repartition, sharded checkpoint/resume.

On a machine without multiple accelerators, run on a virtual CPU mesh:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/kh_sharded.py --solver subgrid --dim 2 --steps 100

    python examples/kh_sharded.py --solver plain --shell --steps 100
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--solver", default="subgrid",
                   choices=("plain", "subgrid", "blocked"))
    p.add_argument("--dim", type=int, default=2, choices=(2, 3))
    p.add_argument("--shell", action="store_true",
                   help="[plain] prismed icosahedral shell (the reference "
                        "flagship deployment: MPI over the shell)")
    p.add_argument("--level", type=int, default=0)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--adapt-every", type=int, default=50)
    p.add_argument("--adapt-lag", type=int, default=0,
                   help="prefetch refinement criteria N steps before each "
                        "adapt boundary (AMR pipelining)")
    p.add_argument("--extent", type=int, default=8)
    p.add_argument("--order", type=int, default=1, choices=(1, 2),
                   help="2 = sharded MUSCL (plain + subgrid solvers)")
    p.add_argument("--checkpoint", default="",
                   help="write a (sharded-portable) checkpoint at the end")
    args = p.parse_args()

    devices = jax.devices()
    print(f"devices: {len(devices)} x {devices[0].platform}")

    if args.solver == "plain":
        from t8gpu_tpu.parallel.solver import ShardedEulerSolver
        if args.shell:
            from t8gpu_tpu.mesh.shell_forest import (PrismForest,
                                                     shell_roots)
            from t8gpu_tpu.models.initial_conditions import kh_sphere
            forest = PrismForest.uniform(shell_roots(2),
                                         args.level or 1)
            amr = AMRConfig(min_level=0, max_level=(args.level or 1) + 2,
                            refine_threshold=10.0)
            solver = ShardedEulerSolver(forest, kh_sphere, amr=amr,
                                        config=EulerConfig(order=args.order))
        else:
            from t8gpu_tpu.mesh.forest import Forest
            from t8gpu_tpu.models.initial_conditions import kh_planar
            level = args.level or (6 if args.dim == 2 else 4)
            forest = Forest.uniform(level, dim=args.dim)
            amr = AMRConfig(min_level=level - 1, max_level=level + 2,
                            refine_threshold=2.0)
            solver = ShardedEulerSolver(
                forest, lambda c: kh_planar(c, dim=args.dim), amr=amr,
                config=EulerConfig(order=args.order))
    elif args.solver == "blocked":
        # plain elements on a uniform periodic brick, stepped as blocks
        # on the fused kernels under shard_map (multi-chip config 1)
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.models.blocked_euler import ShardedBlockedEulerSolver
        from t8gpu_tpu.models.initial_conditions import kh_planar
        level = args.level or (6 if args.dim == 2 else 4)
        forest = Forest.uniform(level, dim=args.dim)
        solver = ShardedBlockedEulerSolver(
            forest, lambda c: kh_planar(c, dim=args.dim))
        args.adapt_every = args.steps + 1      # static mesh
    else:
        from t8gpu_tpu.memory.subgrid import SubgridSpec
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.models.initial_conditions import kh_planar
        from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver
        level = args.level or (4 if args.dim == 2 else 2)
        forest = Forest.uniform(level, dim=args.dim)
        amr = AMRConfig(min_level=max(level - 1, 0), max_level=level + 2,
                        refine_threshold=0.02)
        solver = ShardedSubgridEulerSolver(
            forest, SubgridSpec((args.extent,) * args.dim),
            lambda c: kh_planar(c, dim=args.dim), amr=amr,
            config=EulerConfig(order=args.order))

    m0 = solver.compute_integral()
    print(f"shards={solver.n_shards} elements={solver.n_elements} "
          f"integral={m0:.6f}")

    t0 = time.perf_counter()
    done, adapts = 0, 0
    dt = solver.compute_timestep_device()
    while done < args.steps:
        to_b = args.adapt_every - done % args.adapt_every
        n = min(args.steps - done, to_b)
        if args.adapt_lag and to_b > args.adapt_lag:
            n = min(n, to_b - args.adapt_lag)
        solver.iterate_many(n, dt)
        done += n
        if (args.adapt_lag
                and done % args.adapt_every
                    == args.adapt_every - args.adapt_lag
                and done + args.adapt_lag < args.steps):
            solver.adapt_prefetch()
        if done % args.adapt_every == 0 and done < args.steps:
            solver.adapt()
            adapts += 1
            dt = solver.compute_timestep_device()
    u = solver.conserved_state()
    wall = time.perf_counter() - t0
    assert np.isfinite(u).all()
    m1 = solver.compute_integral()
    print(f"steps={args.steps} adapts={adapts} "
          f"elements={solver.n_elements} wall={wall:.2f}s "
          f"integral drift={abs(m1 - m0) / abs(m0):.2e}")

    if args.checkpoint:
        if args.solver == "blocked":
            print("checkpoint: n/a for the static blocked path")
        else:
            from t8gpu_tpu.io.checkpoint import save_solver
            save_solver(args.checkpoint, solver, step=done)
            print(f"checkpoint: {args.checkpoint}")


if __name__ == "__main__":
    main()
