"""Adapt-cadence study (VERDICT r3 item 8): end-to-end throughput and
accuracy vs --adapt-every on the 3D subgrid AMR config, separating
stepping from per-adapt phases (criteria D2H, host walk, remap dispatch,
mesh install) with the utils/profiling phase timers.

One row per cadence: steps/wall, cell-updates/s end-to-end, final L2
density deviation vs a reference uniform run at the max level... the
accuracy proxy here is the conserved-integral drift + final element
count (full L2-vs-exact needs an exact solution; the KH problem has
none, so the study reports the cost side — the accuracy side of the
trade is documented by the convergence suites).

    python scripts/adapt_cadence.py --steps 400
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def run(cadence: int, steps: int, level: int, max_level: int):
    import jax

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.models.subgrid_euler import (SubgridCompressibleEulerSolver,
                                                subgrid_manager)
    from t8gpu_tpu.utils import profiling
    from t8gpu_tpu.utils.config import AMRConfig

    profiling._phase_acc.clear()
    amr = AMRConfig(min_level=max(level - 1, 1), max_level=max_level,
                    refine_threshold=0.02)
    mesh = subgrid_manager(Forest.uniform(level, dim=3), amr=amr,
                           spec=SubgridSpec((8, 8, 8)))
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=3))
    m0 = s.compute_integral()
    dt = s.compute_timestep_device()
    # warm the initial bucket
    s.iterate_many(2, dt)
    s.u.block_until_ready()

    t0 = time.perf_counter()
    cell_steps = 0
    it = 0
    t_step = 0.0
    while it < steps:
        n = min(cadence - it % cadence, steps - it)
        ts = time.perf_counter()
        s.iterate_many(n, dt)
        if it + n >= steps:
            s.u.block_until_ready()
        t_step += time.perf_counter() - ts
        cell_steps += n * s.n_elements * 512
        it += n
        if it % cadence == 0 and it < steps:
            s.adapt()
            dt = s.compute_timestep_device()
    wall = time.perf_counter() - t0
    drift = (s.compute_integral() - m0) / m0
    phases = {k: v[0] for k, v in profiling._phase_acc.items()}
    return dict(cadence=cadence, steps=steps, wall=wall,
                step_wall=t_step,
                end_to_end_rate=cell_steps / wall,
                stepping_rate=cell_steps / max(t_step, 1e-9),
                final_elements=int(s.n_elements),
                mass_drift=float(drift),
                phases=phases)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--level", type=int, default=2)
    p.add_argument("--max-level", type=int, default=4)
    p.add_argument("--cadences", default="25,50,100,200")
    args = p.parse_args()
    for c in [int(x) for x in args.cadences.split(",")]:
        r = run(c, args.steps, args.level, args.max_level)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
