"""Adjoint-based initial-condition recovery (data assimilation demo).

Differentiates the FV solver end-to-end with jax.grad (models/adjoint.py)
to recover an unknown shear-layer perturbation amplitude from a target
density field observed after N steps — a workflow the reference CUDA
architecture cannot express (its step is in-place kernels + atomicAdd +
MPI barriers, examples/compressible_euler/solver.cu:75-175).

Runs on CPU or TPU:
  python examples/adjoint_ic.py --level 4 --steps 20 --iters 30
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--steps", type=int, default=20,
                   help="rollout horizon (RK3 steps)")
    p.add_argument("--iters", type=int, default=30,
                   help="gradient-descent iterations")
    p.add_argument("--true-amp", type=float, default=0.08)
    p.add_argument("--order", type=int, default=1, choices=(1, 2))
    args = p.parse_args()

    from t8gpu_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from t8gpu_tpu.mesh.uniform import uniform_mesh
    from t8gpu_tpu.models import adjoint
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.utils.config import EulerConfig

    mesh = uniform_mesh(args.level, dim=2, periodic=True)
    solver = CompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2),
                                     config=EulerConfig(order=args.order))
    dt = 0.5 * solver.compute_timestep()
    base = solver.u

    def simulate(amp):
        u0 = base.at[1].mul(1.0 + amp)      # perturb x-momentum
        return adjoint.rollout(solver, dt, args.steps, u0=u0)

    target = simulate(jnp.float32(args.true_amp))
    print(f"target generated: amp={args.true_amp}, {args.steps} steps, "
          f"{solver.n_elements} elements")

    @jax.jit
    def loss_and_grad(amp):
        return jax.value_and_grad(
            lambda a: ((simulate(a) - target) ** 2).sum())(amp)

    amp = jnp.float32(0.0)
    lr = None
    t0 = time.perf_counter()
    for it in range(args.iters):
        val, g = loss_and_grad(amp)
        if lr is None:                      # scale lr from the first grad
            lr = 0.02 / max(abs(float(g)), 1e-12)
        amp = amp - lr * g
        if it % 5 == 0 or it == args.iters - 1:
            print(f"iter {it:3d}  loss {float(val):.3e}  "
                  f"amp {float(amp):+.5f}")
    wall = time.perf_counter() - t0
    err = abs(float(amp) - args.true_amp)
    print(f"recovered amp {float(amp):+.5f} (true {args.true_amp:+.5f}, "
          f"|err| {err:.2e}) in {wall:.1f}s")
    assert np.isfinite(float(amp))


if __name__ == "__main__":
    main()
