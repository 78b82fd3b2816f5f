"""The determinism audit (utils/debug.audit_determinism) — the TPU-native
answer to race detection: no atomics + fixed reduction orders make
bit-reproducibility a TESTABLE invariant (the reference's atomicAdd
accumulation is run-to-run nondeterministic by design)."""

import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.utils.debug import audit_determinism


def kh(centers):
    from t8gpu_tpu.models.initial_conditions import kh_planar
    return kh_planar(centers, dim=2)


def test_euler_step_is_bitwise_deterministic():
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver

    s = CompressibleEulerSolver(uniform_mesh(level=4, dim=2), kh)
    audit_determinism(s, float(s.compute_timestep()), n_steps=3)


def test_mhd_step_is_bitwise_deterministic():
    from t8gpu_tpu.models.mhd import MHDSolver, orszag_tang

    s = MHDSolver(uniform_mesh(level=4, dim=2), orszag_tang)
    audit_determinism(s, float(s.compute_timestep()), n_steps=3)


def test_sharded_step_is_bitwise_deterministic():
    """Fixed reduction orders hold across the device mesh too (psum /
    halo ppermute schedules are deterministic)."""
    import jax

    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    s = ShardedEulerSolver(Forest.uniform(4, dim=2), kh,
                           devices=jax.devices())
    audit_determinism(s, float(s.compute_timestep()), n_steps=3)


def test_audit_detects_injected_nondeterminism():
    """The audit actually fires: a 'solver' whose step depends on a
    mutating counter (scheduling-dependent state — the race model)."""

    class Racy:
        def __init__(self):
            import jax.numpy as jnp
            self.u = jnp.zeros((2, 8))
            self._calls = 0

        def iterate_many(self, n, dt):
            self._calls += 1
            self.u = self.u + self._calls       # differs between runs

    with pytest.raises(AssertionError, match="nondeterministic"):
        audit_determinism(Racy(), 1e-3)
