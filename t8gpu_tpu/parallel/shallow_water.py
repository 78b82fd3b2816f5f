"""Sharded shallow water: third model family over the device mesh.

Like parallel/advection.py, this overrides ONLY the physics hook of
ShardedEulerSolver — a nonlinear 3-row system this time — and inherits
the whole distribution machinery (SFC partition, ppermute halo, compiled
step cache, distributed AMR remap, criteria prefetch).
"""

from __future__ import annotations

from t8gpu_tpu.models.shallow_water import (SW_GUARD, rusanov_face_flux,
                                            wall_face_flux)
from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.solver import ShardedEulerSolver
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


class ShardedShallowWaterSolver(ShardedEulerSolver):
    """h, hu, hv over a 1D device mesh (2D forests), Rusanov flux,
    reflective walls."""

    N_ROWS = 3
    GUARD = SW_GUARD

    def __init__(self, forest, ic, g: float = 9.81, devices=None,
                 amr: AMRConfig = AMRConfig(), cfl: float = 0.45):
        # 0.45 default, not 0.7 — see ShallowWaterSolver.__init__
        self.g = float(g)
        super().__init__(forest, ic, devices=devices,
                         config=EulerConfig(cfl=cfl), amr=amr)

    def _flux_divergence(self, u, conn):
        g = self.g
        return halo.sharded_divergence(
            u, conn,
            lambda u_l, u_r, n, a: rusanov_face_flux(u_l, u_r, n, a, g),
            lambda u_own, bn, ba: wall_face_flux(u_own, bn, ba, g))

    OBS_DEFAULT = ("volume", "energy")

    def _obs_registry(self):
        """Shallow-water observables for the inherited iterate_record
        (volume / momentum / energy / max_froude)."""
        from t8gpu_tpu.models.shallow_water import (SW_OBSERVABLES,
                                                    SW_REDUCERS)
        return SW_OBSERVABLES, SW_REDUCERS

    def _obs_param(self):
        return self.g

    def _cfl_cell_speed(self, u, live):
        """SWE CFL speed hook: axis-summed sum_a |v_a| + dim * sqrt(g h)
        (same rationale as ShallowWaterSolver.compute_timestep_device)."""
        import jax.numpy as jnp

        hw = jnp.maximum(u[0], 1e-12)
        s = ((jnp.abs(u[1]) + jnp.abs(u[2])) / hw
             + 2.0 * jnp.sqrt(self.g * hw))
        return jnp.where(live, s, 0.0).max()
