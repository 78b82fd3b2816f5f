"""Sharded shallow water: third model family over the device mesh.

Like parallel/advection.py, this overrides ONLY the physics hook of
ShardedEulerSolver — a nonlinear 3-row system this time — and inherits
the whole distribution machinery (SFC partition, ppermute halo, compiled
step cache, distributed AMR remap, criteria prefetch).
"""

from __future__ import annotations

from t8gpu_tpu.models.shallow_water import (SW_GUARD, _sw_guard,
                                            rusanov_face_flux,
                                            wall_face_flux)
from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.solver import ShardedEulerSolver
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


class ShardedShallowWaterSolver(ShardedEulerSolver):
    """h, hu, hv over a 1D device mesh (2D forests), Rusanov flux,
    reflective walls; order=2 = row-generic sharded MUSCL with the
    depth-positivity guard (same second halo round as Euler/MHD)."""

    N_ROWS = 3
    GUARD = SW_GUARD

    def __init__(self, forest, ic, g: float = 9.81, devices=None,
                 amr: AMRConfig = AMRConfig(), cfl: float = 0.45,
                 order: int = 1, limiter: str = "bj"):
        # 0.45 default, not 0.7 — see ShallowWaterSolver.__init__
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        self.g = float(g)
        # order in the config also flips needs_geom in _install
        super().__init__(forest, ic, devices=devices,
                         config=EulerConfig(cfl=cfl, order=order,
                                            limiter=limiter), amr=amr)

    def _flux_divergence(self, u, conn):
        g = self.g
        return halo.sharded_divergence(
            u, conn,
            lambda u_l, u_r, n, a: rusanov_face_flux(u_l, u_r, n, a, g),
            lambda u_own, bn, ba: wall_face_flux(u_own, bn, ba, g))

    def _flux_divergence_vol(self, u, conn, inv_vol, vol=None):
        """order=2: sharded MUSCL reconstruction (grad+alpha second halo
        round, identical interface states on both sides of a shard cut)
        feeding the same Rusanov/wall fluxes."""
        if getattr(self.config, "order", 1) != 2:
            return self._flux_divergence(u, conn)
        import jax
        import jax.numpy as jnp

        from t8gpu_tpu.ops.fluxes import accumulate_inc

        g = self.g
        u_lf, u_rf, u_bf = halo.sharded_reconstruct_sides(
            u, conn, inv_vol, getattr(self.config, "limiter", "bj"),
            self.forest.dim, guard=_sw_guard)
        f, sp = rusanov_face_flux(u_lf, u_rf, conn.normal, conn.area, g)
        sp = sp * (conn.area > 0)
        if conn.boundary_capacity:
            fb, sp_b = wall_face_flux(u_bf, conn.b_normal, conn.b_area, g)
            sp_b = sp_b * (conn.b_area > 0)
        else:
            fb = jnp.zeros((3, 0), u.dtype)
            sp_b = jnp.zeros((0,), u.dtype)
        acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)
        local = jnp.maximum(sp.max(), sp_b.max() if sp_b.size else 0.0)
        return acc, jax.lax.pmax(local, halo.AXIS)

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
