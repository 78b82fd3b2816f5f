"""Sharded GLM-MHD: fourth model family over the device mesh.

Overrides the physics hooks of ShardedEulerSolver (like
parallel/advection.py and parallel/shallow_water.py) and inherits the
whole distribution machinery — SFC partition, neighbor-scoped ppermute
halo, compiled step cache, distributed AMR remap, criteria prefetch.

The one genuinely new distributed ingredient: the GLM cleaning speed c_h
is a GLOBAL scalar, so the divergence hook computes the shard-local
signal maximum and `lax.pmax`es it over the mesh axis before the face
fluxes run — every shard then evaluates the 2x2 GLM interface solve with
the identical c_h; sharded == single-device to summation tolerance
(tested, tests/test_mhd.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t8gpu_tpu.models.mhd import (MHD_GUARD, MHD_OBSERVABLES, MHD_REDUCERS,
                                  N_ROWS, glm_ch, mhd_cfl_speed,
                                  mhd_face_flux, mhd_wall_flux)
from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.solver import ShardedEulerSolver
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


class ShardedMHDSolver(ShardedEulerSolver):
    """[rho, m, E, B, psi] over a 1D device mesh, Rusanov + exact GLM
    interface solve, perfect-conductor walls."""

    N_ROWS = N_ROWS
    GUARD = MHD_GUARD

    def __init__(self, forest, ic, gamma: float = 5.0 / 3.0,
                 glm_alpha: float = 0.1, devices=None,
                 amr: AMRConfig = AMRConfig(), cfl: float = 0.45,
                 order: int = 1, limiter: str = "bj"):
        self.gamma = float(gamma)
        self.glm_alpha = float(glm_alpha)
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        super().__init__(forest, ic, devices=devices,
                         config=EulerConfig(cfl=cfl, gamma=gamma,
                                            order=order, limiter=limiter),
                         amr=amr)

    def _flux_divergence_vol(self, u, conn, inv_vol, vol=None):
        """Volume-aware override: the GLM damping source needs V and h
        (from the step's exact sharded volume array); c_h needs a global
        pmax.  order=2 swaps the raw gathered side states for the
        row-generic sharded MUSCL reconstruction (same second halo round
        as the Euler order-2 path) with the MHD admissibility guard —
        same face flux, same exact-GLM interface solve."""
        from t8gpu_tpu.models.mhd import _mhd_guard

        gamma, alpha = self.gamma, self.glm_alpha
        live = inv_vol > 0
        ch = jnp.maximum(
            jax.lax.pmax(glm_ch(u, gamma, live), halo.AXIS), 1e-12)
        if getattr(self.config, "order", 1) == 2:
            u_lf, u_rf, u_bf = halo.sharded_reconstruct_sides(
                u, conn, inv_vol,
                getattr(self.config, "limiter", "bj"), self.forest.dim,
                guard=lambda rec, first: _mhd_guard(rec, first, gamma))
            f, sp = mhd_face_flux(u_lf, u_rf, conn.normal, conn.area,
                                  gamma, ch)
            sp = sp * (conn.area > 0)
            if conn.boundary_capacity:
                fb, sp_b = mhd_wall_flux(u_bf, conn.b_normal, conn.b_area,
                                         gamma, ch)
                sp_b = sp_b * (conn.b_area > 0)
            else:
                fb = jnp.zeros((N_ROWS, 0), u.dtype)
                sp_b = jnp.zeros((0,), u.dtype)
            from t8gpu_tpu.ops.fluxes import accumulate_inc
            acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)
            local = jnp.maximum(sp.max(), sp_b.max() if sp_b.size else 0.0)
            speed = jax.lax.pmax(local, halo.AXIS)
        else:
            acc, speed = halo.sharded_divergence(
                u, conn,
                lambda u_l, u_r, n, a: mhd_face_flux(u_l, u_r, n, a,
                                                     gamma, ch),
                lambda u_own, bn, ba: mhd_wall_flux(u_own, bn, ba,
                                                    gamma, ch))
        if alpha > 0.0:
            h = jnp.where(live, vol, 1.0) ** (1.0 / self.forest.dim)
            acc = acc.at[8].add(-alpha * ch * u[8] * vol / h)
        return acc, speed

    def _flux_divergence(self, u, conn):
        raise NotImplementedError(
            "MHD always goes through _flux_divergence_vol (the GLM "
            "damping source needs the cell volumes)")

    OBS_DEFAULT = ("mass", "total_energy", "magnetic_energy", "psi_energy")

    def _obs_registry(self):
        return MHD_OBSERVABLES, MHD_REDUCERS

    def _obs_param(self):
        return self.gamma

    def _cfl_cell_speed(self, u, live):
        """Axis-summed sum_a |v_a| + dim * c_f^max (models/mhd.py)."""
        return mhd_cfl_speed(u, self.gamma, self.forest.dim, live)
