"""Sharded scalar advection: the distribution layer is PDE-agnostic.

The reference's core claim is that everything below the application is
physics-free (SURVEY §1 "Key architectural invariant") — including its
MPI/ghost machinery, which moves opaque enum-keyed variables.  This
module is the multi-chip counterpart of `models/advection.py`'s proof:
`ShardedAdvectionSolver` reuses ShardedEulerSolver's entire distribution
machinery (SFC partition, ppermute halo rounds, compiled-step cache,
distributed AMR remap, criteria prefetch) and overrides ONLY the physics
hook (`_flux_divergence`) plus the model constants (1 state row, zero
guard, |v| wave speed).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.solver import ShardedEulerSolver
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


class ShardedAdvectionSolver(ShardedEulerSolver):
    """u_t + div(a u) = 0, first-order upwind, over a 1D device mesh.

    `velocity` is the constant advection velocity (length = forest dim).
    Walls are outflow (do-nothing), matching models/advection.py.
    """

    N_ROWS = 1
    GUARD = np.ones(1, np.float32)   # CLAUDE.md: guard padded
    #                                  slots, never zeros

    def __init__(self, forest, ic, velocity, devices=None,
                 amr: AMRConfig = AMRConfig(), cfl: float = 0.7,
                 order: int = 1, limiter: str = "bj"):
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        self._vel_host = np.zeros(3, np.float32)
        self._vel_host[: len(velocity)] = np.asarray(velocity, np.float32)
        self.cfl = cfl
        # order in the config also flips needs_geom in _install
        super().__init__(forest, lambda c: np.asarray(ic(c))[None, :],
                         devices=devices,
                         config=EulerConfig(cfl=cfl, order=order,
                                            limiter=limiter), amr=amr)

    # -- the physics hook ------------------------------------------------------

    def _flux_divergence(self, u, conn):
        vel = jnp.asarray(self._vel_host)

        def face_flux(u_l, u_r, normal, area):
            v_n = vel @ normal
            up = jnp.where(v_n > 0, u_l[0], u_r[0])
            return (v_n * up * area)[None, :], jnp.abs(v_n)

        def boundary_flux(u_own, b_normal, b_area):
            v_n = vel @ b_normal
            return ((jnp.maximum(v_n, 0.0) * u_own[0] * b_area)[None, :],
                    jnp.abs(v_n))

        return halo.sharded_divergence(u, conn, face_flux, boundary_flux)

    def _flux_divergence_vol(self, u, conn, inv_vol, vol=None):
        """order=2: the scalar row through the row-generic sharded MUSCL
        (grad+alpha second halo round), upwind on reconstructed states."""
        if getattr(self.config, "order", 1) != 2:
            return self._flux_divergence(u, conn)
        import jax

        from t8gpu_tpu.ops.fluxes import accumulate_inc

        vel = jnp.asarray(self._vel_host)
        u_lf, u_rf, u_bf = halo.sharded_reconstruct_sides(
            u, conn, inv_vol, getattr(self.config, "limiter", "bj"),
            self.forest.dim, guard=lambda rec, first: rec)
        v_n = vel @ conn.normal
        up = jnp.where(v_n > 0, u_lf[0], u_rf[0])
        f = (v_n * up * conn.area)[None, :]
        if conn.boundary_capacity:
            v_b = vel @ conn.b_normal
            bf = (jnp.maximum(v_b, 0.0) * u_bf[0] * conn.b_area)[None, :]
        else:
            bf = jnp.zeros((1, 0), u.dtype)
        acc = accumulate_inc(f, bf, conn.inc_slot, conn.inc_sign)
        local = (jnp.abs(v_n) * (conn.area > 0)).max()
        return acc, jax.lax.pmax(local, halo.AXIS)

    # -- model-specific diagnostics -------------------------------------------

    OBS_DEFAULT = ("integral", "min", "max")

    def _obs_registry(self):
        """Scalar-advection observables for the inherited
        iterate_record (integral / l2 / min / max — the extrema ride
        lax.pmin/pmax across the mesh)."""
        from t8gpu_tpu.models.advection import (ADVECTION_OBSERVABLES,
                                                ADVECTION_REDUCERS)
        return ADVECTION_OBSERVABLES, ADVECTION_REDUCERS

    def _obs_param(self):
        return 0.0        # no EOS constant in the scalar model

    def compute_timestep_device(self):
        # axis-summed speed (see AdvectionSolver.compute_timestep)
        speed = float(np.abs(self._vel_host).sum())
        return jnp.float32(self.cfl * self._cfl_h) / max(speed, 1e-30)

    def state(self) -> np.ndarray:
        """Unpadded scalar values [N] on host."""
        return self.conserved_state()[0]
