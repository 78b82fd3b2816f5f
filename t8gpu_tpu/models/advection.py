"""Scalar linear advection: a second conservation-law model family.

The reference library's core claim is PDE-agnosticism — layers 1-4
(storage, mesh/AMR, connectivity, RK3) know nothing about the physics;
the application supplies flux kernels and criteria (SURVEY §1 "Key
architectural invariant"; the reference ships only the Euler examples).
This module is the proof for this framework: a complete second solver —
u_t + div(a u) = 0, first-order upwind flux — built ONLY from the public
seams the Euler solvers use:

  * `FaceConnectivity` + `ops.fluxes.gather_cols`/`accumulate` (the
    deterministic replacement for the reference's per-face atomicAdd
    scatter, kernels.cu:295-308),
  * `ops.rk.ssp_rk3` (ref ssp_runge_kutta.inl:30-99),
  * `mesh.manager.MeshManager.adapt` (volume-weighted remap) with the
    gradient criteria (ref solver.cu:231-241),
  * capacity buckets / iterate_many single-dispatch batching.

State is [1, capacity] — `accumulate` is row-count generic.  Works on
every mesh kind the Euler solver accepts (uniform/forest brick, shell
prisms, tri, tet) because the flux uses the general face normals.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.mesh.connectivity import FaceConnectivity
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops.amr import refinement_criteria
from t8gpu_tpu.ops.fluxes import accumulate, gather_cols
from t8gpu_tpu.utils.config import AMRConfig


def upwind_face_fluxes(u: jnp.ndarray, conn: FaceConnectivity,
                       velocity: jnp.ndarray):
    """Area-scaled upwind fluxes [1, Fcap] for faces whose normal points
    left -> right (the connectivity convention): F = A * (a.n) * u_up."""
    u_l = gather_cols(u, conn.left)          # [1, Fcap]
    u_r = gather_cols(u, conn.right)
    v_n = velocity @ conn.normal             # [Fcap] (normal is [3, F])
    up = jnp.where(v_n > 0, u_l[0], u_r[0])
    return (v_n * up * conn.area)[None, :]


def boundary_face_fluxes(u: jnp.ndarray, conn: FaceConnectivity,
                         velocity: jnp.ndarray):
    """Outflow (do-nothing) walls: flux leaves with the interior value
    where a.n > 0, nothing enters where a.n < 0 — [1, Fbcap]."""
    if conn.boundary_capacity == 0:
        return jnp.zeros((1, 0), u.dtype)
    u_in = gather_cols(u, conn.b_elem)
    v_n = velocity @ conn.b_normal
    return (jnp.maximum(v_n, 0.0) * u_in[0] * conn.b_area)[None, :]


def advection_divergence(u: jnp.ndarray, conn: FaceConnectivity,
                         velocity: jnp.ndarray) -> jnp.ndarray:
    """Signed per-element flux sum [1, capacity] (gather accumulation)."""
    f = upwind_face_fluxes(u, conn, velocity)
    bf = boundary_face_fluxes(u, conn, velocity)
    return accumulate(f, bf, conn)


def advection_divergence_muscl(u: jnp.ndarray, conn: FaceConnectivity,
                               velocity: jnp.ndarray, inv_volume,
                               limiter: str = "bj", dim: int = 2):
    """Second-order upwind divergence: the scalar row through the SAME
    row-generic MUSCL reconstruction Euler/SWE/MHD ride (C=1; the BJ
    limiter keeps reconstructed values inside the neighbor min/max, so
    the upwind flux stays bounded — no admissibility guard needed
    beyond identity)."""
    from t8gpu_tpu.ops.reconstruct import reconstruct_sides

    u_lf, u_rf, u_bf = reconstruct_sides(u, conn, inv_volume, 0.0,
                                         limiter=limiter, dim=dim,
                                         guard=lambda rec, first: rec)
    v_n = velocity @ conn.normal
    up = jnp.where(v_n > 0, u_lf[0], u_rf[0])
    f = (v_n * up * conn.area)[None, :]
    if conn.boundary_capacity:
        v_b = velocity @ conn.b_normal
        bf = (jnp.maximum(v_b, 0.0) * u_bf[0] * conn.b_area)[None, :]
    else:
        bf = jnp.zeros((1, 0), u.dtype)
    return accumulate(f, bf, conn)


# -- per-step observables (models/observables.py contract) --------------------
# Signature (u, cell_volume, param) -> scalar; padded slots carry zero
# volume (and are masked for the extrema).  `param` is unused (the
# scalar model has no EOS constant).

def _live(u, vol):
    return vol > 0


ADVECTION_OBSERVABLES = {
    # conserved integral (exact on periodic domains)
    "integral": lambda u, vol, p: (u[0] * vol).sum(),
    # L2 energy: non-increasing for the monotone upwind scheme
    "l2": lambda u, vol, p: (u[0] ** 2 * vol).sum(),
    # maximum-principle audit: live-cell extrema (min non-decreasing,
    # max non-increasing under first-order upwind)
    "min": lambda u, vol, p: jnp.where(_live(u, vol), u[0],
                                       jnp.inf).min(),
    "max": lambda u, vol, p: jnp.where(_live(u, vol), u[0],
                                       -jnp.inf).max(),
}
ADVECTION_REDUCERS = {"integral": "sum", "l2": "sum",
                      "min": "min", "max": "max"}


@functools.partial(jax.jit, static_argnames=("n_steps", "order", "limiter",
                                             "observables"),
                   donate_argnames=("u",))
def _rk3_multi(u, conn: FaceConnectivity, inv_volume, dt, velocity,
               n_steps: int, volume=None, order: int = 1,
               limiter: str = "bj", observables: tuple = ()):
    if order == 2:
        flux_fn = lambda w: (advection_divergence_muscl(
            w, conn, velocity, inv_volume, limiter=limiter), None)
    else:
        flux_fn = lambda w: (advection_divergence(w, conn, velocity), None)

    if observables:
        from t8gpu_tpu.models.observables import resolve
        fns = resolve(observables, ADVECTION_OBSERVABLES)

        def sbody(v, _):
            v2, _sp = rk.ssp_rk3(v, flux_fn, dt, inv_volume)
            row = jnp.stack([f(v2, volume, 0.0) for f in fns])
            return v2, row

        return jax.lax.scan(sbody, u, None, length=n_steps)

    def body(_i, v):
        v2, _ = rk.ssp_rk3(v, flux_fn, dt, inv_volume)
        return v2

    return jax.lax.fori_loop(0, n_steps, body, u)


class AdvectionSolver:
    """Finite-volume scalar advection on any mesh the Euler solver runs on.

    Parameters
    ----------
    mesh: object with `.conn`, `.volumes`, `.centers` — or an adaptive
        `MeshManager` (then `adapt()` performs full AMR cycles).
    ic: callable mapping centers [N, dim] -> scalar values [N].
    velocity: constant advection velocity, length = mesh dim (padded to
        the normals' width internally).
    """

    def __init__(self, mesh, ic: Callable[[np.ndarray], np.ndarray],
                 velocity, amr: AMRConfig = AMRConfig(), cfl: float = 0.7,
                 order: int = 1, limiter: str = "bj"):
        from t8gpu_tpu.mesh.manager import MeshManager

        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        self.order = int(order)
        self.limiter = str(limiter)
        self.cfl = cfl
        self.amr = amr
        self.manager: Optional[MeshManager] = None
        if isinstance(mesh, MeshManager):
            self.manager = mesh
            self.amr = mesh.amr
            mesh = mesh.mesh
        u0 = np.asarray(ic(mesh.centers), np.float32)[None, :]
        self._vel_host = np.asarray(velocity, np.float32)
        self.install_mesh(mesh, jnp.asarray(u0))

    def install_mesh(self, mesh, u: jnp.ndarray):
        self._crit_pending = None    # criteria refer to the previous mesh
        self.mesh = mesh
        self.conn: FaceConnectivity = mesh.conn
        cap = self.conn.inc_slot.shape[0]
        n = self.conn.n_elements
        vol = np.zeros(cap, np.float32)
        vol[:n] = np.asarray(mesh.volumes)
        self.volume = jnp.asarray(vol)
        inv = np.zeros(cap, np.float32)
        inv[:n] = 1.0 / vol[:n]
        self.inv_volume = jnp.asarray(inv)
        vel = np.zeros(self.conn.normal.shape[0], np.float32)   # [3]
        vel[: len(self._vel_host)] = self._vel_host
        self.velocity = jnp.asarray(vel)
        if u.shape[-1] < cap:
            u = jnp.concatenate(
                [u, jnp.ones((1, cap - u.shape[-1]), u.dtype)], axis=1)
        self.u = u

    # -- stepping -------------------------------------------------------------

    def iterate(self, dt: float):
        self.iterate_many(1, dt)

    def iterate_many(self, n_steps: int, dt: float):
        self.u = _rk3_multi(self.u, self.conn, self.inv_volume,
                            jnp.float32(dt), self.velocity, n_steps=n_steps,
                            order=self.order, limiter=self.limiter)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("integral", "min", "max")):
        """n_steps steps AND a per-step observable history in one
        dispatch — [n_steps, K] device array over
        ADVECTION_OBSERVABLES (integral / l2 / min / max; the extrema
        columns audit the upwind scheme's maximum principle).  Same
        contract as CompressibleEulerSolver.iterate_record."""
        from t8gpu_tpu.models.observables import resolve
        resolve(observables, ADVECTION_OBSERVABLES)   # eager validation
        self.u, rows = _rk3_multi(
            self.u, self.conn, self.inv_volume, jnp.float32(dt),
            self.velocity, n_steps=n_steps, volume=self.volume,
            order=self.order, limiter=self.limiter,
            observables=tuple(observables))
        return rows

    # -- diagnostics ----------------------------------------------------------

    def compute_integral(self) -> float:
        return float((self.u[0] * self.volume).sum())

    def compute_timestep(self) -> float:
        h = getattr(self.mesh, "cfl_h", None)
        if h is None:
            level = getattr(self.mesh, "max_level", None)
            if level is None:
                level = getattr(self.mesh, "level", self.amr.max_level)
            h = 0.5 ** level
        # axis-summed speed for the dim-summed upwind update (the 2-norm
        # under-counts diagonal advection by up to sqrt(dim); same
        # rationale as ops/euler.cfl_sum_speed)
        speed = float(np.abs(self._vel_host).sum())
        return self.cfl * float(h) / max(speed, 1e-30)

    # -- AMR ------------------------------------------------------------------

    def adapt(self):
        """Gradient-criteria AMR cycle through the SAME MeshManager seam
        the Euler solver uses (proof the mesh layer is PDE-agnostic)."""
        if self.manager is None:
            raise RuntimeError("adapt() requires an adaptive MeshManager mesh")
        if self._crit_pending is not None:
            crit, self._crit_pending = self._crit_pending, None
        else:
            crit = refinement_criteria(self.u, self.conn, self.volume,
                                       dim=self.manager.dim)
        u_new = self.manager.adapt(np.asarray(crit), self.u)
        self.install_mesh(self.manager.mesh, u_new)

    def adapt_prefetch(self):
        """AMR pipelining (see CompressibleEulerSolver.adapt_prefetch):
        start the criteria device->host copy early; the next adapt()
        consumes it without stalling."""
        if self.manager is None:
            raise RuntimeError("adapt_prefetch() requires a MeshManager")
        crit = refinement_criteria(self.u, self.conn, self.volume,
                                   dim=self.manager.dim)
        try:
            crit.copy_to_host_async()
        except AttributeError:
            pass
        self._crit_pending = crit

    @property
    def n_elements(self) -> int:
        return self.conn.n_elements

    def state(self) -> np.ndarray:
        """Unpadded scalar values [N] on host."""
        return np.asarray(self.u[0, : self.n_elements])
