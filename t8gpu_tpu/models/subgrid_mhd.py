"""Block-structured (subgrid) GLM-MHD solver.

The fourth physics family on the dense-block scheme: each forest leaf
carries a Subgrid<4,4>/<8,8>(,...) block of FV cells and the 9-row GLM-MHD
system (models/mhd.py) runs through the same slab-exchange surface
decomposition as the subgrid Euler solver (ops/subgrid_mhd.py) — the
reference ships exactly ONE physics on its subgrid machinery
(examples/subgrid/solver.h:32); this solver demonstrates the rebuilt
layers 1-4 are genuinely PDE-agnostic on the block scheme too, not just
on the plain-element path.

Same solver contract as every other family: iterate / iterate_many /
iterate_record (fused device batches with per-step observable histories),
dynamic AMR through the shared MeshManager seam (H1 criteria + the
octant-injection/pooled-restriction remap, which is row-count generic),
device-scalar CFL dt, checkpointing via the 9-row state array.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.mhd import (MHD_GUARD, MHD_OBSERVABLES, N_ROWS,
                                  mhd_cfl_speed)
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops import subgrid as sg
from t8gpu_tpu.ops.subgrid_mhd import mhd_subgrid_divergence
from t8gpu_tpu.utils.config import AMRConfig


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "spec", "gamma", "alpha",
                                    "order", "limiter", "observables"),
                   donate_argnames=("u",))
def _rk3_multi(u, conn, volumes, inv_cell_volume, dt, *, n_steps: int,
               spec: SubgridSpec, gamma: float, alpha: float,
               order: int = 1, limiter: str = "minmod",
               observables: tuple = ()):
    if order == 2:
        from t8gpu_tpu.ops.subgrid_mhd import mhd_subgrid_divergence_muscl
        flux_fn = lambda w: mhd_subgrid_divergence_muscl(
            w, volumes, conn, spec, gamma, alpha, limiter=limiter)
    else:
        flux_fn = lambda w: mhd_subgrid_divergence(w, volumes, conn, spec,
                                                   gamma, alpha)

    if observables:
        from t8gpu_tpu.models.observables import resolve
        fns = resolve(observables, MHD_OBSERVABLES)
        cell_vol = volumes / spec.size

        def sbody(carry, _):
            v, sp = rk.ssp_rk3(carry[0], flux_fn, dt, inv_cell_volume)
            row = jnp.stack([f(v, cell_vol, gamma) for f in fns])
            return (v, sp), row

        carry0 = (u, jnp.zeros((), u.dtype))
        (u, sp), rows = jax.lax.scan(sbody, carry0, None, length=n_steps)
        return u, sp, rows

    def body(_i, carry):
        return rk.ssp_rk3(carry[0], flux_fn, dt, inv_cell_volume)

    return jax.lax.fori_loop(0, n_steps, body, (u, jnp.zeros((), u.dtype)))


class SubgridMHDSolver:
    """GLM-MHD on subgrid elements over a fixed or adaptive forest.

    Parameters
    ----------
    mesh: a SubgridMesh, or a MeshManager built with a SubgridMesh
        factory (`models.subgrid_euler.subgrid_manager`) for dynamic AMR.
    ic: callable mapping cell centers [N*B, dim] -> state [9, N*B]
        (rho, m, E, B, psi — build E with `models.mhd.mhd_state`; cells in
        element-major C-order, same contract as the subgrid Euler solver).
    """

    def __init__(self, mesh, ic: Callable[[np.ndarray], np.ndarray],
                 gamma: float = 5.0 / 3.0, glm_alpha: float = 0.1,
                 amr: AMRConfig = AMRConfig(), cfl: float = 0.45,
                 order: int = 1, limiter: str = "minmod"):
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        if limiter not in ("minmod", "none"):
            raise ValueError(
                f"subgrid MHD limiters are per-axis 'minmod' or 'none', "
                f"got {limiter!r} (the plain-family 'bj'/'venkat' do not "
                f"apply to the block scheme)")
        self.gamma = float(gamma)
        self.glm_alpha = float(glm_alpha)
        self.cfl = cfl
        self.order = int(order)
        self.limiter = str(limiter)
        self.amr = amr
        self.manager: Optional[MeshManager] = None
        if isinstance(mesh, MeshManager):
            self.manager = mesh
            self.amr = mesh.amr
            mesh = mesh.mesh
        assert isinstance(mesh, SubgridMesh)
        self.spec: SubgridSpec = mesh.spec
        self._max_speed = None

        u0 = np.asarray(ic(mesh.cell_centers()), np.float32)
        u0 = u0.reshape((N_ROWS, mesh.n_elements) + mesh.spec.extents)
        # internal layout is element-minor: [9, *ext, N] (ops/subgrid.py)
        self.install_mesh(mesh, jnp.asarray(np.moveaxis(u0, 1, -1)))

    def install_mesh(self, mesh: SubgridMesh, u: jnp.ndarray):
        self._crit_pending = None
        self.mesh = mesh
        self.conn = mesh.conn
        cap = mesh.conn.element_capacity
        n = mesh.n_elements
        B = self.spec.size
        vol = np.zeros(cap, np.float32)
        vol[:n] = mesh.volumes
        inv = np.zeros(cap, np.float32)
        inv[:n] = B / mesh.volumes
        dim = self.spec.dim
        from t8gpu_tpu.utils.xfer import pack_put
        self.volumes, self.inv_cell_volume = pack_put([vol, inv])
        if u.shape[-1] != cap:
            guard = jnp.broadcast_to(
                jnp.asarray(MHD_GUARD).reshape((N_ROWS,) + (1,) * (dim + 1)),
                (N_ROWS,) + self.spec.extents + (cap - u.shape[-1],))
            u = jnp.concatenate([u, guard], axis=-1)
        self.u = u

    # -- stepping ---------------------------------------------------------------

    def iterate(self, dt: float):
        self.iterate_many(1, dt)

    def iterate_many(self, n_steps: int, dt: float):
        """n_steps RK3 steps as one fused device program."""
        self.u, self._max_speed = _rk3_multi(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.float32(dt), n_steps=n_steps, spec=self.spec,
            gamma=self.gamma, alpha=self.glm_alpha, order=self.order,
            limiter=self.limiter)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "total_energy",
                                    "magnetic_energy", "psi_energy")):
        """n_steps steps AND a per-step observable history [n_steps, K]
        in one dispatch (models/mhd.MHD_OBSERVABLES registry)."""
        from t8gpu_tpu.models.observables import resolve
        resolve(observables, MHD_OBSERVABLES)          # eager validation
        self.u, self._max_speed, rows = _rk3_multi(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.float32(dt), n_steps=n_steps, spec=self.spec,
            gamma=self.gamma, alpha=self.glm_alpha, order=self.order,
            limiter=self.limiter, observables=tuple(observables))
        return rows

    # -- diagnostics --------------------------------------------------------------

    def compute_integral(self) -> float:
        return float((self.u[0] * (self.volumes / self.spec.size)).sum())

    def compute_divergence_b(self) -> np.ndarray:
        """Per-cell Green-Gauss div B, unpadded [N, *ext] (element-major;
        ops/subgrid_mhd.subgrid_divergence_b)."""
        from t8gpu_tpu.ops.subgrid_mhd import subgrid_divergence_b
        d = subgrid_divergence_b(self.u, self.volumes, self.conn, self.spec)
        return np.moveaxis(np.asarray(d[..., : self.n_elements]), -1, 0)

    def compute_timestep(self) -> float:
        return float(self.compute_timestep_device())

    def compute_timestep_device(self):
        """CFL dt as a DEVICE scalar (axis-summed speed; see
        models/mhd.mhd_cfl_speed and BENCHMARKS.md round-3e)."""
        speed = mhd_cfl_speed(self.u, self.gamma, self.spec.dim,
                              self.volumes > 0)
        h_min = 0.5 ** self.mesh.max_level / self.spec.extent
        return jnp.float32(self.cfl * h_min) / speed

    # -- AMR ----------------------------------------------------------------------

    def adapt(self):
        """H1-criteria AMR cycle; the subgrid remap (octant injection /
        pooled restriction) is row-count generic so all 9 rows remap
        conservatively (psi like a density)."""
        if self.manager is None:
            raise RuntimeError("adapt() requires an adaptive MeshManager mesh")
        if self._crit_pending is not None:
            crit, self._crit_pending = self._crit_pending, None
        else:
            crit = sg.h1_criteria(self.u, self.volumes, self.spec)
        crit = np.asarray(crit)
        remap = self.manager.adapt_forest(crit)
        mesh = self.manager.mesh
        cap = mesh.conn.element_capacity
        n = len(remap.src_start)

        src = np.zeros(cap, np.int32)
        refined = np.zeros(cap, np.uint8)
        child = np.zeros(cap, np.int32)
        coarsened = np.zeros(cap, np.uint8)
        src[:n] = remap.src_start
        refined[:n] = remap.level_change > 0
        child[:n] = remap.child_id
        coarsened[:n] = remap.src_count > 1

        from t8gpu_tpu.utils.xfer import pack_put
        d_src, d_ref, d_child, d_coars = pack_put(
            [src, refined, child, coarsened])
        u_new = sg.apply_subgrid_remap(
            self.u, d_src, d_ref > 0, d_child, d_coars > 0,
            spec=self.spec, capacity=cap)
        self.install_mesh(mesh, u_new)
        self._max_speed = None

    def adapt_prefetch(self):
        """AMR pipelining (see CompressibleEulerSolver.adapt_prefetch)."""
        if self.manager is None:
            raise RuntimeError("adapt_prefetch() requires a MeshManager")
        crit = sg.h1_criteria(self.u, self.volumes, self.spec)
        try:
            crit.copy_to_host_async()
        except AttributeError:
            pass
        self._crit_pending = crit

    @property
    def n_elements(self) -> int:
        return self.mesh.n_elements

    def conserved_state(self) -> np.ndarray:
        """Unpadded [9, N, *ext] state on host (element-major external
        order; internally the layout is element-minor)."""
        return np.moveaxis(np.asarray(self.u[..., : self.n_elements]), -1, 1)
