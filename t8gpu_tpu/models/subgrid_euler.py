"""Block-structured (subgrid) compressible-Euler solver.

TPU-native counterpart of the reference `SubgridCompressibleEulerSolver`
(`examples/subgrid/solver.h:32`, `solver.inl`): each forest leaf carries a
dense Subgrid<4,4>/<4,4,4> block of FV cells; inner fluxes are dense
stencils over the block axes, outer fluxes stitch neighboring blocks
(including 2:1 hanging faces), SSP-RK3 in time, H1-seminorm AMR criteria.

TPU design departures (SURVEY.md §7 M4):
  * state is one array [5, Ecap, ext, ext(, ext)] — inner fluxes are
    shifted elementwise slices batched over elements (VPU-shaped), fused
    by XLA with the RK stages into one program per step; the reference
    launches 3x(inner+boundary+outer+RK) CUDA kernels with device syncs
    and MPI barriers between them (solver.inl:152-266);
  * hanging-face pairing is host-resolved into flat index maps instead of
    runtime anchor/stride arithmetic (kernels.inl:710-758);
  * padded element slots hold a quiescent guard state so the fused flux
    math stays finite without masking branches.

Unlike the reference, compute_timestep is implemented (the reference
prints "not implemented yet" and exits, solver.inl:307-325); the bundled
drivers' fixed dt = cfl * 0.5^(level + log2 ext) remains available through
RunConfig.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.mesh.subgrid import SubgridConnectivity, SubgridMesh
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops import subgrid as sg
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig, resolve_dtype

GUARD_STATE = np.array([1.0, 0.0, 0.0, 0.0, 2.5], np.float32)


def _with_cell_gravity(flux_fn, gravity, inv_cell_volume):
    """Gravity source scaled by the per-cell volume ([cap] broadcasts
    against the element-minor [5, *ext, cap] divergence)."""
    from t8gpu_tpu.ops.source import volume_from_inverse, with_gravity

    return with_gravity(flux_fn, gravity,
                        volume_from_inverse(inv_cell_volume))


def _use_fused_rk(conn, spec) -> bool:
    from t8gpu_tpu.ops.pallas_kernels import kernel_mode

    return sg.can_fuse_rk(conn, spec) and kernel_mode() != "off"


def validate_subgrid_bc(config, plain_pointer: str) -> dict:
    """Validate + normalize the boundary/wall options of an EulerConfig
    into static kwargs for the subgrid step functions — the ONE
    validator shared by the single-device and sharded subgrid solvers
    (so the two cannot drift on which configs they accept).

    The subgrid wall model takes a UNIFORM wall velocity tuple; per-face
    callables (e.g. only a cavity lid moving) are a plain-path feature
    (ops/viscous.boundary_viscous_flux) — `plain_pointer` names the
    plain-path solver in the error."""
    wv = getattr(config, "wall_velocity", (0.0, 0.0, 0.0))
    if callable(wv):
        raise ValueError(
            "the subgrid path takes a uniform wall_velocity tuple; "
            f"per-face callables run on the plain-element path "
            f"({plain_pointer})")
    wt = getattr(config, "wall_temperature", None)
    wall = getattr(config, "wall", "slip")
    b = getattr(config, "boundary", "reflective")
    ff = getattr(config, "farfield", None)
    if b == "farfield":
        if ff is None:
            raise ValueError("boundary='farfield' needs farfield="
                             "(rho, vx, vy, vz, p)")
        if wall == "noslip":
            raise ValueError("farfield boundaries are open — no-slip "
                             "walls do not compose with them")
        ff = tuple(float(x) for x in ff)
    elif b != "reflective":
        raise ValueError(f"unknown boundary model: {b!r}")
    else:
        ff = None
    return dict(wall=wall,
                wall_velocity=tuple(float(x) for x in wv),
                wall_temperature=None if wt is None else float(wt),
                farfield=ff)


def _fused_path(conn, spec, order, dtype=None) -> bool:
    """EVERY first-order configuration rides the RK-fused Pallas kernels
    on TPU backends: viscosity runs in-VMEM
    (ops/pallas_kernels._tile_viscous_divergence) with hanging 2:1 and
    no-slip wall fluxes as additive side extras
    (ops/subgrid_viscous.viscous_hanging_sides / viscous_wall_sides),
    gravity as the in-kernel unsplit source, farfield as the ghost side
    layers.  Order 2 has its own fused kernel (flux_divergence_muscl)."""
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False     # f64 runs the XLA stencil path (Mosaic kernels are f32)
    return order == 1 and _use_fused_rk(conn, spec)


def _base_flux_fn(conn, volumes, spec, gamma, flux, order, limiter,
                  gravity, inv_cell_volume, mu=0.0, prandtl=0.72,
                  wall="slip", wall_velocity=(0.0, 0.0, 0.0),
                  wall_temperature=None, farfield=None):
    """The non-RK-fused (divergence, speed) closure: order 1/2, plus the
    unsplit gravity source and the viscous (Navier-Stokes) divergence
    when configured (ops/subgrid_viscous.py — hanging 2:1 faces handled
    by its internal virtual-fine pass; wall="noslip" adds the one-sided
    wall shear, viscous_wall_sides)."""
    from t8gpu_tpu.ops.source import has_gravity

    if order == 2:
        flux_fn = lambda v: sg.flux_divergence_muscl(
            v, volumes, conn, spec, gamma, flux, limiter=limiter,
            farfield=farfield)
    else:
        flux_fn = lambda v: sg.flux_divergence(v, volumes, conn, spec,
                                               gamma, flux,
                                               farfield=farfield)
    if float(mu) > 0.0:
        from t8gpu_tpu.ops.subgrid_viscous import (viscous_divergence,
                                                   viscous_wall_sides)
        from t8gpu_tpu.ops.viscous import viscous_speed_bound
        base = flux_fn
        dim = spec.dim
        noslip = wall == "noslip" and bool(conn.b_groups)

        def flux_fn(v):
            d, sp = base(v)
            d = d + viscous_divergence(v, volumes, conn, spec, gamma,
                                       float(mu), float(prandtl))
            if noslip:
                ws, wx = viscous_wall_sides(
                    v, volumes, conn, spec, gamma, float(mu),
                    float(prandtl), wall_velocity, wall_temperature)
                for k, c in zip(ws, wx):
                    d = sg._slab_add(d, c.reshape(5, -1), k // 2,
                                     layer_hi=(k % 2 == 0), spec=spec)
            # diffusive dt limit as a speed (cell size = element h / ext)
            live = volumes > 0
            rho_min = jnp.where(live, v[0].min(
                axis=tuple(range(v.ndim - 2))), jnp.inf).min()
            h_min = (jnp.where(live, volumes, jnp.inf).min()
                     ** (1.0 / dim)) / spec.extent
            nu = (float(mu) / rho_min) * max(1.0, gamma / float(prandtl))
            # summed, not maxed (ops/viscous.viscous_speed_bound docs)
            return d, sp + 2.0 * dim * nu / h_min
    if has_gravity(gravity):
        flux_fn = _with_cell_gravity(flux_fn, gravity, inv_cell_volume)
    return flux_fn


@functools.partial(jax.jit,
                   static_argnames=("spec", "gamma", "flux", "order",
                                    "limiter", "gravity", "mu", "prandtl",
                                    "wall", "wall_velocity",
                                    "wall_temperature", "farfield"),
                   donate_argnames=("u",))
def _rk3_step(u, conn: SubgridConnectivity, volumes, inv_cell_volume, dt,
              *, spec: SubgridSpec, gamma: float, flux: str,
              order: int = 1, limiter: str = "minmod",
              gravity=(0.0, 0.0, 0.0), mu: float = 0.0,
              prandtl: float = 0.72, wall: str = "slip",
              wall_velocity=(0.0, 0.0, 0.0), wall_temperature=None,
              farfield=None):
    from t8gpu_tpu.ops.source import has_gravity
    if _fused_path(conn, spec, order, u.dtype):
        return sg.ssp_rk3_fused(u, volumes, conn, spec, gamma, flux,
                                dt, inv_cell_volume, mu=float(mu),
                                prandtl=float(prandtl), wall=wall,
                                wall_velocity=wall_velocity,
                                wall_temperature=wall_temperature,
                                farfield=farfield, gravity=tuple(gravity))
    if order == 2 or has_gravity(gravity) or float(mu) > 0.0:
        flux_fn = _base_flux_fn(conn, volumes, spec, gamma, flux, order,
                                limiter, gravity, inv_cell_volume, mu,
                                prandtl, wall, wall_velocity,
                                wall_temperature, farfield)
        return rk.ssp_rk3(u, flux_fn, dt, inv_cell_volume)
    flux_fn = lambda v: sg.flux_divergence(v, volumes, conn, spec, gamma,
                                           flux, farfield=farfield)
    return rk.ssp_rk3(u, flux_fn, dt, inv_cell_volume)


@functools.partial(jax.jit,
                   static_argnames=("spec", "gamma", "flux", "n_steps",
                                    "order", "limiter", "gravity", "mu",
                                    "prandtl", "wall", "wall_velocity",
                                    "wall_temperature", "farfield",
                                    "observables"),
                   donate_argnames=("u",))
def _rk3_multi(u, conn: SubgridConnectivity, volumes, inv_cell_volume, dt,
               *, n_steps: int, spec: SubgridSpec, gamma: float, flux: str,
               order: int = 1, limiter: str = "minmod",
               gravity=(0.0, 0.0, 0.0), mu: float = 0.0,
               prandtl: float = 0.72, wall: str = "slip",
               wall_velocity=(0.0, 0.0, 0.0), wall_temperature=None,
               farfield=None, observables: tuple = ()):
    """n_steps fused RK3 steps in ONE device dispatch (lax.fori_loop).

    Between adapt events the connectivity is static, so whole step batches
    compile to a single XLA while-loop — the reference cannot do this (its
    step requires host-driven kernel launches + MPI barriers,
    solver.inl:152-266); on TPU it also amortizes host->device dispatch
    latency over the batch.

    With `observables` (static names, models/observables.OBSERVABLES) the
    batch runs as a lax.scan that also evaluates the requested global
    reductions after every step, returning (u, speed, rows [n_steps, K])."""
    one_step = _step_closure(conn, volumes, spec, gamma, flux, order,
                             limiter, gravity, inv_cell_volume, mu,
                             prandtl, wall, wall_velocity,
                             wall_temperature, farfield, dt)

    if observables:
        from t8gpu_tpu.models.observables import resolve
        fns = resolve(observables)
        cell_vol = volumes / spec.size

        def body(carry, _):
            v, sp = one_step(carry[0])
            row = jnp.stack([f(v, cell_vol, gamma) for f in fns])
            return (v, sp), row

        carry0 = (u, jnp.zeros((), u.dtype))
        (u, sp), rows = jax.lax.scan(body, carry0, None, length=n_steps)
        return u, sp, rows

    def body(_i, carry):
        return one_step(carry[0])

    return jax.lax.fori_loop(0, n_steps, body,
                             (u, jnp.zeros((), u.dtype)))


def _step_closure(conn, volumes, spec, gamma, flux, order, limiter,
                  gravity, inv_cell_volume, mu, prandtl, wall,
                  wall_velocity, wall_temperature, farfield, dt):
    """The ONE dispatch of a full RK3 step onto the fused Pallas path /
    the general flux_fn path / the plain stencil, shared by the
    multi-step and recording batch drivers."""
    from t8gpu_tpu.ops.source import has_gravity
    if _fused_path(conn, spec, order, volumes.dtype):
        return lambda v: sg.ssp_rk3_fused(
            v, volumes, conn, spec, gamma, flux, dt, inv_cell_volume,
            mu=float(mu), prandtl=float(prandtl), wall=wall,
            wall_velocity=wall_velocity,
            wall_temperature=wall_temperature, farfield=farfield,
            gravity=tuple(gravity))
    if order == 2 or has_gravity(gravity) or float(mu) > 0.0:
        flux_fn = _base_flux_fn(conn, volumes, spec, gamma, flux, order,
                                limiter, gravity, inv_cell_volume, mu,
                                prandtl, wall, wall_velocity,
                                wall_temperature, farfield)
    else:
        flux_fn = lambda v: sg.flux_divergence(v, volumes, conn, spec,
                                               gamma, flux,
                                               farfield=farfield)
    return lambda v: rk.ssp_rk3(v, flux_fn, dt, inv_cell_volume)


@jax.jit
def _integral(u_rho, cell_volume):
    return (u_rho * cell_volume).sum()


class SubgridCompressibleEulerSolver:
    """Euler solver on subgrid elements over a fixed or adaptive forest.

    Parameters
    ----------
    mesh: a SubgridMesh, or a MeshManager constructed with a SubgridMesh
        factory (see `subgrid_manager`) for dynamic AMR.
    ic: callable mapping cell centers [N*B, dim] -> conservative state
        [5, N*B] (cells in element-major C-order).
    """

    def __init__(self, mesh, ic: Callable[[np.ndarray], np.ndarray],
                 config: EulerConfig = EulerConfig(),
                 amr: AMRConfig = AMRConfig()):
        self.config = config
        self.amr = amr
        self.manager: Optional[MeshManager] = None
        if isinstance(mesh, MeshManager):
            self.manager = mesh
            self.amr = mesh.amr
            mesh = mesh.mesh
        assert isinstance(mesh, SubgridMesh)
        self.spec: SubgridSpec = mesh.spec
        self._max_speed = None
        # honor EulerConfig.dtype like the plain path (the reference's
        # float_type trait, memory_manager.h:27-42); f64 steps the XLA
        # stencil path (_fused_path gates the f32-only Mosaic kernels)
        self.dtype = resolve_dtype(config.dtype)

        u0 = np.asarray(ic(mesh.cell_centers()), self.dtype)
        u0 = u0.reshape((5, mesh.n_elements) + mesh.spec.extents)
        # internal layout is element-minor: [5, *ext, N] (ops/subgrid.py)
        self.install_mesh(mesh, jnp.asarray(np.moveaxis(u0, 1, -1)))

    # -- mesh / state installation --------------------------------------------

    def install_mesh(self, mesh: SubgridMesh, u: jnp.ndarray):
        self._crit_pending = None    # criteria refer to the previous mesh
        self.mesh = mesh
        self.conn = mesh.conn
        cap = mesh.conn.element_capacity
        n = mesh.n_elements
        B = self.spec.size
        dtype = getattr(self, "dtype", np.float32)
        vol = np.zeros(cap, dtype)
        vol[:n] = mesh.volumes
        inv = np.zeros(cap, dtype)
        inv[:n] = B / np.asarray(mesh.volumes, dtype)
        dim = self.spec.dim
        from t8gpu_tpu.utils.xfer import pack_put
        # [cap] broadcasts directly against the element-minor state
        self.volumes, self.inv_cell_volume = pack_put([vol, inv])
        if u.shape[-1] != cap:
            guard = jnp.broadcast_to(
                jnp.asarray(GUARD_STATE, u.dtype).reshape(
                    (5,) + (1,) * (dim + 1)),
                (5,) + self.spec.extents + (cap - u.shape[-1],))
            u = jnp.concatenate([u, guard], axis=-1)
        self.u = u

    # -- time stepping (ref solver.inl:152-266) --------------------------------

    def iterate(self, dt: float):
        self.u, self._max_speed = _rk3_step(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.asarray(dt, self.dtype), spec=self.spec, gamma=self.config.gamma,
            flux=self.config.flux, order=self.config.order,
            limiter=self._sg_limiter(),
            gravity=tuple(self.config.gravity),
            mu=float(self.config.mu), prandtl=float(self.config.prandtl),
            **self._wall_kwargs())

    def iterate_many(self, n_steps: int, dt: float):
        """Run n_steps RK3 steps as one fused device program."""
        self.u, self._max_speed = _rk3_multi(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.asarray(dt, self.dtype), n_steps=n_steps, spec=self.spec,
            gamma=self.config.gamma, flux=self.config.flux,
            order=self.config.order, limiter=self._sg_limiter(),
            gravity=tuple(self.config.gravity),
            mu=float(self.config.mu), prandtl=float(self.config.prandtl),
            **self._wall_kwargs())

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "kinetic_energy",
                                    "total_energy")):
        """n_steps fused RK3 steps AND a per-step observable history in
        one device dispatch — [n_steps, K] device array, one column per
        name in models/observables.OBSERVABLES (no host fetch per
        sample; see CompressibleEulerSolver.iterate_record)."""
        from t8gpu_tpu.models.observables import resolve
        resolve(observables)  # validate eagerly: empty/unknown names
        self.u, self._max_speed, rows = _rk3_multi(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.asarray(dt, self.dtype), n_steps=n_steps,
            observables=tuple(observables), spec=self.spec,
            gamma=self.config.gamma, flux=self.config.flux,
            order=self.config.order, limiter=self._sg_limiter(),
            gravity=tuple(self.config.gravity),
            mu=float(self.config.mu), prandtl=float(self.config.prandtl),
            **self._wall_kwargs())
        return rows

    def _wall_kwargs(self) -> dict:
        return validate_subgrid_bc(self.config, "CompressibleEulerSolver")

    def _sg_limiter(self) -> str:
        # EulerConfig.limiter speaks the plain path's names ("bj"/"none");
        # the subgrid per-axis scheme uses minmod as its limited variant.
        # A "-prim" suffix selects primitive-space reconstruction
        # (ops/euler.prim_rows) and passes through unmapped.
        lim, _, space = self.config.limiter.partition("-")
        lim = "none" if lim == "none" else "minmod"
        return f"{lim}-{space}" if space else lim

    # -- AMR cycle (ref solver.inl:327-345) -------------------------------------

    def adapt(self):
        from t8gpu_tpu.utils.profiling import phase

        if self.manager is None:
            raise RuntimeError("adapt() requires an adaptive MeshManager mesh")
        if self._crit_pending is not None:
            crit, self._crit_pending = self._crit_pending, None
        else:
            with phase("adapt/criteria-device"):
                crit = sg.h1_criteria(self.u, self.volumes, self.spec)
        with phase("adapt/criteria-fetch"):
            crit = np.asarray(crit)          # D2H (tunnel-bound here)
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
        with phase("adapt/remap-dispatch"):
            d_src, d_ref, d_child, d_coars = pack_put(
                [src, refined, child, coarsened])
            u_new = sg.apply_subgrid_remap(
                self.u, d_src, d_ref > 0, d_child, d_coars > 0,
                spec=self.spec, capacity=cap)
        with phase("adapt/install-mesh"):
            self.install_mesh(mesh, u_new)
        self._max_speed = None

    def adapt_prefetch(self):
        """Start the H1-criteria computation + device->host copy for a
        LATER adapt() (AMR pipelining — see
        CompressibleEulerSolver.adapt_prefetch): call a few steps before
        the adapt boundary so the tunnel-bound fetch overlaps the fused
        step batch instead of stalling the cycle."""
        if self.manager is None:
            raise RuntimeError("adapt_prefetch() requires a MeshManager")
        crit = sg.h1_criteria(self.u, self.volumes, self.spec)
        try:
            crit.copy_to_host_async()
        except AttributeError:
            pass
        self._crit_pending = crit

    # -- diagnostics -------------------------------------------------------------

    def compute_integral(self) -> float:
        """Global integral of rho dV (ref solver.inl has the plain analogue)."""
        return float(_integral(self.u[0], self.volumes / self.spec.size))

    def compute_entropy(self) -> float:
        """Total entropy integral -rho log(p rho^-gamma)/(gamma-1) dV —
        non-increasing under the entropy-stable KEPES flux (see
        CompressibleEulerSolver.compute_entropy)."""
        from t8gpu_tpu.models.compressible_euler import _entropy
        return float(_entropy(self.u, self.volumes / self.spec.size,
                              self.config.gamma))

    def compute_timestep(self) -> float:
        """CFL timestep: cfl * h_cell_min / max wave speed."""
        return float(self.compute_timestep_device())

    def compute_timestep_device(self):
        """CFL timestep as a DEVICE scalar — feed it straight to
        iterate/iterate_many to avoid a host round trip per adapt cycle
        (device->host fetches are latency-bound; BENCHMARKS.md).

        The bound uses the AXIS-SUMMED cell speed (ops/euler
        .cfl_sum_speed — the per-face max speed the reference uses is
        noise-unstable at cfl 0.7 in 3D, see its docstring) plus the
        SUMMED diffusive rate when mu > 0."""
        from t8gpu_tpu.ops.euler import cfl_sum_speed

        gamma = self.config.gamma
        dim = self.spec.dim
        live = self.volumes > 0
        speed = cfl_sum_speed(self.u, gamma, dim, live=live)
        h_min = 0.5 ** self.mesh.max_level / self.spec.extent
        mu = float(self.config.mu)
        if mu > 0.0:
            # diffusive dt limit as a speed, summed (same formula as
            # _base_flux_fn; max() is NOT stable for the coupled system)
            rho_min = jnp.where(live, self.u[0].min(
                axis=tuple(range(self.u.ndim - 2))), jnp.inf).min()
            h_cell = (jnp.where(live, self.volumes, jnp.inf).min()
                      ** (1.0 / dim)) / self.spec.extent
            nu = (mu / rho_min) * max(1.0, gamma / float(self.config.prandtl))
            speed = speed + 2.0 * dim * nu / h_cell
        return jnp.asarray(self.config.cfl * h_min, self.dtype) / speed

    @property
    def n_elements(self) -> int:
        return self.mesh.n_elements

    def conserved_state(self) -> np.ndarray:
        """Unpadded [5, N, *ext] state on host (element-major external
        order; internally the layout is element-minor)."""
        return np.moveaxis(np.asarray(self.u[..., : self.n_elements]), -1, 1)

    # -- enum-keyed storage view (ref SubgridMemoryManager API parity) --------

    def as_store(self):
        """Snapshot into an enum-keyed VariableStore over flat cells
        (cell count = n_elements * block size; the reference's
        SubgridMemoryManager equivalent, subgrid_memory_manager.h:425)."""
        from t8gpu_tpu.memory.store import VariableStore
        from t8gpu_tpu.models.compressible_euler import StepList, VariableList

        n_cells = self.n_elements * self.spec.size
        store = VariableStore.create(VariableList, StepList, n_cells)
        store = store.set_step(
            StepList.Prev,
            jnp.asarray(self.conserved_state().reshape(5, -1)))
        cell_vol = np.repeat(np.asarray(self.volumes[: self.n_elements])
                             / self.spec.size, self.spec.size)
        return store.set_volume(jnp.asarray(cell_vol))


def subgrid_manager(forest, spec: SubgridSpec,
                    amr: AMRConfig = AMRConfig()) -> MeshManager:
    """MeshManager wired with a SubgridMesh factory (the reference's
    SubgridMeshManager role, subgrid_mesh_manager.h:266)."""
    return MeshManager(
        forest, amr,
        mesh_factory=lambda f, cap: SubgridMesh.from_forest(f, spec, cap))
