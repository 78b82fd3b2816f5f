"""Distributed (multi-chip) subgrid GLM-MHD.

`ShardedSubgridMHDSolver` = `ShardedSubgridEulerSolver`'s distribution
machinery (SFC sharding, capacity buckets, neighbor-wise ppermute halo,
device-side distributed AMR remap, compiled-program reuse across adapts)
with the 9-row GLM-MHD physics of `ops/subgrid_mhd.py` swapped in — the
same subclass pattern as the plain-path families (parallel/mhd.py).

Two MHD-specific distributed ingredients:

  * the cleaning speed c_h is GLOBAL: computed per shard from live local
    cells and `lax.pmax`'d over the mesh axis before any interface sees
    it, so every chip's GLM subsystem rides the identical wave speed;
  * the halo exchange ships the full 9-row state (`_halo_exchange_state`
    is row-count generic) and the interface engine reads neighbor layers
    from the extended element axis (`_interface_engine(u_ext=...)`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.models.mhd import (MHD_GUARD, MHD_OBSERVABLES, MHD_REDUCERS,
                                  glm_ch, mhd_cfl_speed)
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops.subgrid_mhd import (_conductor_ghost, _interface_engine,
                                       _rusanov_stack, axis_unrotate9)
from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.subgrid import (ShardedSubgridEulerSolver,
                                        _halo_exchange_state)
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

N_ROWS = 9


def sharded_subgrid_mhd_divergence(u, volumes, conn, spec: SubgridSpec,
                                   gamma: float, alpha: float):
    """Per-shard GLM-MHD flux divergence [9, *ext, CL] + GLOBAL max
    signal speed (runs inside shard_map; one halo exchange + one pmax'd
    c_h per call).  On TPU backends with ext 4/8 the per-shard interior +
    equal/coarse + wall interfaces run as the fused Pallas kernel
    (ops/pallas_kernels.fused_mhd_flux_pallas) with side layers resolved
    from the halo-extended axis; hanging-fine subfaces stay the XLA
    additive pass — the same dispatch as the single-device
    mhd_subgrid_divergence."""
    from t8gpu_tpu.ops.pallas_kernels import kernel_mode
    mode = kernel_mode()
    u_ext = _halo_exchange_state(u, conn)
    live = volumes > 0
    ch = jnp.maximum(jax.lax.pmax(glm_ch(u, gamma, live), halo.AXIS), 1e-12)
    iface = lambda l, r: _rusanov_stack(l, r, gamma, ch)
    if mode != "off" and spec.extent in (4, 8):
        from t8gpu_tpu.ops.pallas_kernels import fused_mhd_flux_pallas
        from t8gpu_tpu.ops.subgrid_mhd import mhd_side_inputs
        others, weights = mhd_side_inputs(u, conn, spec, volumes, ch,
                                          u_ext=u_ext)
        D, sp_e = fused_mhd_flux_pallas(u, weights, others, gamma=gamma,
                                        interpret=mode == "interpret")
        speed = sp_e.max()
        if any(conn.has_fine):
            D2, sp_f = _interface_engine(u, volumes, conn, spec, N_ROWS,
                                         iface, axis_unrotate9,
                                         _conductor_ghost, u_ext=u_ext,
                                         fine_only=True)
            D = D + D2
            speed = jnp.maximum(speed, sp_f)
    else:
        D, speed = _interface_engine(u, volumes, conn, spec, N_ROWS, iface,
                                     axis_unrotate9, _conductor_ghost,
                                     u_ext=u_ext)
    if alpha > 0.0:
        h_cell = (jnp.where(live, volumes, 1.0) ** (1.0 / spec.dim)
                  / spec.extent)
        cell_vol = volumes / spec.size
        D = D.at[8].add(-alpha * ch * u[8] * (cell_vol / h_cell) * live)
    return D, jax.lax.pmax(speed, halo.AXIS)


def sharded_subgrid_mhd_divergence_muscl(u, volumes, conn,
                                         spec: SubgridSpec, gamma: float,
                                         alpha: float,
                                         limiter: str = "minmod"):
    """Per-shard second-order GLM-MHD divergence
    (`ShardedSubgridMHDSolver(order=2)`): the subgrid halo ships WHOLE
    neighbor elements, so the equal-level facing layers the MUSCL core
    needs are already on the extended axis — no extra halo round vs
    first order (same property as the sharded Euler subgrid MUSCL).  The
    slope/interface math is the SHARED ops/subgrid_mhd.mhd_muscl_engine
    gathering from the extended axis, so sharded == single-device is
    identical code; c_h is pmax'd BEFORE any interface sees it."""
    from t8gpu_tpu.ops.subgrid_mhd import mhd_muscl_engine
    u_ext = _halo_exchange_state(u, conn)
    live = volumes > 0
    ch = jnp.maximum(jax.lax.pmax(glm_ch(u, gamma, live), halo.AXIS), 1e-12)
    D, speed = mhd_muscl_engine(u, u_ext, volumes, conn, spec, gamma, ch,
                                limiter=limiter)
    if alpha > 0.0:
        h_cell = (jnp.where(live, volumes, 1.0) ** (1.0 / spec.dim)
                  / spec.extent)
        cell_vol = volumes / spec.size
        D = D.at[8].add(-alpha * ch * u[8] * (cell_vol / h_cell) * live)
    return D, jax.lax.pmax(speed, halo.AXIS)


class ShardedSubgridMHDSolver(ShardedSubgridEulerSolver):
    """Subgrid GLM-MHD distributed over a 1D device mesh: distribution
    machinery inherited; physics = ops/subgrid_mhd.py."""

    N_ROWS = 9

    @staticmethod
    def _guard_state() -> np.ndarray:
        return MHD_GUARD

    def _obs_registry(self):
        return MHD_OBSERVABLES

    def _obs_reducers(self):
        return MHD_REDUCERS

    def __init__(self, forest: Forest, spec: SubgridSpec, ic,
                 devices=None, gamma: float = 5.0 / 3.0,
                 glm_alpha: float = 0.1, amr: AMRConfig = AMRConfig(),
                 cfl: float = 0.45, order: int = 1,
                 limiter: str = "minmod"):
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        if limiter not in ("minmod", "none"):
            raise ValueError(
                f"subgrid MHD limiters are per-axis 'minmod' or 'none', "
                f"got {limiter!r}")
        # attributes first: super().__init__ calls self._build_speed()
        self.gamma = float(gamma)
        self.glm_alpha = float(glm_alpha)
        self.cfl = float(cfl)
        self.order = int(order)
        self.limiter = str(limiter)
        # the parent stores an EulerConfig for cfl/gamma plumbing
        # (compute_timestep_device); flux/order fields are never read —
        # _build_step and _build_speed are fully overridden here
        super().__init__(forest, spec, ic, devices=devices,
                         config=EulerConfig(gamma=float(gamma),
                                            cfl=float(cfl)), amr=amr)

    def _build_step(self, n_steps: int = 1, observables: tuple = ()):
        gamma, alpha = self.gamma, self.glm_alpha
        order, limiter = self.order, self.limiter
        sgspec = self.spec
        u_spec = self._u_spec()

        if observables:
            from t8gpu_tpu.models.observables import resolve
            obs_fns = resolve(observables, MHD_OBSERVABLES)
            obs_reds = tuple(MHD_REDUCERS[n] for n in observables)
        out_specs = ((u_spec, P(), P()) if observables
                     else (u_spec, P()))

        @functools.partial(
            jax.shard_map, mesh=self.mesh_dev,
            in_specs=(u_spec, P(halo.AXIS), P(halo.AXIS), P(halo.AXIS), P()),
            out_specs=out_specs, check_vma=False)
        def step(u, conn, volumes, inv_cv, dt):
            conn = jax.tree.map(lambda x: x[0], conn)
            if order == 2:
                flux_fn = lambda v: sharded_subgrid_mhd_divergence_muscl(
                    v, volumes, conn, sgspec, gamma, alpha, limiter=limiter)
            else:
                flux_fn = lambda v: sharded_subgrid_mhd_divergence(
                    v, volumes, conn, sgspec, gamma, alpha)
            one = lambda v: rk.ssp_rk3(v, flux_fn, dt, inv_cv)

            if observables:
                cell_vol = volumes / sgspec.size

                def body(carry, _):
                    v, sp = one(carry[0])
                    row = jnp.stack([
                        jax.lax.psum(f(v, cell_vol, gamma), halo.AXIS)
                        if r == "sum"
                        else jax.lax.pmax(f(v, cell_vol, gamma), halo.AXIS)
                        for f, r in zip(obs_fns, obs_reds)])
                    return (v, sp), row

                carry0 = (u, jnp.zeros((), u.dtype))
                (u_out, sp), rows = jax.lax.scan(body, carry0, None,
                                                 length=n_steps)
                return u_out, sp, rows

            def body(_i, carry):
                return one(carry[0])

            return jax.lax.fori_loop(
                0, n_steps, body, (u, jnp.zeros((), u.dtype)))

        return jax.jit(step, donate_argnums=(0,))

    def _build_speed(self):
        """Axis-summed MHD CFL speed — a pure cell reduction over the
        global sharded state (models/mhd.mhd_cfl_speed)."""
        gamma = self.gamma
        sgspec = self.spec

        @jax.jit
        def speed(u, conn, volumes):
            del conn                      # kept for call-site signature
            return mhd_cfl_speed(u, gamma, sgspec.dim, volumes > 0)

        return speed

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "total_energy",
                                    "magnetic_energy", "psi_energy")):
        return super().iterate_record(n_steps, dt, observables=observables)

    def compute_divergence_b(self) -> np.ndarray:
        """Global per-cell Green-Gauss div B [N, *ext] (gathered;
        diagnostic, not a stepping-path call)."""
        from t8gpu_tpu.ops.subgrid_mhd import subgrid_divergence_b
        u_spec = self._u_spec()

        @functools.partial(
            jax.shard_map, mesh=self.mesh_dev,
            in_specs=(u_spec, P(halo.AXIS), P(halo.AXIS)),
            out_specs=P(*((None,) * self.spec.dim), halo.AXIS),
            check_vma=False)
        def divb(u, conn, volumes):
            conn = jax.tree.map(lambda x: x[0], conn)
            u_ext = _halo_exchange_state(u, conn)
            iface = lambda l, r: ((0.5 * (l[5] + r[5]))[None],
                                  jnp.zeros_like(l[0]))
            D, _ = _interface_engine(u, volumes, conn, self.spec, 1, iface,
                                     lambda f, a: f, lambda q: q,
                                     u_ext=u_ext)
            live = volumes > 0
            cell_vol = jnp.where(live, volumes, 1.0) / self.spec.size
            return jnp.where(live, -D[0] / cell_vol, 0.0)

        d = np.asarray(divb(self.u, self.conn, self.volumes))
        from t8gpu_tpu.parallel.subgrid import _unpad_flat
        return np.moveaxis(_unpad_flat(d, self.bounds, self.local_capacity),
                           -1, 0)
