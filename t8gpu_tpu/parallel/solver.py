"""Multi-chip compressible-Euler solver: shard_map over a device mesh.

The distributed counterpart of models/compressible_euler.py, covering the
reference's MPI multi-rank operation (`examples/compressible_euler` run
under `mpirun -n N` with CUDA MPS, README.md:46-58).  Elements are
SFC-partitioned across a 1D `Mesh(devices, ("sfc",))`; each RK3 stage
performs one halo all_gather over ICI (parallel/halo.py) and all flux and
stage arithmetic stays shard-local.  The CFL wave speed is a `pmax`, the
conservation integral a `psum` (ref MPI_Allreduce, solver.cu:206-222).

Dynamic AMR on the sharded state follows the reference cycle adapt ->
partition -> reconnect (`solver.inl:327-345`): criteria are computed
shard-local, the forest adapt + repartition happen on the host (the single
JAX controller), and the remapped state is resharded — the analogue of
`t8_forest_partition_data` + the `partition_data` IPC gather kernel
(`mesh_manager.inl:645-723`).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops.amr import apply_remap, pad_remap
from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.partition import (ShardedConnectivity,
                                          build_sharded_connectivity,
                                          shard_array, unshard_array)
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


class ShardedEulerSolver:
    """Plain-element Euler solver distributed over a 1D device mesh."""

    def __init__(self, forest: Forest, ic: Callable[[np.ndarray], np.ndarray],
                 devices=None,
                 config: EulerConfig = EulerConfig(),
                 amr: AMRConfig = AMRConfig()):
        self.config = config
        self.amr = amr
        devices = devices if devices is not None else jax.devices()
        self.mesh_dev = Mesh(np.asarray(devices), axis_names=(halo.AXIS,))
        self.n_shards = len(devices)
        self._max_speed = None
        self.forest = forest
        self._install(forest, ic=ic)

    # -- installation ---------------------------------------------------------

    def _install(self, forest: Forest, ic=None, u_stacked=None):
        """Partition the forest, build the sharded connectivity and place
        the state; exactly one of ic / u_stacked supplies the state."""
        self.forest = forest
        conn, bounds = build_sharded_connectivity(
            forest.build_faces(), forest.n_elements, self.n_shards)
        self.bounds = bounds
        CL = conn.local_capacity

        volumes = forest.volumes().astype(np.float32)
        inv = shard_array(1.0 / volumes, bounds, CL)
        vol = shard_array(volumes, bounds, CL)
        if u_stacked is None:
            u_global = np.asarray(ic(forest.centers()), np.float32)
            u_stacked = shard_array(u_global, bounds, CL)

        shard = NamedSharding(self.mesh_dev, P(halo.AXIS))
        self.conn: ShardedConnectivity = jax.device_put(conn, shard)
        self.u = jax.device_put(jnp.asarray(u_stacked), shard)
        self.inv_volume = jax.device_put(jnp.asarray(inv), shard)
        self.volume = jax.device_put(jnp.asarray(vol), shard)
        self._step = self._build_step()
        self._multi = {}
        self._criteria = self._build_criteria()

    def _build_step(self, n_steps: int = 1):
        mesh_dev = self.mesh_dev
        gamma, flux = self.config.gamma, self.config.flux
        spec = P(halo.AXIS)

        @functools.partial(
            jax.shard_map, mesh=mesh_dev,
            in_specs=(spec, spec, spec, P()),
            out_specs=(spec, P()))
        def step(u, conn, inv_vol, dt):
            u, conn, inv_vol = jax.tree.map(
                lambda x: x[0], (u, conn, inv_vol))
            flux_fn = lambda v: halo.sharded_flux_divergence(v, conn, gamma, flux)

            def body(_i, carry):
                v, _ = carry
                return rk.ssp_rk3(v, flux_fn, dt, inv_vol)

            u_next, speed = jax.lax.fori_loop(
                0, n_steps, body, (u, jnp.zeros((), u.dtype)))
            return u_next[None], speed

        return jax.jit(step, donate_argnums=(0,))

    def _build_criteria(self):
        spec = P(halo.AXIS)
        dim = self.forest.dim

        @functools.partial(
            jax.shard_map, mesh=self.mesh_dev,
            in_specs=(spec, spec, spec), out_specs=spec)
        def criteria(u, conn, volume):
            u, conn, volume = jax.tree.map(lambda x: x[0], (u, conn, volume))
            return _sharded_criteria(u, conn, volume, dim)[None]

        return jax.jit(criteria)

    # -- time stepping ----------------------------------------------------------

    def iterate(self, dt: float):
        self.u, self._max_speed = self._step(
            self.u, self.conn, self.inv_volume, jnp.float32(dt))

    def iterate_many(self, n_steps: int, dt: float):
        """Run n_steps RK3 steps as one fused device program (one dispatch,
        halo collectives inside the loop)."""
        fn = self._multi.get(n_steps)
        if fn is None:
            fn = self._multi[n_steps] = self._build_step(n_steps)
        self.u, self._max_speed = fn(
            self.u, self.conn, self.inv_volume, jnp.float32(dt))

    # -- AMR + repartition (ref solver.inl:327-345, mesh_manager.inl:645-723) ---

    def adapt(self):
        """Full distributed AMR cycle: local criteria -> host forest adapt
        (pre-balanced flags) -> state remap -> repartition + reshard."""
        crit = self._criteria(self.u, self.conn, self.volume)
        crit_global = unshard_array(np.asarray(crit), self.bounds)

        flags = self.forest.flags_from_criteria(
            crit_global, b=self.amr.refine_threshold,
            min_level=self.amr.min_level, max_level=self.amr.max_level)
        flags = self.forest.balance_flags(flags)
        new_forest, remap = self.forest.adapt(flags)

        # remap on the host-gathered state (single-controller; the data
        # volume is one halo-free copy — the reference likewise round-trips
        # criteria and rebuilds connectivity on host every adapt,
        # solver.cu:267, mesh_manager.inl:332-481)
        u_global = unshard_array(np.asarray(self.u), self.bounds)
        k = 1 << self.forest.dim
        n_new = new_forest.n_elements
        start, count = pad_remap(remap.src_start, remap.src_count, n_new)
        u_new = np.asarray(apply_remap(jnp.asarray(u_global), start, count,
                                       k=k, capacity=n_new))

        # repartition: equal-count SFC split of the new forest + reshard
        from t8gpu_tpu.memory.store import bucket_capacity
        from t8gpu_tpu.parallel.partition import partition_elements
        bounds = partition_elements(n_new, self.n_shards)
        CL = bucket_capacity(int((bounds[1:] - bounds[:-1]).max()))
        u_stacked = shard_array(u_new, bounds, CL)
        self._install(new_forest, u_stacked=u_stacked)
        self._max_speed = None

    # -- diagnostics --------------------------------------------------------------

    def compute_integral(self) -> float:
        return float((self.u[:, 0] * self.volume).sum())

    def compute_timestep(self) -> float:
        if self._max_speed is None:
            self.iterate(0.0)  # zero step: state unchanged, speed measured
        level = int(self.forest.level.max())
        return float(self.config.cfl * 0.5**level / float(self._max_speed))

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    def conserved_state(self) -> np.ndarray:
        """Global unpadded [5, N] state on host."""
        return unshard_array(np.asarray(self.u), self.bounds)


def _sharded_criteria(u, conn, volume, dim):
    """Per-shard gradient criteria (ref kernels.cu:471-501): |d rho| over
    incident faces / V^(1/dim), evaluated on the extended element axis."""
    u_ext = halo.halo_exchange(u, conn.send_idx)
    rho = u_ext[0]
    jump = jnp.abs(rho[conn.left] - rho[conn.right]) * (conn.area > 0)
    nb = conn.b_elem.shape[-1]
    all_j = jnp.concatenate([jump, jnp.zeros(nb + 1, u.dtype)])
    contrib = all_j[conn.inc_slot]
    grad = (contrib * jnp.abs(conn.inc_sign)).sum(axis=-1)
    h = jnp.where(volume > 0, volume, 1.0) ** (1.0 / dim)
    return grad / h * (volume > 0)
