"""Multi-chip subgrid solver: block halo exchange over a device mesh.

The distributed counterpart of models/subgrid_euler.py (the reference's
`SubgridCompressibleEulerSolver` under `mpirun -n N`): elements (whole
subgrid blocks) are SFC-partitioned; each flux evaluation all_gathers the
halo BLOCKS published by every shard, inner fluxes stay purely local
(dense VPU work), and outer/boundary fluxes index the extended
[local | halo-pool] cell axis.  Contributions landing on halo cells are
dropped (scatter mode='drop') — the owning shard computes them from its
own copy of the duplicated face, exactly replacing the reference's remote
atomicAdd over CUDA IPC (`examples/subgrid/kernels.inl:789-801`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from t8gpu_tpu.memory.store import bucket_capacity
from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import _flat_cells, expand_axis_subfaces, _tangent_grid
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops import subgrid as sg
from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.partition import (partition_elements, shard_array,
                                          unshard_array)
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedSubgridConnectivity:
    """Stacked per-shard subface maps (axis 0 = shard axis).

    Cell indices are flat over the EXTENDED element axis:
    [0, CL*B) local | [CL*B, (CL+S*H)*B) halo pool."""

    l_cell: Tuple[jnp.ndarray, ...]   # per face-axis [S, Ka] i32
    r_cell: Tuple[jnp.ndarray, ...]
    area: Tuple[jnp.ndarray, ...]
    b_cell: Tuple[jnp.ndarray, ...]   # per boundary group [S, Kb]
    b_area: Tuple[jnp.ndarray, ...]
    send_idx: jnp.ndarray             # i32 [S, H] local element ids

    b_groups: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    local_capacity: int = dataclasses.field(metadata=dict(static=True))
    halo_size: int = dataclasses.field(metadata=dict(static=True))


def build_sharded_subgrid_connectivity(
        forest: Forest, spec: SubgridSpec, n_shards: int
) -> Tuple[ShardedSubgridConnectivity, np.ndarray]:
    dim = forest.dim
    ext = spec.extent
    B = spec.size
    n = forest.n_elements
    assert forest.L - int(forest.level.max()) >= spec.log2_extent

    f = forest.build_faces()
    sizes = forest.sizes()
    h = forest.h_unit
    bounds = partition_elements(n, n_shards)
    starts = bounds[:-1]
    owner = np.searchsorted(bounds, np.arange(n), side="right") - 1
    CL = bucket_capacity(int((bounds[1:] - bounds[:-1]).max()))

    gl, gr = f["left"].astype(np.int64), f["right"].astype(np.int64)
    o_l, o_r = owner[gl], owner[gr]
    cross = o_l != o_r
    send_lists = []
    for s in range(n_shards):
        need = np.concatenate([gl[cross & (o_l == s)], gr[cross & (o_r == s)]])
        send_lists.append(np.unique(need))
    H = bucket_capacity(max(max((len(x) for x in send_lists), default=1), 1),
                        base=64)
    send_idx = np.zeros((n_shards, H), np.int32)
    pool_pos = {}
    for s, lst in enumerate(send_lists):
        send_idx[s, : len(lst)] = lst - starts[s]
        for p, g in enumerate(lst):
            pool_pos[int(g)] = s * H + p

    def ext_elem(g: np.ndarray, s: int) -> np.ndarray:
        """Global element ids -> extended element indices for shard s."""
        local = owner[g] == s
        out = np.where(local, g - starts[s], 0).astype(np.int64)
        for i in np.flatnonzero(~local):
            out[i] = CL + pool_pos[int(g[i])]
        return out

    # --- interior subfaces per (shard, axis) --------------------------------
    l_groups = [[] for _ in range(dim)]
    r_groups = [[] for _ in range(dim)]
    a_groups = [[] for _ in range(dim)]
    for axis in range(dim):
        sel_ax = np.flatnonzero(f["axis"] == axis)
        per_shard = []
        for s in range(n_shards):
            sel = sel_ax[(o_l[sel_ax] == s) | (o_r[sel_ax] == s)]
            if len(sel):
                le, re = gl[sel], gr[sel]
                el, cl, er, cr, ar = expand_axis_subfaces(
                    spec, axis, le, re, f["sign"][sel],
                    f["level_difference"][sel], f["neighbor_offset"][sel],
                    sizes[re], sizes[le], h)
                lc = _flat_cells(spec, ext_elem(el, s), cl)
                rc = _flat_cells(spec, ext_elem(er, s), cr)
            else:
                lc = np.zeros(0, np.int32)
                rc = np.zeros(0, np.int32)
                ar = np.zeros(0, np.float32)
            per_shard.append((lc, rc, ar))
        Ka = bucket_capacity(max(max((len(p[0]) for p in per_shard), default=1), 1))
        ls = np.zeros((n_shards, Ka), np.int32)
        rs = np.zeros((n_shards, Ka), np.int32)
        ars = np.zeros((n_shards, Ka), np.float32)
        for s, (lc, rc, ar) in enumerate(per_shard):
            ls[s, : len(lc)] = lc
            rs[s, : len(rc)] = rc
            ars[s, : len(ar)] = ar
        l_groups[axis] = jnp.asarray(ls)
        r_groups[axis] = jnp.asarray(rs)
        a_groups[axis] = jnp.asarray(ars)

    # --- boundary subfaces per (shard, axis, sign) --------------------------
    b_cells, b_areas, b_groups = [], [], []
    if f["b_elem"] is not None:
        gb = f["b_elem"].astype(np.int64)
        t_grid = _tangent_grid(ext, dim)
        S_sub = t_grid.shape[0]
        for axis in range(dim):
            for sign in (1, -1):
                sel_g = np.flatnonzero((f["b_axis"] == axis) & (f["b_sign"] == sign))
                if not len(sel_g):
                    continue
                per_shard = []
                for s in range(n_shards):
                    sel = sel_g[owner[gb[sel_g]] == s]
                    if len(sel):
                        be = gb[sel]
                        K = len(sel)
                        coord = [None] * dim
                        coord[axis] = np.full((K, S_sub),
                                              ext - 1 if sign > 0 else 0, np.int64)
                        tangents = [a for a in range(dim) if a != axis]
                        for ti, ta in enumerate(tangents):
                            coord[ta] = np.broadcast_to(
                                t_grid[None, :, ti], (K, S_sub))
                        elem = np.broadcast_to((be - starts[s])[:, None], (K, S_sub))
                        bc = _flat_cells(spec, elem.ravel(),
                                         [c.ravel() for c in coord])
                        ar = np.broadcast_to(
                            ((sizes[be] * h / ext) ** (dim - 1)
                             ).astype(np.float32)[:, None], (K, S_sub)).ravel()
                    else:
                        bc = np.zeros(0, np.int32)
                        ar = np.zeros(0, np.float32)
                    per_shard.append((bc, ar))
                Kb = bucket_capacity(max(max((len(p[0]) for p in per_shard),
                                             default=1), 1))
                bs = np.zeros((n_shards, Kb), np.int32)
                ars = np.zeros((n_shards, Kb), np.float32)
                for s, (bc, ar) in enumerate(per_shard):
                    bs[s, : len(bc)] = bc
                    ars[s, : len(ar)] = ar
                b_cells.append(jnp.asarray(bs))
                b_areas.append(jnp.asarray(ars))
                b_groups.append((axis, sign))

    conn = ShardedSubgridConnectivity(
        l_cell=tuple(l_groups), r_cell=tuple(r_groups), area=tuple(a_groups),
        b_cell=tuple(b_cells), b_area=tuple(b_areas),
        send_idx=jnp.asarray(send_idx), b_groups=tuple(b_groups),
        n_shards=n_shards, local_capacity=CL, halo_size=H)
    return conn, bounds


def sharded_subgrid_flux_divergence(u, volumes, conn, spec: SubgridSpec,
                                    gamma: float, flux: str):
    """Per-shard flux divergence [5, CL, *ext] + GLOBAL max wave speed.
    Runs inside shard_map; one block halo all_gather per call."""
    D, sp_i = sg.inner_divergence(u, volumes, spec, gamma, flux)

    send = u[:, conn.send_idx]                           # [5, H, *ext]
    pool = jax.lax.all_gather(send, halo.AXIS)           # [S, 5, H, *ext]
    pool = jnp.moveaxis(pool, 0, 1).reshape((u.shape[0], -1) + spec.extents)
    u_ext_flat = jnp.concatenate([u, pool], axis=1).reshape(u.shape[0], -1)

    n_local_cells = u.shape[1] * spec.size
    D_flat = D.reshape(u.shape[0], -1)
    speed = sp_i
    for a, (lc, rc, ar) in enumerate(zip(conn.l_cell, conn.r_cell, conn.area)):
        u_l = u_ext_flat[:, lc]
        u_r = u_ext_flat[:, rc]
        f, sp = sg.numerical_flux(sg.axis_rotate(u_l, a), sg.axis_rotate(u_r, a),
                                  gamma=gamma, flux=flux)
        f = sg.axis_unrotate(f, a) * ar
        # halo-cell contributions are dropped: the owning shard accumulates
        # them from its duplicate of this face
        D_flat = D_flat.at[:, lc].add(-f, mode="drop")
        D_flat = D_flat.at[:, rc].add(f, mode="drop")
        speed = jnp.maximum(speed, (sp * (ar > 0)).max())
    for (axis, sign), bc, ar in zip(conn.b_groups, conn.b_cell, conn.b_area):
        u_own = sg.axis_rotate(u_ext_flat[:, bc], axis)
        u_ghost = u_own.at[1].multiply(-1.0)
        if sign > 0:
            f, sp = sg.numerical_flux(u_own, u_ghost, gamma=gamma, flux=flux)
        else:
            f, sp = sg.numerical_flux(u_ghost, u_own, gamma=gamma, flux=flux)
        f = sg.axis_unrotate(f, axis) * ar
        D_flat = D_flat.at[:, bc].add(-f if sign > 0 else f, mode="drop")
        speed = jnp.maximum(speed, (sp * (ar > 0)).max())

    D = D_flat[:, :n_local_cells].reshape(D.shape)
    return D, jax.lax.pmax(speed, halo.AXIS)


class ShardedSubgridEulerSolver:
    """Subgrid Euler solver distributed over a 1D device mesh."""

    def __init__(self, forest: Forest, spec: SubgridSpec,
                 ic: Callable[[np.ndarray], np.ndarray],
                 devices=None,
                 config: EulerConfig = EulerConfig(),
                 amr: AMRConfig = AMRConfig()):
        self.config = config
        self.amr = amr
        self.spec = spec
        devices = devices if devices is not None else jax.devices()
        self.mesh_dev = Mesh(np.asarray(devices), axis_names=(halo.AXIS,))
        self.n_shards = len(devices)
        self._max_speed = None
        from t8gpu_tpu.mesh.subgrid import cell_centers
        u0 = np.asarray(ic(cell_centers(forest, spec)), np.float32)
        u0 = u0.reshape((u0.shape[0], forest.n_elements) + spec.extents)
        self._install(forest, u0)

    def _install(self, forest: Forest, u_global: np.ndarray):
        self.forest = forest
        conn, bounds = build_sharded_subgrid_connectivity(
            forest, self.spec, self.n_shards)
        self.bounds = bounds
        CL = conn.local_capacity
        dim = self.spec.dim
        B = self.spec.size

        volumes = forest.volumes().astype(np.float32)
        vol = shard_array(volumes, bounds, CL)
        inv = shard_array((B / volumes).astype(np.float32), bounds, CL)
        # pad state element slots with the guard state
        from t8gpu_tpu.models.subgrid_euler import GUARD_STATE
        u_stacked = np.empty((self.n_shards, 5, CL) + self.spec.extents,
                             np.float32)
        u_stacked[:] = GUARD_STATE.reshape((1, 5, 1) + (1,) * dim)
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            u_stacked[s, :, : hi - lo] = u_global[:, lo:hi]

        shard = NamedSharding(self.mesh_dev, P(halo.AXIS))
        self.conn = jax.device_put(conn, shard)
        self.u = jax.device_put(jnp.asarray(u_stacked), shard)
        self.volumes = jax.device_put(jnp.asarray(vol), shard)
        self.inv_cell_volume = jax.device_put(
            jnp.asarray(inv).reshape((self.n_shards, 1, CL) + (1,) * dim), shard)
        self._step = self._build_step()

    def _build_step(self):
        gamma, flux = self.config.gamma, self.config.flux
        spec_p = P(halo.AXIS)
        sgspec = self.spec

        @functools.partial(
            jax.shard_map, mesh=self.mesh_dev,
            in_specs=(spec_p, spec_p, spec_p, spec_p, P()),
            out_specs=(spec_p, P()))
        def step(u, conn, volumes, inv_cv, dt):
            u, conn, volumes, inv_cv = jax.tree.map(
                lambda x: x[0], (u, conn, volumes, inv_cv))
            flux_fn = lambda v: sharded_subgrid_flux_divergence(
                v, volumes, conn, sgspec, gamma, flux)
            u_next, speed = rk.ssp_rk3(u, flux_fn, dt, inv_cv)
            return u_next[None], speed

        return jax.jit(step, donate_argnums=(0,))

    def iterate(self, dt: float):
        self.u, self._max_speed = self._step(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.float32(dt))

    def adapt(self):
        """Distributed AMR: local H1 criteria -> host adapt -> subgrid remap
        -> SFC repartition + reshard (ref solver.inl:327-345)."""
        crit_stacked = np.asarray(jax.jit(
            jax.vmap(sg.h1_criteria, in_axes=(0, 0, None)),
            static_argnums=(2,))(self.u, self.volumes, self.spec))
        crit = unshard_array(crit_stacked, self.bounds)

        flags = self.forest.flags_from_criteria(
            crit, b=self.amr.refine_threshold,
            min_level=self.amr.min_level, max_level=self.amr.max_level)
        flags = self.forest.balance_flags(flags)
        new_forest, remap = self.forest.adapt(flags)

        u_global = jnp.asarray(self._gather_state())
        n_new = new_forest.n_elements
        src = np.zeros(n_new, np.int32)
        refined = np.zeros(n_new, bool)
        child = np.zeros(n_new, np.int32)
        coarsened = np.zeros(n_new, bool)
        src[:] = remap.src_start
        refined[:] = remap.level_change > 0
        child[:] = remap.child_id
        coarsened[:] = remap.src_count > 1
        u_new = np.asarray(sg.apply_subgrid_remap(
            u_global, jnp.asarray(src), jnp.asarray(refined),
            jnp.asarray(child), jnp.asarray(coarsened),
            spec=self.spec, capacity=n_new))
        self._install(new_forest, u_new)
        self._max_speed = None

    def _gather_state(self) -> np.ndarray:
        stacked = np.asarray(self.u)
        parts = [stacked[s, :, : self.bounds[s + 1] - self.bounds[s]]
                 for s in range(self.n_shards)]
        return np.concatenate(parts, axis=1)

    def compute_integral(self) -> float:
        cv = self.volumes / self.spec.size            # [S, CL]
        cv = cv.reshape(cv.shape + (1,) * self.spec.dim)
        return float((self.u[:, 0] * cv).sum())

    def compute_timestep(self) -> float:
        if self._max_speed is None:
            self.iterate(0.0)
        h_min = 0.5 ** int(self.forest.level.max()) / self.spec.extent
        return float(self.config.cfl * h_min / float(self._max_speed))

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    def conserved_state(self) -> np.ndarray:
        return self._gather_state()
