"""Multi-chip subgrid solver: block halo exchange over a device mesh.

The distributed counterpart of models/subgrid_euler.py (the reference's
`SubgridCompressibleEulerSolver` under `mpirun -n N`): elements (whole
subgrid blocks) are SFC-partitioned; each flux evaluation all_gathers
the halo blocks published by every shard, inner fluxes stay purely
local (dense VPU work), and outer fluxes run the same slab-exchange
scheme as the single-device path with neighbor ids indexing the
extended [local | halo-pool] element axis.  Every shard computes only
its own side of each face, so nothing is ever written remotely —
replacing the reference's remote atomicAdd over CUDA IPC
(`examples/subgrid/kernels.inl:789-801`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from t8gpu_tpu.memory.store import bucket_capacity
from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import _flat_cells, _tangent_grid
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops import subgrid as sg
from t8gpu_tpu.parallel import halo
from t8gpu_tpu.parallel.partition import (partition_elements, shard_array,
                                          unshard_array)
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedSubgridConnectivity:
    """Stacked per-shard side tables (axis 0 = shard axis).

    Same slab-exchange scheme as the single-device SubgridConnectivity,
    but neighbor ids index the EXTENDED element axis
    [0, CL) local | [CL, CL + n_shards*H) halo pool, and each shard's
    tables cover only its local elements — every shard computes its own
    side of each face, so nothing is ever written remotely."""

    nbr: Tuple[jnp.ndarray, ...]      # per side [S, CL, M] i32 (extended)
    rel: Tuple[jnp.ndarray, ...]      # per side [S, CL] i8
    bits: Tuple[jnp.ndarray, ...]     # per side [S, CL, dim-1] i8
    mask: Tuple[jnp.ndarray, ...]     # per side [S, CL] f32
    b_cell: Tuple[jnp.ndarray, ...]   # per boundary group [S, Kb]
    b_area: Tuple[jnp.ndarray, ...]
    b_recv: Tuple[jnp.ndarray, ...]   # per boundary group [S, CL*T] i32
    send_idx: jnp.ndarray             # i32 [S, H] local element ids

    b_groups: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True))
    has_fine: Tuple[bool, ...] = dataclasses.field(metadata=dict(static=True))
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

    # --- global side tables, then shard + remap ------------------------------
    from t8gpu_tpu.mesh.subgrid import build_recv_map, build_side_tables
    M = 1 << (dim - 1)
    T = ext ** (dim - 1)
    g_nbr, g_rel, g_bits, g_mask = build_side_tables(forest, spec, n)

    # halo send lists: elements referenced by another shard's side tables
    send_lists = [[] for _ in range(n_shards)]
    for k in range(2 * dim):
        ids = g_nbr[k][:n].astype(np.int64)              # [n, M]
        own_rows = np.repeat(owner, M).reshape(n, M)
        own_ids = owner[ids]
        remote = own_ids != own_rows
        for r in range(n_shards):
            send_lists[r].append(ids[remote & (own_ids == r)])
    send_lists = [np.unique(np.concatenate(lst)) if lst else np.zeros(0, np.int64)
                  for lst in send_lists]
    H = bucket_capacity(max(max((len(x) for x in send_lists), default=1), 1),
                        base=64)
    send_idx = np.zeros((n_shards, H), np.int32)
    pool_of = np.full(n, -1, np.int64)                   # global id -> pool slot
    for r, lst in enumerate(send_lists):
        send_idx[r, : len(lst)] = lst - starts[r]
        pool_of[lst] = r * H + np.arange(len(lst))

    nbrs, rels, bitss, masks = [], [], [], []
    for k in range(2 * dim):
        nbr_s = np.zeros((n_shards, CL, M), np.int32)
        rel_s = np.zeros((n_shards, CL), np.int8)
        bit_s = np.zeros((n_shards, CL, max(dim - 1, 1)), np.int8)
        msk_s = np.zeros((n_shards, CL), np.float32)
        for s in range(n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            ids = g_nbr[k][lo:hi].astype(np.int64)
            local = owner[ids] == s
            ext_ids = np.where(local, ids - starts[s], CL + pool_of[ids])
            nbr_s[s, : hi - lo] = ext_ids
            rel_s[s, : hi - lo] = g_rel[k][lo:hi]
            bit_s[s, : hi - lo] = g_bits[k][lo:hi]
            msk_s[s, : hi - lo] = g_mask[k][lo:hi]
        nbrs.append(jnp.asarray(nbr_s))
        rels.append(jnp.asarray(rel_s))
        bitss.append(jnp.asarray(bit_s))
        masks.append(jnp.asarray(msk_s))

    # --- boundary subfaces per (shard, axis, sign) --------------------------
    b_cells, b_areas, b_groups, b_recvs = [], [], [], []
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
                                         [c.ravel() for c in coord],
                                         CL + n_shards * H)
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
                brs = np.full((n_shards, CL * T), Kb, np.int32)
                for s, (bc, ar) in enumerate(per_shard):
                    bs[s, : len(bc)] = bc
                    ars[s, : len(ar)] = ar
                    brs[s] = build_recv_map(
                        bc, CL, spec, axis, 1, sentinel=Kb,
                        n_elems_decode=CL + n_shards * H)[:, 0]
                b_cells.append(jnp.asarray(bs))
                b_areas.append(jnp.asarray(ars))
                b_recvs.append(jnp.asarray(brs))
                b_groups.append((axis, sign))

    conn = ShardedSubgridConnectivity(
        nbr=tuple(nbrs), rel=tuple(rels), bits=tuple(bitss),
        mask=tuple(masks),
        b_cell=tuple(b_cells), b_area=tuple(b_areas),
        b_recv=tuple(b_recvs),
        send_idx=jnp.asarray(send_idx), b_groups=tuple(b_groups),
        has_fine=tuple(bool((r[:n] == 1).any()) for r in g_rel),
        n_shards=n_shards, local_capacity=CL, halo_size=H)
    return conn, bounds


def sharded_subgrid_flux_divergence(u, volumes, conn, spec: SubgridSpec,
                                    gamma: float, flux: str):
    """Per-shard flux divergence [5, *ext, CL] + GLOBAL max wave speed.
    Runs inside shard_map; one block halo all_gather per call.
    Element-minor layout throughout (see ops/subgrid.py)."""
    D, sp_i = sg.inner_divergence(u, volumes, spec, gamma, flux)

    send = u[..., conn.send_idx]                         # [5, *ext, H]
    pool = jax.lax.all_gather(send, halo.AXIS)           # [S, 5, *ext, H]
    pool = jnp.moveaxis(pool, 0, -2)                     # [5, *ext, S, H]
    pool = pool.reshape(pool.shape[: spec.dim + 1] + (-1,))
    u_ext = jnp.concatenate([u, pool], axis=-1)          # [5, *ext, CL+S*H]
    speed = sp_i

    # slab-exchange outer fluxes, same scheme as ops/subgrid.outer_apply but
    # neighbor layers gathered from the extended element axis
    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    t_axes = tuple(range(1, 1 + n_t))
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    area_t = (h_e / ext) ** n_t
    area_v = area_t / (2 ** n_t)
    for a in range(dim):
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            nbr, rel, bits, mask = (conn.nbr[k], conn.rel[k],
                                    conn.bits[k], conn.mask[k])
            hi = sign > 0
            my_layer = jax.lax.index_in_dim(
                u, ext - 1 if hi else 0, axis=1 + a, keepdims=False)
            opp_layer = jax.lax.index_in_dim(
                u_ext, 0 if hi else ext - 1, axis=1 + a, keepdims=False)
            nb = sg._gather_layers(opp_layer, nbr)
            base = nb[..., 0]

            r = rel.reshape((1,) * (base.ndim - 1) + (-1,))
            other = jnp.where(r < 0, sg._coarse_window(base, bits, spec),
                              base)
            u_l, u_r = (my_layer, other) if hi else (other, my_layer)
            f, sp = sg.numerical_flux(sg.axis_rotate(u_l, a),
                                      sg.axis_rotate(u_r, a),
                                      gamma=gamma, flux=flux)
            w1 = mask * area_t * (rel <= 0)
            f = (sg.axis_unrotate(f, a)
                 * w1.reshape((1,) * (f.ndim - 1) + (-1,)))
            contrib = -f if hi else f
            sp_m = (w1 > 0).reshape((1,) * (f.ndim - 2) + (-1,))
            speed = jnp.maximum(speed, (sp * sp_m).max())

            if conn.has_fine[k]:
                fine = sg._fine_interleave(nb, spec)
                mine = sg._upsample2(my_layer, t_axes)
                u_l, u_r = (mine, fine) if hi else (fine, mine)
                f2, sp2 = sg.numerical_flux(sg.axis_rotate(u_l, a),
                                            sg.axis_rotate(u_r, a),
                                            gamma=gamma, flux=flux)
                w2 = mask * area_v * (rel > 0)
                f2 = (sg.axis_unrotate(f2, a)
                      * w2.reshape((1,) * (f2.ndim - 1) + (-1,)))
                f2 = sg._pool2(f2, n_t)
                contrib = contrib + (-f2 if hi else f2)
                sp_m2 = (w2 > 0).reshape((1,) * (f2.ndim - 2) + (-1,))
                speed = jnp.maximum(speed, (sp2 * sp_m2).max())

            D = sg._slab_add(D, contrib.reshape(contrib.shape[0], -1), a,
                             layer_hi=hi, spec=spec)

    u_ext_flat = u_ext.reshape(u.shape[0], -1)
    for (axis, sign), bc, ar, br in zip(conn.b_groups, conn.b_cell,
                                        conn.b_area, conn.b_recv):
        u_own = sg.axis_rotate(u_ext_flat[:, bc], axis)
        u_ghost = u_own.at[1].multiply(-1.0)
        if sign > 0:
            f, sp = sg.numerical_flux(u_own, u_ghost, gamma=gamma, flux=flux)
        else:
            f, sp = sg.numerical_flux(u_ghost, u_own, gamma=gamma, flux=flux)
        f = sg.axis_unrotate(f, axis) * ar
        f_pad = jnp.concatenate([f, jnp.zeros((5, 1), f.dtype)], axis=1)
        c = f_pad[:, br]
        D = sg._slab_add(D, -c if sign > 0 else c, axis,
                         layer_hi=sign > 0, spec=spec)
        speed = jnp.maximum(speed, (sp * (ar > 0)).max())

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
        # internal layout is element-minor: [5, *ext, N]
        self._install(forest, np.moveaxis(u0, 1, -1))

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
        # pad state element slots with the guard state (element-minor:
        # u_global is [5, *ext, N], shards slice/pad the minor axis)
        from t8gpu_tpu.models.subgrid_euler import GUARD_STATE
        u_stacked = np.empty((self.n_shards, 5) + self.spec.extents + (CL,),
                             np.float32)
        u_stacked[:] = GUARD_STATE.reshape((1, 5) + (1,) * (dim + 1))
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            u_stacked[s, ..., : hi - lo] = u_global[..., lo:hi]

        shard = NamedSharding(self.mesh_dev, P(halo.AXIS))
        self.conn = jax.device_put(conn, shard)
        self.u = jax.device_put(jnp.asarray(u_stacked), shard)
        self.volumes = jax.device_put(jnp.asarray(vol), shard)
        self.inv_cell_volume = jax.device_put(jnp.asarray(inv), shard)
        self._step = self._build_step()
        self._multi = {}

    def _build_step(self, n_steps: int = 1):
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

            def body(_i, carry):
                v, _ = carry
                return rk.ssp_rk3(v, flux_fn, dt, inv_cv)

            u_next, speed = jax.lax.fori_loop(
                0, n_steps, body, (u, jnp.zeros((), u.dtype)))
            return u_next[None], speed

        return jax.jit(step, donate_argnums=(0,))

    def iterate(self, dt: float):
        self.u, self._max_speed = self._step(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.float32(dt))

    def iterate_many(self, n_steps: int, dt: float):
        """n_steps fused RK3 steps in one dispatch (collectives inside)."""
        fn = self._multi.get(n_steps)
        if fn is None:
            fn = self._multi[n_steps] = self._build_step(n_steps)
        self.u, self._max_speed = fn(
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
        """Internal element-minor global state [5, *ext, N]."""
        stacked = np.asarray(self.u)
        parts = [stacked[s][..., : self.bounds[s + 1] - self.bounds[s]]
                 for s in range(self.n_shards)]
        return np.concatenate(parts, axis=-1)

    def compute_integral(self) -> float:
        cv = self.volumes / self.spec.size            # [S, CL]
        cv = cv.reshape((self.n_shards,) + (1,) * self.spec.dim + (-1,))
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
        """Global unpadded [5, N, *ext] (element-major external order)."""
        return np.moveaxis(self._gather_state(), -1, 1)
