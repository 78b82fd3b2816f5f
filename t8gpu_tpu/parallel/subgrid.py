"""Multi-chip subgrid solver: block halo exchange over a device mesh.

The distributed counterpart of models/subgrid_euler.py (the reference's
`SubgridCompressibleEulerSolver` under `mpirun -n N`): elements (whole
subgrid blocks) are SFC-partitioned; each flux evaluation ships the
halo blocks with neighbor-scoped ppermute rounds (parallel/partition.py),
inner fluxes stay purely local (dense VPU work), and outer fluxes run
the same slab-exchange scheme as the single-device path with neighbor
ids indexing the extended [local | received-rounds] element axis.  Every shard computes only
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
from t8gpu_tpu.parallel.partition import partition_elements, shard_array
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedSubgridConnectivity:
    """Stacked per-shard side tables (axis 0 = shard axis).

    Same slab-exchange scheme as the single-device SubgridConnectivity,
    but neighbor ids index the EXTENDED element axis
    [0, CL) local | [CL, CL + halo_size) received ppermute-round blocks,
    and each shard's tables cover only its local elements — every shard
    computes its own side of each face, so nothing is ever written
    remotely."""

    nbr: Tuple[jnp.ndarray, ...]      # per side [S, CL, M] i32 (extended)
    rel: Tuple[jnp.ndarray, ...]      # per side [S, CL] i8
    bits: Tuple[jnp.ndarray, ...]     # per side [S, CL, dim-1] i8
    mask: Tuple[jnp.ndarray, ...]     # per side [S, CL] f32
    # compact hanging-fine tables (mesh/subgrid.SubgridConnectivity):
    # [S, K] local fine-element ids / [S, CL] inverse positions
    fine_idx: Tuple[jnp.ndarray, ...]
    fine_inv: Tuple[jnp.ndarray, ...]
    b_cell: Tuple[jnp.ndarray, ...]   # per boundary group [S, Kb]
    b_area: Tuple[jnp.ndarray, ...]
    b_recv: Tuple[jnp.ndarray, ...]   # per boundary group [S, CL*T] i32
    # neighbor-wise halo plan (see parallel/partition.py): one send list
    # per active shard-offset round
    send_rounds: Tuple[jnp.ndarray, ...]   # i32 [S, H_r] local element ids

    halo_rounds: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))
    b_groups: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True))
    has_fine: Tuple[bool, ...] = dataclasses.field(metadata=dict(static=True))
    has_coarse: Tuple[bool, ...] = dataclasses.field(
        metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    local_capacity: int = dataclasses.field(metadata=dict(static=True))
    halo_size: int = dataclasses.field(metadata=dict(static=True))  # sum H_r


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

    # neighbor-wise halo plan (ghost scoping): per destination shard, the
    # remote block ids its side tables reference, grouped by owner; each
    # (owner -> dest) pair is one ppermute round r = (dest - owner) mod S
    round_lists = {}
    dest_map = []                # per dest: global id -> extended index
    for t in range(n_shards):
        lo, hi = bounds[t], bounds[t + 1]
        refs = np.unique(np.concatenate(
            [g_nbr[k][lo:hi].ravel() for k in range(2 * dim)]).astype(np.int64))
        refs = refs[owner[refs] != t]
        groups = []
        for s in np.unique(owner[refs]) if len(refs) else []:
            r = int((t - s) % n_shards)
            lst = refs[owner[refs] == s]
            round_lists.setdefault(r, [np.zeros(0, np.int64)] * n_shards)
            round_lists[r][s] = lst
            groups.append((r, lst))
        dest_map.append(groups)

    halo_rounds = tuple(sorted(round_lists))
    H_r = {r: bucket_capacity(max(max(len(x) for x in round_lists[r]), 1),
                              base=16)
           for r in halo_rounds}
    round_offset = {}
    off = 0
    for r in halo_rounds:
        round_offset[r] = off
        off += H_r[r]
    H = off
    send_rounds = []
    for r in halo_rounds:
        arr = np.zeros((n_shards, H_r[r]), np.int32)
        for s, lst in enumerate(round_lists[r]):
            arr[s, : len(lst)] = lst - starts[s]
        send_rounds.append(arr)

    # per-dest extended-index translation table over global element ids
    ext_of = np.zeros((n_shards, n), np.int64)
    for t in range(n_shards):
        ext_of[t, bounds[t]: bounds[t + 1]] = np.arange(
            bounds[t + 1] - bounds[t])
        for r, lst in dest_map[t]:
            ext_of[t, lst] = CL + round_offset[r] + np.arange(len(lst))

    nbrs, rels, bitss, masks = [], [], [], []
    for k in range(2 * dim):
        nbr_s = np.zeros((n_shards, CL, M), np.int32)
        rel_s = np.zeros((n_shards, CL), np.int8)
        bit_s = np.zeros((n_shards, CL, max(dim - 1, 1)), np.int8)
        msk_s = np.zeros((n_shards, CL), np.float32)
        for s in range(n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            ids = g_nbr[k][lo:hi].astype(np.int64)
            nbr_s[s, : hi - lo] = ext_of[s, ids]
            rel_s[s, : hi - lo] = g_rel[k][lo:hi]
            bit_s[s, : hi - lo] = g_bits[k][lo:hi]
            msk_s[s, : hi - lo] = g_mask[k][lo:hi]
        nbrs.append(nbr_s)
        rels.append(rel_s)
        bitss.append(bit_s)
        masks.append(msk_s)

    # compact hanging-fine tables per side, K common across shards
    fine_idxs, fine_invs = [], []
    for k in range(2 * dim):
        rel_s = rels[k]
        per = [np.flatnonzero(rel_s[s] == 1) for s in range(n_shards)]
        mx = max(len(p) for p in per)
        if mx == 0:
            fine_idxs.append(np.zeros((n_shards, 0), np.int32))
            fine_invs.append(np.zeros((n_shards, 0), np.int32))
            continue
        # coarse x2 buckets — same rationale as mesh/subgrid
        # build_fine_tables (adapt-to-adapt K jitter = program churn)
        K = bucket_capacity(mx, growth=2.0, base=256)
        fi = np.zeros((n_shards, K), np.int32)
        inv = np.full((n_shards, CL), K, np.int32)
        for s, pos in enumerate(per):
            if len(pos):
                fi[s] = pos[0]
                fi[s, : len(pos)] = pos
                inv[s, pos] = np.arange(len(pos))
        fine_idxs.append(fi)
        fine_invs.append(inv)

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
                                         CL + H)
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
                        n_elems_decode=CL + H)[:, 0]
                b_cells.append(bs)
                b_areas.append(ars)
                b_recvs.append(brs)
                b_groups.append((axis, sign))

    # ONE batched host->device upload for every table built above — the
    # per-array jnp.asarray alternative pays tunnel latency per table on
    # every distributed adapt (utils/xfer.pack_put; mirrors the
    # single-device builder in mesh/subgrid.py)
    from t8gpu_tpu.utils.xfer import pack_put
    groups = [send_rounds, nbrs, rels, bitss, masks, fine_idxs, fine_invs,
              b_cells, b_areas, b_recvs]
    flat_dev = pack_put([a for g in groups for a in g])
    it = iter(flat_dev)
    (send_rounds, nbrs, rels, bitss, masks, fine_idxs, fine_invs,
     b_cells, b_areas, b_recvs) = (
        [next(it) for _ in g] for g in groups)

    conn = ShardedSubgridConnectivity(
        nbr=tuple(nbrs), rel=tuple(rels), bits=tuple(bitss),
        mask=tuple(masks),
        fine_idx=tuple(fine_idxs), fine_inv=tuple(fine_invs),
        b_cell=tuple(b_cells), b_area=tuple(b_areas),
        b_recv=tuple(b_recvs),
        send_rounds=tuple(send_rounds), halo_rounds=halo_rounds,
        b_groups=tuple(b_groups),
        has_fine=tuple(bool((r[:n] == 1).any()) for r in g_rel),
        has_coarse=tuple(bool((r[:n] == -1).any()) for r in g_rel),
        n_shards=n_shards, local_capacity=CL, halo_size=H)
    return conn, bounds


def sharded_subgrid_flux_divergence(u, volumes, conn, spec: SubgridSpec,
                                    gamma: float, flux: str,
                                    farfield=None):
    """Per-shard flux divergence [5, *ext, CL] + GLOBAL max wave speed.
    Runs inside shard_map; one set of halo ppermute rounds per call.
    Element-minor layout throughout (see ops/subgrid.py).

    The halo exchange ships raw 5-row states over ICI; per-cell fields
    (ops/euler.cell_fields) are then computed once on the extended element
    axis and shared by the inner stencil, the slab-exchange outer pass and
    the wall fluxes."""
    S = conn.n_shards
    parts = [u]
    for r, idx in zip(conn.halo_rounds, conn.send_rounds):
        send = u[..., idx]                               # [5, *ext, H_r]
        perm = [(s, (s + r) % S) for s in range(S)]
        parts.append(jax.lax.ppermute(send, halo.AXIS, perm))
    u_ext = jnp.concatenate(parts, axis=-1)              # [5, *ext, CL+H]

    CL = u.shape[-1]
    from t8gpu_tpu.ops.euler import cell_fields_tuple, maybe_barrier
    q_ext = maybe_barrier(
        cell_fields_tuple(u_ext, gamma, flux))
    q_loc = tuple(r[..., :CL] for r in q_ext)

    from t8gpu_tpu.ops.pallas_kernels import kernel_mode
    ghost_f = (sg.farfield_field_rows(farfield, gamma, flux, u.dtype)
               if farfield is not None else None)
    if spec.extent in (4, 8) and kernel_mode() != "off":
        # the fused Pallas kernel per shard (2D/3D, ext 8 or 4): resolved
        # neighbor layers come from the extended element axis, everything
        # else is the single-device path (fused_flux_pallas)
        return _sharded_fused_flux(u, u_ext, q_ext, q_loc, volumes, conn,
                                   spec, gamma, flux, ghost_fields=ghost_f)

    D, sp_i = sg.inner_divergence_fields(q_loc, volumes, spec, gamma, flux)
    D, speed = _sharded_outer_boundary(D, sp_i, q_ext, CL, volumes, conn,
                                       spec, gamma, flux,
                                       ghost_fields=ghost_f)
    return D, jax.lax.pmax(speed, halo.AXIS)


def _sharded_outer_boundary(D, speed, q_ext, CL, volumes, conn,
                            spec: SubgridSpec, gamma: float, flux: str,
                            exclude_equal: bool = False,
                            ghost_fields=None):
    """Slab-exchange outer fluxes + reflective walls from extended-axis
    fields — the per-shard mirror of ops/subgrid.outer_apply +
    boundary_apply.  exclude_equal skips equal-level mesh faces (they are
    handled at second order by the sharded MUSCL path)."""
    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    t_axes = tuple(range(1, 1 + n_t))
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    area_t = (h_e / ext) ** n_t
    area_v = area_t / (2 ** n_t)
    for a in range(dim):
        q_rot = sg.fields_axis_rotate(q_ext, a)          # tuple: free
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            if exclude_equal and not (conn.has_coarse[k]
                                      or conn.has_fine[k]):
                continue
            nbr, rel, bits, mask = (conn.nbr[k], conn.rel[k],
                                    conn.bits[k], conn.mask[k])
            hi = sign > 0
            my_layer = jnp.stack([
                jax.lax.index_in_dim(r[..., :CL], ext - 1 if hi else 0,
                                     axis=a, keepdims=False)
                for r in q_rot])
            opp_layer = jnp.stack([
                jax.lax.index_in_dim(r, 0 if hi else ext - 1, axis=a,
                                     keepdims=False) for r in q_rot])
            nb = sg._gather_layers(
                opp_layer, nbr if conn.has_fine[k] else nbr[:, :1])
            base = nb[..., 0]

            contrib = None
            if not (exclude_equal and not conn.has_coarse[k]):
                r = rel.reshape((1,) * (base.ndim - 1) + (-1,))
                other = (jnp.where(r < 0,
                                   sg._coarse_window(base, bits, spec),
                                   base)
                         if conn.has_coarse[k] else base)
                q_l, q_r = (my_layer, other) if hi else (other, my_layer)
                f, sp = sg.fields_flux(q_l, q_r, gamma=gamma, flux=flux)
                w1 = mask * area_t * ((rel < 0) if exclude_equal
                                      else (rel <= 0))
                f = (sg.axis_unrotate(f, a)
                     * w1.reshape((1,) * (f.ndim - 1) + (-1,)))
                contrib = -f if hi else f
                sp_m = (w1 > 0).reshape((1,) * (f.ndim - 2) + (-1,))
                speed = jnp.maximum(speed, (sp * sp_m).max())

            if conn.has_fine[k]:
                fine = sg._fine_interleave(nb, spec)
                mine = sg._upsample2(my_layer, t_axes)
                q_l, q_r = (mine, fine) if hi else (fine, mine)
                f2, sp2 = sg.fields_flux(q_l, q_r, gamma=gamma, flux=flux)
                w2 = mask * area_v * (rel > 0)
                f2 = (sg.axis_unrotate(f2, a)
                      * w2.reshape((1,) * (f2.ndim - 1) + (-1,)))
                f2 = sg._pool2(f2, n_t)
                f2 = -f2 if hi else f2
                contrib = f2 if contrib is None else contrib + f2
                sp_m2 = (w2 > 0).reshape((1,) * (f2.ndim - 2) + (-1,))
                speed = jnp.maximum(speed, (sp2 * sp_m2).max())

            if contrib is not None:
                D = sg._slab_add(D, contrib.reshape(contrib.shape[0], -1),
                                 a, layer_hi=hi, spec=spec)

    q_ext_flat = tuple(r.reshape(-1) for r in q_ext)
    for (axis, sign), bc, ar, br in zip(conn.b_groups, conn.b_cell,
                                        conn.b_area, conn.b_recv):
        from t8gpu_tpu.ops.euler import fields_mirror
        q_own = sg.fields_axis_rotate(tuple(r[bc] for r in q_ext_flat),
                                      axis)
        if ghost_fields is None:
            q_ghost = fields_mirror(q_own)
        else:
            q_ghost = sg.fields_axis_rotate(
                tuple(jnp.broadcast_to(g, o.shape)
                      for g, o in zip(ghost_fields, q_own)), axis)
        if sign > 0:
            f, sp = sg.fields_flux(q_own, q_ghost, gamma=gamma, flux=flux)
        else:
            f, sp = sg.fields_flux(q_ghost, q_own, gamma=gamma, flux=flux)
        f = sg.axis_unrotate(f, axis) * ar
        f_pad = jnp.concatenate([f, jnp.zeros((5, 1), f.dtype)], axis=1)
        c = f_pad[:, br]
        D = sg._slab_add(D, -c if sign > 0 else c, axis,
                         layer_hi=sign > 0, spec=spec)
        speed = jnp.maximum(speed, (sp * (ar > 0)).max())

    return D, speed


def sharded_subgrid_flux_divergence_muscl(u, volumes, conn,
                                           spec: SubgridSpec, gamma: float,
                                           flux: str,
                                           limiter: str = "minmod",
                                           farfield=None):
    """Per-shard second-order MUSCL flux divergence — the multi-chip
    mirror of ops/subgrid.flux_divergence_muscl.

    The subgrid halo ships WHOLE neighbor elements (all layers), so the
    equal-level neighbor's facing two layers are already on the extended
    element axis: no second halo round is needed (unlike the plain-element
    sharded MUSCL, parallel/halo.py).  The slope/interface math is the
    SHARED ops/subgrid.muscl_core (gathering from the extended axis), so
    sharded == single-device is identical code, not parallel copies.
    Every mesh face is evaluated from both sides with identical inputs —
    conservation is exact across shard boundaries exactly as within a
    shard.  On TPU backends the interior + equal-face work runs as the
    fused MUSCL Pallas kernel with extended-axis gather sources (same
    dispatch shape as _sharded_fused_flux); the shared muscl_core stencil
    is the fallback and the CPU-test surface."""
    from t8gpu_tpu.ops.euler import cell_fields_tuple, maybe_barrier
    from t8gpu_tpu.ops.pallas_kernels import kernel_mode

    u_ext = _halo_exchange_state(u, conn)
    CL = u.shape[-1]
    lim_base, _, space = limiter.partition("-")    # "<lim>-prim" support
    space = space or "cons"
    mode = kernel_mode()
    if (mode != "off" and spec.extent in (4, 8)
            and lim_base in ("minmod", "none")):
        from t8gpu_tpu.ops.pallas_kernels import fused_muscl_pallas
        others, weights = sg.muscl_side_inputs(u, conn, spec, volumes,
                                               u_src=u_ext)
        D, sp_e = fused_muscl_pallas(u, weights, others, gamma=gamma,
                                     flux=flux, limiter=lim_base,
                                     space=space,
                                     interpret=mode == "interpret")
        speed = sp_e.max()
    else:
        D, speed = sg.muscl_core(u, u_ext, volumes, conn, spec, gamma,
                                 flux, lim_base, space=space)

    # hanging (2:1) faces + walls: first-order closure, equal excluded
    q_ext = maybe_barrier(cell_fields_tuple(u_ext, gamma, flux))
    ghost_f = (sg.farfield_field_rows(farfield, gamma, flux, u.dtype)
               if farfield is not None else None)
    D, speed = _sharded_outer_boundary(D, speed, q_ext, CL, volumes, conn,
                                       spec, gamma, flux,
                                       exclude_equal=True,
                                       ghost_fields=ghost_f)
    return D, jax.lax.pmax(speed, halo.AXIS)


def _sharded_fused_flux(u, u_ext, q_ext, q_loc, volumes, conn,
                        spec: SubgridSpec, gamma: float, flux: str,
                        ghost_fields=None):
    """Per-shard fused-Pallas flux path (2D/3D, ext 8 or 4): the kernel
    covers interior + equal/coarse mesh faces + walls (mirrored side
    layers — or the farfield ghost when `ghost_fields` is given); only
    hanging-fine contributions stay XLA-side, gathering from the
    extended axis (same structure as ops/subgrid.flux_divergence with
    extended-axis gather sources)."""
    from t8gpu_tpu.ops.pallas_kernels import fused_flux_pallas, kernel_mode

    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    t_axes = tuple(range(1, 1 + n_t))
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    area_v = (h_e / ext) ** n_t / (2 ** n_t)

    others, weights = sg.pallas_side_inputs(q_loc, conn, spec, volumes,
                                            q_ext=q_ext,
                                            ghost_fields=ghost_fields)
    D, sp_e = fused_flux_pallas(jnp.stack(q_loc), weights, others,
                                gamma=gamma, flux=flux,
                                interpret=kernel_mode() == "interpret")
    speed = sp_e.max()

    # hanging-fine pass (extended-axis gathers)
    for a in range(dim):
        q_rot = sg.fields_axis_rotate(q_ext, a)
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            if not conn.has_fine[k]:
                continue
            nbr, rel, mask = conn.nbr[k], conn.rel[k], conn.mask[k]
            hi = sign > 0
            CL = u.shape[-1]
            my_layer = jnp.stack([
                jax.lax.index_in_dim(r[..., :CL], ext - 1 if hi else 0,
                                     axis=a, keepdims=False)
                for r in q_rot])
            opp_layer = jnp.stack([
                jax.lax.index_in_dim(r, 0 if hi else ext - 1, axis=a,
                                     keepdims=False) for r in q_rot])
            nb = sg._gather_layers(opp_layer, nbr)
            fine = sg._fine_interleave(nb, spec)
            mine = sg._upsample2(my_layer, t_axes)
            q_l, q_r = (mine, fine) if hi else (fine, mine)
            f2, sp2 = sg.fields_flux(q_l, q_r, gamma=gamma, flux=flux)
            w2 = mask * area_v * (rel > 0)
            f2 = (sg.axis_unrotate(f2, a)
                  * w2.reshape((1,) * (f2.ndim - 1) + (-1,)))
            f2 = sg._pool2(f2, n_t)
            contrib = -f2 if hi else f2
            sp_m2 = (w2 > 0).reshape((1,) * (f2.ndim - 2) + (-1,))
            speed = jnp.maximum(speed, (sp2 * sp_m2).max())
            D = sg._slab_add(D, contrib.reshape(5, -1), a, layer_hi=hi,
                             spec=spec)

    return D, jax.lax.pmax(speed, halo.AXIS)


def _sharded_subgrid_viscous_wrap(flux_fn, volumes, conn,
                                  spec: SubgridSpec, gamma: float,
                                  mu: float, prandtl: float,
                                  wall: str = "slip",
                                  wall_velocity=(0.0, 0.0, 0.0),
                                  wall_temperature=None):
    """Add the viscous divergence (ops/subgrid_viscous.py, equal-level
    meshes) to a per-shard (divergence, speed) closure: the layer
    gathers read the halo-extended axis, and both sides of a
    shard-boundary face see the identical two facing layers, so the
    viscous exchange is exactly conservative across shards.  The
    global diffusive dt rate is SUMMED into the speed (see
    ops/viscous.viscous_speed_bound)."""
    from t8gpu_tpu.ops.subgrid_viscous import (viscous_divergence,
                                               viscous_wall_sides)

    dim = spec.dim
    noslip = wall == "noslip" and bool(conn.b_groups)

    def fn(v):
        d, sp = flux_fn(v)
        u_ext = _halo_exchange_state(v, conn)
        d = d + viscous_divergence(v, volumes, conn, spec, gamma,
                                   float(mu), float(prandtl), u_src=u_ext)
        if noslip:
            ws, wx = viscous_wall_sides(v, volumes, conn, spec, gamma,
                                        float(mu), float(prandtl),
                                        wall_velocity, wall_temperature)
            for k, c in zip(ws, wx):
                d = sg._slab_add(d, c.reshape(5, -1), k // 2,
                                 layer_hi=(k % 2 == 0), spec=spec)
        live = volumes > 0
        rho_min = jax.lax.pmin(
            jnp.where(live, v[0].min(axis=tuple(range(v.ndim - 2))),
                      jnp.inf).min(), halo.AXIS)
        h_min = jax.lax.pmin(
            jnp.where(live, volumes, jnp.inf).min(), halo.AXIS)             ** (1.0 / dim) / spec.extent
        nu = (float(mu) / rho_min) * max(1.0, gamma / float(prandtl))
        return d, sp + 2.0 * dim * nu / h_min

    return fn


def _halo_exchange_state(u, conn):
    """ppermute halo rounds for a [5, *ext, CL] state -> [5, *ext, CL+H]."""
    S = conn.n_shards
    parts = [u]
    for r, idx in zip(conn.halo_rounds, conn.send_rounds):
        send = u[..., idx]
        perm = [(s, (s + r) % S) for s in range(S)]
        parts.append(jax.lax.ppermute(send, halo.AXIS, perm))
    return jnp.concatenate(parts, axis=-1)


def sharded_ssp_rk3_fused(u, volumes, conn, spec: SubgridSpec,
                          gamma: float, flux: str, dt, inv_cv,
                          mu: float = 0.0, prandtl: float = 0.72,
                          wall: str = "slip",
                          wall_velocity=(0.0, 0.0, 0.0),
                          wall_temperature=None, farfield=None,
                          gravity=(0.0, 0.0, 0.0)):
    """One SSP-RK3 step per shard with RK-fused Pallas stage kernels
    (runs inside shard_map; preconditions: sg.can_fuse_rk on the shard
    tables).  Each stage: halo ppermute rounds, resolve neighbor layers
    (walls = mirrored own layers, in-kernel), hanging-fine side extras
    XLA-side, one kernel call.  mu > 0 adds the in-VMEM viscous
    divergence (equal-level scope; the viscous tile consumes the SAME
    resolved side layers as the inviscid stencil, so shard-boundary
    faces see identical data on both sides and no extra halo round is
    needed) and folds the GLOBAL diffusive dt rate into the speed."""
    from t8gpu_tpu.ops.euler import cell_fields_tuple
    from t8gpu_tpu.ops.pallas_kernels import (fused_rk_stage_fields_pallas,
                                              fused_rk_stage_pallas,
                                              kernel_mode)
    from t8gpu_tpu.ops.rk import STAGE_2, STAGE_3

    interp = kernel_mode() == "interpret"
    any_fine = any(conn.has_fine)
    viscous = float(mu) > 0.0
    grav = tuple(float(c) for c in gravity)
    has_grav = any(c != 0.0 for c in grav)
    use_fields = (sg.RK_STAGE_INPUTS == "fields" and not viscous
                  and not has_grav)
    use_logs = sg.RK_STAGE_INPUTS == "logs" and flux == "kepes"
    wv = (sg.viscous_weight_rows(conn, spec, volumes) if viscous else None)
    if not use_fields:
        w = sg.rk_weights(conn, spec, volumes, dt, inv_cv)

    any_hang = any_fine or any(conn.has_coarse)
    noslip = viscous and wall == "noslip" and bool(conn.b_groups)
    ghost5 = ghost7 = ghost_q = None
    if farfield is not None and conn.b_groups:
        ghost5 = sg.farfield_state_rows(farfield, gamma, 5, u.dtype)
        ghost7 = (sg.farfield_state_rows(farfield, gamma, 7, u.dtype)
                  if use_logs else None)
        ghost_q = (sg.farfield_field_rows(farfield, gamma, flux, u.dtype)
                   if use_fields else None)

    def stage(u_stage, u_prev, coeffs):
        u_ext = _halo_exchange_state(u_stage, conn)
        if any_fine:
            sides, extras, sp_f = sg.fine_side_extras(
                u_stage, conn, spec, volumes, gamma, flux, u_ext=u_ext)
        else:
            sides, extras, sp_f = (), (), jnp.zeros((), u.dtype)
        if viscous and (any_hang or noslip):
            # hanging 2:1 + no-slip wall viscous fluxes through the same
            # extras input; the halo-extended gather source makes
            # shard-boundary hanging faces see identical operands on both
            # sides
            from t8gpu_tpu.ops.subgrid_viscous import merge_viscous_extras
            sides, extras = merge_viscous_extras(
                sides, extras, u_stage, volumes, conn, spec, gamma, mu,
                prandtl, wall, wall_velocity, wall_temperature,
                u_src=u_ext)
        if use_logs:
            # append [log rho, log p] AFTER the halo exchange (5-row
            # ppermute traffic; the 2 transcendentals are evaluated for
            # local + halo cells, never sent over ICI)
            CL = u_stage.shape[-1]
            u7_ext = sg.append_log_rows(u_ext, gamma)
            u7 = u7_ext[..., :CL]
            others = sg._state_side_layers(u7, conn, spec, volumes,
                                           u_ext=u7_ext, ghost=ghost7)
            u_n, sp = fused_rk_stage_pallas(u7, u_prev, w, others,
                                            gamma=gamma, flux=flux,
                                            coeffs=coeffs, interpret=interp,
                                            extra_sides=sides, extras=extras,
                                            viscous_weights=wv,
                                            mu=float(mu),
                                            prandtl=float(prandtl),
                                            gravity=grav)
        elif use_fields:
            CL = u_stage.shape[-1]
            q_ext = cell_fields_tuple(u_ext, gamma, flux)
            q_loc = tuple(r[..., :CL] for r in q_ext)
            others, w_q = sg.pallas_side_inputs(q_loc, conn, spec, volumes,
                                                q_ext=q_ext,
                                                dt_inv=dt * inv_cv,
                                                ghost_fields=ghost_q)
            u_n, sp = fused_rk_stage_fields_pallas(
                jnp.stack(q_loc), u_prev, w_q, others, gamma=gamma,
                flux=flux, coeffs=coeffs, interpret=interp,
                extra_sides=sides, extras=extras)
        else:
            others = sg._state_side_layers(u_stage, conn, spec, volumes,
                                           u_ext=u_ext, ghost=ghost5)
            u_n, sp = fused_rk_stage_pallas(u_stage, u_prev, w, others,
                                            gamma=gamma, flux=flux,
                                            coeffs=coeffs, interpret=interp,
                                            extra_sides=sides, extras=extras,
                                            viscous_weights=wv,
                                            mu=float(mu),
                                            prandtl=float(prandtl),
                                            gravity=grav)
        return u_n, jnp.maximum(sp.max(), sp_f)

    # stage 1: u_prev == u, passed as None so the kernel reads ONE state
    u1, sp = stage(u, None, (1.0, 0.0, 1.0))
    u2, _ = stage(u1, u, STAGE_2)
    u3, _ = stage(u2, u, STAGE_3)
    sp = jax.lax.pmax(sp, halo.AXIS)
    if viscous:
        # GLOBAL diffusive dt rate, summed after the advective pmax
        # (same bound as _sharded_subgrid_viscous_wrap)
        dim = spec.dim
        live = volumes > 0
        rho_min = jax.lax.pmin(
            jnp.where(live, u[0].min(axis=tuple(range(u.ndim - 2))),
                      jnp.inf).min(), halo.AXIS)
        h_min = jax.lax.pmin(
            jnp.where(live, volumes, jnp.inf).min(),
            halo.AXIS) ** (1.0 / dim) / spec.extent
        nu = (float(mu) / rho_min) * max(1.0, gamma / float(prandtl))
        sp = sp + 2.0 * dim * nu / h_min
    return u3, sp


class ShardedSubgridEulerSolver:
    """Subgrid Euler solver distributed over a 1D device mesh.

    State layout: ONE global jax.Array [5, *ext, S*CL] sharded on the
    minor element axis (P(None, ..., "sfc")); see parallel/solver.py for
    the rationale — the AMR remap runs as a global device gather with an
    output sharding constraint, and compiled step programs persist across
    adapts at equal capacity buckets.

    Subclasses for other physics (parallel/subgrid_mhd.py) override
    N_ROWS/_guard_state and the step/speed builders; _install, adapt,
    conserved_state and the iterate drivers are row-count generic."""

    N_ROWS = 5

    @staticmethod
    def _guard_state() -> np.ndarray:
        from t8gpu_tpu.models.subgrid_euler import GUARD_STATE
        return GUARD_STATE

    def _obs_registry(self):
        return None          # default: the Euler OBSERVABLES registry

    def _obs_reducers(self):
        from t8gpu_tpu.models.observables import REDUCERS
        return REDUCERS

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
        self._steps = {}
        # built ONCE; jax.jit retraces per capacity bucket and keeps every
        # trace cached, so adapts at a steady bucket reuse the executable
        self._speed_fn = self._build_speed()
        from t8gpu_tpu.mesh.subgrid import cell_centers
        u0 = np.asarray(ic(cell_centers(forest, spec)), np.float32)
        u0 = u0.reshape((u0.shape[0], forest.n_elements) + spec.extents)
        # internal layout is element-minor: [5, *ext, N]
        self._install(forest, u_host=np.moveaxis(u0, 1, -1))

    def _u_spec(self) -> P:
        return P(*((None,) * (self.spec.dim + 1)), halo.AXIS)

    def _install(self, forest: Forest, u_host=None, u_dev=None):
        self._crit_pending = None    # criteria refer to the previous mesh
        self.forest = forest
        conn, bounds = build_sharded_subgrid_connectivity(
            forest, self.spec, self.n_shards)
        self.bounds = bounds
        CL = conn.local_capacity
        self.local_capacity = CL
        dim = self.spec.dim
        B = self.spec.size

        volumes = forest.volumes().astype(np.float32)
        vol = shard_array(volumes, bounds, CL).reshape(-1)
        inv = shard_array((B / volumes).astype(np.float32),
                          bounds, CL).reshape(-1)
        if u_dev is None:
            # pad state element slots with the guard state (element-minor:
            # u_host is [C, *ext, N], shards slice/pad the minor axis)
            C = self.N_ROWS
            u_flat = np.empty((C,) + self.spec.extents + (self.n_shards * CL,),
                              np.float32)
            u_flat[:] = self._guard_state().reshape((C,) + (1,) * (dim + 1))
            for s in range(self.n_shards):
                lo, hi = bounds[s], bounds[s + 1]
                u_flat[..., s * CL: s * CL + hi - lo] = u_host[..., lo:hi]
            u_dev = jnp.asarray(u_flat)

        conn_shard = NamedSharding(self.mesh_dev, P(halo.AXIS))
        e_shard = NamedSharding(self.mesh_dev, P(halo.AXIS))
        self.conn = jax.device_put(conn, conn_shard)
        self.u = jax.device_put(
            u_dev, NamedSharding(self.mesh_dev, self._u_spec()))
        self.volumes = jax.device_put(jnp.asarray(vol), e_shard)
        self.inv_cell_volume = jax.device_put(jnp.asarray(inv), e_shard)

    def _build_step(self, n_steps: int = 1, observables: tuple = ()):
        gamma, flux = self.config.gamma, self.config.flux
        order = getattr(self.config, "order", 1)
        _lim_raw = getattr(self.config, "limiter", "bj")
        _lim, _, _space = _lim_raw.partition("-")   # "<lim>-prim" support
        limiter = "none" if _lim == "none" else "minmod"
        if _space:
            limiter = f"{limiter}-{_space}"
        gravity = tuple(getattr(self.config, "gravity", (0.0, 0.0, 0.0)))
        from t8gpu_tpu.ops.source import has_gravity
        grav = has_gravity(gravity)
        mu = float(getattr(self.config, "mu", 0.0))
        prandtl = float(getattr(self.config, "prandtl", 0.72))
        from t8gpu_tpu.models.subgrid_euler import validate_subgrid_bc
        bc = validate_subgrid_bc(self.config, "ShardedEulerSolver")
        wall, wv = bc["wall"], bc["wall_velocity"]
        wt, ff = bc["wall_temperature"], bc["farfield"]
        sgspec = self.spec
        u_spec = self._u_spec()

        if observables:
            from t8gpu_tpu.models.observables import resolve
            obs_fns = resolve(observables, self._obs_registry())
            obs_reds = tuple(self._obs_reducers()[n] for n in observables)
        out_specs = ((u_spec, P(), P()) if observables
                     else (u_spec, P()))

        @functools.partial(
            jax.shard_map, mesh=self.mesh_dev,
            in_specs=(u_spec, P(halo.AXIS), P(halo.AXIS), P(halo.AXIS), P()),
            out_specs=out_specs, check_vma=False)
        def step(u, conn, volumes, inv_cv, dt):
            from t8gpu_tpu.ops.pallas_kernels import kernel_mode

            conn = jax.tree.map(lambda x: x[0], conn)
            if (order == 1 and sg.can_fuse_rk(conn, sgspec)
                    and kernel_mode() != "off"):
                # RK-fused path for EVERY first-order configuration:
                # viscosity in-VMEM (hanging 2:1 + no-slip walls as
                # additive side extras), gravity as the in-kernel
                # unsplit source, farfield as the ghost side layers
                one = lambda v: sharded_ssp_rk3_fused(
                    v, volumes, conn, sgspec, gamma, flux, dt, inv_cv,
                    mu=mu, prandtl=prandtl, wall=wall, wall_velocity=wv,
                    wall_temperature=wt, farfield=ff, gravity=gravity)
            else:
                if order == 2:
                    flux_fn = (lambda v:
                               sharded_subgrid_flux_divergence_muscl(
                                   v, volumes, conn, sgspec, gamma, flux,
                                   limiter, farfield=ff))
                else:
                    flux_fn = lambda v: sharded_subgrid_flux_divergence(
                        v, volumes, conn, sgspec, gamma, flux, farfield=ff)
                if mu > 0.0:
                    flux_fn = _sharded_subgrid_viscous_wrap(
                        flux_fn, volumes, conn, sgspec, gamma, mu, prandtl,
                        wall=wall, wall_velocity=wv, wall_temperature=wt)
                if grav:
                    from t8gpu_tpu.models.subgrid_euler import \
                        _with_cell_gravity
                    flux_fn = _with_cell_gravity(flux_fn, gravity, inv_cv)
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

    def _get_step(self, n_steps: int):
        fn = self._steps.get(n_steps)
        if fn is None:
            fn = self._steps[n_steps] = self._build_step(n_steps)
        return fn

    def iterate(self, dt: float):
        self.u, self._max_speed = self._get_step(1)(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.float32(dt))

    def iterate_many(self, n_steps: int, dt: float):
        """n_steps fused RK3 steps in one dispatch (collectives inside)."""
        self.u, self._max_speed = self._get_step(n_steps)(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.float32(dt))

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "kinetic_energy",
                                    "total_energy")):
        """n_steps sharded RK3 steps AND per-step global observable
        history in ONE dispatch — [n_steps, K] replicated device array
        (models/observables.py; the reductions ride psum/pmax inside
        shard_map)."""
        from t8gpu_tpu.models.observables import resolve
        # validate eagerly: empty/unknown names
        resolve(observables, self._obs_registry())
        key = ("record", n_steps, tuple(observables))
        fn = self._steps.get(key)
        if fn is None:
            fn = self._steps[key] = self._build_step(
                n_steps, observables=tuple(observables))
        self.u, self._max_speed, rows = fn(
            self.u, self.conn, self.volumes, self.inv_cell_volume,
            jnp.float32(dt))
        return rows

    def _build_speed(self):
        """CFL speed over the GLOBAL sharded state: the axis-summed cell
        speed (ops/euler.cfl_sum_speed — a pure cell reduction, no halo
        and no shard_map; XLA lowers the global max over the sharded
        element axis to a collective) plus the SUMMED diffusive rate
        when mu > 0."""
        gamma = self.config.gamma
        sgspec = self.spec
        mu = float(getattr(self.config, "mu", 0.0))
        prandtl = float(getattr(self.config, "prandtl", 0.72))

        @jax.jit
        def speed(u, conn, volumes):
            from t8gpu_tpu.ops.euler import cfl_sum_speed

            del conn                      # kept for call-site signature
            dim = sgspec.dim
            live = volumes > 0
            s = cfl_sum_speed(u, gamma, dim, live=live)
            if mu > 0.0:
                rho_min = jnp.where(live, u[0].min(
                    axis=tuple(range(u.ndim - 2))), jnp.inf).min()
                h_cell = (jnp.where(live, volumes, jnp.inf).min()
                          ** (1.0 / dim)) / sgspec.extent
                nu = (mu / rho_min) * max(1.0, gamma / prandtl)
                s = s + 2.0 * dim * nu / h_cell
            return s

        return speed

    def adapt(self):
        """Distributed AMR: local H1 criteria -> host adapt -> DEVICE-side
        subgrid remap (global gather with output resharding, see
        parallel/solver.adapt) -> fresh connectivity
        (ref solver.inl:327-345, mesh_manager.inl:625-723).  Only the
        criteria and the integer index plan cross the host boundary."""
        # sg.h1_criteria is module-level jitted: its trace cache persists
        # across adapts (no per-adapt jax.jit wrappers — ADVICE r2)
        if self._crit_pending is not None:
            crit_flat, self._crit_pending = self._crit_pending, None
        else:
            crit_flat = sg.h1_criteria(self.u, self.volumes, self.spec)
        crit = _unpad_flat(np.asarray(crit_flat), self.bounds,
                           self.local_capacity)

        flags = self.forest.flags_from_criteria(
            crit, b=self.amr.refine_threshold,
            min_level=self.amr.min_level, max_level=self.amr.max_level)
        flags = self.forest.balance_flags(flags)
        old_forest, old_bounds, old_CL = (self.forest, self.bounds,
                                          self.local_capacity)
        new_forest, remap = old_forest.adapt(flags)

        # host index plan in padded-global coordinates
        from t8gpu_tpu.memory.store import bucket_capacity
        k = 1 << old_forest.dim
        n_old = old_forest.n_elements
        n_new = new_forest.n_elements
        bounds = partition_elements(n_new, self.n_shards)
        CL = bucket_capacity(int((bounds[1:] - bounds[:-1]).max()))

        old_owner = np.searchsorted(old_bounds, np.arange(n_old),
                                    side="right") - 1
        old_pos = (old_owner * old_CL
                   + (np.arange(n_old) - old_bounds[old_owner])).astype(np.int32)
        new_owner = np.searchsorted(bounds, np.arange(n_new),
                                    side="right") - 1
        new_pos = (new_owner * CL
                   + (np.arange(n_new) - bounds[new_owner]))

        cap = self.n_shards * CL
        src = np.zeros(cap, np.int32)
        refined = np.zeros(cap, bool)
        child = np.zeros(cap, np.int32)
        coarsened = np.zeros(cap, bool)
        fam = np.zeros((cap, k), np.int32)
        src[new_pos] = old_pos[remap.src_start]
        refined[new_pos] = remap.level_change > 0
        child[new_pos] = remap.child_id
        coarsened[new_pos] = remap.src_count > 1
        fam_el = np.minimum(remap.src_start[:, None] + np.arange(k)[None, :],
                            n_old - 1)
        fam[new_pos] = old_pos[fam_el]

        out_sh = NamedSharding(self.mesh_dev, self._u_spec())
        u_new = sg.apply_subgrid_remap_gathered(
            self.u, jnp.asarray(src), jnp.asarray(refined),
            jnp.asarray(child), jnp.asarray(coarsened), jnp.asarray(fam),
            spec=self.spec, capacity=cap)
        u_new = _constrain(u_new, out_sh)
        self._install(new_forest, u_dev=u_new)
        self._max_speed = None

    def adapt_prefetch(self):
        """Start the H1-criteria computation + device->host copy for a
        LATER adapt() (AMR pipelining — see CompressibleEulerSolver
        .adapt_prefetch)."""
        crit = sg.h1_criteria(self.u, self.volumes, self.spec)
        try:
            crit.copy_to_host_async()
        except AttributeError:
            pass
        self._crit_pending = crit

    def compute_integral(self) -> float:
        cv = self.volumes / self.spec.size            # [S*CL]
        return float((self.u[0] * cv).sum())

    def compute_timestep(self) -> float:
        return float(self.compute_timestep_device())

    def compute_timestep_device(self):
        """CFL timestep as a DEVICE scalar — no host round trip; fetching
        scalars through the TPU tunnel is latency-poison in adapt loops
        (same rationale as the single-device compute_timestep_device)."""
        speed = self._speed_fn(self.u, self.conn, self.volumes)
        h_min = 0.5 ** int(self.forest.level.max()) / self.spec.extent
        return jnp.float32(self.config.cfl * h_min) / speed

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    def conserved_state(self) -> np.ndarray:
        """Global unpadded [5, N, *ext] (element-major external order)."""
        flat = _unpad_flat(np.asarray(self.u), self.bounds,
                           self.local_capacity)
        return np.moveaxis(flat, -1, 1)


def _unpad_flat(flat: np.ndarray, bounds: np.ndarray, CL: int) -> np.ndarray:
    """[..., S*CL] padded-global -> [..., N] unpadded global."""
    parts = []
    for s in range(len(bounds) - 1):
        lo = s * CL
        parts.append(flat[..., lo: lo + bounds[s + 1] - bounds[s]])
    return np.concatenate(parts, axis=-1)


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def _constrain(x, sharding):
    """Module-level resharding helper: its trace cache persists across
    adapts (NamedSharding is hashable, so it rides along as a static arg
    like _device_remap's out_sharding in parallel/solver.py)."""
    return jax.lax.with_sharding_constraint(x, sharding)
