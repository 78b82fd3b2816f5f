"""SFC domain decomposition: per-shard face lists + halo exchange plans.

TPU-native counterpart of the reference's MPI rank decomposition
(SURVEY.md §2.4): the t8code forest partition assigns each rank a
contiguous SFC segment of elements (`t8gpu/mesh/mesh_manager.h:189-229`)
and kernels reach remote element data through CUDA-IPC (rank, remote_index)
indirection (`shared_device_vector.h:18-29`).  TPUs have no cross-chip
load/store from kernels, so the zero-copy ghost becomes an explicit halo
collective over ICI:

  1. elements (already SFC/Morton ordered) are split into n_shards
     contiguous chunks, padded to a common local capacity;
  2. the ghost layer is NEIGHBOR-SCOPED (like the reference's ghost
     bookkeeping, mesh_manager.h:189-229): for every shard-offset round
     r, shard s packs exactly the elements shard (s+r) mod S reads and a
     `ppermute` ships them; with a 1-D SFC partition almost all halo
     traffic is r in {1, S-1}, so the received pool is O(local boundary)
     — NOT the O(S*H) all-gather pool of round 1;
  3. per-shard face lists index an EXTENDED element axis
     [0, CL) local | [CL, ...) received round blocks, so flux kernels are
     the same single-device code on the concatenated array;
  4. faces crossing a shard boundary are duplicated on both shards
     (each accumulates only its own side), keeping accumulation local and
     deterministic — no remote atomics (ref kernels.cu:295-308).

Everything here is host-side NumPy planning; the device ops live in
parallel/halo.py and run inside `jax.shard_map`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import bucket_capacity


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedConnectivity:
    """Stacked per-shard face/halo arrays; axis 0 is the shard axis
    (sharded over the device mesh; each device sees its own slice)."""

    # interior faces, extended-index element references
    left: jnp.ndarray       # i32 [S, Fcap]
    right: jnp.ndarray      # i32 [S, Fcap]
    normal: jnp.ndarray     # f32 [S, 3, Fcap]
    area: jnp.ndarray       # f32 [S, Fcap] (0 padding)
    # boundary faces (owners always local)
    b_elem: jnp.ndarray     # i32 [S, Bcap]
    b_normal: jnp.ndarray   # f32 [S, 3, Bcap]
    b_area: jnp.ndarray     # f32 [S, Bcap]
    # CSR incidence over LOCAL elements; slots: f < Fcap interior,
    # Fcap <= f < Fcap+Bcap boundary, Fcap+Bcap zero sentinel
    inc_slot: jnp.ndarray   # i32 [S, CL, D]
    inc_sign: jnp.ndarray   # f32 [S, CL, D]
    # neighbor-wise halo plan: one send list per ACTIVE shard offset round
    # r (halo_rounds[i]); send_rounds[i][s] holds the local ids shard s
    # packs for shard (s + r) mod S
    send_rounds: Tuple[jnp.ndarray, ...]   # i32 [S, H_r] each

    halo_rounds: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))
    n_shards: int = dataclasses.field(metadata=dict(static=True))
    local_capacity: int = dataclasses.field(metadata=dict(static=True))
    halo_size: int = dataclasses.field(metadata=dict(static=True))  # sum H_r
    # axis-aligned orientation groups, COMMON across shards (per-axis
    # segments padded to shared capacities) — static row-permutation
    # rotations like mesh/connectivity.FaceConnectivity.axis_ranges;
    # None on general meshes
    axis_ranges: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True))
    b_axis_ranges: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True))

    # MUSCL displacement geometry (face centroid minus adjacent element
    # centroid, from each side; parallel counterpart of
    # FaceConnectivity.d_left/d_right/d_b).  None when the face dict
    # carries no centroids — then only first-order sharded paths exist.
    d_left: Optional[jnp.ndarray] = None    # f32 [S, 3, Fcap]
    d_right: Optional[jnp.ndarray] = None   # f32 [S, 3, Fcap]
    d_b: Optional[jnp.ndarray] = None       # f32 [S, 3, Bcap]
    # per-face no-slip wall velocity (static lid field, e.g. a driven
    # cavity's moving lid) evaluated at boundary-face centroids at
    # install time and sharded with the connectivity; None = uniform
    # wall velocity from the config tuple
    b_wall_vel: Optional[jnp.ndarray] = None  # f32 [S, 3, Bcap]

    @property
    def face_capacity(self) -> int:
        return self.left.shape[-1]

    @property
    def boundary_capacity(self) -> int:
        return self.b_elem.shape[-1]


def partition_elements(n: int, n_shards: int) -> np.ndarray:
    """SFC-contiguous split points [n_shards+1] (elements are Morton
    ordered, so equal-count prefix splits mirror t8_forest_partition)."""
    return (np.arange(n_shards + 1) * n) // n_shards


def build_sharded_connectivity(
        faces: dict, n_elements: int, n_shards: int,
        local_capacity: Optional[int] = None,
        centers: Optional[np.ndarray] = None,
        wrap: Optional[float] = None) -> Tuple[ShardedConnectivity, np.ndarray]:
    """Partition global face lists (a Forest.build_faces() dict) into a
    ShardedConnectivity.  Returns (conn, bounds) with bounds the element
    split points.

    When the face dict carries `face_center` and element `centers` are
    given, per-shard MUSCL displacement arrays (d_left/d_right/d_b) are
    built alongside — minimal-image wrapped with period `wrap` on
    periodic meshes."""
    bounds = partition_elements(n_elements, n_shards)
    starts = bounds[:-1]
    owner = np.searchsorted(bounds, np.arange(n_elements), side="right") - 1

    gl = faces["left"].astype(np.int64)
    gr = faces["right"].astype(np.int64)
    g_normal = faces["normal"]
    g_area = faces["area"]
    has_b = faces.get("b_elem") is not None
    gb = faces["b_elem"].astype(np.int64) if has_b else np.zeros(0, np.int64)

    # global MUSCL displacements (both sides per face, wrapped)
    g_fc = faces.get("face_center")
    have_geom = g_fc is not None and centers is not None
    if have_geom:
        centers = np.asarray(centers, np.float64)
        c3 = np.zeros((n_elements, 3))
        c3[:, : centers.shape[1]] = centers

        def _wrapd(d):
            return d - wrap * np.round(d / wrap) if wrap is not None else d

        g_fc64 = np.asarray(g_fc, np.float64)
        g_dl = _wrapd(g_fc64 - c3[gl].T)
        g_dr = _wrapd(g_fc64 - c3[gr].T)
        g_bfc = faces.get("b_face_center")
        g_db = (_wrapd(np.asarray(g_bfc, np.float64) - c3[gb].T)
                if has_b and g_bfc is not None else None)

    CL = local_capacity or bucket_capacity(
        int((bounds[1:] - bounds[:-1]).max()))

    # --- neighbor-wise halo plan (ghost scoping, mesh_manager.h:189-229) --
    # per destination shard t, the remote elements its faces read, grouped
    # by owner; each (owner s -> dest t) pair is one ppermute round
    # r = (t - s) mod S.  SFC contiguity makes almost all traffic r = 1 or
    # r = S-1; inactive rounds are dropped statically.
    o_l, o_r = owner[gl], owner[gr]
    round_lists = {}           # r -> [send list per sender s]
    pool_pos = {}              # (dest t, global g) -> position within round
    for t in range(n_shards):
        sel = (o_l == t) | (o_r == t)
        refs = np.unique(np.concatenate([
            gl[sel & (o_l != t)], gr[sel & (o_r != t)]]))
        for s in np.unique(owner[refs]) if len(refs) else []:
            r = int((t - s) % n_shards)
            lst = refs[owner[refs] == s]
            round_lists.setdefault(r, [np.zeros(0, np.int64)] * n_shards)
            round_lists[r][s] = lst
            for p, g in enumerate(lst):
                pool_pos[(t, int(g))] = (r, p)

    halo_rounds = tuple(sorted(round_lists))
    H_r = {r: bucket_capacity(max(max(len(x) for x in round_lists[r]), 1),
                              base=16)
           for r in halo_rounds}
    round_offset = {}
    off = 0
    for r in halo_rounds:
        round_offset[r] = off
        off += H_r[r]
    H = off                    # total received pool rows per shard
    send_rounds = []
    for r in halo_rounds:
        arr = np.zeros((n_shards, H_r[r]), np.int32)
        for s, lst in enumerate(round_lists[r]):
            arr[s, : len(lst)] = lst - starts[s]           # local indices
        send_rounds.append(jnp.asarray(arr))

    # --- per-shard face lists with extended indices ------------------------
    def ext_index(g: np.ndarray, s: int) -> np.ndarray:
        """Global element ids -> extended local indices for shard s."""
        local = owner[g] == s
        out = np.where(local, g - starts[s], 0).astype(np.int64)
        remote = np.flatnonzero(~local)
        for i in remote:
            r, p = pool_pos[(s, int(g[i]))]
            out[i] = CL + round_offset[r] + p
        return out

    g_axis = faces.get("axis")
    g_sign = faces.get("sign")
    grouped = g_axis is not None and len(gl) > 0
    per_shard = []
    for s in range(n_shards):
        sel = np.flatnonzero((o_l == s) | (o_r == s))
        l_ext = ext_index(gl[sel], s)
        r_ext = ext_index(gr[sel], s)
        if grouped:
            # canonicalize to +axis normals: swap sides where sign < 0
            # (F(l, r, n) = -F(r, l, -n); the incidence roles swap too)
            swap = np.asarray(g_sign, np.int64)[sel] < 0
            l_ext[swap], r_ext[swap] = (r_ext[swap].copy(),
                                        l_ext[swap].copy())
        bsel = np.flatnonzero(owner[gb] == s) if has_b else np.zeros(0, np.int64)
        per_shard.append((sel, l_ext, r_ext, bsel))

    axis_ranges = None
    b_axis_ranges = None
    if grouped:
        # per-axis face segments padded to capacities COMMON across shards
        # so the flux path compiles ONE program with static per-axis
        # ranges + row-permutation rotations (no per-face basis math)
        ga = np.asarray(g_axis, np.int64)
        n_ax = int(ga.max()) + 1
        seg_counts = np.zeros((n_shards, n_ax), np.int64)
        for s, (sel, _l, _r, _b) in enumerate(per_shard):
            for a in range(n_ax):
                seg_counts[s, a] = int((ga[sel] == a).sum())
        seg_caps = [bucket_capacity(max(int(seg_counts[:, a].max()), 1))
                    for a in range(n_ax)]
        seg_offs = np.concatenate([[0], np.cumsum(seg_caps)]).astype(int)
        Fcap = int(seg_offs[-1])
        axis_ranges = tuple((a, int(seg_offs[a]), int(seg_offs[a + 1]))
                            for a in range(n_ax))
    else:
        Fcap = bucket_capacity(
            max(max((len(p[0]) for p in per_shard), default=1), 1))

    gb_axis = faces.get("b_axis")
    gb_sign = faces.get("b_sign")
    b_grouped = has_b and gb_axis is not None and len(gb) > 0
    if b_grouped:
        gba = np.asarray(gb_axis, np.int64)
        gbs = np.asarray(gb_sign, np.int64)
        bkey = gba * 2 + (gbs < 0)
        keys = np.unique(bkey)
        bseg_counts = np.zeros((n_shards, len(keys)), np.int64)
        for s, (_sel, _l, _r, bsel) in enumerate(per_shard):
            for i, kk in enumerate(keys):
                bseg_counts[s, i] = int((bkey[bsel] == kk).sum())
        bseg_caps = [bucket_capacity(max(int(bseg_counts[:, i].max()), 1))
                     for i in range(len(keys))]
        bseg_offs = np.concatenate([[0], np.cumsum(bseg_caps)]).astype(int)
        Bcap = int(bseg_offs[-1])
        b_axis_ranges = tuple(
            (int(kk) // 2, 1 - 2 * (int(kk) % 2),
             int(bseg_offs[i]), int(bseg_offs[i + 1]))
            for i, kk in enumerate(keys))
    else:
        Bcap = (bucket_capacity(
            max(max((len(p[3]) for p in per_shard), default=1), 1))
            if has_b else 0)
    sentinel = Fcap + Bcap

    # incidence degree: max faces touching one local element across shards
    deg = 4
    for s, (sel, l_ext, r_ext, bsel) in enumerate(per_shard):
        cnt = np.zeros(CL, np.int64)
        loc_l = l_ext[l_ext < CL]
        loc_r = r_ext[r_ext < CL]
        np.add.at(cnt, loc_l, 1)
        np.add.at(cnt, loc_r, 1)
        if has_b and len(bsel):
            np.add.at(cnt, gb[bsel] - starts[s], 1)
        deg = max(deg, int(cnt.max()))
    D = 1 << int(np.ceil(np.log2(deg)))

    lefts = np.zeros((n_shards, Fcap), np.int32)
    rights = np.zeros((n_shards, Fcap), np.int32)
    normals = np.zeros((n_shards, 3, Fcap), np.float32)
    normals[:, 0] = 1.0
    areas = np.zeros((n_shards, Fcap), np.float32)
    b_elems = np.zeros((n_shards, max(Bcap, 1) if has_b else 0), np.int32)
    b_normals = np.zeros((n_shards, 3, b_elems.shape[1]), np.float32)
    if has_b:
        b_normals[:, 0] = 1.0
    b_areas = np.zeros((n_shards, b_elems.shape[1]), np.float32)
    inc_slot = np.full((n_shards, CL, D), sentinel, np.int32)
    inc_sign = np.zeros((n_shards, CL, D), np.float32)
    if have_geom:
        d_lefts = np.zeros((n_shards, 3, Fcap), np.float32)
        d_rights = np.zeros((n_shards, 3, Fcap), np.float32)
        d_bs = np.zeros((n_shards, 3, b_elems.shape[1]), np.float32)

    for s, (sel, l_ext, r_ext, bsel) in enumerate(per_shard):
        F = len(sel)
        # face placement: contiguous [0, F) or per-axis segments (grouped)
        if grouped:
            pos = np.empty(F, np.int64)
            for a in range(len(axis_ranges)):
                in_a = np.flatnonzero(ga[sel] == a)
                pos[in_a] = axis_ranges[a][1] + np.arange(len(in_a))
        else:
            pos = np.arange(F)
        lefts[s, pos] = l_ext
        rights[s, pos] = r_ext
        if grouped:
            for a, a0, _a1 in axis_ranges:
                normals[s, :, a0:_a1] = 0.0
                normals[s, a, a0:_a1] = 1.0
        else:
            normals[s, :, :F] = g_normal[:, sel]
        areas[s, pos] = g_area[sel]
        if have_geom:
            dl_s = g_dl[:, sel].copy()
            dr_s = g_dr[:, sel].copy()
            if grouped:
                # the side swap above exchanged the elements' roles;
                # their displacements swap with them
                sw = np.asarray(g_sign, np.int64)[sel] < 0
                dl_s[:, sw], dr_s[:, sw] = (dr_s[:, sw].copy(),
                                            dl_s[:, sw].copy())
            d_lefts[s][:, pos] = dl_s
            d_rights[s][:, pos] = dr_s
        Fb = len(bsel)
        if has_b and Fb:
            if b_grouped:
                bpos = np.empty(Fb, np.int64)
                for i, (_a, _sgn, b0, _b1) in enumerate(b_axis_ranges):
                    in_k = np.flatnonzero(bkey[bsel] == keys[i])
                    bpos[in_k] = b0 + np.arange(len(in_k))
            else:
                bpos = np.arange(Fb)
            b_elems[s, bpos] = gb[bsel] - starts[s]
            b_normals[s, :, bpos] = faces["b_normal"][:, bsel].T
            b_areas[s, bpos] = faces["b_area"][bsel]
            if have_geom and g_db is not None:
                d_bs[s][:, bpos] = g_db[:, bsel]

        # local incidence: -1 for emitter/owner side, +1 for receiver
        elems = []
        slots = []
        signs = []
        loc_mask_l = l_ext < CL
        loc_mask_r = r_ext < CL
        elems.append(l_ext[loc_mask_l])
        slots.append(pos[loc_mask_l])
        signs.append(-np.ones(loc_mask_l.sum()))
        elems.append(r_ext[loc_mask_r])
        slots.append(pos[loc_mask_r])
        signs.append(np.ones(loc_mask_r.sum()))
        if has_b and Fb:
            elems.append(gb[bsel] - starts[s])
            slots.append(Fcap + bpos)
            signs.append(-np.ones(Fb))
        elems = np.concatenate(elems).astype(np.int64)
        slots = np.concatenate(slots).astype(np.int64)
        signs = np.concatenate(signs).astype(np.float32)
        order = np.argsort(elems, kind="stable")
        elems, slots, signs = elems[order], slots[order], signs[order]
        counts = np.bincount(elems, minlength=CL)
        offs = np.arange(len(elems)) - np.concatenate(
            [[0], np.cumsum(counts)[:-1]])[elems]
        inc_slot[s, elems, offs] = slots
        inc_sign[s, elems, offs] = signs

    conn = ShardedConnectivity(
        left=jnp.asarray(lefts), right=jnp.asarray(rights),
        normal=jnp.asarray(normals), area=jnp.asarray(areas),
        b_elem=jnp.asarray(b_elems), b_normal=jnp.asarray(b_normals),
        b_area=jnp.asarray(b_areas),
        inc_slot=jnp.asarray(inc_slot), inc_sign=jnp.asarray(inc_sign),
        send_rounds=tuple(send_rounds), halo_rounds=halo_rounds,
        n_shards=n_shards, local_capacity=CL, halo_size=H,
        axis_ranges=axis_ranges, b_axis_ranges=b_axis_ranges,
        d_left=jnp.asarray(d_lefts) if have_geom else None,
        d_right=jnp.asarray(d_rights) if have_geom else None,
        d_b=jnp.asarray(d_bs) if have_geom else None)
    return conn, bounds


def shard_array(values: np.ndarray, bounds: np.ndarray, local_capacity: int,
                fill: float = 0.0) -> np.ndarray:
    """Split a per-element array [..., n] into stacked shards
    [n_shards, ..., CL] padded with `fill`."""
    n_shards = len(bounds) - 1
    out = np.full((n_shards,) + values.shape[:-1] + (local_capacity,),
                  fill, values.dtype)
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        out[s, ..., : hi - lo] = values[..., lo:hi]
    return out


def unshard_array(stacked: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Inverse of shard_array: [n_shards, ..., CL] -> [..., n]."""
    parts = []
    for s in range(len(bounds) - 1):
        parts.append(stacked[s, ..., : bounds[s + 1] - bounds[s]])
    return np.concatenate(parts, axis=-1)
