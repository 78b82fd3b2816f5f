"""Subgrid mesh: per-side neighbor tables for the block-structured scheme.

TPU-native counterpart of the reference `SubgridMeshManager` /
`SubgridMeshConnectivityAccessor` (`t8gpu/mesh/subgrid_mesh_manager.h:30-216`).
The reference resolves hanging-face cell pairing at kernel runtime from
(level_difference, neighbor_offset, normal) with anchor/stride index
arithmetic (`examples/subgrid/kernels.inl:710-758`, the `double_stride`
trick); here the host builds per-element-SIDE neighbor tables once per
adapt and the device evaluates whole face slabs densely (the
slab-exchange scheme — see the SubgridConnectivity docstring and
ops/subgrid.py for the rationale and the exactness argument).

All flux rotations are static momentum permutations per axis group —
no per-face basis construction (normals on the subgrid scheme are
axis-aligned, ref kernels.inl:717-750).

Flat cell index = cell * n_elements + element (element-minor layout),
matching the [5, *ext, E] state arrays.  Boundary (wall) faces keep a
small per-subface gather path with receive maps.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import bucket_capacity
from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SubgridConnectivity:
    """Per-side neighbor tables for the slab-exchange outer-flux scheme.

    TPU rationale: arbitrary per-cell gathers/scatters serialize on the
    TPU scalar core (measured ~12 ms per 2M-index gather), so mesh-face
    fluxes are NOT assembled per subface.  Instead every element SIDE
    (2*dim of them) gathers its <=2^(dim-1) neighbor elements' facing
    layer slabs — few large-slice gathers — and evaluates ALL subfaces
    densely at "virtual fine" resolution (2x the layer per tangent axis):
    equal/coarser neighbors see each physical flux replicated 2^(dim-1)x
    with area /2^(dim-1) (bit-identical sum), finer neighbors land exactly
    on their physical fine subfaces.  Both sides of a face compute the
    identical flux value and update only themselves -> exact conservation
    without any scatter (replacing ref kernels.inl:664-911 + atomicAdd).

    Per side k = 2*axis + (0 for +, 1 for -):
      nbr[k]  i32 [Ecap, M]      neighbor element ids (repeated for
                                 equal/coarser; self on walls/padding)
      rel[k]  i8  [Ecap]         neighbor level - my level in {-1, 0, +1}
      bits[k] i8  [Ecap, dim-1]  coarse-neighbor tangent half-shift bits
                                 (the reference neighbor_offset in units of
                                 ext/2, subgrid_mesh_manager.h:486-488)
      mask[k] f32 [Ecap]         1 interior, 0 wall/padding

    Boundary (wall) groups keep the small per-subface gather path.
    """

    nbr: Tuple[jnp.ndarray, ...]
    rel: Tuple[jnp.ndarray, ...]
    bits: Tuple[jnp.ndarray, ...]
    mask: Tuple[jnp.ndarray, ...]
    # compact hanging-fine tables (sides with finer neighbors only; empty
    # [0]-arrays elsewhere): fine_idx[k] [K] = element ids with rel > 0
    # (bucketed, padded by repeating the first), fine_inv[k] [Ecap] =
    # position in fine_idx or K (sentinel).  The virtual-fine pass runs on
    # the COMPACT axis and expands by row gather — O(level-boundary)
    # instead of O(all elements) work (the dense pass measured 4x the
    # whole step cost on a band-refined mesh).
    fine_idx: Tuple[jnp.ndarray, ...]
    fine_inv: Tuple[jnp.ndarray, ...]

    b_cell: Tuple[jnp.ndarray, ...]
    b_area: Tuple[jnp.ndarray, ...]
    b_recv: Tuple[jnp.ndarray, ...]

    b_groups: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True))  # (axis, sign) per boundary group
    # per side: does any element face FINER/COARSER neighbors?  Static so
    # uniform meshes compile without the virtual-fine pass (outer_apply
    # pass 2), with single-column neighbor gathers, and without the
    # coarse-window resolution.
    has_fine: Tuple[bool, ...] = dataclasses.field(metadata=dict(static=True))
    has_coarse: Tuple[bool, ...] = dataclasses.field(
        metadata=dict(static=True))
    n_elements: int = dataclasses.field(metadata=dict(static=True))
    element_capacity: int = dataclasses.field(metadata=dict(static=True))


def _flat_cells(spec: SubgridSpec, elem: np.ndarray, coords,
                n_elems: int) -> np.ndarray:
    """elem [K] + per-axis cell coords [K] -> flat cell indices [K] in the
    element-minor layout (flat = cell * n_elems + elem, matching the
    [*ext, n_elems] state array raveled)."""
    idx = np.zeros_like(elem, dtype=np.int64)
    for c, e in zip(coords, spec.extents):
        idx = idx * e + c
    return (idx * n_elems + elem.astype(np.int64)).astype(np.int32)


def _tangent_grid(ext: int, dim: int) -> np.ndarray:
    """Subface tangent tiling [S, dim-1] in C order."""
    S = ext ** (dim - 1)
    return np.stack(np.meshgrid(*([np.arange(ext)] * (dim - 1)),
                                indexing="ij"), axis=-1).reshape(S, dim - 1)


def build_recv_map(cells: np.ndarray, n_rows_elems: int, spec: SubgridSpec,
                   axis: int, multiplicity: int, sentinel: int,
                   positions: Optional[np.ndarray] = None,
                   n_elems_decode: Optional[int] = None) -> np.ndarray:
    """Invert flat target-cell indices into a per-layer-cell receive map.

    cells: [K] flat cell indices (all lying in some element's boundary
    layer along `axis` — the tangent coordinates identify the layer cell).
    Returns [T * n_rows_elems, multiplicity] int32 of subface slots
    (positions in `cells`, or `positions[k]` when given — used by the
    sharded builder, where remote-target subfaces are filtered out but
    slots index the unfiltered flux array), sentinel-filled.  Rows are
    (tangent-cell-major, element-minor), matching the [*tangent_ext, E]
    slab layout.  `n_elems_decode` is the element-axis length of the flat
    indexing (differs from n_rows_elems for the sharded extended axis)."""
    dim = spec.dim
    ext = spec.extent
    T = ext ** (dim - 1)
    if n_elems_decode is None:
        n_elems_decode = n_rows_elems
    if positions is None:
        positions = np.arange(len(cells))
    e = cells.astype(np.int64) % n_elems_decode
    off = cells.astype(np.int64) // n_elems_decode
    # decode C-order coords (x slowest), drop the face axis, re-flatten
    coords = []
    rem = off
    for a in range(dim - 1, -1, -1):
        coords.append(rem % ext)
        rem = rem // ext
    coords = coords[::-1]                    # x, y(, z)
    tidx = np.zeros_like(e)
    for a in range(dim):
        if a == axis:
            continue
        tidx = tidx * ext + coords[a]
    row = tidx * n_rows_elems + e
    order = np.argsort(row, kind="stable")
    rows_sorted = row[order]
    counts = np.bincount(rows_sorted, minlength=n_rows_elems * T)
    assert counts.max(initial=0) <= multiplicity, \
        f"receive multiplicity {counts.max()} exceeds {multiplicity}"
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(rows_sorted)) - starts[rows_sorted]
    recv = np.full((n_rows_elems * T, multiplicity), sentinel, np.int32)
    recv[rows_sorted, slot] = np.asarray(positions)[order].astype(np.int32)
    return recv


def build_side_tables(forest: Forest, spec: SubgridSpec, cap_e: int,
                      elem_map=None):
    """Per-(axis, sign) neighbor tables (see SubgridConnectivity docstring).

    Probes the 2^(dim-1) quadrant points behind each element face; 2:1
    balance guarantees all probed leaves share one level in {lv-1, lv,
    lv+1}, so the side is uniformly equal / coarser / finer.  `elem_map`
    optionally remaps global neighbor ids (the sharded builder passes
    global->extended-local translation); rows beyond n_elements are
    masked padding.  Returns (nbr, rel, bits, mask) tuples of 2*dim
    NumPy arrays each.
    """
    dim = forest.dim
    ext_units = np.int64(1) << forest.L
    n = forest.n_elements
    sizes = forest.sizes()
    lv = forest.level.astype(np.int64)
    M = 1 << (dim - 1)

    nbrs, rels, bits_, masks = [], [], [], []
    for axis in range(dim):
        tangents = [a for a in range(dim) if a != axis]
        for sign in (1, -1):
            nbr = np.zeros((cap_e, M), np.int32)
            rel = np.zeros(cap_e, np.int8)
            bits = np.zeros((cap_e, max(dim - 1, 1)), np.int8)
            mask = np.zeros(cap_e, np.float32)

            q0 = forest.anchor.copy()
            q0[:, axis] += np.where(sign > 0, sizes, -1)
            outside = (q0[:, axis] < 0) | (q0[:, axis] >= ext_units)
            wall = outside & (not forest.periodic_axes[axis])
            q0[:, axis] %= ext_units

            probes = np.empty((M, n), np.int64)
            for m in range(M):
                qm = q0.copy()
                for ti, ta in enumerate(tangents):
                    if (m >> ti) & 1:
                        qm[:, ta] += sizes // 2
                probes[m] = forest._locate(qm)
            j0 = probes[0]
            r = np.sign(lv[j0] - lv).astype(np.int8)
            r[wall] = 0

            nbr_rows = probes.T.astype(np.int64)          # [n, M]
            nbr_rows[wall] = np.arange(n)[wall, None]     # self on walls
            for ti, ta in enumerate(tangents):
                b = (forest.anchor[:, ta] - forest.anchor[j0, ta]) // sizes
                bits[:n, ti] = np.where(r == -1, b & 1, 0)
            if elem_map is not None:
                nbr_rows = elem_map(nbr_rows)
            nbr[:n] = nbr_rows
            rel[:n] = r
            mask[:n] = (~wall).astype(np.float32)
            nbrs.append(nbr)
            rels.append(rel)
            bits_.append(bits)
            masks.append(mask)
    return nbrs, rels, bits_, masks


def build_fine_tables(rels, cap_e: int):
    """Per side, the compact hanging-fine index table + its inverse
    (see SubgridConnectivity.fine_idx/fine_inv).  `rels` are host [cap_e]
    int8 arrays; sides without finer neighbors get empty [0] arrays."""
    fine_idxs, fine_invs = [], []
    for r in rels:
        pos = np.flatnonzero(r == 1)
        if len(pos):
            # COARSE buckets (x2 from 256): the per-side hanging counts
            # jitter by tens of percent between adapts, and every
            # distinct K is a distinct XLA program shape — with 2*dim
            # independent sides, fine-grained buckets caused recurring
            # fresh compiles through the relay on long AMR runs
            # (round-4 endurance observation); x2 growth caps the
            # distinct shapes at ~log2(N) per side and warms in a
            # couple of adapts
            K = bucket_capacity(len(pos), growth=2.0, base=256)
            fi = np.full(K, pos[0], np.int32)
            fi[: len(pos)] = pos
            inv = np.full(cap_e, K, np.int32)
            inv[pos] = np.arange(len(pos))
        else:
            fi = np.zeros(0, np.int32)
            inv = np.zeros(0, np.int32)
        fine_idxs.append(fi)
        fine_invs.append(inv)
    return fine_idxs, fine_invs


def build_subgrid_connectivity(
        forest: Forest, spec: SubgridSpec,
        element_capacity: Optional[int] = None) -> SubgridConnectivity:
    """Resolve the forest into per-side neighbor tables + wall groups."""
    dim = forest.dim
    assert spec.dim == dim
    ext = spec.extent
    n = forest.n_elements
    cap_e = element_capacity or bucket_capacity(n)
    # the coarsest element must hold at least `ext` anchor units per axis so
    # neighbor offsets convert exactly to cell units
    assert forest.L - int(forest.level.max()) >= spec.log2_extent, \
        "forest anchor resolution too coarse for the subgrid extent"

    f = forest.build_faces()
    sizes = forest.sizes()
    h = forest.h_unit
    S = ext ** (dim - 1)
    t_grid = _tangent_grid(ext, dim)

    nbrs, rels, bits_, masks = build_side_tables(forest, spec, cap_e)

    b_cells, b_areas, b_groups, b_recvs = [], [], [], []
    if f["b_elem"] is not None:
        for axis in range(dim):
            for sign in (1, -1):
                sel = np.flatnonzero((f["b_axis"] == axis) & (f["b_sign"] == sign))
                if not len(sel):
                    continue
                be = f["b_elem"][sel]
                K = len(sel)
                coord = [None] * dim
                coord[axis] = np.full((K, S), ext - 1 if sign > 0 else 0, np.int64)
                tangents = [a for a in range(dim) if a != axis]
                for ti, ta in enumerate(tangents):
                    coord[ta] = np.broadcast_to(t_grid[None, :, ti], (K, S))
                elem = np.broadcast_to(be[:, None], (K, S))
                bc = _flat_cells(spec, elem.ravel(),
                                 [c.ravel() for c in coord], cap_e)
                ar = np.broadcast_to(
                    ((sizes[be] * h / ext) ** (dim - 1)).astype(np.float32)[:, None],
                    (K, S)).ravel()
                cap = bucket_capacity(len(bc))
                pad = cap - len(bc)
                b_cells.append(np.pad(bc, (0, pad)))
                b_areas.append(np.pad(ar.astype(np.float32), (0, pad)))
                b_recvs.append(build_recv_map(bc, cap_e, spec, axis, 1,
                                              sentinel=cap)[:, 0])
                b_groups.append((axis, sign))

    # compact hanging-fine tables (see SubgridConnectivity docstring)
    fine_idxs, fine_invs = build_fine_tables(rels, cap_e)

    # ONE host->device transfer for the whole connectivity (per-array
    # uploads are latency-bound through slow interconnects; see utils/xfer)
    from t8gpu_tpu.utils.xfer import pack_put
    sides = 2 * dim
    dev = pack_put(nbrs + rels + bits_ + masks + fine_idxs + fine_invs
                   + b_cells + b_areas + b_recvs)
    d_nbr = dev[:sides]
    d_rel = dev[sides: 2 * sides]
    d_bits = dev[2 * sides: 3 * sides]
    d_mask = dev[3 * sides: 4 * sides]
    d_fi = dev[4 * sides: 5 * sides]
    d_fv = dev[5 * sides: 6 * sides]
    nb = len(b_cells)
    d_bc = dev[6 * sides: 6 * sides + nb]
    d_ba = dev[6 * sides + nb: 6 * sides + 2 * nb]
    d_br = dev[6 * sides + 2 * nb: 6 * sides + 3 * nb]

    return SubgridConnectivity(
        nbr=tuple(d_nbr), rel=tuple(d_rel), bits=tuple(d_bits),
        mask=tuple(d_mask), fine_idx=tuple(d_fi), fine_inv=tuple(d_fv),
        b_cell=tuple(d_bc), b_area=tuple(d_ba), b_recv=tuple(d_br),
        b_groups=tuple(b_groups),
        has_fine=tuple(bool((r == 1).any()) for r in rels),
        has_coarse=tuple(bool((r == -1).any()) for r in rels),
        n_elements=n, element_capacity=cap_e)


def cell_centers(forest: Forest, spec: SubgridSpec) -> np.ndarray:
    """Physical centers of every subgrid cell: [n_elements * size, dim]
    in element-major C-order (matching the flat cell indexing)."""
    ext = spec.extent
    dim = forest.dim
    h = forest.h_unit
    origins = forest.anchor * h                       # [N, dim]
    h_cell = (forest.edge_lengths() / ext)            # [N]
    grids = np.meshgrid(*([np.arange(ext)] * dim), indexing="ij")
    offs = np.stack([g.ravel() for g in grids], axis=-1)  # [B, dim] C-order
    centers = origins[:, None, :] + (offs[None, :, :] + 0.5) * h_cell[:, None, None]
    return centers.reshape(-1, dim)


@dataclasses.dataclass
class SubgridMesh:
    """Adapter bundling a Forest + SubgridSpec with device-facing arrays."""

    forest: Forest
    spec: SubgridSpec
    conn: SubgridConnectivity
    volumes: np.ndarray     # [N] element volumes (cell volume = V / size)

    @property
    def dim(self) -> int:
        return self.forest.dim

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    @property
    def max_level(self) -> int:
        return int(self.forest.level.max())

    def cell_centers(self) -> np.ndarray:
        return cell_centers(self.forest, self.spec)

    @staticmethod
    def from_forest(forest: Forest, spec: SubgridSpec,
                    element_capacity: Optional[int] = None) -> "SubgridMesh":
        return SubgridMesh(
            forest=forest, spec=spec,
            conn=build_subgrid_connectivity(forest, spec, element_capacity),
            volumes=forest.volumes().astype(np.float32))
