"""Subgrid mesh: per-face cell index maps for the block-structured scheme.

TPU-native counterpart of the reference `SubgridMeshManager` /
`SubgridMeshConnectivityAccessor` (`t8gpu/mesh/subgrid_mesh_manager.h:30-216`).
The reference resolves hanging-face cell pairing at kernel runtime from
(level_difference, neighbor_offset, normal) with anchor/stride index
arithmetic (`examples/subgrid/kernels.inl:710-758`, the `double_stride`
trick); here the host resolves every subface to a flat (left_cell,
right_cell) index pair once per adapt, and the device kernels are plain
vectorized gathers + scatter-adds over those index arrays.

Faces are canonicalized to +axis normals (a -axis face swaps sides) and
grouped by axis, so the flux rotation per group is a static momentum
permutation — no per-face basis construction (normals on the subgrid
scheme are axis-aligned, ref kernels.inl:717-750).

Flat cell index = element * block_size + C-order offset over (x, y[, z]).
Padding entries point at cell 0 with area 0 (contributing exactly zero,
same convention as mesh/connectivity.py).
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
    """Flat subface index maps, grouped by face axis.

    For axis group a: `l_cell[a][s]` / `r_cell[a][s]` are flat cell indices
    of the s-th subface's two sides (left = lower coordinate along a after
    canonicalization), `area[a][s]` the subface area (0 on padding).
    Boundary groups are keyed (axis, sign) with the owner cell + outward
    sign; empty tuple on periodic meshes.
    """

    l_cell: Tuple[jnp.ndarray, ...]
    r_cell: Tuple[jnp.ndarray, ...]
    area: Tuple[jnp.ndarray, ...]
    b_cell: Tuple[jnp.ndarray, ...]
    b_area: Tuple[jnp.ndarray, ...]

    b_groups: Tuple[Tuple[int, int], ...] = dataclasses.field(
        metadata=dict(static=True))  # (axis, sign) per boundary group
    n_elements: int = dataclasses.field(metadata=dict(static=True))
    element_capacity: int = dataclasses.field(metadata=dict(static=True))


def _flat_cells(spec: SubgridSpec, elem: np.ndarray, coords) -> np.ndarray:
    """elem [K] + per-axis cell coords [K] -> flat cell indices [K]."""
    idx = np.zeros_like(elem, dtype=np.int64)
    for c, e in zip(coords, spec.extents):
        idx = idx * e + c
    return (elem.astype(np.int64) * spec.size + idx).astype(np.int32)


def _tangent_grid(ext: int, dim: int) -> np.ndarray:
    """Subface tangent tiling [S, dim-1] in C order."""
    S = ext ** (dim - 1)
    return np.stack(np.meshgrid(*([np.arange(ext)] * (dim - 1)),
                                indexing="ij"), axis=-1).reshape(S, dim - 1)


def expand_axis_subfaces(spec: SubgridSpec, axis: int, le, re, sign, ldiff,
                         off_anchor, nb_size, le_size, h: float):
    """Resolve the faces of one axis group into per-subface cell pairs.

    Implements the reference anchor/stride/double_stride pairing
    (kernels.inl:710-758) in bulk: for each face, tile the LEFT (finer or
    equal) element's face with ext^(dim-1) subfaces, pair each with the
    right element's cell (tangent index >> ldiff for 2:1 hanging faces)
    and canonicalize -axis faces by swapping sides.

    Returns (elem_l, coords_l, elem_r, coords_r, area) flattened over
    faces x subfaces, with GLOBAL element ids (callers map to their own
    flat/extended indexing via _flat_cells).
    """
    dim = spec.dim
    ext = spec.extent
    t_grid = _tangent_grid(ext, dim)
    S = t_grid.shape[0]
    K = len(le)
    sign = np.asarray(sign, np.int64)
    ldiff = np.asarray(ldiff, np.int64)
    off_cells = (off_anchor * ext) // np.asarray(nb_size)[:, None]

    tangents = [a for a in range(dim) if a != axis]
    t = t_grid[None, :, :]
    lcoord = [None] * dim
    rcoord = [None] * dim
    lcoord[axis] = np.where(sign > 0, ext - 1, 0)[:, None] * np.ones((1, S), np.int64)
    rcoord[axis] = off_cells[:, axis][:, None] * np.ones((1, S), np.int64)
    for ti, ta in enumerate(tangents):
        lcoord[ta] = np.broadcast_to(t[:, :, ti], (K, S))
        rcoord[ta] = off_cells[:, ta][:, None] + (t[:, :, ti] >> ldiff[:, None])

    elem_l = np.broadcast_to(np.asarray(le)[:, None], (K, S)).ravel()
    elem_r = np.broadcast_to(np.asarray(re)[:, None], (K, S)).ravel()
    lcoord = [c.ravel() for c in lcoord]
    rcoord = [c.ravel() for c in rcoord]
    # canonicalize -axis faces: +axis normal points lower -> higher
    # coordinate, so the geometric left side of a -axis face is the neighbor
    swap = np.broadcast_to((sign < 0)[:, None], (K, S)).ravel()
    elem_l2 = np.where(swap, elem_r, elem_l)
    elem_r2 = np.where(swap, elem_l, elem_r)
    lcoord2 = [np.where(swap, rc, lc) for lc, rc in zip(lcoord, rcoord)]
    rcoord2 = [np.where(swap, lc, rc) for lc, rc in zip(lcoord, rcoord)]
    # subface area = the finer (emitting) element's cell face area
    area = np.broadcast_to(
        ((np.asarray(le_size) * h / ext) ** (dim - 1)).astype(np.float32)[:, None],
        (K, S)).ravel()
    return elem_l2, lcoord2, elem_r2, rcoord2, area


def build_subgrid_connectivity(
        forest: Forest, spec: SubgridSpec,
        element_capacity: Optional[int] = None) -> SubgridConnectivity:
    """Resolve forest faces into per-axis flat subface index maps."""
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

    l_cells, r_cells, areas = [], [], []
    for axis in range(dim):
        sel = np.flatnonzero(f["axis"] == axis)
        if len(sel):
            le, re = f["left"][sel], f["right"][sel]
            el, cl, er, cr, ar = expand_axis_subfaces(
                spec, axis, le, re, f["sign"][sel],
                f["level_difference"][sel], f["neighbor_offset"][sel],
                sizes[re], sizes[le], h)
            lc2 = _flat_cells(spec, el, cl)
            rc2 = _flat_cells(spec, er, cr)
        else:
            lc2 = np.zeros(0, np.int32)
            rc2 = np.zeros(0, np.int32)
            ar = np.zeros(0, np.float32)

        cap = bucket_capacity(max(len(lc2), 1))
        pad = cap - len(lc2)
        l_cells.append(jnp.asarray(np.pad(lc2, (0, pad))))
        r_cells.append(jnp.asarray(np.pad(rc2, (0, pad))))
        areas.append(jnp.asarray(np.pad(ar.astype(np.float32), (0, pad))))

    b_cells, b_areas, b_groups = [], [], []
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
                bc = _flat_cells(spec, elem.ravel(), [c.ravel() for c in coord])
                ar = np.broadcast_to(
                    ((sizes[be] * h / ext) ** (dim - 1)).astype(np.float32)[:, None],
                    (K, S)).ravel()
                cap = bucket_capacity(len(bc))
                pad = cap - len(bc)
                b_cells.append(jnp.asarray(np.pad(bc, (0, pad))))
                b_areas.append(jnp.asarray(np.pad(ar.astype(np.float32), (0, pad))))
                b_groups.append((axis, sign))

    return SubgridConnectivity(
        l_cell=tuple(l_cells), r_cell=tuple(r_cells), area=tuple(areas),
        b_cell=tuple(b_cells), b_area=tuple(b_areas),
        b_groups=tuple(b_groups),
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
