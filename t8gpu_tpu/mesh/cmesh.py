"""User-supplied coarse meshes (cmesh) + mixed-class forests.

The reference accepts ANY t8code cmesh — its flagship driver builds one
with a single constructor call (`t8_cmesh_new_prismed_spherical_shell_
icosahedron`, examples/compressible_euler/main.cu:23) and t8code forests
mix element classes freely (`README.md:8`).  This module closes that gap
for the rebuild:

* `QuadRoots` / `QuadForest` — an adaptive 4-ary quadtree forest over an
  ARBITRARY user quad mesh (shared vertices + [Nq, 4] corner ids, any
  planar embedding — bilinear root geometry, so curved/skewed quads work);
* `HexRoots` / `HexForest` — the 3D analogue: an adaptive octree forest
  over an arbitrary hex mesh (trilinear root geometry);
* `HybridForest` — ONE forest mixing TRIANGLE and QUAD elements over a
  shared vertex/edge key space, with criteria-driven AMR balanced 2:1
  ACROSS the class boundary, driving the general-normal flux path with
  per-class geometry (the mixed-element configuration BASELINE config 4
  names).

Design: same linearized-forest pattern as mesh/tri.py / mesh/tet.py —
elements are (root, level, path) triples in SFC order; faces are found by
EXACT integer key matching (`PrismForest._match_records`, native
`t8f_match_records` when built): every face emits a record keyed by its
corner-vertex lattice keys, equal keys pair up, a face matching a
one-level-finer quarter is hanging (emitted by the finer side, ref
mesh_manager.inl:396-424), the rest are domain boundary.  The key space
is shared across classes: global vertex ids, then root-edge interior
points (edge id x lattice parameter, oriented from the lower vertex id),
then per-root interior points — two roots of ANY class agree on every
key along a shared edge, which is what makes cross-class and cross-root
matching exact (no floating-point geometry in connectivity).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from t8gpu_tpu.mesh.connectivity import FaceConnectivity, build_connectivity
from t8gpu_tpu.mesh.forest import RemapSpec
from t8gpu_tpu.mesh.morton import morton_decode, morton_encode
from t8gpu_tpu.mesh.shell_forest import LMAX, PrismForest

_match_records = PrismForest._match_records
R_UNIT = np.int64(1) << LMAX                 # root edge in lattice units


# ---------------------------------------------------------------------------
# Shared key-space helpers
# ---------------------------------------------------------------------------


def _edge_table(cells_list) -> dict:
    """Shared edge ids over every (a, b) vertex pair appearing as an edge
    of any cell in any class; key = sorted pair."""
    edge_id: dict = {}
    for pairs in cells_list:
        for a, b in pairs:
            key = (min(int(a), int(b)), max(int(a), int(b)))
            if key not in edge_id:
                edge_id[key] = len(edge_id)
    return edge_id


def _edge_key_lookup(edge_id: dict, u: np.ndarray, w: np.ndarray,
                     tpar: np.ndarray, nv: int) -> np.ndarray:
    """Key of the interior point at parameter `tpar` (1..R-1) along root
    edge (u, w), oriented from the LOWER global vertex id (both sides of
    a shared edge compute the identical key)."""
    from t8gpu_tpu.mesh.shell_forest import edge_id_vec
    lo = np.minimum(u, w)
    hi = np.maximum(u, w)
    tt = np.where(u < w, tpar, R_UNIT - tpar)
    eid = edge_id_vec(edge_id, nv, lo, hi)
    return np.int64(nv) + eid * (R_UNIT - 1) + (tt - 1)


# ---------------------------------------------------------------------------
# QuadForest: adaptive quadtree over an arbitrary quad mesh
# ---------------------------------------------------------------------------

# z-order corners: c0=(0,0) c1=(1,0) c2=(0,1) c3=(1,1)
_QUAD_EDGES = ((0, 2), (1, 3), (0, 1), (2, 3))   # left, right, bottom, top
_QUAD_CORNER_UV = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.int64)


@dataclasses.dataclass(frozen=True)
class QuadRoots:
    """Arbitrary coarse quad mesh: shared vertices + z-order corner ids.

    `tri_blocks` reserves that many interior-key blocks BEFORE the quad
    roots (HybridForest puts the triangle roots there so both classes
    share one key space); standalone quad meshes leave it 0."""

    verts: np.ndarray    # [Nv, 2 or 3] (planar or embedded)
    quads: np.ndarray    # [Nq, 4] vertex ids, z-order corners
    edge_id: dict
    tri_blocks: int = 0

    @property
    def n_roots(self) -> int:
        return len(self.quads)


def quad_roots(verts, quads) -> QuadRoots:
    """Build QuadRoots from user vertices [Nv, 2] + quads [Nq, 4]
    (z-order corners: (0,0),(1,0),(0,1),(1,1))."""
    verts = np.asarray(verts, np.float64)
    quads = np.asarray(quads, np.int64)
    edges = quads[:, list(sum(_QUAD_EDGES, ()))].reshape(-1, 2)
    return QuadRoots(verts=verts, quads=quads,
                     edge_id=_edge_table([edges]))


def unit_square_quad_roots(nx: int = 1, ny: int = 1) -> QuadRoots:
    """nx x ny structured quad grid of the unit square (the trivial user
    cmesh; reflective walls)."""
    xs = np.linspace(0.0, 1.0, nx + 1)
    ys = np.linspace(0.0, 1.0, ny + 1)
    verts = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1
                     ).reshape(-1, 2)
    vid = np.arange((nx + 1) * (ny + 1)).reshape(nx + 1, ny + 1)
    quads = np.stack([vid[:-1, :-1], vid[1:, :-1],
                      vid[:-1, 1:], vid[1:, 1:]], axis=-1).reshape(-1, 4)
    return quad_roots(verts, quads)


class QuadForest:
    """Linearized adaptive quadtree forest over QuadRoots (duck-type
    compatible with mesh/forest.Forest for MeshManager/solvers, like
    TriForest)."""

    dim = 2
    NCH = 4

    def __init__(self, roots: QuadRoots, root: np.ndarray,
                 level: np.ndarray, path: np.ndarray):
        self.roots = roots
        self.root = np.asarray(root, np.int64)
        self.level = np.asarray(level, np.int8)
        self.path = np.asarray(path, np.int64)   # Morton index in root
        self._sort()
        self._geom = None
        self._faces = None
        self._face_dict = None

    @staticmethod
    def uniform(roots: QuadRoots, level: int) -> "QuadForest":
        assert level < LMAX
        per_root = 4 ** level
        R = roots.n_roots
        root = np.repeat(np.arange(R, dtype=np.int64), per_root)
        path = np.tile(np.arange(per_root, dtype=np.int64), R)
        return QuadForest(roots, root,
                          np.full(R * per_root, level, np.int8), path)

    def _key(self) -> np.ndarray:
        lv = self.level.astype(np.int64)
        return (self.root << (2 * LMAX)) | (self.path << (2 * (LMAX - lv)))

    def _sort(self):
        key = self._key()
        order = np.argsort(key, kind="stable")
        if not np.array_equal(order, np.arange(len(order))):
            self.root = self.root[order]
            self.level = self.level[order]
            self.path = self.path[order]
            key = key[order]
        self.code = key

    @property
    def n_elements(self) -> int:
        return len(self.level)

    # -- families / adapt (same 4-ary pattern as TriForest) -----------------

    def family_heads(self) -> np.ndarray:
        n = self.n_elements
        heads = np.zeros(n, bool)
        if n < 4:
            return heads
        lv = self.level.astype(np.int64)
        same = np.ones(n - 3, bool)
        for k in range(1, 4):
            same &= (lv[k: n - 3 + k] == lv[: n - 3]) \
                & (self.root[k: n - 3 + k] == self.root[: n - 3]) \
                & ((self.path[k: n - 3 + k] >> 2) == (self.path[: n - 3] >> 2))
        heads[: n - 3] = (same & (lv[: n - 3] > 0)
                          & ((self.path[: n - 3] & 3) == 0))
        return heads

    def flags_from_criteria(self, criteria: np.ndarray, b: float,
                            min_level: int, max_level: int) -> np.ndarray:
        flags = np.zeros(self.n_elements, np.int8)
        flags[(criteria > b) & (self.level < max_level)] = 1
        h_idx = np.flatnonzero(self.family_heads())
        if len(h_idx):
            fam = h_idx[:, None] + np.arange(4)
            no_refine = (flags[fam] < 1).all(axis=1)
            ok = ((self.level[h_idx] > min_level) & no_refine
                  & (criteria[fam].mean(axis=1) < b))
            flags[fam[ok].ravel()] = -1
        return flags

    def adapt(self, flags: np.ndarray) -> Tuple["QuadForest", RemapSpec]:
        flags = np.asarray(flags, np.int8).copy()
        n = self.n_elements

        coarsen_head = np.zeros(n, bool)
        is_coarsened = np.zeros(n, bool)
        h_idx = np.flatnonzero(self.family_heads())
        if len(h_idx):
            fam = h_idx[:, None] + np.arange(4)
            ok = (flags[fam] == -1).all(axis=1)
            coarsen_head[h_idx[ok]] = True
            is_coarsened[fam[ok].ravel()] = True
        flags[(flags == -1) & ~is_coarsened] = 0

        refine = flags == 1
        counts = np.ones(n, np.int64)
        counts[refine] = 4
        counts[is_coarsened & ~coarsen_head] = 0

        new_from_old = np.repeat(np.arange(n), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        child_rank = np.arange(len(new_from_old)) - starts[new_from_old]

        old_level = self.level.astype(np.int64)[new_from_old]
        old_path = self.path[new_from_old]
        ref = refine[new_from_old]
        coh = coarsen_head[new_from_old]

        new_level = old_level + ref - coh
        new_path = np.where(ref, old_path * 4 + child_rank,
                            np.where(coh, old_path >> 2, old_path))

        remap = RemapSpec(
            src_start=new_from_old.astype(np.int32),
            src_count=np.where(coh, 4, 1).astype(np.int32),
            child_id=np.where(ref, child_rank, 0).astype(np.int8),
            level_change=(ref.astype(np.int8) - coh.astype(np.int8)),
        )
        f = QuadForest(self.roots, self.root[new_from_old],
                       new_level.astype(np.int8), new_path)
        return f, remap

    def balance_flags(self, flags: np.ndarray) -> np.ndarray:
        m = self._build_face_lists()
        pairs = (np.concatenate([m["eq_l"], m["hang_f"]]).astype(np.int64),
                 np.concatenate([m["eq_r"], m["hang_c"]]).astype(np.int64))
        return _ripple_balance(self.level, flags, pairs,
                               [(self.family_heads(), 4, 0)])

    # -- geometry (bilinear root map) ---------------------------------------

    def _anchors(self):
        """(iN, jN) lattice anchors at LMAX resolution + size."""
        lv = self.level.astype(np.int64)
        sh = LMAX - lv
        ij = morton_decode(self.path.astype(np.uint64), 2)
        return ij[:, 0] << sh, ij[:, 1] << sh, np.int64(1) << sh

    def _map_points(self, iN: np.ndarray, jN: np.ndarray,
                    root: np.ndarray) -> np.ndarray:
        """Bilinear image [n, D] of lattice points in their roots."""
        c = self.roots.verts[self.roots.quads[root]]      # [n, 4, D]
        u = (iN / float(R_UNIT))[:, None]
        v = (jN / float(R_UNIT))[:, None]
        return ((1 - u) * (1 - v) * c[:, 0] + u * (1 - v) * c[:, 1]
                + (1 - u) * v * c[:, 2] + u * v * c[:, 3])

    def _geometry(self):
        if self._geom is None:
            iN, jN, S = self._anchors()
            corners = np.stack(
                [self._map_points(iN + du * S, jN + dv * S, self.root)
                 for du, dv in _QUAD_CORNER_UV], axis=1)    # [N, 4, D]
            # shoelace over CCW polygon c0 c1 c3 c2
            poly = corners[:, [0, 1, 3, 2]]
            x, y = poly[..., 0], poly[..., 1]
            xr, yr = np.roll(x, -1, 1), np.roll(y, -1, 1)
            cross = x * yr - xr * y
            a_signed = 0.5 * cross.sum(axis=1)
            area = np.abs(a_signed)
            cx = ((x + xr) * cross).sum(axis=1) / (6.0 * a_signed)
            cy = ((y + yr) * cross).sum(axis=1) / (6.0 * a_signed)
            centers = np.stack([cx, cy], axis=1)
            self._geom = (corners, area, centers)
        return self._geom

    def volumes(self) -> np.ndarray:
        return self._geometry()[1]

    def centers(self) -> np.ndarray:
        return self._geometry()[2]

    # -- faces ---------------------------------------------------------------

    def _vertex_keys(self, iN: np.ndarray, jN: np.ndarray,
                     quad: np.ndarray) -> np.ndarray:
        roots = self.roots
        R = R_UNIT
        v = roots.quads[quad]
        nv = len(roots.verts)
        ne = len(roots.edge_id)
        OFF_I = np.int64(nv) + np.int64(ne) * (R - 1)
        blk = np.int64(roots.tri_blocks) + quad

        key = OFF_I + (blk * (R + 1) + iN) * (R + 1) + jN
        key = np.where((iN == 0) & (jN == 0), v[:, 0], key)
        key = np.where((iN == R) & (jN == 0), v[:, 1], key)
        key = np.where((iN == 0) & (jN == R), v[:, 2], key)
        key = np.where((iN == R) & (jN == R), v[:, 3], key)

        for (a, b), sel, par in (
                ((0, 1), (jN == 0) & (iN > 0) & (iN < R), iN),   # bottom
                ((2, 3), (jN == R) & (iN > 0) & (iN < R), iN),   # top
                ((0, 2), (iN == 0) & (jN > 0) & (jN < R), jN),   # left
                ((1, 3), (iN == R) & (jN > 0) & (jN < R), jN)):  # right
            if sel.any():
                key[sel] = _edge_key_lookup(roots.edge_id, v[sel, a],
                                            v[sel, b], par[sel], nv)
        return key

    def _edge_records(self, offset: int = 0):
        """Edge records for the exact matcher (side order: left, right,
        bottom, top — _QUAD_EDGES); `offset` shifts element ids for
        joint mixed-class matching."""
        n = self.n_elements
        iN, jN, S = self._anchors()
        assert int(self.level.max(initial=0)) < LMAX
        zero = np.zeros(n, np.int64)
        ids = np.arange(n) + offset
        # corner lattice coords in z-order
        ci = np.stack([iN, iN + S, iN, iN + S], axis=1)
        cj = np.stack([jN, jN, jN + S, jN + S], axis=1)
        vk = np.stack([self._vertex_keys(ci[:, c], cj[:, c], self.root)
                       for c in range(4)], axis=1)
        own_rec, sub_rec = [], []
        for e, (a, b) in enumerate(_QUAD_EDGES):
            k_a, k_b = vk[:, a], vk[:, b]
            own_rec.append((np.minimum(k_a, k_b), np.maximum(k_a, k_b),
                            zero, zero, ids, e))
            miN = (ci[:, a] + ci[:, b]) >> 1
            mjN = (cj[:, a] + cj[:, b]) >> 1
            k_m = self._vertex_keys(miN, mjN, self.root)
            for (ka, kb) in ((k_a, k_m), (k_m, k_b)):
                sub_rec.append((np.minimum(ka, kb), np.maximum(ka, kb),
                                zero, zero, ids, e))
        return own_rec, sub_rec

    def _build_face_lists(self):
        if self._faces is None:
            own_rec, sub_rec = self._edge_records()
            self._faces = _match_records(
                own_rec, sub_rec, allow_boundary=True,
                boundary_mask=lambda g: np.ones(len(g), bool))
        return self._faces

    def _edge_geom(self, elem: np.ndarray, side: np.ndarray):
        """(outward normal [n,2], length [n], midpoint [n,2]) of local
        edge `side` of `elem` (straight chords between mapped corner
        images — both sides of a shared lattice edge see the identical
        geometry)."""
        corners, _, centers = self._geometry()
        pairs = np.array(_QUAD_EDGES)
        a = pairs[side, 0]
        b = pairs[side, 1]
        ar = np.arange(len(elem))
        p0 = corners[elem][ar, a]
        p1 = corners[elem][ar, b]
        d = p1 - p0
        length = np.linalg.norm(d, axis=1)
        nrm = np.stack([d[:, 1], -d[:, 0]], axis=1) / length[:, None]
        cent = (p0 + p1) / 2.0
        s = np.sign(((cent - centers[elem]) * nrm).sum(axis=1))
        return nrm * s[:, None], length, cent

    def build_faces(self):
        if self._face_dict is None:
            self._face_dict = _faces_from_match(
                self._build_face_lists(), [(0, self, self.n_elements)])
        return self._face_dict

    def connectivity(self, element_capacity: Optional[int] = None,
                     recon_geometry: bool = True) -> FaceConnectivity:
        return _connectivity_from_faces(self, element_capacity,
                                        recon_geometry)

    def cfl_h(self) -> float:
        from t8gpu_tpu.mesh.forest import cfl_h_from_faces
        return cfl_h_from_faces(self)


# ---------------------------------------------------------------------------
# Shared face-dict / balance helpers (class-agnostic)
# ---------------------------------------------------------------------------


def _ripple_balance(level: np.ndarray, flags: np.ndarray, pairs,
                    families) -> np.ndarray:
    """2:1 balance fixpoint over an explicit face-pair graph (the
    TriForest.balance_flags logic, class-agnostic): cancel partial-family
    coarsens, then repeatedly cancel coarsens / add refines until every
    adjacent tentative-level difference is <= 1.  `families` is a list of
    (heads_mask, k, offset) per element class."""
    flags = np.asarray(flags, np.int8).copy()
    n = len(level)
    fams = []
    for heads, k, off in families:
        h_idx = np.flatnonzero(heads) + off
        if len(h_idx):
            fams.append(h_idx[:, None] + np.arange(k))
    keep = np.zeros(n, bool)
    for fam in fams:
        full = (flags[fam] == -1).all(axis=1)
        keep[fam[full].ravel()] = True
    flags[(flags == -1) & ~keep] = 0

    a, b = pairs
    lv = np.asarray(level, np.int64)
    for _ in range(64):
        t = lv + flags
        viol = np.zeros(n, bool)
        viol[a[t[b] > t[a] + 1]] = True
        viol[b[t[a] > t[b] + 1]] = True
        if not viol.any():
            break
        cancel = viol & (flags == -1)
        if cancel.any() and fams:
            changed = False
            for fam in fams:
                bad = cancel[fam].any(axis=1)
                members = fam[bad].ravel()
                if len(members):
                    mem_flags = flags[members]
                    flags[members[mem_flags == -1]] = 0
                    changed = True
            if changed:
                continue
        flags[viol & (flags == 0)] = 1
    return flags


def _faces_from_match(m: dict, classes) -> dict:
    """Face-dict (Forest.build_faces format) from matched records.
    `classes` is a list of (offset, forest_with_edge_geom, count); an
    element id e belongs to the class with the largest offset <= e.
    Face geometry comes from the EMITTING side (eq: left; hanging: the
    finer element), exactly like TriForest."""
    def geom(elem, side):
        nrm = np.zeros((len(elem), 2))
        length = np.zeros(len(elem))
        cent = np.zeros((len(elem), 2))
        for off, fr, cnt in classes:
            sel = (elem >= off) & (elem < off + cnt)
            if sel.any():
                nrm[sel], length[sel], cent[sel] = fr._edge_geom(
                    elem[sel] - off, side[sel])
        return nrm, length, cent

    lefts, rights, normals, lens, f_cents = [], [], [], [], []
    b_elems, b_normals, b_lens, b_cents = [], [], [], []

    def emit(le, ri, side):
        nrm, length, cent = geom(le, side)
        lefts.append(le)
        rights.append(ri)
        n3 = np.zeros((3, len(le)), np.float32)
        n3[:2] = nrm.T
        normals.append(n3)
        lens.append(length)
        c3 = np.zeros((3, len(le)))
        c3[:2] = cent.T
        f_cents.append(c3)

    if len(m["eq_l"]):
        emit(m["eq_l"], m["eq_r"], m["eq_side_l"])
    if len(m["hang_f"]):
        emit(m["hang_f"], m["hang_c"], m["hang_side_f"])
    if len(m["bnd_elem"]):
        el, side = m["bnd_elem"], m["bnd_side"]
        nrm, length, cent = geom(el, side)
        b_elems.append(el)
        n3 = np.zeros((3, len(el)), np.float32)
        n3[:2] = nrm.T
        b_normals.append(n3)
        b_lens.append(length)
        c3 = np.zeros((3, len(el)))
        c3[:2] = cent.T
        b_cents.append(c3)

    has_b = bool(b_elems)
    return dict(
        left=np.concatenate(lefts).astype(np.int32),
        right=np.concatenate(rights).astype(np.int32),
        normal=np.concatenate(normals, axis=1).astype(np.float32),
        area=np.concatenate(lens).astype(np.float32),
        b_elem=(np.concatenate(b_elems).astype(np.int32) if has_b else None),
        b_normal=(np.concatenate(b_normals, axis=1).astype(np.float32)
                  if has_b else None),
        b_area=(np.concatenate(b_lens).astype(np.float32)
                if has_b else None),
        axis=None, sign=None, b_axis=None, b_sign=None,
        face_center=np.concatenate(f_cents, axis=1),
        b_face_center=(np.concatenate(b_cents, axis=1) if has_b else None),
    )


def _connectivity_from_faces(forest, element_capacity, recon_geometry):
    f = forest.build_faces()
    return build_connectivity(
        left=f["left"], right=f["right"], normal=f["normal"],
        area=f["area"], n_elements=forest.n_elements,
        b_elem=f["b_elem"], b_normal=f["b_normal"], b_area=f["b_area"],
        element_capacity=element_capacity,
        face_center=f["face_center"] if recon_geometry else None,
        b_face_center=f["b_face_center"] if recon_geometry else None,
        centers=forest.centers() if recon_geometry else None,
    )


# ---------------------------------------------------------------------------
# HybridForest: tri + quad elements in ONE forest
# ---------------------------------------------------------------------------


def hybrid_roots(verts, tris, quads):
    """(TriRoots, QuadRoots) over a SHARED vertex/edge key space — the
    construction that makes cross-class face matching exact.  `tris`
    [Nt, 3] counter-clockwise; `quads` [Nq, 4] z-order corners."""
    from t8gpu_tpu.mesh.tri import TriRoots

    verts = np.asarray(verts, np.float64)
    tris = np.asarray(tris, np.int64)
    quads = np.asarray(quads, np.int64)
    t_edges = tris[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)
    q_edges = quads[:, list(sum(_QUAD_EDGES, ()))].reshape(-1, 2)
    edge_id = _edge_table([t_edges, q_edges])
    troots = TriRoots(verts=verts, tris=tris, edge_id=edge_id)
    qroots = QuadRoots(verts=verts, quads=quads, edge_id=edge_id,
                       tri_blocks=len(tris))
    return troots, qroots


def unit_square_hybrid_roots():
    """The reference mixed-mesh miniature: unit square, left half one
    quad root, right half two tri roots (a genuinely mixed cmesh with a
    shared interior edge)."""
    verts = np.array([[0.0, 0.0], [0.5, 0.0], [1.0, 0.0],
                      [0.0, 1.0], [0.5, 1.0], [1.0, 1.0]])
    quads = np.array([[0, 1, 3, 4]], np.int64)       # z-order corners
    tris = np.array([[1, 2, 5], [1, 5, 4]], np.int64)
    return hybrid_roots(verts, tris, quads)


class HybridForest:
    """Mixed-class adaptive forest: quad elements first, tri elements
    after, each block SFC-ordered; faces (including CROSS-CLASS quad-tri
    faces and their 2:1 hanging variants) found by one joint record
    match over the shared key space.  Duck-type compatible with
    mesh/forest.Forest for MeshManager and the general-normal solvers —
    the flux path never sees element classes, only face lists
    (ref kernels.cu:174-193 is likewise class-blind)."""

    dim = 2

    def __init__(self, quad: QuadForest, tri):
        self.quad = quad
        self.tri = tri
        self._face_dict = None
        self._faces = None

    @staticmethod
    def uniform(troots, qroots, level: int) -> "HybridForest":
        from t8gpu_tpu.mesh.tri import TriForest

        return HybridForest(QuadForest.uniform(qroots, level),
                            TriForest.uniform(troots, level))

    @property
    def n_elements(self) -> int:
        return self.quad.n_elements + self.tri.n_elements

    @property
    def level(self) -> np.ndarray:
        return np.concatenate([self.quad.level, self.tri.level])

    def element_class(self) -> np.ndarray:
        """Per-element class code: 0 = quad, 1 = tri."""
        return np.concatenate([
            np.zeros(self.quad.n_elements, np.int8),
            np.ones(self.tri.n_elements, np.int8)])

    def volumes(self) -> np.ndarray:
        return np.concatenate([self.quad.volumes(), self.tri.volumes()])

    def centers(self) -> np.ndarray:
        return np.concatenate([self.quad.centers(), self.tri.centers()])

    def family_heads(self) -> np.ndarray:
        return np.concatenate([self.quad.family_heads(),
                               self.tri.family_heads()])

    def flags_from_criteria(self, criteria, b, min_level, max_level):
        nq = self.quad.n_elements
        return np.concatenate([
            self.quad.flags_from_criteria(criteria[:nq], b, min_level,
                                          max_level),
            self.tri.flags_from_criteria(criteria[nq:], b, min_level,
                                         max_level)])

    def balance_flags(self, flags: np.ndarray) -> np.ndarray:
        """2:1 balance over the FULL hybrid face graph — refinement
        ripples across the tri/quad interface exactly like within a
        class."""
        m = self._build_face_lists()
        pairs = (np.concatenate([m["eq_l"], m["hang_f"]]).astype(np.int64),
                 np.concatenate([m["eq_r"], m["hang_c"]]).astype(np.int64))
        nq = self.quad.n_elements
        return _ripple_balance(
            self.level, flags, pairs,
            [(self.quad.family_heads(), 4, 0),
             (self.tri.family_heads(), 4, nq)])

    def adapt(self, flags: np.ndarray) -> Tuple["HybridForest", RemapSpec]:
        nq = self.quad.n_elements
        fq, rq = self.quad.adapt(flags[:nq])
        ft, rt = self.tri.adapt(flags[nq:])
        remap = RemapSpec(
            src_start=np.concatenate([rq.src_start,
                                      rt.src_start + nq]).astype(np.int32),
            src_count=np.concatenate([rq.src_count, rt.src_count]),
            child_id=np.concatenate([rq.child_id, rt.child_id]),
            level_change=np.concatenate([rq.level_change, rt.level_change]),
        )
        return HybridForest(fq, ft), remap

    def _build_face_lists(self):
        if self._faces is None:
            nq = self.quad.n_elements
            own_q, sub_q = self.quad._edge_records(offset=0)
            own_t, sub_t = self.tri._edge_records(offset=nq)
            self._faces = _match_records(
                own_q + own_t, sub_q + sub_t, allow_boundary=True,
                boundary_mask=lambda g: np.ones(len(g), bool))
        return self._faces

    def _tri_edge_geom(self, elem, side):
        """TriForest edge geometry in the shared (normal, length, mid)
        form (TriForest inlines this in its own build_faces)."""
        X, _, centers = self.tri._geometry()
        pairs = np.array([(0, 1), (1, 2), (2, 0)])
        a = pairs[side, 0]
        b = pairs[side, 1]
        ar = np.arange(len(elem))
        p0 = X[elem][ar, a]
        p1 = X[elem][ar, b]
        d = p1 - p0
        length = np.linalg.norm(d, axis=1)
        nrm = np.stack([d[:, 1], -d[:, 0]], axis=1) / length[:, None]
        cent = (p0 + p1) / 2.0
        s = np.sign(((cent - centers[elem]) * nrm).sum(axis=1))
        return nrm * s[:, None], length, cent

    def build_faces(self):
        if self._face_dict is None:
            import types
            nq = self.quad.n_elements
            tri_shim = types.SimpleNamespace(_edge_geom=self._tri_edge_geom)
            self._face_dict = _faces_from_match(
                self._build_face_lists(),
                [(0, self.quad, nq), (nq, tri_shim, self.tri.n_elements)])
        return self._face_dict

    def connectivity(self, element_capacity: Optional[int] = None,
                     recon_geometry: bool = True) -> FaceConnectivity:
        return _connectivity_from_faces(self, element_capacity,
                                        recon_geometry)

    def cfl_h(self) -> float:
        from t8gpu_tpu.mesh.forest import cfl_h_from_faces
        return cfl_h_from_faces(self)


# ---------------------------------------------------------------------------
# Mesh adapters + managers
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CmeshForestMesh:
    """Adapter exposing any cmesh forest with the mesh interface the
    general-normal solvers expect (same shape as TriForestMesh)."""

    forest: object
    conn: FaceConnectivity
    centers: np.ndarray
    volumes: np.ndarray
    cfl_h: float

    @property
    def dim(self) -> int:
        return self.forest.dim

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    @property
    def max_level(self) -> int:
        return int(np.ceil(-np.log2(max(self.cfl_h, 1e-30))))

    @staticmethod
    def from_forest(forest, element_capacity: Optional[int] = None,
                    recon_geometry: bool = True) -> "CmeshForestMesh":
        return CmeshForestMesh(
            forest=forest,
            conn=forest.connectivity(element_capacity, recon_geometry),
            centers=forest.centers().astype(np.float32),
            volumes=forest.volumes().astype(np.float32),
            cfl_h=forest.cfl_h(),
        )


def quad_manager(roots: QuadRoots, level: int = 2, amr=None):
    """MeshManager over an adaptive quadtree forest of a USER quad cmesh
    (the reference's `MeshManager` over any `t8_cmesh_*`, main.cu:23)."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig

    return MeshManager(QuadForest.uniform(roots, level),
                       amr or AMRConfig(),
                       mesh_factory=CmeshForestMesh.from_forest)


def hybrid_manager(troots, qroots, level: int = 2, amr=None):
    """MeshManager over ONE mixed tri+quad forest (per-class refinement,
    cross-class 2:1 balance, general-normal fluxes)."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig

    return MeshManager(HybridForest.uniform(troots, qroots, level),
                       amr or AMRConfig(),
                       mesh_factory=CmeshForestMesh.from_forest)


# ---------------------------------------------------------------------------
# HexForest: adaptive octree over an arbitrary hex mesh (3D user cmesh)
# ---------------------------------------------------------------------------

def _face_id_vec(face_id: dict, nv: int, ids: np.ndarray) -> np.ndarray:
    """Vectorized face-id lookup (sorted corner 4-tuple -> id): packed
    searchsorted LUT when nv**4 fits int64, per-row dict fallback
    otherwise (same rationale as shell_forest.edge_id_vec).  The LUT is
    O(coarse faces) — rebuilt per call; missing keys raise KeyError
    like the dict lookup they replaced."""
    srt = np.sort(np.asarray(ids, np.int64), axis=1)
    if nv ** 4 >= 2 ** 62:
        return np.array([face_id[tuple(map(int, row))] for row in srt],
                        np.int64)
    keys = np.array(list(face_id.keys()), np.int64).reshape(-1, 4)
    vals = np.fromiter(face_id.values(), np.int64, len(face_id))
    packed = (((keys[:, 0] * nv + keys[:, 1]) * nv + keys[:, 2])
              * nv + keys[:, 3])
    order = np.argsort(packed)
    packed_sorted, vals_sorted = packed[order], vals[order]
    q = (((srt[:, 0] * nv + srt[:, 1]) * nv + srt[:, 2]) * nv + srt[:, 3])
    pos = np.minimum(np.searchsorted(packed_sorted, q),
                     len(packed_sorted) - 1)
    if not np.array_equal(packed_sorted[pos], q):
        bad = np.flatnonzero(packed_sorted[pos] != q)[0]
        raise KeyError(f"root face {tuple(map(int, srt[bad]))} not in the "
                       "face table (malformed coarse mesh)")
    return vals_sorted[pos]

# z-order corners: bit0 = x, bit1 = y, bit2 = z
_HEX_EDGES = tuple((a, a | (1 << ax)) for ax in range(3)
                   for a in range(8) if not (a >> ax) & 1)
# local faces: (axis, side); corners in z-order of the two varying axes
_HEX_FACES = tuple((ax, side) for ax in range(3) for side in (0, 1))


def _hex_face_corners(ax: int, side: int):
    """The 4 z-order corner ids of local face (ax, side): varying axes
    in increasing axis order."""
    axes = [a for a in range(3) if a != ax]
    out = []
    for b in range(4):
        c = side << ax
        c |= (b & 1) << axes[0]
        c |= ((b >> 1) & 1) << axes[1]
        out.append(c)
    return tuple(out)


_HEX_FACE_CORNERS = tuple(_hex_face_corners(ax, side)
                          for ax, side in _HEX_FACES)


@dataclasses.dataclass(frozen=True)
class HexRoots:
    """Arbitrary coarse hex mesh: shared vertices + z-order corner ids.
    Face identity = sorted corner quadruple (orientation-free — the
    canonical in-face frame below restores a shared parametrization)."""

    verts: np.ndarray    # [Nv, 3]
    hexes: np.ndarray    # [Nh, 8] vertex ids, z-order corners
    edge_id: dict        # sorted vertex pair -> edge index
    face_id: dict        # sorted corner 4-tuple -> face index
    # key-space shift applied to the quad-face-interior and root-interior
    # key blocks (NOT vertices/edges, which stay shared): Hybrid3DForest
    # reserves the tet face + interior blocks below (the 3D analogue of
    # QuadRoots.tri_blocks); standalone hex meshes leave it 0.
    key_shift: int = 0

    @property
    def n_roots(self) -> int:
        return len(self.hexes)


def hex_roots(verts, hexes) -> HexRoots:
    verts = np.asarray(verts, np.float64)
    hexes = np.asarray(hexes, np.int64)
    edges = hexes[:, list(sum(_HEX_EDGES, ()))].reshape(-1, 2)
    face_id: dict = {}
    for h in hexes:
        for fc in _HEX_FACE_CORNERS:
            key = tuple(sorted(int(h[c]) for c in fc))
            if key not in face_id:
                face_id[key] = len(face_id)
    return HexRoots(verts=verts, hexes=hexes,
                    edge_id=_edge_table([edges]), face_id=face_id)


def unit_cube_hex_roots(nx: int = 1, ny: int = 1, nz: int = 1) -> HexRoots:
    """nx x ny x nz structured hex grid of the unit cube."""
    xs = np.linspace(0.0, 1.0, nx + 1)
    ys = np.linspace(0.0, 1.0, ny + 1)
    zs = np.linspace(0.0, 1.0, nz + 1)
    verts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1
                     ).reshape(-1, 3)
    vid = np.arange((nx + 1) * (ny + 1) * (nz + 1)).reshape(
        nx + 1, ny + 1, nz + 1)
    hexes = np.stack([vid[:-1, :-1, :-1], vid[1:, :-1, :-1],
                      vid[:-1, 1:, :-1], vid[1:, 1:, :-1],
                      vid[:-1, :-1, 1:], vid[1:, :-1, 1:],
                      vid[:-1, 1:, 1:], vid[1:, 1:, 1:]],
                     axis=-1).reshape(-1, 8)
    return hex_roots(verts, hexes)


class HexForest:
    """Linearized adaptive octree forest over HexRoots (duck-type
    compatible with mesh/forest.Forest — the 3D user-cmesh analogue of
    QuadForest).  Cell faces may be non-planar (trilinear roots): each
    face is split into two triangles along the diagonal at its smallest
    corner KEY — both sides pick the same split, the face area vector is
    the exact triangulated one, and cell volumes come from the exact
    divergence-theorem sum, so uniform states are preserved to roundoff
    and geometry is consistent across faces."""

    dim = 3
    NCH = 8

    def __init__(self, roots: HexRoots, root: np.ndarray,
                 level: np.ndarray, path: np.ndarray):
        self.roots = roots
        self.root = np.asarray(root, np.int64)
        self.level = np.asarray(level, np.int8)
        self.path = np.asarray(path, np.int64)
        self._sort()
        self._geom = None
        self._faces = None
        self._face_dict = None

    @staticmethod
    def uniform(roots: HexRoots, level: int) -> "HexForest":
        assert level < LMAX
        per_root = 8 ** level
        R = roots.n_roots
        root = np.repeat(np.arange(R, dtype=np.int64), per_root)
        path = np.tile(np.arange(per_root, dtype=np.int64), R)
        return HexForest(roots, root,
                         np.full(R * per_root, level, np.int8), path)

    def _key(self) -> np.ndarray:
        lv = self.level.astype(np.int64)
        return (self.root << (3 * LMAX)) | (self.path << (3 * (LMAX - lv)))

    def _sort(self):
        key = self._key()
        order = np.argsort(key, kind="stable")
        if not np.array_equal(order, np.arange(len(order))):
            self.root = self.root[order]
            self.level = self.level[order]
            self.path = self.path[order]
            key = key[order]
        self.code = key

    @property
    def n_elements(self) -> int:
        return len(self.level)

    # -- families / adapt (8-ary) -------------------------------------------

    def family_heads(self) -> np.ndarray:
        n = self.n_elements
        heads = np.zeros(n, bool)
        if n < 8:
            return heads
        lv = self.level.astype(np.int64)
        same = np.ones(n - 7, bool)
        for k in range(1, 8):
            same &= (lv[k: n - 7 + k] == lv[: n - 7]) \
                & (self.root[k: n - 7 + k] == self.root[: n - 7]) \
                & ((self.path[k: n - 7 + k] >> 3) == (self.path[: n - 7] >> 3))
        heads[: n - 7] = (same & (lv[: n - 7] > 0)
                          & ((self.path[: n - 7] & 7) == 0))
        return heads

    def flags_from_criteria(self, criteria: np.ndarray, b: float,
                            min_level: int, max_level: int) -> np.ndarray:
        flags = np.zeros(self.n_elements, np.int8)
        flags[(criteria > b) & (self.level < max_level)] = 1
        h_idx = np.flatnonzero(self.family_heads())
        if len(h_idx):
            fam = h_idx[:, None] + np.arange(8)
            no_refine = (flags[fam] < 1).all(axis=1)
            ok = ((self.level[h_idx] > min_level) & no_refine
                  & (criteria[fam].mean(axis=1) < b))
            flags[fam[ok].ravel()] = -1
        return flags

    def adapt(self, flags: np.ndarray) -> Tuple["HexForest", RemapSpec]:
        flags = np.asarray(flags, np.int8).copy()
        n = self.n_elements

        coarsen_head = np.zeros(n, bool)
        is_coarsened = np.zeros(n, bool)
        h_idx = np.flatnonzero(self.family_heads())
        if len(h_idx):
            fam = h_idx[:, None] + np.arange(8)
            ok = (flags[fam] == -1).all(axis=1)
            coarsen_head[h_idx[ok]] = True
            is_coarsened[fam[ok].ravel()] = True
        flags[(flags == -1) & ~is_coarsened] = 0

        refine = flags == 1
        counts = np.ones(n, np.int64)
        counts[refine] = 8
        counts[is_coarsened & ~coarsen_head] = 0

        new_from_old = np.repeat(np.arange(n), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        child_rank = np.arange(len(new_from_old)) - starts[new_from_old]

        old_level = self.level.astype(np.int64)[new_from_old]
        old_path = self.path[new_from_old]
        ref = refine[new_from_old]
        coh = coarsen_head[new_from_old]

        new_level = old_level + ref - coh
        new_path = np.where(ref, old_path * 8 + child_rank,
                            np.where(coh, old_path >> 3, old_path))

        remap = RemapSpec(
            src_start=new_from_old.astype(np.int32),
            src_count=np.where(coh, 8, 1).astype(np.int32),
            child_id=np.where(ref, child_rank, 0).astype(np.int8),
            level_change=(ref.astype(np.int8) - coh.astype(np.int8)),
        )
        f = HexForest(self.roots, self.root[new_from_old],
                      new_level.astype(np.int8), new_path)
        return f, remap

    def balance_flags(self, flags: np.ndarray) -> np.ndarray:
        m = self._build_face_lists()
        pairs = (np.concatenate([m["eq_l"], m["hang_f"]]).astype(np.int64),
                 np.concatenate([m["eq_r"], m["hang_c"]]).astype(np.int64))
        return _ripple_balance(self.level, flags, pairs,
                               [(self.family_heads(), 8, 0)])

    # -- geometry (trilinear root map, triangulated faces) -------------------

    def _anchors(self):
        lv = self.level.astype(np.int64)
        sh = LMAX - lv
        ijk = morton_decode(self.path.astype(np.uint64), 3)
        return (ijk[:, 0] << sh, ijk[:, 1] << sh, ijk[:, 2] << sh,
                np.int64(1) << sh)

    def _map_points(self, iN, jN, kN, root) -> np.ndarray:
        c = self.roots.verts[self.roots.hexes[root]]       # [n, 8, 3]
        u = (iN / float(R_UNIT))[:, None]
        v = (jN / float(R_UNIT))[:, None]
        w = (kN / float(R_UNIT))[:, None]
        out = 0.0
        for b in range(8):
            bu = u if (b & 1) else (1 - u)
            bv = v if (b >> 1) & 1 else (1 - v)
            bw = w if (b >> 2) & 1 else (1 - w)
            out = out + bu * bv * bw * c[:, b]
        return out

    def _corner_coords(self):
        """Lattice coords of the 8 element corners [N, 8] each axis."""
        iN, jN, kN, S = self._anchors()
        ci = np.stack([iN + ((b & 1)) * S for b in range(8)], 1)
        cj = np.stack([jN + ((b >> 1) & 1) * S for b in range(8)], 1)
        ck = np.stack([kN + ((b >> 2) & 1) * S for b in range(8)], 1)
        return ci, cj, ck

    def _geometry(self):
        if self._geom is None:
            ci, cj, ck = self._corner_coords()
            n = self.n_elements
            corners = np.zeros((n, 8, 3))
            for b in range(8):
                corners[:, b] = self._map_points(ci[:, b], cj[:, b],
                                                 ck[:, b], self.root)
            ckeys = np.stack([self._vertex_keys(ci[:, b], cj[:, b],
                                                ck[:, b], self.root)
                              for b in range(8)], axis=1)   # [N, 8]
            # exact polyhedron volume/centroid over triangulated faces:
            # each face split along the diagonal at its smallest corner
            # key (the same split the neighbor picks, see _edge_geom);
            # per-triangle outward orientation from the corner-mean hint,
            # then V = sum x.A/3 and int x_k dV = sum A_k<(x_k)^2>/2
            # (divergence theorem on x_k^2 e_k / 2)
            hint = corners.mean(axis=1)                     # [N, 3]
            vol = np.zeros(n)
            cent = np.zeros((n, 3))
            for f_i, fc in enumerate(_HEX_FACE_CORNERS):
                k4 = ckeys[:, list(fc)]                     # [N, 4] z-order
                p = corners[:, list(fc)]                    # [N, 4, 3]
                quad = p[:, [0, 1, 3, 2]]                   # a simple cycle
                kq = k4[:, [0, 1, 3, 2]]
                # rotate so the smallest key is first -> consistent diagonal
                start = np.argmin(kq, axis=1)
                ar = np.arange(n)
                idx = (start[:, None] + np.arange(4)) % 4
                quad = quad[ar[:, None], idx]
                fcent = p.mean(axis=1)
                out = fcent - hint
                for tri in ((0, 1, 2), (0, 2, 3)):
                    a3, b3, c3 = (quad[:, tri[0]], quad[:, tri[1]],
                                  quad[:, tri[2]])
                    av = 0.5 * np.cross(b3 - a3, c3 - a3)
                    sgn = np.sign((av * out).sum(axis=1))[:, None]
                    av = av * sgn
                    centroid = (a3 + b3 + c3) / 3.0
                    vol += (centroid * av).sum(axis=1) / 3.0
                    cent += av * ((a3 + b3) ** 2 + (b3 + c3) ** 2
                                  + (c3 + a3) ** 2) / 24.0
            self._geom = (corners, ckeys, vol,
                          cent / np.maximum(vol, 1e-300)[:, None])
        return self._geom

    def volumes(self) -> np.ndarray:
        return self._geometry()[2]

    def centers(self) -> np.ndarray:
        return self._geometry()[3]

    # -- shared lattice keys -------------------------------------------------

    def _vertex_keys(self, iN, jN, kN, root) -> np.ndarray:
        """Canonical key of lattice point (iN, jN, kN) in `root` —
        globally shared on root corners/edges/faces (SURVEY-style exact
        connectivity; the t8code orientation machinery reduces to the
        canonical in-face frame below)."""
        roots = self.roots
        R = R_UNIT
        v = roots.hexes[root]                              # [n, 8]
        nv = len(roots.verts)
        ne = len(roots.edge_id)
        nf = len(roots.face_id)
        OFF_E = np.int64(nv)
        OFF_F = OFF_E + np.int64(ne) * (R - 1) + np.int64(roots.key_shift)
        OFF_I = OFF_F + np.int64(nf) * (R - 1) * (R - 1)

        on0 = [iN == 0, jN == 0, kN == 0]
        onR = [iN == R, jN == R, kN == R]
        onb = [o0 | oR for o0, oR in zip(on0, onR)]
        nb = on0[0] * 0
        for o in onb:
            nb = nb + o

        # interior default
        key = OFF_I + ((root * (R + 1) + iN) * (R + 1) + jN) * (R + 1) + kN

        coords = (iN, jN, kN)
        # corners (3 boundary axes)
        for b in range(8):
            sel = np.ones(len(iN), bool)
            for ax in range(3):
                sel &= onR[ax] if (b >> ax) & 1 else on0[ax]
            if sel.any():
                key[sel] = v[sel, b]

        # edges (2 boundary axes): param along the free axis
        for (a, b) in _HEX_EDGES:
            free_ax = int(np.log2(a ^ b))
            sel = np.ones(len(iN), bool)
            for ax in range(3):
                if ax == free_ax:
                    sel &= ~onb[ax]
                else:
                    sel &= onR[ax] if (a >> ax) & 1 else on0[ax]
            if sel.any():
                key[sel] = _edge_key_lookup(
                    roots.edge_id, v[sel, a], v[sel, b],
                    coords[free_ax][sel], nv)

        # faces (1 boundary axis): canonical in-face frame from global ids
        for f_i, (ax, side) in enumerate(_HEX_FACES):
            fc = _HEX_FACE_CORNERS[f_i]
            axes = [x for x in range(3) if x != ax]
            sel = (onR[ax] if side else on0[ax])
            sel &= ~onb[axes[0]] & ~onb[axes[1]]
            if not sel.any():
                continue
            ids = v[np.ix_(sel, list(fc))]                 # [m, 4] z-order
            s = coords[axes[0]][sel]
            t = coords[axes[1]][sel]
            key[sel] = self._face_interior_key(ids, s, t, OFF_F)
        return key

    def _face_interior_key(self, ids: np.ndarray, s: np.ndarray,
                           t: np.ndarray, OFF_F) -> np.ndarray:
        """Key of in-face lattice point (s, t) given the face's 4 corner
        global ids in local z-order [c00, c10, c01, c11].  Canonical
        frame: origin = smallest id; first axis toward its smaller-id
        in-face neighbor — both adjacent roots derive the identical
        (pa, pb) regardless of their local orientations."""
        roots = self.roots
        R = R_UNIT
        fid = _face_id_vec(roots.face_id, len(roots.verts), ids)
        # local coords of the 4 z-order corners
        corner_st = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.int64)
        org = np.argmin(ids, axis=1)                       # [m]
        o_s = corner_st[org, 0] * R
        o_t = corner_st[org, 1] * R
        # neighbors of each corner along local s / local t
        nb_s = np.array([1, 0, 3, 2])                      # flip s bit
        nb_t = np.array([2, 3, 0, 1])                      # flip t bit
        m = len(ids)
        arm = np.arange(m)
        id_s = ids[arm, nb_s[org]]
        id_t = ids[arm, nb_t[org]]
        # params measured FROM the origin corner along each local axis
        pa_s = np.abs(s - o_s)
        pa_t = np.abs(t - o_t)
        first_s = id_s < id_t
        pa = np.where(first_s, pa_s, pa_t)
        pb = np.where(first_s, pa_t, pa_s)
        return OFF_F + fid * (R - 1) * (R - 1) + (pa - 1) * (R - 1) + (pb - 1)

    # -- faces ---------------------------------------------------------------

    def _face_records(self, offset: int = 0):
        """Own + quarter face records keyed by the canonical DIAGONAL
        corner-key pair (the diagonal containing the smallest key): an
        axis-aligned lattice rectangle is determined by one diagonal, and
        both sides see the same shared corner keys, so equal faces match
        exactly and quarters identify hanging (2:1) faces.

        Every corner of every own face AND every quarter lies on the
        element's 3x3x3 half-step lattice, so the 27 key planes are
        computed once and all 30 rectangles assemble by indexing (the
        naive per-rectangle evaluation costs 120 _vertex_keys passes)."""
        n = self.n_elements
        iN, jN, kN, S = self._anchors()
        assert int(self.level.max(initial=0)) < LMAX
        ids_el = np.arange(n) + offset
        zero = np.zeros(n, np.int64)
        half = S >> 1

        K = np.empty((3, 3, 3, n), np.int64)
        for ix, dx in enumerate((zero, half, S)):
            for iy, dy in enumerate((zero, half, S)):
                for iz, dz in enumerate((zero, half, S)):
                    K[ix, iy, iz] = self._vertex_keys(
                        iN + dx, jN + dy, kN + dz, self.root)

        def rect_key(c00, c10, c01, c11):
            m1 = np.minimum(c00, c11)
            M1 = np.maximum(c00, c11)
            m2 = np.minimum(c10, c01)
            M2 = np.maximum(c10, c01)
            use1 = m1 < m2
            return np.where(use1, m1, m2), np.where(use1, M1, M2)

        own_rec, sub_rec = [], []
        for f_i, (ax, side) in enumerate(_HEX_FACES):
            axes = [x for x in range(3) if x != ax]

            def gp(u, v):
                idx = [0, 0, 0]
                idx[ax] = 2 * side
                idx[axes[0]] = u
                idx[axes[1]] = v
                return K[idx[0], idx[1], idx[2]]

            ka, kb = rect_key(gp(0, 0), gp(2, 0), gp(0, 2), gp(2, 2))
            own_rec.append((ka, kb, zero, zero, ids_el, f_i))
            for qa in range(2):
                for qb in range(2):
                    ka, kb = rect_key(gp(qa, qb), gp(qa + 1, qb),
                                      gp(qa, qb + 1), gp(qa + 1, qb + 1))
                    sub_rec.append((ka, kb, zero, zero, ids_el, f_i))
        return own_rec, sub_rec

    def _build_face_lists(self):
        if self._faces is None:
            own_rec, sub_rec = self._face_records()
            self._faces = _match_records(
                own_rec, sub_rec, allow_boundary=True,
                boundary_mask=lambda g: np.ones(len(g), bool))
        return self._faces

    def _edge_geom(self, elem: np.ndarray, side: np.ndarray):
        """(outward unit normal [n,3], |area vector| [n], center [n,3])
        of local face `side` of `elem` via the consistent-diagonal
        triangulation (see _geometry)."""
        corners, ckeys, _, centers = self._geometry()
        n = len(elem)
        av = np.zeros((n, 3))
        cent = np.zeros((n, 3))
        for f_i, fc in enumerate(_HEX_FACE_CORNERS):
            sel = side == f_i
            if not sel.any():
                continue
            e = elem[sel]
            p = corners[e][:, list(fc)]                    # [m, 4, 3]
            kq = ckeys[e][:, list(fc)]
            quad = p[:, [0, 1, 3, 2]]
            kqq = kq[:, [0, 1, 3, 2]]
            start = np.argmin(kqq, axis=1)
            arm = np.arange(len(e))
            idx = (start[:, None] + np.arange(4)) % 4
            quad = quad[arm[:, None], idx]
            a_sum = np.zeros((len(e), 3))
            for tri in ((0, 1, 2), (0, 2, 3)):
                a3, b3, c3 = (quad[:, tri[0]], quad[:, tri[1]],
                              quad[:, tri[2]])
                a_sum += 0.5 * np.cross(b3 - a3, c3 - a3)
            cm = p.mean(axis=1)
            s = np.sign(((cm - centers[e]) * a_sum).sum(axis=1))
            av[sel] = a_sum * s[:, None]
            cent[sel] = cm
        mag = np.linalg.norm(av, axis=1)
        return av / np.maximum(mag, 1e-300)[:, None], mag, cent

    def build_faces(self):
        if self._face_dict is None:
            self._face_dict = _faces_from_match_3d(
                self._build_face_lists(), self)
        return self._face_dict

    def connectivity(self, element_capacity: Optional[int] = None,
                     recon_geometry: bool = True) -> FaceConnectivity:
        return _connectivity_from_faces(self, element_capacity,
                                        recon_geometry)

    def cfl_h(self) -> float:
        from t8gpu_tpu.mesh.forest import cfl_h_from_faces
        return cfl_h_from_faces(self)


def _faces_from_match_3d(m: dict, forest) -> dict:
    """3D variant of _faces_from_match (normals/centers are [3, F]
    already)."""
    lefts, rights, normals, areas, f_cents = [], [], [], [], []
    b_elems, b_normals, b_areas, b_cents = [], [], [], []

    def emit(le, ri, side):
        nrm, area, cent = forest._edge_geom(le, side)
        lefts.append(le)
        rights.append(ri)
        normals.append(nrm.T)
        areas.append(area)
        f_cents.append(cent.T)

    if len(m["eq_l"]):
        emit(m["eq_l"], m["eq_r"], m["eq_side_l"])
    if len(m["hang_f"]):
        emit(m["hang_f"], m["hang_c"], m["hang_side_f"])
    if len(m["bnd_elem"]):
        el, side = m["bnd_elem"], m["bnd_side"]
        nrm, area, cent = forest._edge_geom(el, side)
        b_elems.append(el)
        b_normals.append(nrm.T)
        b_areas.append(area)
        b_cents.append(cent.T)

    has_b = bool(b_elems)
    return dict(
        left=np.concatenate(lefts).astype(np.int32),
        right=np.concatenate(rights).astype(np.int32),
        normal=np.concatenate(normals, axis=1).astype(np.float32),
        area=np.concatenate(areas).astype(np.float32),
        b_elem=(np.concatenate(b_elems).astype(np.int32) if has_b else None),
        b_normal=(np.concatenate(b_normals, axis=1).astype(np.float32)
                  if has_b else None),
        b_area=(np.concatenate(b_areas).astype(np.float32)
                if has_b else None),
        axis=None, sign=None, b_axis=None, b_sign=None,
        face_center=np.concatenate(f_cents, axis=1),
        b_face_center=(np.concatenate(b_cents, axis=1) if has_b else None),
    )


def hex_manager(roots: HexRoots, level: int = 1, amr=None):
    """MeshManager over an adaptive octree forest of a USER hex cmesh."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig

    return MeshManager(HexForest.uniform(roots, level),
                       amr or AMRConfig(),
                       mesh_factory=CmeshForestMesh.from_forest)


# ---------------------------------------------------------------------------
# Hybrid3DForest: tet + hex elements in ONE forest
# ---------------------------------------------------------------------------

def _tri_face_id_vec(face_id: dict, nv: int, ids: np.ndarray) -> np.ndarray:
    """Vectorized tri-face lookup (sorted corner triple -> id); packed
    searchsorted LUT when nv**3 fits int64 (same pattern as
    _face_id_vec)."""
    srt = np.sort(np.asarray(ids, np.int64), axis=1)
    if nv ** 3 >= 2 ** 62:
        return np.array([face_id[tuple(map(int, row))] for row in srt],
                        np.int64)
    keys = np.array(list(face_id.keys()), np.int64).reshape(-1, 3)
    vals = np.fromiter(face_id.values(), np.int64, len(face_id))
    packed = (keys[:, 0] * nv + keys[:, 1]) * nv + keys[:, 2]
    order = np.argsort(packed)
    ps, vs = packed[order], vals[order]
    q = (srt[:, 0] * nv + srt[:, 1]) * nv + srt[:, 2]
    pos = np.minimum(np.searchsorted(ps, q), len(ps) - 1)
    if not np.array_equal(ps[pos], q):
        bad = np.flatnonzero(ps[pos] != q)[0]
        raise KeyError(f"tri face {tuple(map(int, srt[bad]))} not in the "
                       "tet face table (non-conforming hybrid interface)")
    return vs[pos]


def hybrid3d_roots(verts, tets, hexes):
    """(TetRoots, HexRoots, iface_kind) over a SHARED vertex/edge key
    space — the 3D mixed-class construction (BASELINE config 4 names
    "tri/quad, tet/hex"; ref README.md:8 "any element class").

    A conforming tet|hex interface is a hex quad face triangulated by two
    tet faces along one of its diagonals; `iface_kind[hex_root, f]` says
    which (0 = z-order corner diagonal c00-c11, 1 = anti diagonal
    c10-c01, -1 = not a tet interface).  On interface faces the hex emits
    HALF-TRIANGLE records in the TET key space (sorted corner-key
    triples, tet-face barycentric interior keys), so cross-class faces —
    including their 2:1 hanging variants — match exactly like any other.
    The hex's own quad-face/interior key blocks are shifted past the tet
    blocks (HexRoots.key_shift)."""
    from t8gpu_tpu.mesh.tet import TetRoots, _root_tables

    verts = np.asarray(verts, np.float64)
    tets = np.asarray(tets, np.int64)
    hexes = np.asarray(hexes, np.int64)
    t_edges = np.concatenate([tets[:, [a, b]] for a in range(4)
                              for b in range(a + 1, 4)])
    h_edges = hexes[:, list(sum(_HEX_EDGES, ()))].reshape(-1, 2)
    edge_id = _edge_table([t_edges, h_edges])
    tet_face_id, _ = _root_tables(verts, tets)
    troots = TetRoots(verts=verts, tets=tets, face_id=tet_face_id,
                      edge_id=edge_id)

    R = R_UNIT
    # tet key span past OFF_F: face block + per-root interior blocks
    key_shift = (len(tet_face_id) * (R + 1) * (R + 1)
                 + len(tets) * (R + 1) ** 3)
    hex_face_id: dict = {}
    for h in hexes:
        for fc in _HEX_FACE_CORNERS:
            key = tuple(sorted(int(h[c]) for c in fc))
            if key not in hex_face_id:
                hex_face_id[key] = len(hex_face_id)
    hroots = HexRoots(verts=verts, hexes=hexes, edge_id=edge_id,
                      face_id=hex_face_id, key_shift=int(key_shift))

    iface_kind = np.full((len(hexes), 6), -1, np.int8)
    for r, h in enumerate(hexes):
        for f_i, fc in enumerate(_HEX_FACE_CORNERS):
            c00, c10, c01, c11 = (int(h[c]) for c in fc)
            main = (tuple(sorted((c00, c10, c11))) in tet_face_id
                    and tuple(sorted((c00, c01, c11))) in tet_face_id)
            anti = (tuple(sorted((c00, c10, c01))) in tet_face_id
                    and tuple(sorted((c10, c11, c01))) in tet_face_id)
            if main:
                iface_kind[r, f_i] = 0
            elif anti:
                iface_kind[r, f_i] = 1
    return troots, hroots, iface_kind


def unit_cube_hybrid3d_roots():
    """The 3D mixed-mesh miniature: unit cube, left half ([0, .5] in x)
    one hex root, right half six Kuhn tetrahedra — a genuinely mixed
    cmesh with a shared interior quad face triangulated by the tets."""
    import itertools

    xs = (0.0, 0.5, 1.0)
    verts = np.array([[x, y, z] for x in xs for y in (0.0, 1.0)
                      for z in (0.0, 1.0)], np.float64)

    def vid(ix, y, z):
        return 4 * ix + 2 * y + z

    # left hex, z-order corners (bit0 = x, bit1 = y, bit2 = z)
    hexes = np.array([[vid((b >> 0) & 1, (b >> 1) & 1, (b >> 2) & 1)
                       for b in range(8)]], np.int64)
    # right half: Kuhn split (six tets sharing the main diagonal)
    tets = []
    for perm in itertools.permutations(range(3)):
        p = np.zeros(3, np.int64)
        path = [vid(1 + p[0], p[1], p[2])]
        for axis in perm:
            p[axis] = 1
            path.append(vid(1 + p[0], p[1], p[2]))
        tets.append(path)
    return hybrid3d_roots(verts, np.asarray(tets, np.int64), hexes)


def _faces_from_match3d(m: dict, classes) -> dict:
    """3D counterpart of _faces_from_match: face-dict from matched
    records; `classes` is a list of (offset, forest_with_edge_geom,
    count); geometry comes from the emitting side."""
    def geom(elem, side):
        nrm = np.zeros((len(elem), 3))
        area = np.zeros(len(elem))
        cent = np.zeros((len(elem), 3))
        for off, fr, cnt in classes:
            sel = (elem >= off) & (elem < off + cnt)
            if sel.any():
                nrm[sel], area[sel], cent[sel] = fr._edge_geom(
                    elem[sel] - off, side[sel])
        return nrm, area, cent

    lefts, rights, normals, areas, f_cents = [], [], [], [], []
    b_elems, b_normals, b_areas, b_cents = [], [], [], []

    def emit(le, ri, side):
        nrm, area, cent = geom(le, side)
        lefts.append(le)
        rights.append(ri)
        normals.append(nrm.T)
        areas.append(area)
        f_cents.append(cent.T)

    if len(m["eq_l"]):
        emit(m["eq_l"], m["eq_r"], m["eq_side_l"])
    if len(m["hang_f"]):
        emit(m["hang_f"], m["hang_c"], m["hang_side_f"])
    if len(m["bnd_elem"]):
        el, side = m["bnd_elem"], m["bnd_side"]
        nrm, area, cent = geom(el, side)
        b_elems.append(el)
        b_normals.append(nrm.T)
        b_areas.append(area)
        b_cents.append(cent.T)

    has_b = bool(b_elems)
    return dict(
        left=np.concatenate(lefts).astype(np.int32),
        right=np.concatenate(rights).astype(np.int32),
        normal=np.concatenate(normals, axis=1).astype(np.float32),
        area=np.concatenate(areas).astype(np.float32),
        b_elem=(np.concatenate(b_elems).astype(np.int32) if has_b else None),
        b_normal=(np.concatenate(b_normals, axis=1).astype(np.float32)
                  if has_b else None),
        b_area=(np.concatenate(b_areas).astype(np.float32)
                if has_b else None),
        axis=None, sign=None, b_axis=None, b_sign=None,
        face_center=np.concatenate(f_cents, axis=1),
        b_face_center=(np.concatenate(b_cents, axis=1) if has_b else None),
    )


# half-triangle corner (s, t) offsets in face units of S, per diagonal
# kind and half: kind 0 splits along c00-c11 (s = t), kind 1 along
# c10-c01 (s + t = S)
_H3_HALF_UV = {
    (0, 0): ((0, 0), (1, 0), (1, 1)),
    (0, 1): ((0, 0), (0, 1), (1, 1)),
    (1, 0): ((0, 0), (1, 0), (0, 1)),
    (1, 1): ((1, 0), (1, 1), (0, 1)),
}
# the same triples as z-order indices into the face corner list
# [c00, c10, c01, c11]
_H3_HALF_CORNERS = {
    (0, 0): (0, 1, 3), (0, 1): (0, 2, 3),
    (1, 0): (0, 1, 2), (1, 1): (1, 3, 2),
}


class Hybrid3DForest:
    """Mixed-class adaptive forest: hex elements first, tet elements
    after, each block SFC-ordered; faces (including CROSS-CLASS hex-tet
    interface faces and their 2:1 hanging variants) found by one joint
    record match.  Interface quad faces of hexes are emitted as TWO
    half-triangle records in the tet key space, split along the diagonal
    the tet mesh triangulates them with (hybrid3d_roots detects it per
    coarse face); the tri lattice generated by Bey red refinement cuts
    every finer hex sub-face along the PARALLEL diagonal, so the split
    stays conforming at every level.  Duck-type compatible with
    mesh/forest.Forest for MeshManager and the general-normal solvers
    (the flux path is class-blind, ref kernels.cu:174-193)."""

    dim = 3

    # side codes: 0..5 = hex quad faces, 6..17 = (hex face f, half h)
    # interface half-triangles, tet sides 0..3 unchanged in its block

    def __init__(self, hex_f: HexForest, tet, iface_kind: np.ndarray):
        self.hex = hex_f
        self.tet = tet
        self.iface_kind = iface_kind
        self._face_dict = None
        self._faces = None

    @staticmethod
    def uniform(troots, hroots, iface_kind, level: int) -> "Hybrid3DForest":
        from t8gpu_tpu.mesh.tet import TetForest

        return Hybrid3DForest(HexForest.uniform(hroots, level),
                              TetForest.uniform(troots, level),
                              iface_kind)

    @property
    def n_elements(self) -> int:
        return self.hex.n_elements + self.tet.n_elements

    @property
    def level(self) -> np.ndarray:
        return np.concatenate([self.hex.level, self.tet.level])

    def element_class(self) -> np.ndarray:
        """Per-element class code: 0 = hex, 1 = tet."""
        return np.concatenate([
            np.zeros(self.hex.n_elements, np.int8),
            np.ones(self.tet.n_elements, np.int8)])

    def volumes(self) -> np.ndarray:
        return np.concatenate([self.hex.volumes(), self.tet.volumes()])

    def centers(self) -> np.ndarray:
        return np.concatenate([self.hex.centers(), self.tet.centers()])

    def family_heads(self) -> np.ndarray:
        return np.concatenate([self.hex.family_heads(),
                               self.tet.family_heads()])

    def flags_from_criteria(self, criteria, b, min_level, max_level):
        nh = self.hex.n_elements
        return np.concatenate([
            self.hex.flags_from_criteria(criteria[:nh], b, min_level,
                                         max_level),
            self.tet.flags_from_criteria(criteria[nh:], b, min_level,
                                         max_level)])

    def balance_flags(self, flags: np.ndarray) -> np.ndarray:
        m = self._build_face_lists()
        pairs = (np.concatenate([m["eq_l"], m["hang_f"]]).astype(np.int64),
                 np.concatenate([m["eq_r"], m["hang_c"]]).astype(np.int64))
        nh = self.hex.n_elements
        return _ripple_balance(
            self.level, flags, pairs,
            [(self.hex.family_heads(), 8, 0),
             (self.tet.family_heads(), 8, nh)])

    def adapt(self, flags: np.ndarray) -> Tuple["Hybrid3DForest", RemapSpec]:
        nh = self.hex.n_elements
        fh, rh = self.hex.adapt(flags[:nh])
        ft, rt = self.tet.adapt(flags[nh:])
        remap = RemapSpec(
            src_start=np.concatenate([rh.src_start,
                                      rt.src_start + nh]).astype(np.int32),
            src_count=np.concatenate([rh.src_count, rt.src_count]),
            child_id=np.concatenate([rh.child_id, rt.child_id]),
            level_change=np.concatenate([rh.level_change, rt.level_change]),
        )
        return Hybrid3DForest(fh, ft, self.iface_kind), remap

    # -- interface records (hex side, tet key space) -----------------------

    def _iface_point_keys(self, ids4: np.ndarray, kind: np.ndarray,
                          s: np.ndarray, t: np.ndarray) -> np.ndarray:
        """Tet-key-space key of in-face lattice point (s, t) on an
        interface quad face with z-order corner ids `ids4` [P, 4] and
        diagonal kind [P] — replicates TetForest._vertex_keys for points
        on the shared root face (corner / shared-edge / tet-face keys)."""
        troots = self.tet.roots
        roots_h = self.hex.roots
        R = R_UNIT
        nv = len(troots.verts)
        ne = len(troots.edge_id)
        OFF_F = np.int64(nv) + np.int64(ne) * (R - 1)
        c00, c10, c01, c11 = (ids4[:, k] for k in range(4))
        key = np.full(len(s), -1, np.int64)

        at = lambda su, tv: (s == su) & (t == tv)
        for mask, vid in ((at(0, 0), c00), (at(R, 0), c10),
                          (at(0, R), c01), (at(R, R), c11)):
            key[mask & (key < 0)] = vid[mask & (key < 0)]

        def edge(mask, u, w, par):
            mask = mask & (key < 0)
            if mask.any():
                key[mask] = _edge_key_lookup(troots.edge_id, u[mask],
                                             w[mask], par[mask], nv)

        edge((s == 0), c00, c01, t)                  # left
        edge((s == R), c10, c11, t)                  # right
        edge((t == 0), c00, c10, s)                  # bottom
        edge((t == R), c01, c11, s)                  # top
        edge((kind == 0) & (s == t), c00, c11, s)    # main diagonal
        edge((kind == 1) & (s + t == R), c10, c01, t)  # anti diagonal

        rest = key < 0
        if rest.any():
            # interior of one of the two tet faces: barycentric w.r.t.
            # that face's corners, listed in sorted-global-vertex-id
            # order (TetForest._vertex_keys convention)
            va = np.empty((rest.sum(), 3), np.int64)
            ba = np.empty((rest.sum(), 3), np.int64)
            kk, ss, tt = kind[rest], s[rest], t[rest]
            cc = ids4[rest]
            # kind 0: tri A (c00,c10,c11) where s>t; B (c00,c01,c11) s<t
            # kind 1: tri A (c00,c10,c01) where s+t<R; B (c10,c11,c01)
            selA0 = (kk == 0) & (ss > tt)
            selB0 = (kk == 0) & (ss < tt)
            selA1 = (kk == 1) & (ss + tt < R)
            selB1 = (kk == 1) & (ss + tt > R)
            for sel, cols, bary in (
                (selA0, (0, 1, 3), lambda s_, t_: (R - s_, s_ - t_, t_)),
                (selB0, (0, 2, 3), lambda s_, t_: (R - t_, t_ - s_, s_)),
                (selA1, (0, 1, 2), lambda s_, t_: (R - s_ - t_, s_, t_)),
                (selB1, (1, 3, 2), lambda s_, t_: (R - t_, s_ + t_ - R,
                                                   R - s_)),
            ):
                if not sel.any():
                    continue
                va[sel] = cc[sel][:, list(cols)]
                b0, b1, b2 = bary(ss[sel], tt[sel])
                ba[sel] = np.stack([b0, b1, b2], axis=1)
            order = np.argsort(va, axis=1)
            arm = np.arange(len(va))[:, None]
            va_s = va[arm, order]
            ba_s = ba[arm, order]
            fid = _tri_face_id_vec(troots.face_id, len(roots_h.verts), va_s)
            key[rest] = (OFF_F + (fid * (R + 1) + ba_s[:, 0]) * (R + 1)
                         + ba_s[:, 1])
        return key

    def _hex_records(self):
        """Hex face records: interface boundary faces as half-triangle
        own + quarter records in the tet key space; everything else as
        the stock rectangle records (HexForest._face_records) with the
        interface rows filtered out."""
        hx = self.hex
        n = hx.n_elements
        iN, jN, kN, S = hx._anchors()
        coords = (iN, jN, kN)
        v8 = hx.roots.hexes[hx.root]
        R = R_UNIT

        # per (element, face): on the root boundary AND interface?
        ifm = np.zeros((n, 6), bool)
        kind_ef = np.zeros((n, 6), np.int8)
        for f_i, (ax, side) in enumerate(_HEX_FACES):
            c = coords[ax]
            onb = (c + S == R) if side else (c == 0)
            kk = self.iface_kind[hx.root, f_i]
            ifm[:, f_i] = onb & (kk >= 0)
            kind_ef[:, f_i] = kk

        own_rec, sub_rec = hx._face_records()
        own_out = [tuple(col[~ifm[:, rec[5]]] for col in rec[:5])
                   + (rec[5],) for rec in own_rec]
        sub_out = []
        for q, rec in enumerate(sub_rec):
            f_i = rec[5]
            keep = ~ifm[:, f_i]
            sub_out.append(tuple(col[keep] for col in rec[:5]) + (f_i,))

        # interface half-triangle records
        zero_like = lambda a: np.zeros(len(a), np.int64)
        for f_i, (ax, side) in enumerate(_HEX_FACES):
            sel = np.flatnonzero(ifm[:, f_i])
            if not len(sel):
                continue
            axes = [x for x in range(3) if x != ax]
            fc = _HEX_FACE_CORNERS[f_i]
            ids4 = v8[sel][:, list(fc)]
            s0 = coords[axes[0]][sel]
            t0 = coords[axes[1]][sel]
            Sv = S[sel]
            kk = kind_ef[sel, f_i].astype(np.int64)
            ids_el = sel
            for half in (0, 1):
                # corner (s, t) per point, resolved per diagonal kind
                pts = []
                for ci in range(3):
                    u0_a, v0_a = _H3_HALF_UV[(0, half)][ci]
                    u1_a, v1_a = _H3_HALF_UV[(1, half)][ci]
                    su = np.where(kk == 0, s0 + u0_a * Sv, s0 + u1_a * Sv)
                    tv = np.where(kk == 0, t0 + v0_a * Sv, t0 + v1_a * Sv)
                    pts.append((su, tv))
                ks = [self._iface_point_keys(ids4, kk, su, tv)
                      for su, tv in pts]
                tri = np.sort(np.stack(ks, axis=1), axis=1)
                side_code = 6 + 2 * f_i + half
                own_rec_h = (tri[:, 0], tri[:, 1], tri[:, 2],
                             zero_like(sel), ids_el, side_code)
                own_out.append(own_rec_h)
                # quarters: corners + edge midpoints
                mids = []
                for (a, b) in ((0, 1), (1, 2), (2, 0)):
                    ms = (pts[a][0] + pts[b][0]) >> 1
                    mt = (pts[a][1] + pts[b][1]) >> 1
                    mids.append(self._iface_point_keys(ids4, kk, ms, mt))
                kA, kB, kC = ks
                mAB, mBC, mCA = mids
                for qa, qb, qc in ((kA, mAB, mCA), (mAB, kB, mBC),
                                  (mCA, mBC, kC), (mAB, mBC, mCA)):
                    qs = np.sort(np.stack([qa, qb, qc], axis=1), axis=1)
                    sub_out.append((qs[:, 0], qs[:, 1], qs[:, 2],
                                    zero_like(sel), ids_el, side_code))
        return own_out, sub_out

    def _build_face_lists(self):
        if self._faces is None:
            nh = self.hex.n_elements
            own_h, sub_h = self._hex_records()
            own_t, sub_t = self.tet._face_records(offset=nh)
            self._faces = _match_records(
                own_h + own_t, sub_h + sub_t, allow_boundary=True,
                boundary_mask=lambda g: np.ones(len(g), bool))
        return self._faces

    def _hex_edge_geom(self, elem, side):
        """Hex-side geometry shim: quad faces (side 0..5) delegate to
        HexForest._edge_geom; interface half-triangles (side >= 6) are
        planar triangles between the mapped face corners — the SAME flat
        triangles the tet side sees, so the interface is geometrically
        conforming even on non-planar hex faces."""
        nrm = np.zeros((len(elem), 3))
        area = np.zeros(len(elem))
        cent = np.zeros((len(elem), 3))
        quad = side < 6
        if quad.any():
            nrm[quad], area[quad], cent[quad] = self.hex._edge_geom(
                elem[quad], side[quad])
        rest = np.flatnonzero(~quad)
        if len(rest):
            corners = self.hex._geometry()[0]
            centers = self.hex._geometry()[3]
            e = elem[rest]
            f_i = (side[rest] - 6) // 2
            half = (side[rest] - 6) % 2
            kk = self.iface_kind[self.hex.root[e], f_i].astype(np.int64)
            p = np.zeros((len(e), 3, 3))
            for fv in range(6):
                selF = f_i == fv
                if not selF.any():
                    continue
                fc = np.array(_HEX_FACE_CORNERS[fv])
                p4 = corners[e[selF]][:, fc]           # [m, 4, 3] z-order
                for kv in (0, 1):
                    for hv in (0, 1):
                        ss = selF & (kk == kv) & (half == hv)
                        if not ss.any():
                            continue
                        idx = list(_H3_HALF_CORNERS[(kv, hv)])
                        p[ss] = corners[e[ss]][:, fc[idx]]
            nvec = 0.5 * np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
            ce = p.mean(axis=1)
            sg = np.sign(((ce - centers[e]) * nvec).sum(axis=1))
            nvec = nvec * sg[:, None]
            ar = np.linalg.norm(nvec, axis=1)
            nrm[rest] = nvec / ar[:, None]
            area[rest] = ar
            cent[rest] = ce
        return nrm, area, cent

    def build_faces(self):
        if self._face_dict is None:
            import types
            nh = self.hex.n_elements
            hex_shim = types.SimpleNamespace(_edge_geom=self._hex_edge_geom)
            self._face_dict = _faces_from_match3d(
                self._build_face_lists(),
                [(0, hex_shim, nh), (nh, self.tet, self.tet.n_elements)])
        return self._face_dict

    def connectivity(self, element_capacity: Optional[int] = None,
                     recon_geometry: bool = True) -> FaceConnectivity:
        return _connectivity_from_faces(self, element_capacity,
                                        recon_geometry)

    def cfl_h(self) -> float:
        from t8gpu_tpu.mesh.forest import cfl_h_from_faces
        return cfl_h_from_faces(self)


def hybrid3d_manager(troots, hroots, iface_kind, level: int = 1, amr=None):
    """MeshManager over ONE mixed tet+hex forest (cross-class 2:1
    balance, volume-weighted remap — the 3D mixed-element configuration
    BASELINE config 4 names)."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig

    return MeshManager(
        Hybrid3DForest.uniform(troots, hroots, iface_kind, level),
        amr or AMRConfig(),
        mesh_factory=CmeshForestMesh.from_forest)
