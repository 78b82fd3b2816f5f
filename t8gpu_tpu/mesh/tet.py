"""Adaptive 3D tetrahedral forest (general element classes, volumetric).

Completes the reference's any-element-class coverage (ref README.md:8:
quads, hexes, prisms, triangles — and tets via t8code's tet scheme):
a linearized 8-ary forest of TETRAHEDRA over an arbitrary root tet mesh
(unit-cube Kuhn split by default) using Bey's red refinement — each tet
splits into 4 corner tets + 4 inner tets around the m02-m13 diagonal,
all of volume V/8, tiling the parent EXACTLY with planar faces whose
children subdivide the parent faces by midpoint 1->4.  Consequently the
usual safety net holds by construction: adapt conserves volume, each
element's outward face-area vectors close to zero (free-stream), and
hanging faces are exact quarter-triangles.

Representation: each leaf stores its 4 vertices as exact integer
barycentric coordinates (summing to 2^LMAX) in its ROOT tet's frame;
midpoints stay integral at every admissible level.  Face topology —
including across root tets and 2:1 hanging faces — is resolved by the
same exact-integer key matching as the shell/tri forests
(PrismForest._match_records): a face's key is its sorted vertex-key
triple, with vertices on shared root faces/edges canonicalized through
the root mesh's global face/edge/vertex tables so coincident faces of
different roots collide exactly.

Drives the plain general-normal solver through MeshManager like the
prism shell and triangle forests (volume-weighted restriction; Bey
children are equal-volume so the weights are uniform here).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from t8gpu_tpu.mesh.connectivity import FaceConnectivity, build_connectivity
from t8gpu_tpu.mesh.forest import RemapSpec
from t8gpu_tpu.mesh.shell_forest import PrismForest

LMAX = 12
_match_records = PrismForest._match_records


@dataclasses.dataclass(frozen=True)
class TetRoots:
    """Root tet mesh: shared vertices + tets, plus canonical face/edge ids."""

    verts: np.ndarray    # [Nv, 3]
    tets: np.ndarray     # [Nt, 4] vertex ids
    face_id: dict        # sorted vertex triple -> root-face index
    edge_id: dict        # sorted vertex pair  -> root-edge index

    @property
    def n_roots(self) -> int:
        return len(self.tets)


def _root_tables(verts, tets):
    face_id, edge_id = {}, {}
    for t in tets:
        for f in range(4):
            tri = tuple(sorted(np.delete(t, f)))
            if tri not in face_id:
                face_id[tri] = len(face_id)
        for a in range(4):
            for b in range(a + 1, 4):
                e = (min(t[a], t[b]), max(t[a], t[b]))
                if e not in edge_id:
                    edge_id[e] = len(edge_id)
    return face_id, edge_id


def unit_cube_roots() -> TetRoots:
    """The unit cube split into 6 Kuhn tetrahedra (reflective walls)."""
    corners = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                        for z in (0, 1)], np.float64)

    def cid(x, y, z):
        return 4 * x + 2 * y + z

    import itertools

    tets = []
    for perm in itertools.permutations(range(3)):
        p = np.zeros(3, np.int64)
        path = [cid(*p)]
        for axis in perm:
            p[axis] = 1
            path.append(cid(*p))
        tets.append(path)
    tets = np.asarray(tets, np.int64)
    face_id, edge_id = _root_tables(corners, tets)
    return TetRoots(verts=corners, tets=tets, face_id=face_id,
                    edge_id=edge_id)


# Bey red refinement: children as index lists into the 10 lattice points
# [v0, v1, v2, v3, m01, m02, m03, m12, m13, m23] (m02-m13 inner diagonal).
_BEY = np.array([
    [0, 4, 5, 6],    # corner v0
    [4, 1, 7, 8],    # corner v1
    [5, 7, 2, 9],    # corner v2
    [6, 8, 9, 3],    # corner v3
    [4, 5, 6, 8],    # inner
    [4, 5, 7, 8],
    [5, 6, 8, 9],
    [5, 7, 8, 9],
], np.int64)


def _children_verts(verts: np.ndarray) -> np.ndarray:
    """verts [K, 4, 4] int barycentric -> children [K, 8, 4, 4]."""
    v = verts
    m = lambda a, b: (v[:, a] + v[:, b]) >> 1
    pts = np.stack([v[:, 0], v[:, 1], v[:, 2], v[:, 3],
                    m(0, 1), m(0, 2), m(0, 3), m(1, 2), m(1, 3), m(2, 3)],
                   axis=1)                                # [K, 10, 4]
    return pts[:, _BEY]                                   # [K, 8, 4, 4]


class TetForest:
    """Linearized adaptive 8-ary tet forest over TetRoots (duck-type
    compatible with mesh/forest.Forest for MeshManager/solvers)."""

    dim = 3

    def __init__(self, roots: TetRoots, root: np.ndarray, level: np.ndarray,
                 path: np.ndarray, verts: np.ndarray):
        self.roots = roots
        self.root = np.asarray(root, np.int64)
        self.level = np.asarray(level, np.int8)
        self.path = np.asarray(path, np.int64)
        self.verts = np.asarray(verts, np.int64)   # [N, 4, 4] sum = 2^LMAX
        self._sort()
        self._geom = None
        self._faces = None
        self._face_dict = None

    @staticmethod
    def uniform(roots: TetRoots, level: int) -> "TetForest":
        assert level < LMAX
        R = np.int64(1) << LMAX
        n0 = roots.n_roots
        base = np.zeros((n0, 4, 4), np.int64)
        for c in range(4):
            base[:, c, c] = R
        root = np.arange(n0, dtype=np.int64)
        path = np.zeros(n0, np.int64)
        verts = base
        for _ in range(level):
            ch = _children_verts(verts)                  # [K, 8, 4, 4]
            K = len(verts)
            verts = ch.reshape(K * 8, 4, 4)
            root = np.repeat(root, 8)
            path = (np.repeat(path, 8) << 3) | np.tile(np.arange(8), K)
        return TetForest(roots, root, np.full(len(root), level, np.int8),
                        path, verts)

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
            self.verts = self.verts[order]
            key = key[order]
        self.code = key

    @property
    def n_elements(self) -> int:
        return len(self.level)

    # -- families / adapt ------------------------------------------------------

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

    def adapt(self, flags: np.ndarray) -> Tuple["TetForest", RemapSpec]:
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

        new_level = (old_level + ref - coh).astype(np.int8)
        new_path = np.where(ref, old_path * 8 + child_rank,
                            np.where(coh, old_path >> 3, old_path))

        # vertices: children from Bey formulas; coarsen head reconstructs
        # its parent from corner child 0 (v0, m01, m02, m03)
        new_verts = self.verts[new_from_old].copy()
        r_idx = np.flatnonzero(ref)
        if len(r_idx):
            ch = _children_verts(self.verts[new_from_old[r_idx]])
            new_verts[r_idx] = ch[np.arange(len(r_idx)), child_rank[r_idx]]
        c_idx = np.flatnonzero(coh)
        if len(c_idx):
            c0 = self.verts[new_from_old[c_idx]]          # child 0
            v0 = c0[:, 0]
            parent = np.stack([v0,
                               2 * c0[:, 1] - v0,
                               2 * c0[:, 2] - v0,
                               2 * c0[:, 3] - v0], axis=1)
            new_verts[c_idx] = parent

        remap = RemapSpec(
            src_start=new_from_old.astype(np.int32),
            src_count=np.where(coh, 8, 1).astype(np.int32),
            child_id=np.where(ref, child_rank, 0).astype(np.int8),
            level_change=(ref.astype(np.int8) - coh.astype(np.int8)),
        )
        f = TetForest(self.roots, self.root[new_from_old], new_level,
                     new_path, new_verts)
        return f, remap

    def balance_flags(self, flags: np.ndarray) -> np.ndarray:
        flags = np.asarray(flags, np.int8).copy()
        h_idx = np.flatnonzero(self.family_heads())
        fam = (h_idx[:, None] + np.arange(8)) if len(h_idx) else None
        keep = np.zeros(self.n_elements, bool)
        if fam is not None:
            full = (flags[fam] == -1).all(axis=1)
            keep[fam[full].ravel()] = True
        flags[(flags == -1) & ~keep] = 0

        m = self._build_face_lists()
        a = np.concatenate([m["eq_l"], m["hang_f"]]).astype(np.int64)
        b = np.concatenate([m["eq_r"], m["hang_c"]]).astype(np.int64)
        lv = self.level.astype(np.int64)
        for _ in range(64):
            t = lv + flags
            viol = np.zeros(self.n_elements, bool)
            viol[a[t[b] > t[a] + 1]] = True
            viol[b[t[a] > t[b] + 1]] = True
            if not viol.any():
                break
            cancel = viol & (flags == -1)
            if cancel.any() and fam is not None:
                bad = cancel[fam].any(axis=1)
                members = fam[bad].ravel()
                mem_flags = flags[members]
                flags[members[mem_flags == -1]] = 0
                continue
            flags[viol & (flags == 0)] = 1
        return flags

    # -- geometry ---------------------------------------------------------------

    def _positions(self, bary: np.ndarray) -> np.ndarray:
        """Barycentric int coords [..., 4] (in own root) -> xyz [..., 3]."""
        R = float(1 << LMAX)
        V = self.roots.verts[self.roots.tets[self.root]]  # [N, 4, 3]
        w = bary.astype(np.float64) / R                   # [N, ..., 4]
        return np.einsum("n...c,ncx->n...x", w, V)

    def _geometry(self):
        if self._geom is not None:
            return self._geom
        X = self._positions(self.verts)                   # [N, 4, 3]
        e1 = X[:, 1] - X[:, 0]
        e2 = X[:, 2] - X[:, 0]
        e3 = X[:, 3] - X[:, 0]
        vol = np.abs(np.einsum("ni,ni->n", np.cross(e1, e2), e3)) / 6.0
        centers = X.mean(axis=1)
        self._geom = (X, vol, centers)
        return self._geom

    def volumes(self) -> np.ndarray:
        return self._geometry()[1]

    def centers(self) -> np.ndarray:
        return self._geometry()[2]

    # -- face enumeration (exact integer vertex-triple keys) ---------------------

    def _vertex_keys(self, bary: np.ndarray) -> np.ndarray:
        """Canonical global keys of lattice points bary [N, K, 4] (own-root
        barycentric): root vertices / edges / faces canonicalize through
        the shared root tables; interior points get root-local keys."""
        roots = self.roots
        R = np.int64(1) << LMAX
        N, K = bary.shape[:2]
        v4 = roots.tets[self.root]                        # [N, 4]
        v4b = np.broadcast_to(v4[:, None, :], (N, K, 4))
        flat_b = bary.reshape(-1, 4)
        flat_v = v4b.reshape(-1, 4)

        nz = flat_b > 0
        n_nz = nz.sum(axis=1)
        nv = len(roots.verts)
        ne = len(roots.edge_id)
        nf = len(roots.face_id)
        OFF_E = np.int64(nv)
        OFF_F = OFF_E + ne * (R - 1)
        OFF_I = OFF_F + nf * (R + 1) * (R + 1)

        key = np.zeros(len(flat_b), np.int64)

        # interior: root-local key from the first three barycentric coords
        interior = n_nz == 4
        if interior.any():
            b = flat_b[interior]
            r = np.repeat(self.root, K)[interior]
            key[interior] = (OFF_I
                            + ((r * (R + 1) + b[:, 0]) * (R + 1) + b[:, 1])
                            * (R + 1) + b[:, 2])

        # root vertex
        one = n_nz == 1
        if one.any():
            idx = nz[one].argmax(axis=1)
            key[one] = flat_v[one, idx]

        # on a root edge: parametrize from the smaller global vertex id
        two = n_nz == 2
        if two.any():
            rows = np.flatnonzero(two)
            ids = np.zeros((len(rows), 2), np.int64)
            ts = np.zeros(len(rows), np.int64)
            for i, rr in enumerate(rows):
                c = np.flatnonzero(nz[rr])
                u, w = flat_v[rr, c[0]], flat_v[rr, c[1]]
                lo, hi = (u, w) if u < w else (w, u)
                # canonical param measured from the smaller global id =
                # the barycentric coordinate of the OTHER vertex
                t = flat_b[rr, c[1]] if u < w else flat_b[rr, c[0]]
                eid = roots.edge_id[(int(lo), int(hi))]
                ids[i] = (lo, hi)
                ts[i] = eid * (R - 1) + (t - 1)
            key[rows] = OFF_E + ts

        # on a root face: coords listed in sorted-global-vertex-id order
        three = n_nz == 3
        if three.any():
            rows = np.flatnonzero(three)
            for rr in rows:
                c = np.flatnonzero(nz[rr])
                trip = [(int(flat_v[rr, ci]), int(flat_b[rr, ci]))
                        for ci in c]
                trip.sort()
                fid = roots.face_id[tuple(t[0] for t in trip)]
                key[rr] = (OFF_F + (fid * (R + 1) + trip[0][1]) * (R + 1)
                           + trip[1][1])
        return key.reshape(N, K)

    def _build_face_lists(self):
        if self._faces is None:
            self._faces = self._build_face_lists_impl()
        return self._faces

    def _face_records(self, offset: int = 0):
        """Own + quarter tri-face records (sorted corner-key triples) for
        the exact matcher; `offset` shifts element ids for joint
        mixed-class matching (Hybrid3DForest in mesh/cmesh.py emits hex
        half-triangle records in the same key space)."""
        n = self.n_elements
        assert int(self.level.max(initial=0)) < LMAX, (
            "forest refined to LMAX: face-quarter midpoints need one "
            "spare level")
        vk = self._vertex_keys(self.verts)                # [N, 4]
        # midpoint keys for the face quarters
        mids = np.stack([(self.verts[:, a] + self.verts[:, b]) >> 1
                         for a, b in ((0, 1), (0, 2), (0, 3),
                                      (1, 2), (1, 3), (2, 3))], axis=1)
        mk = self._vertex_keys(mids)                      # [N, 6] keys of m_ab
        midx = {(0, 1): 0, (0, 2): 1, (0, 3): 2, (1, 2): 3, (1, 3): 4,
                (2, 3): 5}

        zero = np.zeros(n, np.int64)
        ids = np.arange(n) + offset
        own_rec, sub_rec = [], []
        for f in range(4):
            tri = [c for c in range(4) if c != f]
            ks = np.sort(np.stack([vk[:, c] for c in tri], axis=1), axis=1)
            own_rec.append((ks[:, 0], ks[:, 1], ks[:, 2], zero, ids, f))
            a, b, c = tri
            mab = mk[:, midx[(min(a, b), max(a, b))]]
            mbc = mk[:, midx[(min(b, c), max(b, c))]]
            mca = mk[:, midx[(min(c, a), max(c, a))]]
            quarters = [(vk[:, a], mab, mca), (mab, vk[:, b], mbc),
                        (mca, mbc, vk[:, c]), (mab, mbc, mca)]
            for qa, qb, qc in quarters:
                qs = np.sort(np.stack([qa, qb, qc], axis=1), axis=1)
                sub_rec.append((qs[:, 0], qs[:, 1], qs[:, 2], zero, ids, f))
        return own_rec, sub_rec

    def _build_face_lists_impl(self):
        own_rec, sub_rec = self._face_records()
        return _match_records(own_rec, sub_rec, allow_boundary=True,
                              boundary_mask=lambda g: np.ones(len(g), bool))

    def _edge_geom(self, elem: np.ndarray, side: np.ndarray):
        """(outward unit normal [n, 3], area [n], center [n, 3]) of local
        face `side` of `elem` — the shared mixed-class geometry hook
        (cmesh._faces_from_match3d)."""
        X, _, centers = self._geometry()
        tris = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]])
        idx = tris[side]
        ar = np.arange(len(elem))[:, None]
        p = X[elem][ar, idx]
        nvec = 0.5 * np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        cent = p.mean(axis=1)
        s = np.sign(((cent - centers[elem]) * nvec).sum(axis=1))
        nvec = nvec * s[:, None]
        area = np.linalg.norm(nvec, axis=1)
        return nvec / area[:, None], area, cent

    def build_faces(self):
        if self._face_dict is None:
            self._face_dict = self._build_faces_impl()
        return self._face_dict

    def _build_faces_impl(self):
        """Flat face arrays (general normals; unmatched faces = reflective
        domain boundary).  Hanging faces emitted by the finer side."""
        X, vols, centers = self._geometry()
        m = self._build_face_lists()

        def face_geom(elem, side):
            tris = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]])
            idx = tris[side]                              # [K, 3]
            ar = np.arange(len(elem))[:, None]
            p = X[elem][ar, idx]                          # [K, 3, 3]
            nvec = 0.5 * np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
            cent = p.mean(axis=1)
            return nvec, cent

        lefts, rights, normals, areas = [], [], [], []
        b_elems, b_normals, b_areas = [], [], []
        f_cents, b_cents = [], []

        def orient(el, nvec, cent):
            s = np.sign(((cent - centers[el]) * nvec).sum(axis=1))
            return nvec * s[:, None]

        def emit(le, ri, side):
            nvec, cent = face_geom(le, side)
            nvec = orient(le, nvec, cent)
            area = np.linalg.norm(nvec, axis=1)
            lefts.append(le)
            rights.append(ri)
            normals.append((nvec / area[:, None]).T)
            areas.append(area)
            f_cents.append(cent.T)

        if len(m["eq_l"]):
            emit(m["eq_l"], m["eq_r"], m["eq_side_l"])
        if len(m["hang_f"]):
            emit(m["hang_f"], m["hang_c"], m["hang_side_f"])
        if len(m["bnd_elem"]):
            el, side = m["bnd_elem"], m["bnd_side"]
            nvec, cent = face_geom(el, side)
            nvec = orient(el, nvec, cent)
            area = np.linalg.norm(nvec, axis=1)
            b_elems.append(el)
            b_normals.append((nvec / area[:, None]).T)
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
            b_face_center=(np.concatenate(b_cents, axis=1)
                           if has_b else None),
        )

    def connectivity(self, element_capacity: Optional[int] = None,
                     recon_geometry: bool = True) -> FaceConnectivity:
        f = self.build_faces()
        return build_connectivity(
            left=f["left"], right=f["right"], normal=f["normal"],
            area=f["area"], n_elements=self.n_elements,
            b_elem=f["b_elem"], b_normal=f["b_normal"], b_area=f["b_area"],
            element_capacity=element_capacity,
            face_center=f["face_center"] if recon_geometry else None,
            b_face_center=f["b_face_center"] if recon_geometry else None,
            centers=self.centers() if recon_geometry else None,
        )

    def cfl_h(self) -> float:
        from t8gpu_tpu.mesh.forest import cfl_h_from_faces
        return cfl_h_from_faces(self)


@dataclasses.dataclass
class TetForestMesh:
    """Adapter exposing a TetForest with the mesh interface solvers expect."""

    forest: TetForest
    conn: FaceConnectivity
    centers: np.ndarray
    volumes: np.ndarray
    cfl_h: float

    dim = 3

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    @property
    def max_level(self) -> int:
        return int(np.ceil(-np.log2(max(self.cfl_h, 1e-30))))

    @staticmethod
    def from_forest(forest: TetForest,
                    element_capacity: Optional[int] = None,
                    recon_geometry: bool = True) -> "TetForestMesh":
        return TetForestMesh(
            forest=forest,
            conn=forest.connectivity(element_capacity, recon_geometry),
            centers=forest.centers().astype(np.float32),
            volumes=forest.volumes().astype(np.float32),
            cfl_h=forest.cfl_h(),
        )


def tet_manager(level: int = 2, amr=None, roots: Optional[TetRoots] = None):
    """MeshManager over an adaptive tet mesh of the unit cube."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig

    forest = TetForest.uniform(roots or unit_cube_roots(), level)
    return MeshManager(forest, amr or AMRConfig(),
                       mesh_factory=TetForestMesh.from_forest)
