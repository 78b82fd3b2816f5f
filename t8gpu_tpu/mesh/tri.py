"""Adaptive 2D triangle forest (general element classes, planar).

The reference handles ANY t8code element class through its
general-normal flux path (ref README.md:8; kernels.cu:174-193 builds the
face basis from arbitrary normals).  mesh/forest.py covers quads/hexes
and mesh/shell_forest.py prisms; this module adds planar TRIANGLES: a
linearized 4-ary forest over an arbitrary root triangulation with
criteria-driven refine/coarsen and 2:1 balance, driving the plain-element
solver through the same general-normal connectivity.

Machinery is shared with the shell prism forest (mesh/shell_forest.py):
the triangular-lattice child/parent transforms (up/down midpoint
subdivision) and the exact-integer face-key matching (fine faces match
coarse face HALVES; endpoints on root-triangle borders canonicalize
through shared root vertex/edge ids, so cross-root faces match without
any orientation algebra).  Geometry is linear within each root triangle,
so children tile parents exactly, all 4 children have EQUAL area, and
hanging half-edges are exact halves — conservation and free-stream
preservation hold by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from t8gpu_tpu.mesh.connectivity import FaceConnectivity, build_connectivity
from t8gpu_tpu.mesh.forest import RemapSpec
from t8gpu_tpu.mesh.shell_forest import LMAX, PrismForest, _child_step

_match_records = PrismForest._match_records


def _decode_tri_paths(path: np.ndarray, level: np.ndarray):
    """Vectorized 2-bit path -> (i, j, orient) at each element's level."""
    n = len(path)
    i = np.zeros(n, np.int64)
    j = np.zeros(n, np.int64)
    orient = np.zeros(n, np.int8)
    max_l = int(level.max()) if n else 0
    for s in range(1, max_l + 1):
        act = level >= s
        c = ((path >> (2 * (level.astype(np.int64) - s))) & 3).astype(np.int64)
        ni, nj, no = _child_step(i, j, orient, c)
        i = np.where(act, ni, i)
        j = np.where(act, nj, j)
        orient = np.where(act, no, orient).astype(np.int8)
    return i, j, orient


@dataclasses.dataclass(frozen=True)
class TriRoots:
    """Root triangulation: shared vertices + triangles (any planar mesh)."""

    verts: np.ndarray    # [Nv, 2]
    tris: np.ndarray     # [Nt, 3] vertex ids (consistent winding)
    edge_id: dict        # sorted vertex pair -> root-edge index

    @property
    def n_roots(self) -> int:
        return len(self.tris)


def unit_square_roots() -> TriRoots:
    """The unit square split into 2 root triangles (reflective walls)."""
    verts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    edge_id = {}
    for a, b, c in tris:
        for u, w in ((a, b), (b, c), (c, a)):
            key = (min(u, w), max(u, w))
            if key not in edge_id:
                edge_id[key] = len(edge_id)
    return TriRoots(verts=verts, tris=tris, edge_id=edge_id)


class TriForest:
    """Linearized adaptive 4-ary triangle forest over TriRoots.

    Duck-type compatible with mesh/forest.Forest for MeshManager/solvers:
    flags_from_criteria, balance_flags, adapt, build_faces, connectivity,
    volumes (areas), centers, level, n_elements, dim."""

    dim = 2

    def __init__(self, roots: TriRoots, root: np.ndarray, level: np.ndarray,
                 path: np.ndarray):
        self.roots = roots
        self.root = np.asarray(root, np.int64)
        self.level = np.asarray(level, np.int8)
        self.path = np.asarray(path, np.int64)
        self._sort()
        self._geom = None
        self._faces = None
        self._face_dict = None

    @staticmethod
    def uniform(roots: TriRoots, level: int) -> "TriForest":
        assert level < LMAX
        per_root = 4 ** level
        R = roots.n_roots
        root = np.repeat(np.arange(R, dtype=np.int64), per_root)
        path = np.tile(np.arange(per_root, dtype=np.int64), R)
        return TriForest(roots, root,
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

    # -- families / adapt (4-ary analogues of PrismForest) --------------------

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

    def adapt(self, flags: np.ndarray) -> Tuple["TriForest", RemapSpec]:
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
        f = TriForest(self.roots, self.root[new_from_old],
                      new_level.astype(np.int8), new_path)
        return f, remap

    def balance_flags(self, flags: np.ndarray) -> np.ndarray:
        """Ripple fixpoint over current face-adjacency (PrismForest logic
        with 4-element families)."""
        flags = np.asarray(flags, np.int8).copy()
        h_idx = np.flatnonzero(self.family_heads())
        fam = (h_idx[:, None] + np.arange(4)) if len(h_idx) else None
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

    def _geometry(self):
        if self._geom is not None:
            return self._geom
        roots = self.roots
        i, j, orient = _decode_tri_paths(self.path, self.level)
        lv = self.level.astype(np.int64)
        V = roots.verts[roots.tris[self.root]]       # [N, 3, 2]
        scale = (2.0 ** -lv)[:, None]

        up = (orient == 0)[:, None]
        li = np.where(up, np.stack([i, i + 1, i], 1),
                      np.stack([i + 1, i, i + 1], 1))
        lj = np.where(up, np.stack([j, j, j + 1], 1),
                      np.stack([j, j + 1, j + 1], 1))
        wa = li * scale
        wb = lj * scale
        X = (V[:, None, 0] * (1.0 - wa - wb)[:, :, None]
             + V[:, None, 1] * wa[:, :, None]
             + V[:, None, 2] * wb[:, :, None])        # [N, 3, 2] corners
        e1 = X[:, 1] - X[:, 0]
        e2 = X[:, 2] - X[:, 0]
        area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        centers = X.mean(axis=1)
        self._geom = (X, area, centers)
        return self._geom

    def volumes(self) -> np.ndarray:
        return self._geometry()[1]

    def centers(self) -> np.ndarray:
        return self._geometry()[2]

    # -- face enumeration (exact integer edge keys) -------------------------------

    def _vertex_keys(self, iN: np.ndarray, jN: np.ndarray,
                     tri: np.ndarray) -> np.ndarray:
        """Canonical key of lattice point (iN, jN) at resolution 2^LMAX
        inside root `tri` (same scheme as PrismForest._vertex_keys)."""
        roots = self.roots
        R = np.int64(1) << LMAX
        v = roots.tris[tri]
        nv = len(roots.verts)
        ne = len(roots.edge_id)
        OFF_E = np.int64(nv)
        OFF_I = OFF_E + np.int64(ne) * (R - 1)

        key = OFF_I + (tri * (R + 1) + iN) * (R + 1) + jN
        key = np.where((iN == 0) & (jN == 0), v[:, 0], key)
        key = np.where((iN == R) & (jN == 0), v[:, 1], key)
        key = np.where((iN == 0) & (jN == R), v[:, 2], key)

        def edge_key(u, w, tpar):
            from t8gpu_tpu.mesh.shell_forest import edge_id_vec
            lo = np.minimum(u, w)
            hi = np.maximum(u, w)
            tt = np.where(u < w, tpar, R - tpar)
            eid = edge_id_vec(roots.edge_id, nv, lo, hi)
            return OFF_E + eid * (R - 1) + (tt - 1)

        on_b = (jN == 0) & (iN > 0) & (iN < R)
        if on_b.any():
            key[on_b] = edge_key(v[on_b, 0], v[on_b, 1], iN[on_b])
        on_l = (iN == 0) & (jN > 0) & (jN < R)
        if on_l.any():
            key[on_l] = edge_key(v[on_l, 0], v[on_l, 2], jN[on_l])
        on_d = (iN + jN == R) & (iN > 0) & (iN < R)
        if on_d.any():
            key[on_d] = edge_key(v[on_d, 1], v[on_d, 2], jN[on_d])
        return key

    def _build_face_lists(self):
        if self._faces is None:
            self._faces = self._build_face_lists_impl()
        return self._faces

    def _edge_records(self, offset: int = 0):
        """Per-element edge key records (own granularity + half quarters)
        for the exact-integer matcher; `offset` shifts the element ids so
        mixed-class forests (mesh/cmesh.HybridForest) can match tri and
        quad records in one joint pass over the SHARED vertex/edge key
        space."""
        n = self.n_elements
        i, j, orient = _decode_tri_paths(self.path, self.level)
        lv = self.level.astype(np.int64)
        assert int(lv.max(initial=0)) < LMAX, (
            "forest refined to LMAX: edge midpoints need one spare level")
        sh = LMAX - lv
        t = self.root

        up = orient == 0
        li = np.where(up[:, None], np.stack([i, i + 1, i], 1),
                      np.stack([i + 1, i, i + 1], 1))
        lj = np.where(up[:, None], np.stack([j, j, j + 1], 1),
                      np.stack([j, j + 1, j + 1], 1))
        liN = li << sh[:, None]
        ljN = lj << sh[:, None]

        zero = np.zeros(n, np.int64)
        ids = np.arange(n) + offset
        vk = np.stack([self._vertex_keys(liN[:, c], ljN[:, c], t)
                       for c in range(3)], axis=1)
        own_rec, sub_rec = [], []
        for e, (a, b) in enumerate(((0, 1), (1, 2), (2, 0))):
            k_a, k_b = vk[:, a], vk[:, b]
            own_rec.append((np.minimum(k_a, k_b), np.maximum(k_a, k_b),
                            zero, zero, ids, e))
            miN = (liN[:, a] + liN[:, b]) >> 1
            mjN = (ljN[:, a] + ljN[:, b]) >> 1
            k_m = self._vertex_keys(miN, mjN, t)
            for (ka, kb) in ((k_a, k_m), (k_m, k_b)):
                sub_rec.append((np.minimum(ka, kb), np.maximum(ka, kb),
                                zero, zero, ids, e))
        return own_rec, sub_rec

    def _build_face_lists_impl(self):
        own_rec, sub_rec = self._edge_records()
        return _match_records(own_rec, sub_rec, allow_boundary=True,
                              boundary_mask=lambda g: np.ones(len(g), bool))

    def build_faces(self):
        if self._face_dict is None:
            self._face_dict = self._build_faces_impl()
        return self._face_dict

    def _build_faces_impl(self):
        """Flat face arrays in the Forest.build_faces dict format (general
        in-plane normals, reflective domain-boundary edges).  Hanging
        faces are emitted by the finer side with ITS edge geometry (exact
        halves of the coarse edge)."""
        X, areas_e, centers = self._geometry()
        m = self._build_face_lists()

        pairs = np.array([(0, 1), (1, 2), (2, 0)])

        def edge_geom(elem, side):
            a = pairs[side, 0]
            b = pairs[side, 1]
            ar = np.arange(len(elem))
            p0 = X[elem][ar, a]
            p1 = X[elem][ar, b]
            d = p1 - p0
            length = np.linalg.norm(d, axis=1)
            nrm = np.stack([d[:, 1], -d[:, 0]], axis=1) / length[:, None]
            return nrm, length, (p0 + p1) / 2.0

        lefts, rights, normals, lens = [], [], [], []
        b_elems, b_normals, b_lens = [], [], []
        f_cents, b_cents = [], []

        def emit(le, ri, side):
            nrm, length, cent = edge_geom(le, side)
            s = np.sign(((cent - centers[le]) * nrm).sum(axis=1))
            nrm = nrm * s[:, None]
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
            nrm, length, cent = edge_geom(el, side)
            s = np.sign(((cent - centers[el]) * nrm).sum(axis=1))
            nrm = nrm * s[:, None]
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
class TriForestMesh:
    """Adapter exposing a TriForest with the mesh interface solvers expect."""

    forest: TriForest
    conn: FaceConnectivity
    centers: np.ndarray
    volumes: np.ndarray
    cfl_h: float

    dim = 2

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    @property
    def max_level(self) -> int:
        return int(np.ceil(-np.log2(max(self.cfl_h, 1e-30))))

    @staticmethod
    def from_forest(forest: TriForest,
                    element_capacity: Optional[int] = None,
                    recon_geometry: bool = True) -> "TriForestMesh":
        return TriForestMesh(
            forest=forest,
            conn=forest.connectivity(element_capacity, recon_geometry),
            centers=forest.centers().astype(np.float32),
            volumes=forest.volumes().astype(np.float32),
            cfl_h=forest.cfl_h(),
        )


def tri_manager(level: int = 3, amr=None, roots: Optional[TriRoots] = None):
    """MeshManager over an adaptive triangle mesh of the unit square."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig

    forest = TriForest.uniform(roots or unit_square_roots(), level)
    return MeshManager(forest, amr or AMRConfig(),
                       mesh_factory=TriForestMesh.from_forest)
