"""Adaptive linear Morton forest (host side).

This replaces the t8code dependency of the reference for quad/hex bricks:
a linearized quadtree/octree over the unit square/cube whose leaves are kept
in space-filling-curve (Morton/z) order, with

  * criteria-driven refine/coarsen following the reference adapt-callback
    semantics (`mesh_manager.inl:125-162`: refine when criteria > b below
    max_level; coarsen a full family when the family mean < b above
    min_level),
  * 2:1 face balance (the reference delegates to `t8_forest_set_balance`),
  * remap specs (src_start/src_count per new element) replacing the
    reference's `element_adapt_data` CSR walk (`mesh_manager.inl:258-281`),
  * the reference's face enumeration + dedup rules
    (`mesh_manager.inl:396-424`): the finer side emits hanging faces, the
    lower-index side emits equal-level faces, normals point from the
    emitting (left) element to its neighbor,
  * hanging-face metadata for the subgrid scheme: per-face level_difference
    and neighbor anchor offset (`subgrid_mesh_manager.h:486-488`),
  * SFC partition + ghost enumeration for multi-device runs (the analogue
    of `t8_forest_partition` / ghost layers).

Everything is vectorized NumPy; the same algorithms are mirrored by the
C++ implementation in native/ (used when built, for large foresta).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from t8gpu_tpu.mesh.connectivity import FaceConnectivity, build_connectivity
from t8gpu_tpu.mesh.morton import morton_encode


@dataclasses.dataclass
class RemapSpec:
    """Old->new element data mapping produced by adapt().

    For new element i, its value is the mean of old elements
    [src_start[i], src_start[i] + src_count[i]); count is 1 (copy /
    prolongation from the ancestor) or 2^dim (restriction of a family).
    `child_id` is the z-order child index within the source for refined
    elements (0 for keep/coarsen rows) — the subgrid prolongation needs it
    to select the parent octant (ref subgrid_mesh_manager.inl:318-331).
    `level_change` is new_level - old_level in {-1, 0, +1}.
    """

    src_start: np.ndarray     # int32 [N_new]
    src_count: np.ndarray     # int32 [N_new]
    child_id: np.ndarray      # int8 [N_new]
    level_change: np.ndarray  # int8 [N_new]

    def compose(self, later: "RemapSpec") -> "RemapSpec":
        """Compose with a later remap.  Exact for plain (cell-constant)
        element data; multi-level chains lose the subgrid octant info, so
        subgrid AMR uses the single-pass `adapt(balance_flags(...))` path
        instead of composing."""
        return RemapSpec(self.src_start[later.src_start],
                         self.src_count[later.src_start],
                         later.child_id,
                         self.level_change[later.src_start] + later.level_change)


class Forest:
    """Linearized adaptive Morton forest on the unit square/cube."""

    def __init__(self, dim: int, level: np.ndarray, anchor: np.ndarray,
                 max_refine_level: int, periodic=True):
        assert dim in (2, 3)
        self.dim = dim
        self.L = max_refine_level            # anchor resolution (bits/axis)
        # periodicity may be per-axis (e.g. (True, False) = a channel:
        # wraparound in x, reflective walls in y) — a bool means all axes
        try:
            axes = tuple(bool(q) for q in periodic)
            assert len(axes) == dim, "per-axis periodic needs dim entries"
        except TypeError:
            axes = (bool(periodic),) * dim
        self.periodic_axes = axes
        self.periodic = axes if len(set(axes)) > 1 else axes[0]
        self.level = np.asarray(level, np.int8)
        self.anchor = np.asarray(anchor, np.int64)   # [N, dim] at resolution L
        self._sort()

    # -- construction -------------------------------------------------------

    @staticmethod
    def uniform(level: int, dim: int = 2, periodic=True,
                max_refine_level: Optional[int] = None) -> "Forest":
        """Uniform starting forest (ref t8_forest_new_uniform, main.cu:24).
        `periodic` is a bool, or a per-axis tuple — (True, False) builds a
        channel (x-wraparound, y-walls)."""
        L = max_refine_level if max_refine_level is not None else max(level + 8, 12)
        assert L <= (21 if dim == 3 else 30) and level <= L
        n_side = 1 << level
        codes = np.arange(n_side**dim, dtype=np.uint64)
        from t8gpu_tpu.mesh.morton import morton_decode

        coords = morton_decode(codes, dim)
        anchor = coords << (L - level)
        return Forest(dim, np.full(len(codes), level), anchor, L, periodic)

    def _sort(self):
        code = morton_encode(self.anchor, self.dim)
        order = np.argsort(code, kind="stable")
        if not np.array_equal(order, np.arange(len(order))):
            self.level = self.level[order]
            self.anchor = self.anchor[order]
            code = code[order]
        self.code = code

    # -- basic queries -------------------------------------------------------

    @property
    def n_elements(self) -> int:
        return len(self.level)

    def sizes(self) -> np.ndarray:
        """Edge length in anchor units [N]."""
        return (np.int64(1) << (self.L - self.level.astype(np.int64)))

    @property
    def h_unit(self) -> float:
        """Physical length of one anchor unit."""
        return 0.5**self.L

    def centers(self) -> np.ndarray:
        s = self.sizes()[:, None]
        return ((self.anchor + 0.5 * s) * self.h_unit).astype(np.float64)

    def volumes(self) -> np.ndarray:
        h = self.sizes() * self.h_unit
        return (h.astype(np.float64)) ** self.dim

    def edge_lengths(self) -> np.ndarray:
        return self.sizes() * self.h_unit

    def cfl_h(self) -> float:
        """Characteristic min cell size for CFL control: the finest edge
        (= 0.5^max_level), matching the reference's cfl * 0.5^max_level
        timestep rule (solver.cu:213-229).  Non-brick forests provide the
        same method via cfl_h_from_faces (anisotropic-safe)."""
        return float(self.edge_lengths().min())

    # -- family detection ----------------------------------------------------

    def family_heads(self) -> np.ndarray:
        """Boolean [N]: element starts a complete family of 2^dim siblings
        (consecutive in SFC order, same level, same parent)."""
        n = self.n_elements
        k = 1 << self.dim
        heads = np.zeros(n, bool)
        if n < k:
            return heads
        lv = self.level.astype(np.int64)
        size = self.sizes()
        # candidate heads: same level for k consecutive + same parent anchor
        same_level = np.ones(n - k + 1, bool)
        for j in range(1, k):
            same_level &= lv[j: n - k + 1 + j] == lv[: n - k + 1]
        parent = self.anchor & ~(2 * size - 1)[:, None]  # parent-aligned anchor
        same_parent = np.ones(n - k + 1, bool)
        for j in range(1, k):
            same_parent &= (parent[j: n - k + 1 + j] == parent[: n - k + 1]).all(axis=1)
        # head must itself be the first child (anchor == parent anchor)
        is_first = (self.anchor[: n - k + 1] == parent[: n - k + 1]).all(axis=1)
        heads[: n - k + 1] = same_level & same_parent & is_first & (lv[: n - k + 1] > 0)
        return heads

    # -- adapt ----------------------------------------------------------------

    def flags_from_criteria(self, criteria: np.ndarray, b: float,
                            min_level: int, max_level: int) -> np.ndarray:
        """Reference adapt-callback logic -> per-element flags in {-1,0,1}
        (mesh_manager.inl:137-161): refine if criteria > b and below
        max_level; coarsen a complete family if its mean is < b and above
        min_level."""
        flags = np.zeros(self.n_elements, np.int8)
        flags[(criteria > b) & (self.level < max_level)] = 1
        k = 1 << self.dim
        h_idx = np.flatnonzero(self.family_heads())
        if len(h_idx):
            fam = h_idx[:, None] + np.arange(k)          # [H, k] member indices
            no_refine = (flags[fam] < 1).all(axis=1)
            coarse_ok = ((self.level[h_idx] > min_level) & no_refine
                         & (criteria[fam].mean(axis=1) < b))
            flags[fam[coarse_ok].ravel()] = -1
        return flags

    def adapt(self, flags: np.ndarray) -> Tuple["Forest", RemapSpec]:
        """Apply refine(+1)/keep(0)/coarsen(-1) flags; coarsening only acts
        on complete families where EVERY member is flagged -1.  Returns the
        new forest (unbalanced — call balance()) and the data remap."""
        flags = np.asarray(flags).astype(np.int8).copy()
        k = 1 << self.dim
        n = self.n_elements

        # validate coarsen flags: keep only full families all flagged -1
        coarsen_head = np.zeros(n, bool)
        is_coarsened = np.zeros(n, bool)
        h_idx = np.flatnonzero(self.family_heads())
        if len(h_idx):
            fam = h_idx[:, None] + np.arange(k)
            ok = (flags[fam] == -1).all(axis=1)
            coarsen_head[h_idx[ok]] = True
            is_coarsened[fam[ok].ravel()] = True
        flags[(flags == -1) & ~is_coarsened] = 0

        refine = flags == 1
        counts = np.ones(n, np.int64)
        counts[refine] = k
        counts[is_coarsened & ~coarsen_head] = 0

        new_from_old = np.repeat(np.arange(n), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        child_rank = np.arange(len(new_from_old)) - starts[new_from_old]

        old_level = self.level.astype(np.int64)[new_from_old]
        old_anchor = self.anchor[new_from_old]
        old_size = self.sizes()[new_from_old]

        ref = refine[new_from_old]
        coh = coarsen_head[new_from_old]

        new_level = old_level + ref.astype(np.int64) - coh.astype(np.int64)
        new_anchor = old_anchor.copy()
        # refined children: z-order offsets (child bit a -> axis a)
        half = (old_size // 2)[:, None]
        offs = np.stack([(child_rank >> a) & 1 for a in range(self.dim)], axis=1)
        new_anchor = new_anchor + np.where(ref[:, None], offs * half, 0)
        # coarsen head: parent anchor == head anchor (head is first child)

        remap = RemapSpec(
            src_start=new_from_old.astype(np.int32),
            src_count=np.where(coh, k, 1).astype(np.int32),
            child_id=np.where(ref, child_rank, 0).astype(np.int8),
            level_change=(ref.astype(np.int8) - coh.astype(np.int8)),
        )
        f = Forest(self.dim, new_level, new_anchor, self.L, self.periodic)
        # SFC order is preserved by construction; _sort() should be identity
        return f, remap

    # -- 2:1 balance -----------------------------------------------------------

    def balance_flags(self, flags: np.ndarray) -> np.ndarray:
        """Adjust refine/coarsen flags so ONE adapt() pass yields a
        2:1-balanced forest (requires `self` to be balanced already).

        The reference gets this from a combined t8code
        set_adapt+set_balance commit (mesh_manager.inl:207-212); doing it on
        the flags keeps every element's level change in {-1,0,+1}, which the
        subgrid prolongation/restriction remap relies on
        (subgrid_mesh_manager.inl:318-355 assumes single-level transfers).

        Rules per fixpoint iteration on tentative levels lv+flag: first
        cancel coarsening for any family with a member that would end up
        >1 level coarser than a neighbor; then promote keep->refine where a
        neighbor would end up >1 level finer.
        """
        flags = np.asarray(flags, np.int8).copy()
        k = 1 << self.dim
        h_idx = np.flatnonzero(self.family_heads())
        fam = (h_idx[:, None] + np.arange(k)) if len(h_idx) else None
        # sanitize coarsen flags first (mirrors adapt()): only complete
        # families with EVERY member flagged -1 actually coarsen, so stray
        # -1 flags must not lower tentative levels during balancing
        keep = np.zeros(self.n_elements, bool)
        if fam is not None:
            full = (flags[fam] == -1).all(axis=1)
            keep[fam[full].ravel()] = True
        flags[(flags == -1) & ~keep] = 0

        from t8gpu_tpu.mesh import _native
        if _native.available() and len(set(self.periodic_axes)) == 1:
            return _native.balance_flags(self.anchor, self.level, self.code,
                                         self.L, self.dim,
                                         self.periodic_axes[0], flags)
        lv = self.level.astype(np.int64)
        for _ in range(64):
            tentative = lv + flags
            nb_max = self._max_neighbor_level(tentative)
            viol = nb_max > tentative + 1
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

    def _max_neighbor_level(self, tentative: np.ndarray) -> np.ndarray:
        """Per element, the max tentative level over face-adjacent leaves
        (quarter-resolution face probes; exact for 2:1-balanced forests)."""
        n = self.n_elements
        out = np.full(n, -1, np.int64)
        size = self.sizes()
        ext = np.int64(1) << self.L
        for axis in range(self.dim):
            for sign in (1, -1):
                for q in self._face_probe_points(axis, sign, size):
                    qq = q.copy()
                    valid = np.ones(n, bool)
                    if self.periodic_axes[axis]:
                        qq %= ext
                    else:
                        inside = (qq[:, axis] >= 0) & (qq[:, axis] < ext)
                        valid &= inside
                        qq = np.clip(qq, 0, ext - 1)
                    j = self._locate(qq)
                    t = np.where(valid, tentative[j], -1)
                    out = np.maximum(out, t)
        return out

    def balance(self) -> Tuple["Forest", RemapSpec]:
        """Iteratively refine until no face neighbor differs by > 1 level
        (ref t8_forest_set_balance, mesh_manager.inl:211)."""
        forest = self
        n = self.n_elements
        remap = RemapSpec(np.arange(n, dtype=np.int32), np.ones(n, np.int32),
                          np.zeros(n, np.int8), np.zeros(n, np.int8))
        for _ in range(64):
            viol = forest._balance_violations()
            if not viol.any():
                break
            flags = np.zeros(forest.n_elements, np.int8)
            flags[viol] = 1
            forest, r = forest.adapt(flags)
            remap = remap.compose(r)
        return forest, remap

    def _balance_violations(self) -> np.ndarray:
        """Boolean [N]: element has a face neighbor more than 1 level finer
        (it must refine)."""
        n = self.n_elements
        viol = np.zeros(n, bool)
        size = self.sizes()
        ext = np.int64(1) << self.L
        lv = self.level.astype(np.int64)
        for axis in range(self.dim):
            for sign in (1, -1):
                # probe the neighbor region at the FINEST admissible level:
                # if the leaf found at a probe point 2 levels finer exists,
                # we check its level directly.  Probing each corner of the
                # face at quarter resolution detects any >1-level mismatch.
                # Quarter points across the face:
                probes = self._face_probe_points(axis, sign, size)
                for q in probes:
                    qq = q.copy()
                    valid = np.ones(n, bool)
                    if self.periodic_axes[axis]:
                        qq %= ext
                    else:
                        inside = (qq[:, axis] >= 0) & (qq[:, axis] < ext)
                        valid &= inside
                        qq = np.clip(qq, 0, ext - 1)
                    j = self._locate(qq)
                    nb_finer_by_2 = lv[j] > lv + 1
                    viol |= valid & nb_finer_by_2
        return viol

    def _face_probe_points(self, axis, sign, size):
        """Probe points covering the face at quarter granularity: enough to
        find any neighbor up to 2 levels finer adjacent to the face.  For
        deeper mismatches the loop in balance() converges geometrically."""
        quarter = np.maximum(size // 4, 1)
        tangents = [a for a in range(self.dim) if a != axis]
        probes = []
        steps = range(0, 4)
        grids = np.meshgrid(*[list(steps)] * len(tangents), indexing="ij")
        flat = [g.ravel() for g in grids]
        for combo in zip(*flat):
            q = self.anchor.copy()
            if sign > 0:
                q[:, axis] += size
            else:
                q[:, axis] -= 1
            for t_axis, c in zip(tangents, combo):
                q[:, t_axis] += c * quarter
            probes.append(q)
        return probes

    def _locate(self, q: np.ndarray) -> np.ndarray:
        """Leaf index containing anchor-resolution points q [M, dim]."""
        mq = morton_encode(q, self.dim)
        j = np.searchsorted(self.code, mq, side="right") - 1
        return np.clip(j, 0, self.n_elements - 1)

    # -- face enumeration --------------------------------------------------------

    def _faces_core_numpy(self):
        """Raw face index enumeration (vectorized NumPy fallback; the C++
        core in native/forest.cc computes the same arrays).

        Returns (left, right, axis, sign, ldiff, offset[F,dim],
        b_elem, b_axis, b_sign)."""
        n = self.n_elements
        size = self.sizes()
        lv = self.level.astype(np.int64)
        ext = np.int64(1) << self.L

        lefts, rights, ldiffs, offsets = [], [], [], []
        axes_, signs_ = [], []
        b_elems, b_axes, b_signs = [], [], []

        idx = np.arange(n)
        for axis in range(self.dim):
            for sign in (1, -1):
                q = self.anchor.copy()
                if sign > 0:
                    q[:, axis] += size
                else:
                    q[:, axis] -= 1
                outside = (q[:, axis] < 0) | (q[:, axis] >= ext)
                if self.periodic_axes[axis]:
                    q[:, axis] %= ext
                    boundary = np.zeros(n, bool)
                else:
                    boundary = outside
                    q[:, axis] = np.clip(q[:, axis], 0, ext - 1)

                j = self._locate(q)
                nb_lv = lv[j]

                # emit: neighbor coarser (I am finer) OR equal level and
                # neighbor at larger-or-equal SFC index (== only for the
                # self-periodic single-element axis)
                # (ref mesh_manager.inl:411-414)
                emit = ~boundary & ((nb_lv < lv) | ((nb_lv == lv) & (j >= idx)))

                e = np.flatnonzero(emit)
                if len(e):
                    lefts.append(e.astype(np.int32))
                    rights.append(j[e].astype(np.int32))
                    ldiffs.append((lv[e] - nb_lv[e]).astype(np.int8))
                    # anchor offset (anchor units) of the face-adjacent probe
                    # cell inside the right element: q is one unit past my
                    # face, so q - anchor[j] has axis component 0 (sign>0,
                    # neighbor behind its -axis face) or nb_size-1 (sign<0,
                    # neighbor behind its +axis face); tangential components
                    # give the hanging-face anchor within the coarser
                    # neighbor (ref subgrid_mesh_manager.h:486-488).
                    offsets.append(q[e] - self.anchor[j[e]])
                    axes_.append(np.full(len(e), axis, np.int8))
                    signs_.append(np.full(len(e), sign, np.int8))
                if (boundary).any():
                    b = np.flatnonzero(boundary)
                    b_elems.append(b.astype(np.int32))
                    b_axes.append(np.full(len(b), axis, np.int8))
                    b_signs.append(np.full(len(b), sign, np.int8))

        cat = lambda lst, dt: (np.concatenate(lst) if lst else np.zeros(0, dt))
        return (cat(lefts, np.int32), cat(rights, np.int32),
                cat(axes_, np.int8), cat(signs_, np.int8),
                cat(ldiffs, np.int8),
                (np.concatenate(offsets) if offsets
                 else np.zeros((0, self.dim), np.int64)),
                cat(b_elems, np.int32), cat(b_axes, np.int8),
                cat(b_signs, np.int8))

    def _faces_core(self):
        from t8gpu_tpu.mesh import _native
        if _native.available() and len(set(self.periodic_axes)) == 1:
            return _native.faces_core(self.anchor, self.level, self.code,
                                      self.L, self.dim,
                                      self.periodic_axes[0])
        return self._faces_core_numpy()

    def build_faces(self):
        """Enumerate interior + boundary faces with the reference dedup rule.

        Returns dict with left, right, normal[3,F], area, level_difference,
        neighbor_offset[F, dim] (anchor of left's face corner within the
        right element — used by the subgrid scheme), axis/sign, plus
        boundary arrays.
        """
        (left, right, axis, sign, ldiff, offset,
         b_elem, b_axis, b_sign) = self._faces_core()
        size = self.sizes()
        h = self.h_unit
        F, B = len(left), len(b_elem)

        normal = np.zeros((3, F), np.float32)
        normal[axis, np.arange(F)] = sign
        area = ((size[left] * h) ** (self.dim - 1)).astype(np.float32)
        # Face centroids from the EMITTING (left, finer-on-hanging) element:
        # exact for equal-level and 2:1 faces (the emitter's face IS the
        # shared face).  Used for MUSCL displacement geometry.
        centers = self.centers()
        c3 = np.zeros((len(centers), 3))
        c3[:, : self.dim] = centers
        face_center = c3[left].T + 0.5 * (size[left] * h) * normal
        if B:
            b_normal = np.zeros((3, B), np.float32)
            b_normal[b_axis, np.arange(B)] = b_sign
            b_area = ((size[b_elem] * h) ** (self.dim - 1)).astype(np.float32)
            b_face_center = (c3[b_elem].T
                             + 0.5 * (size[b_elem] * h) * b_normal)

        return dict(
            left=left, right=right, normal=normal, area=area,
            level_difference=ldiff, neighbor_offset=offset,
            axis=axis, sign=sign,
            b_elem=b_elem if B else None,
            b_normal=b_normal if B else None,
            b_area=b_area if B else None,
            b_axis=b_axis if B else None,
            b_sign=b_sign if B else None,
            face_center=face_center,
            b_face_center=b_face_center if B else None,
        )

    def connectivity(self, element_capacity: Optional[int] = None,
                     recon_geometry: bool = True) -> FaceConnectivity:
        f = self.build_faces()
        return build_connectivity(
            left=f["left"], right=f["right"], normal=f["normal"], area=f["area"],
            n_elements=self.n_elements,
            b_elem=f["b_elem"], b_normal=f["b_normal"], b_area=f["b_area"],
            element_capacity=element_capacity,
            axis=f["axis"], sign=f["sign"],
            b_axis=f["b_axis"], b_sign=f["b_sign"],
            face_center=f["face_center"] if recon_geometry else None,
            b_face_center=f["b_face_center"] if recon_geometry else None,
            centers=self.centers() if recon_geometry else None,
            wrap=1.0 if any(self.periodic_axes) else None,
        )


@dataclasses.dataclass
class ForestMesh:
    """Adapter exposing a Forest with the mesh interface solvers expect
    (.conn / .volumes / .centers)."""

    forest: Forest
    conn: FaceConnectivity
    centers: np.ndarray
    volumes: np.ndarray

    @property
    def dim(self) -> int:
        return self.forest.dim

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    @property
    def max_level(self) -> int:
        return int(self.forest.level.max())

    @staticmethod
    def from_forest(forest: Forest, element_capacity: Optional[int] = None,
                    recon_geometry: bool = True) -> "ForestMesh":
        return ForestMesh(
            forest=forest,
            conn=forest.connectivity(element_capacity, recon_geometry),
            centers=forest.centers().astype(np.float32),
            volumes=forest.volumes().astype(np.float32),
        )


def cfl_h_from_faces(forest) -> float:
    """Characteristic min cell size dim * min(V / sum A) over elements —
    half the smallest cell extent on anisotropic elements (shell prisms,
    tets) where V^(1/dim) overestimates the binding direction.  Shared by
    the non-brick forests' cfl_h methods and the ShellForestMesh adapter."""
    f = forest.build_faces()
    suma = np.zeros(forest.n_elements)
    np.add.at(suma, f["left"], f["area"].astype(np.float64))
    np.add.at(suma, f["right"], f["area"].astype(np.float64))
    if f["b_elem"] is not None:
        np.add.at(suma, f["b_elem"], f["b_area"].astype(np.float64))
    return float(forest.dim * (forest.volumes() / suma).min())
