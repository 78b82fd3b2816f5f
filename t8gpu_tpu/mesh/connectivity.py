"""Device-side mesh connectivity: flat face lists + element incidence.

TPU-native counterpart of the reference `MeshConnectivityAccessor`
(`t8gpu/mesh/mesh_manager.h:30-182`): the host mesh layer (forest or uniform
builder) emits flat arrays — neighbor indices, normals, areas, boundary
lists — that become jit inputs.

The key TPU redesign is how per-face fluxes reach per-element accumulators.
The reference scatters with `atomicAdd`, including into remote ranks' memory
over CUDA IPC (`examples/compressible_euler/kernels.cu:295-308`); that is
non-deterministic and has no TPU analogue.  Here accumulation is formulated
two ways, both deterministic:

  * ``gather``: a host-built CSR-style incidence table — each element knows
    the (face, sign) pairs that touch it, padded to a fixed degree — turns
    accumulation into a gather + small reduction, the TPU-friendly shape.
  * ``segment_sum``: `jax.ops.segment_sum` over the face list (XLA scatter).

Faces and incidence degree are padded to capacity buckets so AMR-driven
count changes reuse compiled programs.  Padded faces have area 0 and touch
element 0, contributing exactly zero.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import bucket_capacity


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FaceConnectivity:
    """Flat device arrays describing interior + boundary faces.

    Interior faces: `left` is the emitting element (the finer one across a
    hanging face, mirroring the reference convention mesh_manager.inl:396-424),
    `normal` points from left to right, `area` is the face area.  Boundary
    faces carry the owning element and its outward normal.
    """

    left: jnp.ndarray      # i32 [F]
    right: jnp.ndarray     # i32 [F]
    normal: jnp.ndarray    # f32 [3, F] unit, left -> right
    area: jnp.ndarray      # f32 [F]; 0 for padding faces

    b_elem: jnp.ndarray    # i32 [Fb]
    b_normal: jnp.ndarray  # f32 [3, Fb] outward
    b_area: jnp.ndarray    # f32 [Fb]; 0 for padding

    # CSR incidence: for each element, up to D incident face slots.
    # Slot s < F refers to interior face s; F <= s < F+Fb to boundary face
    # s-F; slot F+Fb is a zero sentinel.  sign: -1 emitter/owner, +1 receiver.
    inc_slot: jnp.ndarray  # i32 [capacity, D]
    inc_sign: jnp.ndarray  # f32 [capacity, D]

    n_faces: int = dataclasses.field(metadata=dict(static=True))
    n_boundary_faces: int = dataclasses.field(metadata=dict(static=True))
    n_elements: int = dataclasses.field(metadata=dict(static=True))

    # Axis-aligned orientation groups (Cartesian meshes): faces are sorted
    # by axis with normals canonicalized to +axis, so the flux path uses
    # static momentum-row permutations per group instead of per-face basis
    # construction + two rotations (VERDICT r1 #4; the reference pays the
    # general-normal basis on every face, kernels.cu:174-193).
    #   axis_ranges:   ((axis, start, stop), ...) tiling [0, face_capacity)
    #   b_axis_ranges: ((axis, sign, start, stop), ...) tiling
    #                  [0, boundary_capacity)
    # None on general (non-axis-aligned) meshes, e.g. the spherical shell.
    axis_ranges: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True))
    b_axis_ranges: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True))

    # MUSCL reconstruction geometry (ops/reconstruct.py): displacement from
    # each adjacent element's centroid to the face centroid, [3, Fcap] /
    # [3, Fbcap].  None when the mesh builder supplied no face centroids
    # (then only first-order flux paths are available).  Periodic meshes
    # store the wrapped (minimal-image) displacement.
    d_left: Optional[jnp.ndarray] = None
    d_right: Optional[jnp.ndarray] = None
    d_b: Optional[jnp.ndarray] = None

    @property
    def face_capacity(self) -> int:
        return self.left.shape[0]

    @property
    def boundary_capacity(self) -> int:
        return self.b_elem.shape[0]


def build_connectivity(
    left: np.ndarray,
    right: np.ndarray,
    normal: np.ndarray,      # [3, F]
    area: np.ndarray,
    n_elements: int,
    b_elem: Optional[np.ndarray] = None,
    b_normal: Optional[np.ndarray] = None,
    b_area: Optional[np.ndarray] = None,
    element_capacity: Optional[int] = None,
    dtype=np.float32,
    axis: Optional[np.ndarray] = None,      # i8 [F]: face-normal axis
    sign: Optional[np.ndarray] = None,      # i8 [F]: +-1 normal orientation
    b_axis: Optional[np.ndarray] = None,    # i8 [Fb]
    b_sign: Optional[np.ndarray] = None,    # i8 [Fb]
    face_center: Optional[np.ndarray] = None,    # [3, F] face centroids
    b_face_center: Optional[np.ndarray] = None,  # [3, Fb]
    centers: Optional[np.ndarray] = None,        # [N, dim<=3] element centroids
    wrap: Optional[float] = None,    # periodic domain period (unit box: 1.0)
) -> FaceConnectivity:
    """Assemble a FaceConnectivity from host face lists (NumPy, unpadded).

    When `axis`/`sign` are given (axis-aligned Cartesian meshes), interior
    faces are canonicalized to +axis normals (swapping left/right where
    sign < 0 — valid since F(l, r, n) = -F(r, l, -n) and the incidence
    signs follow the swapped roles) and sorted into contiguous per-axis
    ranges; boundary faces sort into (axis, sign) ranges.  The flux path
    then replaces per-face basis rotations with static row permutations.
    """
    left = np.asarray(left, np.int64).copy()
    right = np.asarray(right, np.int64).copy()
    normal = np.asarray(normal, dtype).copy()
    area = np.asarray(area, dtype)
    axis_ranges = None
    b_axis_ranges = None
    if axis is not None and len(left):
        axis = np.asarray(axis, np.int64)
        swap = np.asarray(sign, np.int64) < 0
        left[swap], right[swap] = right[swap].copy(), left[swap].copy()
        normal[:, swap] *= -1.0
        order = np.argsort(axis, kind="stable")
        left, right, area, axis = (left[order], right[order], area[order],
                                   axis[order])
        normal = normal[:, order]
        if face_center is not None:
            face_center = np.asarray(face_center)[:, order]
    if b_axis is not None and b_elem is not None and len(b_elem):
        b_axis = np.asarray(b_axis, np.int64)
        b_sign = np.asarray(b_sign, np.int64)
        b_order = np.argsort(b_axis * 2 + (b_sign < 0), kind="stable")
        b_elem = np.asarray(b_elem)[b_order]
        b_normal = np.asarray(b_normal, dtype)[:, b_order]
        b_area = np.asarray(b_area, dtype)[b_order]
        b_axis, b_sign = b_axis[b_order], b_sign[b_order]
        if b_face_center is not None:
            b_face_center = np.asarray(b_face_center)[:, b_order]
    F = len(left)
    if b_elem is None:
        b_elem = np.zeros(0, np.int32)
        b_normal = np.zeros((3, 0), dtype)
        b_area = np.zeros(0, dtype)
    Fb = len(b_elem)

    cap_f = bucket_capacity(max(F, 1))
    cap_b = bucket_capacity(max(Fb, 1)) if Fb else 0
    cap_e = element_capacity or bucket_capacity(n_elements)

    def pad1(a, n, fill=0):
        out = np.full(n, fill, a.dtype if hasattr(a, "dtype") else np.int32)
        out[: len(a)] = a
        return out

    if axis is not None and F:
        axis_ranges = []
        for a in range(int(axis.max()) + 1):
            idx = np.flatnonzero(axis == a)
            if len(idx):
                axis_ranges.append([int(a), int(idx[0]), int(idx[-1] + 1)])
        axis_ranges[-1][2] = cap_f   # padding tail (area 0) joins the last group
        axis_ranges = tuple(tuple(r) for r in axis_ranges)
    if b_axis is not None and b_elem is not None and len(b_elem):
        b_axis_ranges = []
        key = b_axis * 2 + (b_sign < 0)
        for kk in np.unique(key):
            idx = np.flatnonzero(key == kk)
            b_axis_ranges.append([int(kk) // 2, 1 - 2 * (int(kk) % 2),
                                  int(idx[0]), int(idx[-1] + 1)])
        b_axis_ranges[-1][3] = cap_b
        b_axis_ranges = tuple(tuple(r) for r in b_axis_ranges)

    left_p = pad1(np.asarray(left, np.int32), cap_f)
    right_p = pad1(np.asarray(right, np.int32), cap_f)
    area_p = pad1(np.asarray(area, dtype), cap_f, 0)
    normal_p = np.zeros((3, cap_f), dtype)
    normal_p[0] = 1.0  # valid unit normal on padding (degenerate-basis safe)
    normal_p[:, :F] = normal

    b_elem_p = pad1(np.asarray(b_elem, np.int32), cap_b) if cap_b else np.zeros(0, np.int32)
    b_area_p = pad1(np.asarray(b_area, dtype), cap_b, 0) if cap_b else np.zeros(0, dtype)
    b_normal_p = np.zeros((3, cap_b), dtype)
    if cap_b:
        b_normal_p[0] = 1.0
        b_normal_p[:, :Fb] = b_normal

    # --- incidence table -------------------------------------------------
    # element e receives -flux from faces where it is `left` (emitter) and
    # +flux where it is `right`; boundary faces contribute -flux to their
    # owner (ref kernels.cu:295-308, 464-468).
    elems = np.concatenate([left[:F], right[:F], b_elem[:Fb]]).astype(np.int64)
    slots = np.concatenate([
        np.arange(F), np.arange(F), cap_f + np.arange(Fb),
    ]).astype(np.int64)
    signs = np.concatenate([
        -np.ones(F), np.ones(F), -np.ones(Fb),
    ]).astype(dtype)

    order = np.argsort(elems, kind="stable")
    elems, slots, signs = elems[order], slots[order], signs[order]
    counts = np.bincount(elems, minlength=n_elements)
    deg = int(counts.max()) if len(counts) else 1
    # Bucket the degree so hanging-node meshes with varying max degree
    # don't recompile on every adapt.
    D = 1 << int(np.ceil(np.log2(max(deg, 4))))

    sentinel = cap_f + cap_b
    inc_slot = np.full((cap_e, D), sentinel, np.int32)
    inc_sign = np.zeros((cap_e, D), dtype)
    # position of each entry within its element's row
    offsets = np.zeros(len(elems), np.int64)
    if len(elems):
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        offsets = np.arange(len(elems)) - starts[elems]
    inc_slot[elems, offsets] = slots
    inc_sign[elems, offsets] = signs

    # MUSCL displacement geometry: face centroid minus adjacent element
    # centroid, minimal-image-wrapped on periodic meshes.  Padded faces get
    # zero displacement (-> zero extrapolation -> first-order, harmless).
    recon = None
    if face_center is not None and centers is not None:
        centers = np.asarray(centers, np.float64)
        c3 = np.zeros((len(centers), 3))
        c3[:, : centers.shape[1]] = centers
        fc = np.asarray(face_center, np.float64)

        def disp(fcent, elem):
            d = fcent - c3[elem].T
            if wrap is not None:
                d -= wrap * np.round(d / wrap)
            return d

        dl = np.zeros((3, cap_f), dtype)
        dr = np.zeros((3, cap_f), dtype)
        dl[:, :F] = disp(fc, left[:F])
        dr[:, :F] = disp(fc, right[:F])
        db = np.zeros((3, cap_b), dtype)
        if cap_b and b_face_center is not None:
            db[:, :Fb] = disp(np.asarray(b_face_center, np.float64),
                              np.asarray(b_elem[:Fb], np.int64))
        recon = (dl, dr, db)

    # ONE host->device transfer for the whole connectivity (per-array
    # uploads are latency-bound through slow interconnects; see utils/xfer)
    from t8gpu_tpu.utils.xfer import pack_put
    arrays = [left_p, right_p, normal_p, area_p, b_elem_p, b_normal_p,
              b_area_p, inc_slot, inc_sign] + (list(recon) if recon else [])
    out = pack_put(arrays)
    (d_left, d_right, d_normal, d_area, d_b_elem, d_b_normal, d_b_area,
     d_inc_slot, d_inc_sign) = out[:9]
    return FaceConnectivity(
        left=d_left,
        right=d_right,
        normal=d_normal,
        area=d_area,
        b_elem=d_b_elem,
        b_normal=d_b_normal,
        b_area=d_b_area,
        inc_slot=d_inc_slot,
        inc_sign=d_inc_sign,
        n_faces=F,
        n_boundary_faces=Fb,
        n_elements=n_elements,
        axis_ranges=axis_ranges,
        b_axis_ranges=b_axis_ranges,
        d_left=out[9] if recon else None,
        d_right=out[10] if recon else None,
        d_b=out[11] if recon else None,
    )
