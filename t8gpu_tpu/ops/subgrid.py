"""Device ops for the subgrid (block-structured) scheme.

TPU-native re-derivations of the reference subgrid CUDA kernels
(`examples/subgrid/kernels.inl`):

  * `inner_divergence`    — per-element interior cell-face fluxes via dense
    shifted slices over the block axes (ref compute_inner_fluxes
    kernels.inl:335-662: one CUDA block per element with __shared__ staging;
    here a batched elementwise program XLA fuses with the RK stages).
  * `outer_apply`         — mesh-face fluxes via the slab-exchange scheme
    (ref compute_outer_fluxes kernels.inl:664-911 with its runtime
    anchor/stride/double_stride arithmetic + atomicAdd; here each element
    side gathers neighbor layer slabs with ONE row-contiguous gather and
    evaluates subfaces densely — no scatters, no per-cell gathers).
  * `boundary_apply`      — reflective walls (ref compute_boundary_fluxes
    kernels.inl:913-1107).
  * `h1_criteria`         — density H1-seminorm refinement criteria
    (ref compute_refinement_criteria kernels.inl:1109-1168).
  * `apply_subgrid_remap` — AMR prolongation (parent octant injection) /
    restriction (2^dim cell averages) (ref adapt_variables
    subgrid_mesh_manager.inl:301-425).

Since all subgrid faces are axis-aligned (ref kernels.inl:717-750), the
face-frame rotation is a static momentum-row permutation per axis group —
mathematically identical to the reference's complete_orthonormal_basis
rotation (the numerical flux treats the two tangential components
symmetrically).

LAYOUT (the TPU-critical choice): state is [5, bx, by(, bz), E] with the
ELEMENT axis minor-most.  TPU f32 arrays tile to (8 sublanes, 128 lanes)
on the last two dims; with elements minor, the huge E axis fills the
lanes and the block cells fill sublanes exactly (4*4*4 = 64 = 8x8), so
every stencil/flux op vectorizes at full width.  The reference's
element-major CUDA layout ([E * block] with one thread block per element,
subgrid_memory_manager.h:85-101) transposed to [.., 4, 4, 4, E-minor]
would waste 97% of the lanes — this transpose is the single biggest
perf lever of the rebuild.  Flat cell index = cell * Ecap + element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.subgrid import SubgridConnectivity
from t8gpu_tpu.ops.euler import (AXIS_ROTATE, fields_axis_rotate,
                                 fields_flux, numerical_flux)

# momentum-row permutations: state rows [rho, m_x, m_y, m_z, e] -> face frame
# [rho, m_normal, m_t1, m_t2, e] for an +axis normal, and back.
_ROTATE = AXIS_ROTATE
_UNROTATE = {0: (0, 1, 2, 3, 4), 1: (0, 2, 1, 3, 4), 2: (0, 2, 3, 1, 4)}


def axis_rotate(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    if axis == 0:
        return u
    return jnp.stack([u[i] for i in _ROTATE[axis]])


def axis_unrotate(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    if axis == 0:
        return f
    return jnp.stack([f[i] for i in _UNROTATE[axis]])


@functools.partial(jax.jit, static_argnames=("spec", "gamma", "flux"))
def inner_divergence(u: jnp.ndarray, volumes: jnp.ndarray,
                     spec: SubgridSpec, gamma: float, flux: str):
    """Interior cell-face flux divergence: [5, *ext, Ecap] -> same shape,
    plus the max interior wave speed (standalone u-based entry; the fused
    path in flux_divergence shares precomputed fields across stages)."""
    from t8gpu_tpu.ops.euler import cell_fields_tuple, maybe_barrier
    q = maybe_barrier(cell_fields_tuple(u, gamma, flux))
    return inner_divergence_fields(q, volumes, spec, gamma, flux)


def inner_divergence_fields(q: tuple, volumes: jnp.ndarray,
                            spec: SubgridSpec, gamma: float, flux: str):
    """Interior cell-face flux divergence from precomputed cell fields
    (tuple of C rows, each [*ext, Ecap]) -> (D [5, *ext, Ecap], max
    interior wave speed).

    For each axis, KEPES/HLL fluxes on the ext-1 interior interfaces are
    computed from shifted slices and accumulated as D[i] += f[i-1] - f[i]
    (cell surface = (V^(1/dim)/ext)^(dim-1), ref kernels.inl:351-355).
    The E-minor layout keeps every op full-lane-width; the tuple fields
    formulation removes all per-face logs (ops/euler.cell_fields_tuple)
    and makes the face-frame rotation a free row permutation."""
    dim = spec.dim
    ext = spec.extent
    h_cell = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim) / ext
    surface = (h_cell ** (dim - 1)) * (volumes > 0)         # [Ecap], minor

    D = jnp.zeros((5,) + q[0].shape, q[0].dtype)
    speed = jnp.zeros((), q[0].dtype)
    for a in range(dim):
        ax = 1 + a
        q_rot = fields_axis_rotate(q, a)
        q_l = tuple(jax.lax.slice_in_dim(r, 0, ext - 1, axis=a)
                    for r in q_rot)
        q_r = tuple(jax.lax.slice_in_dim(r, 1, ext, axis=a) for r in q_rot)
        f, sp = fields_flux(q_l, q_r, gamma=gamma, flux=flux)
        f = axis_unrotate(f, a) * surface
        pad_lo = [(0, 0)] * f.ndim
        pad_hi = [(0, 0)] * f.ndim
        pad_lo[ax] = (1, 0)   # f[i-1] lands on cell i
        pad_hi[ax] = (0, 1)   # f[i]   leaves  cell i
        D = D + jnp.pad(f, pad_lo) - jnp.pad(f, pad_hi)
        speed = jnp.maximum(speed, (sp * (surface > 0)).max())
    return D, speed


def _slab_add(D: jnp.ndarray, contrib: jnp.ndarray, axis: int, layer_hi: bool,
              spec: SubgridSpec) -> jnp.ndarray:
    """Add a boundary-layer contribution [5, ext^(dim-1) * Ecap] into the
    full block divergence [5, *ext, Ecap] at the axis' first/last layer —
    a DENSE pad+add (no scatter)."""
    dim = spec.dim
    ext = spec.extent
    tshape = (contrib.shape[0],) + (ext,) * (dim - 1) + (-1,)
    contrib = contrib.reshape(tshape)
    contrib = jnp.expand_dims(contrib, 1 + axis)
    pad = [(0, 0)] * contrib.ndim
    pad[1 + axis] = (ext - 1, 0) if layer_hi else (0, ext - 1)
    return D + jnp.pad(contrib, pad)


def _upsample2(x: jnp.ndarray, tangent_axes) -> jnp.ndarray:
    for ax in tangent_axes:
        x = jnp.repeat(x, 2, axis=ax)
    return x


def _gather_layers(opp_layer: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor layer slabs: [5, *t_ext, E] x nbr [E', M]
    -> [5, *t_ext, E', M].

    TPU-critical: XLA gathers along the minor (lane) axis of a
    multi-dimensional operand fall off a ~30x-slower path (measured
    9.8 ms vs 0.33 ms for the same 10M elements); transposing the slab to
    row-major [E, payload] first makes every gathered slice contiguous.
    """
    lead = opp_layer.shape[:-1]
    E = opp_layer.shape[-1]
    rows = opp_layer.reshape(-1, E).T            # [E, P] contiguous payload
    g = rows[nbr]                                # [E', M, P]
    g = jnp.moveaxis(g, -1, 0)                   # [P, E', M]
    return g.reshape(lead + nbr.shape)


def _fine_interleave(nb: jnp.ndarray, spec: SubgridSpec) -> jnp.ndarray:
    """Finer-neighbor layers [C, *t_ext, E, M] -> virtual fine tiling
    [C, *(2 ext), E], quadrant-major per tangent axis (tf = q*ext + c)."""
    ext = spec.extent
    C = nb.shape[0]
    if spec.dim - 1 == 1:
        q = nb.reshape(nb.shape[:-1] + (2,))          # [C, t0, E, b0]
        fine = jnp.moveaxis(q, -1, 1)                 # [C, b0, t0, E]
        return fine.reshape(C, 2 * ext, -1)
    q = nb.reshape(nb.shape[:-1] + (2, 2))            # [C, t0, t1, E, b1, b0]
    fine = jnp.moveaxis(q, (-1, -2), (1, 3))          # [C, b0, t0, b1, t1, E]
    return fine.reshape(C, 2 * ext, 2 * ext, -1)


def _coarse_window(base: jnp.ndarray, bits: jnp.ndarray,
                   spec: SubgridSpec) -> jnp.ndarray:
    """Coarser-neighbor layer [5, *t_ext, E] -> my-resolution sample
    [5, *t_ext, E]: select the per-element tangent half-window, then
    replicate 2x per axis (t -> off + t//2)."""
    ext = spec.extent
    n_t = spec.dim - 1
    cw = base
    for ti in range(n_t):
        ax = 1 + ti
        lower = jax.lax.slice_in_dim(cw, 0, ext // 2, axis=ax)
        upper = jax.lax.slice_in_dim(cw, ext // 2, ext, axis=ax)
        b = bits[:, ti].reshape((1,) * (cw.ndim - 1) + (-1,))
        cw = jnp.where(b > 0, upper, lower)
    return _upsample2(cw, tuple(range(1, 1 + n_t)))


def _pool2(f: jnp.ndarray, n_t: int) -> jnp.ndarray:
    """Sum 2x virtual subfaces per tangent axis back onto layer cells."""
    for ti in range(n_t):
        shape = (f.shape[: 1 + ti] + (f.shape[1 + ti] // 2, 2)
                 + f.shape[2 + ti:])
        f = f.reshape(shape).sum(axis=2 + ti)
    return f


def outer_apply(D: jnp.ndarray, q: tuple,
                conn: SubgridConnectivity, spec: SubgridSpec,
                volumes: jnp.ndarray, gamma: float, flux: str,
                exclude_equal: bool = False):
    """Add mesh-face fluxes into the block divergence [5, *ext, Ecap] via
    the slab-exchange scheme (see SubgridConnectivity): per element side,
    gather neighbor layer slabs (one row-contiguous gather), evaluate the
    subfaces densely, and pad-add into the boundary layer.  No scatters,
    no per-cell gathers — the TPU replacement for the reference's per-face
    kernel + atomicAdd (kernels.inl:664-911).

    `q` is the precomputed cell-fields tuple (C rows of [*ext, Ecap],
    ops/euler.cell_fields_tuple) shared with the inner stencil; only the
    boundary-layer slabs are stacked for the gather.  The 2:1
    interpolation steps (_coarse_window half-window select + replicate,
    _fine_interleave quadrant reorder) are pure cell selections — no
    arithmetic on states — so applying them to precomputed fields is
    exact.

    Two passes per side: pass 1 at MY layer resolution covers equal and
    coarser neighbors exactly; pass 2 at virtual fine (2x) resolution
    covers finer neighbors and is compiled away entirely when the side has
    none (conn.has_fine — always on uniform meshes).
    Returns (D, max speed)."""
    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    t_axes = tuple(range(1, 1 + n_t))
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    area_t = (h_e / ext) ** n_t                          # [E] physical cell face
    area_v = area_t / (2 ** n_t)                         # virtual fine subface
    speed = jnp.zeros((), q[0].dtype)

    for a in range(dim):
        q_rot = fields_axis_rotate(q, a)                 # tuple: free
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            if exclude_equal and not (conn.has_coarse[k]
                                      or conn.has_fine[k]):
                continue        # only equal-level faces on this side
            nbr, rel, bits, mask = (conn.nbr[k], conn.rel[k],
                                    conn.bits[k], conn.mask[k])
            hi = sign > 0
            my_layer = jnp.stack([
                jax.lax.index_in_dim(r, ext - 1 if hi else 0, axis=a,
                                     keepdims=False) for r in q_rot])
            opp_layer = jnp.stack([
                jax.lax.index_in_dim(r, 0 if hi else ext - 1, axis=a,
                                     keepdims=False) for r in q_rot])
            # sides without finer neighbors only ever read quadrant 0 —
            # gather a single neighbor column (4x less traffic in 3D)
            nb = _gather_layers(opp_layer,
                                nbr if conn.has_fine[k] else nbr[:, :1])
            base = nb[..., 0]

            # ---- pass 1: my resolution (equal + coarser neighbors) -------
            contrib = None
            if not (exclude_equal and not conn.has_coarse[k]):
                r = rel.reshape((1,) * (base.ndim - 1) + (-1,))
                other = (jnp.where(r < 0, _coarse_window(base, bits, spec),
                                   base)
                         if conn.has_coarse[k] else base)
                q_l, q_r = (my_layer, other) if hi else (other, my_layer)
                f, sp = fields_flux(q_l, q_r, gamma=gamma, flux=flux)
                w1 = mask * area_t * ((rel < 0) if exclude_equal
                                      else (rel <= 0))
                f = (axis_unrotate(f, a)
                     * w1.reshape((1,) * (f.ndim - 1) + (-1,)))
                contrib = -f if hi else f
                sp_m = (w1 > 0).reshape((1,) * (f.ndim - 2) + (-1,))
                speed = jnp.maximum(speed, (sp * sp_m).max())

            # ---- pass 2: virtual fine resolution (finer neighbors) -------
            if conn.has_fine[k]:
                fine = _fine_interleave(nb, spec)        # [C, *(2ext), E]
                mine = _upsample2(my_layer, t_axes)
                q_l, q_r = (mine, fine) if hi else (fine, mine)
                f2, sp2 = fields_flux(q_l, q_r, gamma=gamma, flux=flux)
                w2 = mask * area_v * (rel > 0)
                f2 = (axis_unrotate(f2, a)
                      * w2.reshape((1,) * (f2.ndim - 1) + (-1,)))
                f2 = _pool2(f2, n_t)
                f2 = -f2 if hi else f2
                contrib = f2 if contrib is None else contrib + f2
                sp_m2 = (w2 > 0).reshape((1,) * (f2.ndim - 2) + (-1,))
                speed = jnp.maximum(speed, (sp2 * sp_m2).max())

            if contrib is not None:
                D = _slab_add(D, contrib.reshape(5, -1), a, layer_hi=hi,
                              spec=spec)
    return D, speed


def _wall_masks(conn, spec: SubgridSpec, volumes: jnp.ndarray):
    """Per side, 1.0 where a REAL element's side is a reflective wall
    (side-table mask 0 on a live element), else 0.  Walls ride the fused
    kernels as ordinary end faces whose neighbor layer is the MIRRORED own
    facing layer (the reference folds walls into its per-face kernels the
    same way, kernels.inl:913-1107)."""
    if not conn.b_groups:
        return None
    live = (volumes > 0).astype(volumes.dtype)
    return tuple((conn.mask[k] == 0) * live for k in range(2 * spec.dim))


def _mirror_rows(layer: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mirror a facing layer across its wall: negate the normal velocity /
    momentum row (row 1 + axis in unrotated row layout).  Exact for both
    5-row states and cell-fields rows (rho, p, logs, ke are invariant)."""
    neg = layer[1 + axis] * -1.0
    return jnp.concatenate(
        [layer[: 1 + axis], neg[None], layer[2 + axis:]], axis=0)


def pallas_side_inputs(q: tuple, conn, spec: SubgridSpec,
                       volumes: jnp.ndarray, q_ext: tuple | None = None,
                       dt_inv=None, ghost_fields=None):
    """Inputs for ops.pallas_kernels.fused_flux_pallas: per side the
    RESOLVED equal/coarse neighbor facing layer (gather + coarse-window,
    identical to outer_apply pass 1) in unrotated field rows
    [C, *t_ext, E], plus the packed per-element weights [8, E]
    (row 0 = interior cell surface, rows 1+k = side-k mesh-face weight,
    wall sides carrying the wall area with a mirrored own layer — or the
    prescribed exterior state's field rows when `ghost_fields`
    (farfield_field_rows) is given: open boundaries).

    `q_ext` supplies the gather source rows when the element axis is
    extended with received halo blocks (the sharded path); defaults to q.
    """
    dim = spec.dim
    ext = spec.extent
    if q_ext is None:
        q_ext = q
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    h_cell = h_e / ext
    surface = (h_cell ** (dim - 1)) * (volumes > 0)
    area_t = (h_e / ext) ** (dim - 1)
    walls = _wall_masks(conn, spec, volumes)

    others = []
    w_rows = [surface]
    for a in range(dim):
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            nbr, rel, bits, mask = (conn.nbr[k], conn.rel[k],
                                    conn.bits[k], conn.mask[k])
            hi = sign > 0
            opp_layer = jnp.stack([
                jax.lax.index_in_dim(r, 0 if hi else ext - 1, axis=a,
                                     keepdims=False) for r in q_ext])
            # pass 1 only ever reads quadrant 0 (the fine pass re-gathers)
            nb = _gather_layers(opp_layer, nbr[:, :1])
            base = nb[..., 0]
            if conn.has_coarse[k]:
                r_b = rel.reshape((1,) * (base.ndim - 1) + (-1,))
                base = jnp.where(r_b < 0, _coarse_window(base, bits, spec),
                                 base)
            w = mask * area_t * (rel <= 0)
            if walls is not None:
                wall_b = walls[k].reshape((1,) * (base.ndim - 1) + (-1,))
                if ghost_fields is not None:
                    sub = jnp.stack([
                        jnp.broadcast_to(
                            g.reshape((1,) * (base.ndim - 1)),
                            base.shape[1:])
                        for g in ghost_fields])
                else:
                    own_layer = jnp.stack([
                        jax.lax.index_in_dim(r, ext - 1 if hi else 0,
                                             axis=a, keepdims=False)
                        for r in q])
                    sub = _mirror_rows(own_layer, a)
                base = jnp.where(wall_b > 0, sub, base)
                w = w + walls[k] * area_t
            others.append(base)
            w_rows.append(w)
    while len(w_rows) < 7:           # fixed [8, E] block for the kernel
        w_rows.append(jnp.zeros_like(surface))
    # row 7: dt * inv_cell_volume for the RK-stage kernels (zero for the
    # D-kernel, which ignores it)
    w_rows.append(dt_inv if dt_inv is not None
                  else jnp.zeros_like(surface))
    return tuple(others), jnp.stack(w_rows)


def muscl_side_inputs(u: jnp.ndarray, conn, spec: SubgridSpec,
                      volumes: jnp.ndarray, u_src: jnp.ndarray = None):
    """Inputs for ops.pallas_kernels.fused_muscl_pallas: per side the
    EQUAL-LEVEL neighbor's edge + second facing layers as ONE stacked
    [10, *t_ext, E] state slab (quadrant-0 gather — the same tables and
    layer selection as muscl_core, one gather for both layers), plus the
    packed per-element weights [8, E] (row 0 = interior cell surface,
    rows 1+k = side-k equal-face weight mask*area*(rel==0); the kernel
    derives the slope eq mask from w > 0).  Hanging faces and walls are
    NOT included — callers add the first-order closure XLA-side
    (outer_apply exclude_equal + boundary_apply), exactly mirroring the
    XLA MUSCL path.  `u_src` supplies the gather source when the element
    axis is halo-extended (the sharded path); defaults to u."""
    dim = spec.dim
    ext = spec.extent
    if u_src is None:
        u_src = u
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    h_cell = h_e / ext
    surface = (h_cell ** (dim - 1)) * (volumes > 0)
    area_t = h_cell ** (dim - 1)
    # row-generic: 5-row Euler states or 9-row GLM-MHD states (the
    # stacked side slab is then [2C, *t_ext, E])
    u_rows = tuple(u_src[i] for i in range(u.shape[0]))

    others = []
    w_rows = [surface]
    for a in range(dim):
        for s_i, hi in ((0, True), (1, False)):
            k = 2 * a + s_i
            nbr1 = conn.nbr[k][:, :1]       # quadrant 0: equal/coarse slot
            e_idx, s_idx = (0, 1) if hi else (ext - 1, ext - 2)
            lay = jnp.stack(
                [jax.lax.index_in_dim(r, e_idx, axis=a, keepdims=False)
                 for r in u_rows]
                + [jax.lax.index_in_dim(r, s_idx, axis=a, keepdims=False)
                   for r in u_rows])
            others.append(_gather_layers(lay, nbr1)[..., 0])
            w_rows.append(conn.mask[k] * area_t * (conn.rel[k] == 0))
    while len(w_rows) < 8:           # fixed [8, E] block for the kernel
        w_rows.append(jnp.zeros_like(surface))
    return tuple(others), jnp.stack(w_rows)


def _state_side_layers(u: jnp.ndarray, conn, spec: SubgridSpec,
                       volumes: jnp.ndarray, u_ext: jnp.ndarray = None,
                       ghost: jnp.ndarray = None):
    """Per side, the RESOLVED equal/coarse neighbor facing layer as 5-row
    STATE slabs [5, *t_ext, E] (the RK-fused kernel derives their fields
    in VMEM).  The coarse-window resolution is a pure cell selection, so
    applying it to states is exact.  Boundary sides get the mirrored own
    facing layer (negated normal momentum, ref kernels.inl:913-1107) —
    or, when `ghost` ([C] farfield state rows, farfield_state_rows) is
    given, the prescribed exterior state (open boundaries).
    `u_ext` supplies the gather source (extended element axis in the
    sharded path); defaults to u."""
    ext = spec.extent
    if u_ext is None:
        u_ext = u
    C = u.shape[0]          # 5 state rows, or 7 with appended log rows
    u_rows = tuple(u_ext[i] for i in range(C))
    own_rows = tuple(u[i] for i in range(C))
    walls = _wall_masks(conn, spec, volumes)
    others = []
    for a in range(spec.dim):
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            hi = sign > 0
            opp_layer = jnp.stack([
                jax.lax.index_in_dim(r, 0 if hi else ext - 1, axis=a,
                                     keepdims=False) for r in u_rows])
            nb = _gather_layers(opp_layer, conn.nbr[k][:, :1])
            base = nb[..., 0]
            if conn.has_coarse[k]:
                r_b = conn.rel[k].reshape((1,) * (base.ndim - 1) + (-1,))
                base = jnp.where(r_b < 0,
                                 _coarse_window(base, conn.bits[k], spec),
                                 base)
            if walls is not None:
                wall_b = walls[k].reshape((1,) * (base.ndim - 1) + (-1,))
                if ghost is not None:
                    sub = ghost.reshape((C,) + (1,) * (base.ndim - 1))
                else:
                    own_layer = jnp.stack([
                        jax.lax.index_in_dim(r, ext - 1 if hi else 0,
                                             axis=a, keepdims=False)
                        for r in own_rows])
                    sub = _mirror_rows(own_layer, a)
                base = jnp.where(wall_b > 0, sub, base)
            others.append(base)
    return tuple(others)


def rk_weights(conn, spec: SubgridSpec,
               volumes: jnp.ndarray, dt, inv_cell_volume: jnp.ndarray):
    """Packed per-element weights [8, E] for the RK-fused kernel:
    row 0 interior cell surface, rows 1..6 side mesh-face weights
    (incl. wall areas on wall sides), row 7 = dt * inv_cell_volume."""
    dim = spec.dim
    ext = spec.extent
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    h_cell = h_e / ext
    surface = (h_cell ** (dim - 1)) * (volumes > 0)
    area_t = (h_e / ext) ** (dim - 1)
    walls = _wall_masks(conn, spec, volumes)
    rows = [surface]
    for k in range(2 * dim):
        w = conn.mask[k] * area_t * (conn.rel[k] <= 0)
        if walls is not None:
            w = w + walls[k] * area_t
        rows.append(w)
    while len(rows) < 7:             # fixed layout: dt always in row 7
        rows.append(jnp.zeros_like(surface))
    rows.append(dt * inv_cell_volume)
    return jnp.stack(rows)


def viscous_weight_rows(conn, spec: SubgridSpec,
                        volumes: jnp.ndarray) -> jnp.ndarray:
    """Packed per-element viscous side table [8, E] for the fused RK
    stage kernel (ops/pallas_kernels._tile_viscous_divergence): row 0 the
    guarded subgrid cell size h (1.0 on dead slots — it is only ever
    used as a reciprocal), rows 1..2*dim the per-side equal-level
    weights mask*(rel==0) — 0 at walls (zero viscous wall flux,
    free-slip adiabatic) and on dead slots, exactly the weights of the
    XLA pass (ops/subgrid_viscous.viscous_divergence)."""
    dim = spec.dim
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    h_cell = h_e / spec.extent
    rows = [jnp.where(volumes > 0, h_cell, 1.0)]
    for k in range(2 * dim):
        rows.append((conn.mask[k] * (conn.rel[k] == 0))
                    .astype(volumes.dtype))
    while len(rows) < 8:
        rows.append(jnp.zeros_like(h_cell))
    return jnp.stack(rows)


def _expand_compact(contrib: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """Compact per-fine-element rows [5, *t_ext, K] -> dense [5, *t_ext, E]
    via the inverse position map (sentinel K -> zero row).  Row-major
    transpose-then-gather, like _gather_layers."""
    lead = contrib.shape[:-1]
    K = contrib.shape[-1]
    rows = contrib.reshape(-1, K).T                  # [K, P]
    rows = jnp.concatenate([rows, jnp.zeros((1, rows.shape[1]),
                                            rows.dtype)])
    dense = rows[inv]                                # [E, P]
    return jnp.moveaxis(dense, -1, 0).reshape(lead + inv.shape)


def fine_side_extras(u: jnp.ndarray, conn, spec: SubgridSpec,
                     volumes: jnp.ndarray, gamma: float, flux: str,
                     u_ext: jnp.ndarray = None):
    """XLA-computed hanging-fine (2:1) side-layer divergences for the
    RK-fused kernel: per side with finer neighbors, the additive
    contribution [5, *t_ext, E] to that side's boundary layer (the
    virtual-fine pass of outer_apply evaluated on STATES, since the
    RK-fused path never materializes cell fields outside the kernel).

    Runs on the COMPACT fine-element axis (conn.fine_idx: only elements
    that actually face finer neighbors) and expands by row gather —
    O(level-boundary) work instead of O(all elements): the dense pass
    measured 4x the whole step cost on a band-refined flagship mesh.
    Returns (extra_sides, extras, max_speed).  Compiled away entirely on
    uniform meshes (conn.has_fine all False)."""
    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    t_axes = tuple(range(1, 1 + n_t))
    if u_ext is None:
        u_ext = u
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    area_v = (h_e / ext) ** n_t / (2 ** n_t)
    u_rows = tuple(u_ext[i] for i in range(5))
    own_rows = tuple(u[i] for i in range(5))
    sides, extras = [], []
    speed = jnp.zeros((), u.dtype)
    for a in range(dim):
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            if not conn.has_fine[k]:
                continue
            idxk = conn.fine_idx[k]                  # [K]
            hi = sign > 0
            my_full = jnp.stack([
                jax.lax.index_in_dim(r, ext - 1 if hi else 0, axis=a,
                                     keepdims=False) for r in own_rows])
            my_layer = _gather_layers(my_full, idxk[:, None])[..., 0]
            opp_layer = jnp.stack([
                jax.lax.index_in_dim(r, 0 if hi else ext - 1, axis=a,
                                     keepdims=False) for r in u_rows])
            nb = _gather_layers(opp_layer, conn.nbr[k][idxk])
            fine = _fine_interleave(nb, spec)
            mine = _upsample2(my_layer, t_axes)
            u_l, u_r = (mine, fine) if hi else (fine, mine)
            f2, sp2 = numerical_flux(axis_rotate(u_l, a), axis_rotate(u_r, a),
                                     gamma=gamma, flux=flux)
            w2 = (conn.mask[k] * area_v * (conn.rel[k] > 0))[idxk]
            f2 = (axis_unrotate(f2, a)
                  * w2.reshape((1,) * (f2.ndim - 1) + (-1,)))
            f2 = _pool2(f2, n_t)
            sp_m2 = (w2 > 0).reshape((1,) * (f2.ndim - 2) + (-1,))
            speed = jnp.maximum(speed, (sp2 * sp_m2).max())
            sides.append(k)
            extras.append(_expand_compact(-f2 if hi else f2,
                                          conn.fine_inv[k]))
    return tuple(sides), tuple(extras), speed


def can_fuse_rk(conn, spec: SubgridSpec) -> bool:
    """The RK-fused kernel now covers walls (mirrored side layers) and
    hanging-fine faces (additive side extras) — any balanced mesh with a
    supported block extent qualifies."""
    return spec.extent in (4, 8)


# What the RK stage kernels take per stage: "state" derives cell fields
# IN VMEM from 5-row state + neighbor state layers (every element also
# re-derives its 2*dim neighbors' facing-layer fields: ~1.75x the field
# transcendentals); "fields" has XLA compute the stacked fields once per
# stage and the kernel consumes field layers directly (1.0x the logs, at
# ~2x the state HBM read).  Measured on v5e with the 2-divide KEPES
# formulation: fields mode is ~2.5x SLOWER (2.44 vs 0.90 ms on the 2D
# 1M-cell config) — the extra HBM traffic outweighs the saved logs once
# the divide count drops — so "state" is the default; "fields" is kept
# as a measured negative result.  "logs" is the middle ground: XLA
# precomputes ONLY the 2 log rows (kepes), the kernel reads [7, ...] and
# derives fields log-free — +40% state reads for 1.75x fewer
# transcendental evaluations.  Measured on v5e (3D flagship, quiet-host
# 200-step slopes): 7.02 ms vs 5.32 ms state — ALSO a negative result:
# the extra XLA append pass + 7-row side-layer gathers cost more than
# the saved logs (the kernel is bound by total VPU op issue, and Mosaic
# overlaps the in-VMEM transcendentals better than an extra HBM pass).
# Process-level switch, read at trace time; supported by both the
# single-device and sharded (shard_map) fused paths.
RK_STAGE_INPUTS = "state"


def append_log_rows(u: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """[5, ...] conserved state -> [7, ...] with appended [log rho, log p]
    rows (the RK_STAGE_INPUTS="logs" kernel input: XLA evaluates the 2
    transcendentals once per cell; the kernel derives every field log-free,
    including the duplicated neighbor facing layers)."""
    gm1 = gamma - 1.0
    rho, m1, m2, m3, e = (u[i] for i in range(5))
    inv_rho = 1.0 / rho
    ke = 0.5 * (m1 * m1 + m2 * m2 + m3 * m3) * (inv_rho * inv_rho)
    p = gm1 * (e - rho * ke)
    return jnp.concatenate([u, jnp.log(rho)[None], jnp.log(p)[None]], axis=0)


def ssp_rk3_fused(u: jnp.ndarray, volumes: jnp.ndarray,
                  conn, spec: SubgridSpec,
                  gamma: float, flux: str, dt, inv_cell_volume: jnp.ndarray,
                  mu: float = 0.0, prandtl: float = 0.72,
                  wall: str = "slip", wall_velocity=(0.0, 0.0, 0.0),
                  wall_temperature=None, farfield=None,
                  gravity=(0.0, 0.0, 0.0)):
    """One SSP-RK3 step with every stage as ONE RK-fused Pallas kernel
    call: flux + divergence + stage update all in VMEM; between stages
    XLA regathers the 2*dim neighbor layer slabs (plus the hanging-fine
    side extras on AMR meshes).  Preconditions: can_fuse_rk.
    RK_STAGE_INPUTS selects the state- or fields-input stage kernel.
    mu > 0 adds the in-VMEM Navier-Stokes divergence (equal-level faces;
    the hanging 2:1 viscous fluxes ride the same additive `extras` input
    as the advective virtual-fine pass —
    ops/subgrid_viscous.viscous_hanging_sides) and folds the diffusive
    dt rate into the returned speed (summed,
    ops/viscous.viscous_speed_bound rationale); the state-input kernel
    is forced then (the fields layout has no cheap primitive recovery
    path for the side layers)."""
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
    # the fields-input stage kernel has no primitive-recovery path for
    # viscous terms or the in-kernel gravity source: force state mode
    use_fields = RK_STAGE_INPUTS == "fields" and not viscous and not has_grav
    use_logs = RK_STAGE_INPUTS == "logs" and flux == "kepes"
    wv = (viscous_weight_rows(conn, spec, volumes) if viscous else None)
    if not use_fields:
        w = rk_weights(conn, spec, volumes, dt, inv_cell_volume)

    any_hang = any_fine or any(conn.has_coarse)
    noslip = viscous and wall == "noslip" and bool(conn.b_groups)
    ghost5 = ghost7 = ghost_q = None
    if farfield is not None and conn.b_groups:
        ghost5 = farfield_state_rows(farfield, gamma, 5, u.dtype)
        ghost7 = (farfield_state_rows(farfield, gamma, 7, u.dtype)
                  if use_logs else None)
        ghost_q = (farfield_field_rows(farfield, gamma, flux, u.dtype)
                   if use_fields else None)

    def stage(u_stage, u_prev, coeffs):
        if any_fine:
            sides, extras, sp_f = fine_side_extras(
                u_stage, conn, spec, volumes, gamma, flux)
        else:
            sides, extras, sp_f = (), (), jnp.zeros((), u.dtype)
        if viscous and (any_hang or noslip):
            # hanging 2:1 + no-slip wall viscous fluxes: merged into the
            # same additive side-layer extras the advective virtual-fine
            # pass uses
            from t8gpu_tpu.ops.subgrid_viscous import merge_viscous_extras
            sides, extras = merge_viscous_extras(
                sides, extras, u_stage, volumes, conn, spec, gamma, mu,
                prandtl, wall, wall_velocity, wall_temperature)
        if use_logs:
            # XLA evaluates the 2 transcendentals once per cell; the
            # kernel consumes [7, ...] (state + log rho + log p) and
            # derives all fields log-free (incl. the neighbor layers)
            u7 = append_log_rows(u_stage, gamma)
            others = _state_side_layers(u7, conn, spec, volumes,
                                        ghost=ghost7)
            u_n, sp = fused_rk_stage_pallas(u7, u_prev, w, others,
                                            gamma=gamma, flux=flux,
                                            coeffs=coeffs, interpret=interp,
                                            extra_sides=sides, extras=extras,
                                            viscous_weights=wv,
                                            mu=float(mu), prandtl=float(prandtl),
                                            gravity=grav)
        elif use_fields:
            q = cell_fields_tuple(u_stage, gamma, flux)
            others, w_q = pallas_side_inputs(q, conn, spec, volumes,
                                             dt_inv=dt * inv_cell_volume,
                                             ghost_fields=ghost_q)
            u_n, sp = fused_rk_stage_fields_pallas(
                jnp.stack(q), u_prev, w_q, others, gamma=gamma, flux=flux,
                coeffs=coeffs, interpret=interp,
                extra_sides=sides, extras=extras)
        else:
            others = _state_side_layers(u_stage, conn, spec, volumes,
                                        ghost=ghost5)
            u_n, sp = fused_rk_stage_pallas(u_stage, u_prev, w, others,
                                            gamma=gamma, flux=flux,
                                            coeffs=coeffs, interpret=interp,
                                            extra_sides=sides, extras=extras,
                                            viscous_weights=wv,
                                            mu=float(mu), prandtl=float(prandtl),
                                            gravity=grav)
        return u_n, jnp.maximum(sp.max(), sp_f)

    # stage 1: u_prev == u, passed as None so the kernel reads ONE state
    u1, sp = stage(u, None, (1.0, 0.0, 1.0))
    u2, _ = stage(u1, u, STAGE_2)
    u3, _ = stage(u2, u, STAGE_3)
    if viscous:
        # diffusive dt rate, SUMMED into the CFL speed (same bound as
        # models/subgrid_euler._base_flux_fn's XLA closure)
        dim = spec.dim
        live = volumes > 0
        rho_min = jnp.where(live, u[0].min(
            axis=tuple(range(u.ndim - 2))), jnp.inf).min()
        h_min = (jnp.where(live, volumes, jnp.inf).min()
                 ** (1.0 / dim)) / spec.extent
        nu = (float(mu) / rho_min) * max(1.0, gamma / float(prandtl))
        sp = sp + 2.0 * dim * nu / h_min
    return u3, sp


def outer_fine_apply(D: jnp.ndarray, q: tuple,
                     conn: SubgridConnectivity, spec: SubgridSpec,
                     volumes: jnp.ndarray, gamma: float, flux: str):
    """ONLY the virtual-fine (hanging 2:1) pass of outer_apply — the
    additive term the fused Pallas kernel leaves to XLA.  Compiled away
    entirely on uniform meshes (conn.has_fine all False)."""
    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    t_axes = tuple(range(1, 1 + n_t))
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    area_v = (h_e / ext) ** n_t / (2 ** n_t)
    speed = jnp.zeros((), q[0].dtype)
    for a in range(dim):
        q_rot = fields_axis_rotate(q, a)
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            if not conn.has_fine[k]:
                continue
            nbr, rel, mask = conn.nbr[k], conn.rel[k], conn.mask[k]
            hi = sign > 0
            my_layer = jnp.stack([
                jax.lax.index_in_dim(r, ext - 1 if hi else 0, axis=a,
                                     keepdims=False) for r in q_rot])
            opp_layer = jnp.stack([
                jax.lax.index_in_dim(r, 0 if hi else ext - 1, axis=a,
                                     keepdims=False) for r in q_rot])
            nb = _gather_layers(opp_layer, nbr)
            fine = _fine_interleave(nb, spec)
            mine = _upsample2(my_layer, t_axes)
            q_l, q_r = (mine, fine) if hi else (fine, mine)
            f2, sp2 = fields_flux(q_l, q_r, gamma=gamma, flux=flux)
            w2 = mask * area_v * (rel > 0)
            f2 = (axis_unrotate(f2, a)
                  * w2.reshape((1,) * (f2.ndim - 1) + (-1,)))
            f2 = _pool2(f2, n_t)
            contrib = -f2 if hi else f2
            sp_m2 = (w2 > 0).reshape((1,) * (f2.ndim - 2) + (-1,))
            speed = jnp.maximum(speed, (sp2 * sp_m2).max())
            D = _slab_add(D, contrib.reshape(5, -1), a, layer_hi=hi,
                          spec=spec)
    return D, speed


def farfield_state_rows(farfield, gamma: float, n_rows: int, dtype):
    """Ghost STATE column [C] for open (farfield) boundaries on the
    subgrid scheme: the prescribed exterior primitive (rho, vx, vy, vz,
    p) as conservative rows, plus [log rho, log p] when the logs RK
    variant reads 7-row states.  The plain-path analogue is
    ops/fluxes.farfield_ghost_fields."""
    import numpy as np
    rho, vx, vy, vz, p = (float(x) for x in farfield)
    e = p / (gamma - 1.0) + 0.5 * rho * (vx * vx + vy * vy + vz * vz)
    rows = [rho, rho * vx, rho * vy, rho * vz, e]
    if n_rows == 7:
        rows += [np.log(rho), np.log(p)]
    return jnp.asarray(np.array(rows, np.float64), dtype)


def farfield_field_rows(farfield, gamma: float, flux: str, dtype):
    """Ghost cell-FIELD rows (tuple of [1] arrays) of the prescribed
    exterior state — the ghost operand for the fields-consuming paths
    (pallas_side_inputs, boundary_apply)."""
    from t8gpu_tpu.ops.euler import cell_fields_tuple
    u = farfield_state_rows(farfield, gamma, 5, dtype)[:, None]
    return cell_fields_tuple(tuple(u[i] for i in range(5)), gamma, flux)


def boundary_apply(D: jnp.ndarray, q_flat: tuple,
                   conn: SubgridConnectivity, spec: SubgridSpec,
                   gamma: float, flux: str, ghost_fields=None):
    """Boundary fluxes added into the block divergence, gather-based.
    ghost_fields = None: reflective walls (mirror ghost: negated normal
    momentum, ref kernels.inl:913-1107).  ghost_fields = tuple of [1]
    field rows (UNROTATED frame): farfield/open boundaries — the ghost
    is the prescribed exterior state and the upwind flux sorts inflow
    from outflow by itself (ops/fluxes.boundary_fluxes_from_side has the
    plain-path analogue and the flux-family caveat).
    q_flat: precomputed cell-fields tuple, rows flattened to [cells]."""
    from t8gpu_tpu.ops.euler import fields_mirror
    speed = jnp.zeros((), q_flat[0].dtype)
    for (axis, sign), bc, ar, br in zip(conn.b_groups, conn.b_cell,
                                        conn.b_area, conn.b_recv):
        q_own = fields_axis_rotate(tuple(r[bc] for r in q_flat), axis)
        if ghost_fields is None:
            q_ghost = fields_mirror(q_own)
        else:
            q_ghost = fields_axis_rotate(
                tuple(jnp.broadcast_to(g, o.shape)
                      for g, o in zip(ghost_fields, q_own)), axis)
        if sign > 0:   # outward normal +axis: owner is the left state
            f, sp = fields_flux(q_own, q_ghost, gamma=gamma, flux=flux)
        else:          # outward normal -axis: in the +axis frame the owner
            f, sp = fields_flux(q_ghost, q_own, gamma=gamma, flux=flux)
        f = axis_unrotate(f, axis) * ar
        f_pad = jnp.concatenate([f, jnp.zeros((5, 1), f.dtype)], axis=1)
        c = f_pad[:, br]
        D = _slab_add(D, -c if sign > 0 else c, axis,
                      layer_hi=sign > 0, spec=spec)
        speed = jnp.maximum(speed, (sp * (ar > 0)).max())
    return D, speed


@functools.partial(jax.jit,
                   static_argnames=("spec", "gamma", "flux", "use_pallas",
                                    "farfield"))
def flux_divergence(u: jnp.ndarray, volumes: jnp.ndarray,
                    conn: SubgridConnectivity, spec: SubgridSpec,
                    gamma: float, flux: str, use_pallas=None,
                    farfield=None):
    """Full surface-flux divergence for the subgrid scheme:
    inner + outer + boundary.  u: [5, *ext, Ecap].  Returns (D, max_speed).

    All three stages share ONE per-cell fields computation
    (ops/euler.cell_fields_tuple), so the transcendental-heavy per-cell
    work is expressed once per evaluation.

    use_pallas selects the fused Pallas kernel (ops/pallas_kernels.
    fused_flux_pallas: interior + equal/coarse mesh faces + walls in one
    VMEM pass; hanging-fine fluxes stay an XLA-side additive pass).
    Extent-8 and extent-4 blocks (2D and 3D, the latter the reference's
    literal Subgrid<4,4(,4)>, main_3d.cu:34); other extents use the XLA
    stencil.  Default (None) = auto: the kernel on TPU backends, XLA
    elsewhere (measured on v5e: 8.4 vs 17.2 ms/step on the 2.1M-cell
    flagship)."""
    from t8gpu_tpu.ops.euler import cell_fields_tuple, maybe_barrier
    from t8gpu_tpu.ops.pallas_kernels import kernel_mode
    mode = kernel_mode()
    explicit = use_pallas
    if use_pallas is None:
        use_pallas = mode != "off"
    ghost_f = (farfield_field_rows(farfield, gamma, flux, u.dtype)
               if farfield is not None else None)
    q = maybe_barrier(cell_fields_tuple(u, gamma, flux))
    if use_pallas and spec.extent in (4, 8):
        from t8gpu_tpu.ops.pallas_kernels import fused_flux_pallas
        others, weights = pallas_side_inputs(q, conn, spec, volumes,
                                             ghost_fields=ghost_f)
        D, sp_e = fused_flux_pallas(jnp.stack(q), weights, others,
                                    gamma=gamma, flux=flux,
                                    interpret=mode == "interpret")
        sp_i = sp_e.max()
        # walls are in-kernel (mirrored side layers); only hanging-fine
        # subfaces remain an XLA-side additive pass
        D, sp_o = outer_fine_apply(D, q, conn, spec, volumes, gamma, flux)
    else:
        if explicit:
            # explicitly requested but shape-unsupported: the round-1
            # inner-only kernel (kept for comparison)
            from t8gpu_tpu.ops.pallas_kernels import inner_divergence_pallas
            D, sp_i = inner_divergence_pallas(u, volumes, spec, gamma, flux)
        else:
            D, sp_i = inner_divergence_fields(q, volumes, spec, gamma, flux)
        D, sp_o = outer_apply(D, q, conn, spec, volumes, gamma, flux)
        if conn.b_groups:
            D, sp_b = boundary_apply(D, tuple(r.reshape(-1) for r in q),
                                     conn, spec, gamma, flux,
                                     ghost_fields=ghost_f)
            sp_o = jnp.maximum(sp_o, sp_b)
    return D, jnp.maximum(sp_i, sp_o)


def _minmod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Minmod slope limiter: 0 at sign changes, the smaller-magnitude
    one-sided difference otherwise."""
    return jnp.where(a * b > 0.0,
                     jnp.sign(a) * jnp.minimum(jnp.abs(a), jnp.abs(b)),
                     jnp.zeros_like(a))


def flux_divergence_muscl(u: jnp.ndarray, volumes: jnp.ndarray,
                          conn: SubgridConnectivity, spec: SubgridSpec,
                          gamma: float, flux: str,
                          limiter: str = "minmod",
                          positivity: bool = True, farfield=None):
    """Second-order MUSCL flux divergence for the subgrid scheme
    (beyond-reference; the reference's subgrid kernels consume cell states
    directly, kernels.inl:335-911).  u: [5, *ext, Ecap] -> (D, max_speed).

    Scheme: per-axis minmod-limited linear reconstruction.  In-block
    interfaces use in-block one-sided differences; the block-edge cells'
    outward differences come from the EQUAL-LEVEL neighbor's facing layer
    (one extra layer-slab gather per side).  Equal-level mesh faces get
    full second order with both edge slopes built from the same four
    layers on both sides — the two elements compute the identical
    interface flux, so conservation is exact, like the first-order slab
    exchange.  Hanging (2:1) faces and walls fall back to the first-order
    closure (outer_apply's coarse/fine passes + boundary_apply): minmod
    against a zero outward difference makes the adjacent edge-cell slopes
    vanish, the standard practice at level jumps.

    The solver selects it via EulerConfig(order=2).  On TPU backends the
    interior + equal-face work runs as ONE fused Pallas kernel per
    evaluation (ops/pallas_kernels.fused_muscl_pallas: reconstruction,
    interface fields and fluxes all VMEM-resident, like the first-order
    fused path); the XLA stencil (muscl_core) is the fallback and the
    CPU-test surface."""
    from t8gpu_tpu.ops.euler import cell_fields_tuple, maybe_barrier
    from t8gpu_tpu.ops.pallas_kernels import kernel_mode

    # "<lim>-prim" selects primitive-space reconstruction (euler.prim_rows)
    lim_base, _, space = limiter.partition("-")
    space = space or "cons"
    mode = kernel_mode()
    if (mode != "off" and spec.extent in (4, 8)
            and lim_base in ("minmod", "none")):
        from t8gpu_tpu.ops.pallas_kernels import fused_muscl_pallas
        others, weights = muscl_side_inputs(u, conn, spec, volumes)
        D, sp_e = fused_muscl_pallas(u, weights, others, gamma=gamma,
                                     flux=flux, limiter=lim_base,
                                     positivity=positivity, space=space,
                                     interpret=mode == "interpret")
        speed = sp_e.max()
    else:
        D, speed = muscl_core(u, u, volumes, conn, spec, gamma, flux,
                              lim_base, positivity, space=space)

    # hanging (2:1) faces + walls: first-order closure, equal faces excluded
    q = maybe_barrier(cell_fields_tuple(u, gamma, flux))
    D, sp_o = outer_apply(D, q, conn, spec, volumes, gamma, flux,
                          exclude_equal=True)
    speed = jnp.maximum(speed, sp_o)
    if conn.b_groups:
        ghost_f = (farfield_field_rows(farfield, gamma, flux, u.dtype)
                   if farfield is not None else None)
        D, sp_b = boundary_apply(D, tuple(r.reshape(-1) for r in q),
                                 conn, spec, gamma, flux,
                                 ghost_fields=ghost_f)
        speed = jnp.maximum(speed, sp_b)
    return D, speed


def muscl_core(u: jnp.ndarray, u_src: jnp.ndarray, volumes, conn,
               spec: SubgridSpec, gamma: float, flux: str,
               limiter: str = "minmod", positivity: bool = True,
               space: str = "cons"):
    """The per-axis MUSCL machinery shared by the single-device and
    sharded subgrid paths: neighbor-layer gathers, limited slopes,
    in-block interfaces, and the second-order equal-level mesh faces.

    `u` holds the elements whose divergence is produced ([5, *ext, E]);
    `u_src` is the GATHER SOURCE for neighbor layers — the same array on
    one device, the halo-extended axis ([5, *ext, E+H]) per shard (the
    side tables' neighbor ids index u_src).  Returns (D [5, *ext, E],
    max speed); hanging faces/walls are NOT included (callers add the
    first-order closure with exclude_equal).

    This is the Euler instantiation of the ROW-GENERIC `muscl_core_rows`
    (which GLM-MHD rides with its 9-row permutation rotation and
    thermal-pressure guard, ops/subgrid_mhd.py)."""
    from t8gpu_tpu.ops.euler import (kepes_pair_flux, numerical_flux,
                                     prim_pair_fields, prim_rows,
                                     primitives)

    if space == "prim":
        # primitive-space reconstruction: slopes/limits/guards on
        # (rho, v, p) rows; fluxes stay conserved-space so the
        # divergence accumulation is unchanged
        if flux != "kepes":
            raise ValueError("primitive-space MUSCL ('<lim>-prim') "
                             "supports the kepes flux")
        w = jnp.stack(prim_rows(u, gamma))
        w_src = w if u_src is u else jnp.stack(prim_rows(u_src, gamma))

        def guard_p(w_rec, w_first):
            if not positivity:
                return w_rec
            ok = (w_rec[0] > 0.0) & (w_rec[4] > 0.0)
            return jnp.where(ok[None], w_rec, w_first)

        return muscl_core_rows(
            w, w_src, volumes, conn, spec, n_rows=5,
            rotate=axis_rotate, unrotate=axis_unrotate,
            iface=lambda l, r: kepes_pair_flux(
                prim_pair_fields(tuple(l)), prim_pair_fields(tuple(r)),
                gamma),
            guard=guard_p, limiter=limiter)

    def guard(u_rec, u_first):
        if not positivity:
            return u_rec
        _, p = primitives(u_rec, gamma)
        ok = (u_rec[0] > 0.0) & (p > 0.0)
        return jnp.where(ok[None], u_rec, u_first)

    return muscl_core_rows(
        u, u_src, volumes, conn, spec, n_rows=5,
        rotate=axis_rotate, unrotate=axis_unrotate,
        iface=lambda l, r: numerical_flux(l, r, gamma=gamma, flux=flux),
        guard=guard, limiter=limiter)


def muscl_core_rows(u: jnp.ndarray, u_src: jnp.ndarray, volumes, conn,
                    spec: SubgridSpec, *, n_rows: int, rotate, unrotate,
                    iface, guard, limiter: str = "minmod"):
    """Row-generic per-axis MUSCL core for the dense-block scheme:
    any C-row conservation-law system plugs in its face-frame rotation
    (a static row permutation on stacked [C, ...] states), its interface
    flux `iface(u_l, u_r) -> (f [C, ...], speed)` on rotated operands,
    and its admissibility `guard(u_rec, u_first)`.  Covers in-block
    interfaces + equal-level mesh faces at second order; hanging (2:1)
    faces and walls are the caller's first-order closure (minmod against
    the eq-masked zero outward difference kills the edge slopes there)."""
    if limiter == "minmod":
        lim = _minmod
    elif limiter == "none":
        # unlimited central slope (convergence studies).  At hanging
        # faces/walls the masked outward difference zeroes ONE term, so
        # edge cells keep HALF their interior slope — only minmod gives
        # the strict first-order fallback there.
        lim = lambda x, y: 0.5 * (x + y)
    else:
        raise ValueError(f"unknown subgrid limiter: {limiter!r}")

    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    h_cell = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim) / ext
    surface = (h_cell ** (dim - 1)) * (volumes > 0)          # [E]
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    area_t = (h_e / ext) ** n_t

    D = jnp.zeros((n_rows,) + u.shape[1:], u.dtype)
    speed = jnp.zeros((), u.dtype)

    for a in range(dim):
        ax = 1 + a
        v = rotate(u, a)                    # rows rotated: v[1] is u_normal
        v_src = v if u_src is u else rotate(u_src, a)

        # equal-level neighbor facing layers (edge + second) per side
        sides = {}
        for s_i, hi in ((0, True), (1, False)):
            k = 2 * a + s_i
            nbr1 = conn.nbr[k][:, :1]       # quadrant 0: equal/coarse slot
            e_idx, s_idx = (0, 1) if hi else (ext - 1, ext - 2)
            nb0 = _gather_layers(
                jax.lax.index_in_dim(v_src, e_idx, axis=ax,
                                     keepdims=False), nbr1)[..., 0]
            nb1 = _gather_layers(
                jax.lax.index_in_dim(v_src, s_idx, axis=ax,
                                     keepdims=False), nbr1)[..., 0]
            eq = ((conn.rel[k] == 0) & (conn.mask[k] > 0)).astype(u.dtype)
            sides[hi] = (nb0, nb1, eq, k)

        my_lo = jax.lax.index_in_dim(v, 0, axis=ax, keepdims=False)
        my_hi = jax.lax.index_in_dim(v, ext - 1, axis=ax, keepdims=False)
        nb0_lo, _, eq_lo, _ = sides[False]
        nb0_hi, _, eq_hi, _ = sides[True]

        def bcast(w, like):
            return w.reshape((1,) * (like.ndim - 1) + (-1,))

        # one-sided differences per cell: d_lo[i] = u_i - u_{i-1},
        # d_hi[i] = u_{i+1} - u_i; outward entries are eq-masked (zero at
        # hanging faces and walls -> minmod kills the edge slope there)
        d_int = (jax.lax.slice_in_dim(v, 1, ext, axis=ax)
                 - jax.lax.slice_in_dim(v, 0, ext - 1, axis=ax))
        d_out_lo = (my_lo - nb0_lo) * bcast(eq_lo, my_lo)
        d_out_hi = (nb0_hi - my_hi) * bcast(eq_hi, my_hi)
        d_lo = jnp.concatenate(
            [jnp.expand_dims(d_out_lo, ax), d_int], axis=ax)
        d_hi = jnp.concatenate(
            [d_int, jnp.expand_dims(d_out_hi, ax)], axis=ax)
        slope = lim(d_lo, d_hi)             # [5, *ext, E]

        # ---- in-block interfaces -----------------------------------------
        v_l = jax.lax.slice_in_dim(v, 0, ext - 1, axis=ax)
        v_r = jax.lax.slice_in_dim(v, 1, ext, axis=ax)
        u_l = guard(v_l + 0.5 * jax.lax.slice_in_dim(slope, 0, ext - 1,
                                                     axis=ax), v_l)
        u_r = guard(v_r - 0.5 * jax.lax.slice_in_dim(slope, 1, ext,
                                                     axis=ax), v_r)
        f, sp = iface(u_l, u_r)
        f = unrotate(f, a) * surface
        pad_lo = [(0, 0)] * f.ndim
        pad_hi = [(0, 0)] * f.ndim
        pad_lo[ax] = (1, 0)
        pad_hi[ax] = (0, 1)
        D = D + jnp.pad(f, pad_lo) - jnp.pad(f, pad_hi)
        speed = jnp.maximum(speed, (sp * (surface > 0)).max())

        # ---- equal-level mesh faces (full second order) --------------------
        for hi in (True, False):
            nb0, nb1, eq, k = sides[hi]
            my_edge = my_hi if hi else my_lo
            s_edge = jax.lax.index_in_dim(slope, ext - 1 if hi else 0,
                                          axis=ax, keepdims=False)
            if hi:
                # neighbor (right) edge-cell slope from the same 4 layers
                s_nbr = lim(nb0 - my_edge, nb1 - nb0)
                u_lf = guard(my_edge + 0.5 * s_edge, my_edge)
                u_rf = guard(nb0 - 0.5 * s_nbr, nb0)
            else:
                s_nbr = lim(nb0 - nb1, my_edge - nb0)
                u_lf = guard(nb0 + 0.5 * s_nbr, nb0)
                u_rf = guard(my_edge - 0.5 * s_edge, my_edge)
            f, sp = iface(u_lf, u_rf)
            w = conn.mask[k] * area_t * eq
            f = unrotate(f, a) * bcast(w, f)
            contrib = -f if hi else f
            D = _slab_add(D, contrib.reshape(n_rows, -1), a, layer_hi=hi,
                          spec=spec)
            sp_m = bcast((w > 0).astype(u.dtype), sp)
            speed = jnp.maximum(speed, (sp * sp_m).max())

    return D, speed


@functools.partial(jax.jit, static_argnames=("spec",))
def h1_criteria(u: jnp.ndarray, volumes: jnp.ndarray,
                spec: SubgridSpec) -> jnp.ndarray:
    """Density H1-seminorm / volume per element -> [Ecap]
    (ref compute_refinement_criteria kernels.inl:1109-1168).
    u: [5, *ext, Ecap] (element-minor)."""
    rho = u[0]                                  # [*ext, Ecap]
    dim = spec.dim
    h_cell = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim) / spec.extent
    s = jnp.zeros(rho.shape[-1], u.dtype)
    for a in range(dim):
        d = jnp.diff(rho, axis=a)
        s = s + (d * d).sum(axis=tuple(range(dim)))
    return s * h_cell / jnp.where(volumes > 0, volumes, 1.0) * (volumes > 0)


@functools.partial(jax.jit, static_argnames=("spec", "capacity"))
def apply_subgrid_remap_gathered(u: jnp.ndarray, src: jnp.ndarray,
                                 refined: jnp.ndarray, child_id: jnp.ndarray,
                                 coarsened: jnp.ndarray, fam: jnp.ndarray,
                                 spec: SubgridSpec, capacity: int) -> jnp.ndarray:
    """apply_subgrid_remap with EXPLICIT family positions: `fam` [capacity,
    2^dim] holds the source position of each z-ordered child for coarsen
    rows (fam[:, 0] == src elsewhere).  Needed when the element axis is a
    padded-global sharded axis where a family's members are not
    necessarily contiguous (the distributed adapt path) — and usable as a
    global device gather whose cross-shard movement XLA lowers to ICI
    collectives."""
    dim = spec.dim
    ext = spec.extent
    half = ext // 2
    cap_old = u.shape[-1]

    cells = [jnp.arange(ext, dtype=jnp.int32) for _ in range(dim)]

    def bcast_cell(c, a):
        shape = [1] * (dim + 1)
        shape[a] = ext
        return c.reshape(shape)

    elem_shape = (1,) * dim + (-1,)

    # ---- path A: keep / refine (one gather) -------------------------------
    oct_bits = [(child_id >> a) & 1 for a in range(dim)]
    r = refined.reshape(elem_shape)
    idx_a = []
    for a in range(dim):
        i = bcast_cell(cells[a], a)
        o = (oct_bits[a] * half).reshape(elem_shape)
        idx_a.append(jnp.where(r, o + (i >> 1), i))
    src_b = src.reshape(elem_shape)
    path_a = u[(slice(None),) + tuple(idx_a) + (src_b,)]

    # ---- path B: coarsen (pool once, gather the z-ordered child) ----------
    pool_shape = (u.shape[0],) + sum(((half, 2),) * dim, ()) + (cap_old,)
    pooled = u.reshape(pool_shape)
    pooled = pooled.mean(axis=tuple(2 + 2 * a for a in range(dim)))
    z = jnp.zeros((1,) * (dim + 1), jnp.int32)
    idx_b = []
    for a in range(dim):
        i = bcast_cell(cells[a], a)
        z = z + ((i >> (spec.log2_extent - 1)) << a)
        idx_b.append(i & (half - 1))
    e_b = jnp.arange(capacity, dtype=jnp.int32).reshape(elem_shape)
    src_z = fam[e_b, z]                                  # [*bcast, capacity]
    path_b = pooled[(slice(None),) + tuple(idx_b) + (src_z,)]

    c = coarsened.reshape((1,) + elem_shape[:-1] + (-1,))
    return jnp.where(c, path_b, path_a)


@functools.partial(jax.jit, static_argnames=("spec", "capacity"))
def apply_subgrid_remap(u: jnp.ndarray, src: jnp.ndarray,
                        refined: jnp.ndarray, child_id: jnp.ndarray,
                        coarsened: jnp.ndarray,
                        spec: SubgridSpec, capacity: int) -> jnp.ndarray:
    """Remap subgrid state across an adapt (ref adapt_variables,
    subgrid_mesh_manager.inl:301-425).  All transfers are single-level
    (guaranteed by Forest.balance_flags).

    u: [C, *ext, cap_old] (any row count — Euler's 5 rows or MHD's 9);
    src/refined/child_id/coarsened: [capacity].
      keep:    new[i, e]   = old[i, src]
      refine:  new[i, e]   = old[oct*ext/2 + i//2, src]   (parent octant)
      coarsen: new[i, e]   = pooled[i & (ext/2-1), src + z(i)]
               where pooled = 2x2(x2) cell means of old and z(i) selects the
               z-order child owning the coarse cell octant.
    """
    dim = spec.dim
    ext = spec.extent
    half = ext // 2
    cap_old = u.shape[-1]

    cells = [jnp.arange(ext, dtype=jnp.int32) for _ in range(dim)]

    def bcast_cell(c, a):
        """[ext] -> broadcastable over (*ext, capacity) at cell axis a."""
        shape = [1] * (dim + 1)
        shape[a] = ext
        return c.reshape(shape)

    elem_shape = (1,) * dim + (-1,)

    # ---- path A: keep / refine (one gather) -------------------------------
    oct_bits = [(child_id >> a) & 1 for a in range(dim)]     # [capacity]
    r = refined.reshape(elem_shape)
    idx_a = []
    for a in range(dim):
        i = bcast_cell(cells[a], a)
        o = (oct_bits[a] * half).reshape(elem_shape)
        idx_a.append(jnp.where(r, o + (i >> 1), i))
    src_b = src.reshape(elem_shape)
    path_a = u[(slice(None),) + tuple(idx_a) + (src_b,)]     # [C, *ext, capacity]

    # ---- path B: coarsen (pool once, one gather) ---------------------------
    pool_shape = (u.shape[0],) + sum(((half, 2),) * dim, ()) + (cap_old,)
    pooled = u.reshape(pool_shape)
    pooled = pooled.mean(axis=tuple(2 + 2 * a for a in range(dim)))  # [5,*half,cap_old]
    z = jnp.zeros((1,) * (dim + 1), jnp.int32)
    idx_b = []
    for a in range(dim):
        i = bcast_cell(cells[a], a)
        z = z + ((i >> (spec.log2_extent - 1)) << a)         # z-order child id
        idx_b.append(i & (half - 1))
    src_z = jnp.minimum(src_b + z, cap_old - 1)
    path_b = pooled[(slice(None),) + tuple(idx_b) + (src_z,)]

    c = coarsened.reshape((1,) + elem_shape[:-1] + (-1,))
    return jnp.where(c, path_b, path_a)
