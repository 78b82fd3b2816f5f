"""Device ops for the subgrid (block-structured) scheme.

TPU-native re-derivations of the reference subgrid CUDA kernels
(`examples/subgrid/kernels.inl`):

  * `inner_divergence`    — per-element interior cell-face fluxes via dense
    shifted slices over the block axes (ref compute_inner_fluxes
    kernels.inl:335-662: one CUDA block per element with __shared__ staging;
    here a batched elementwise program XLA fuses with the RK stages).
  * `outer_apply`         — mesh-face fluxes via the host-resolved flat
    subface index maps (ref compute_outer_fluxes kernels.inl:664-911 with
    its runtime anchor/stride/double_stride arithmetic + atomicAdd; here
    gather -> flux -> deterministic scatter-add).
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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.subgrid import SubgridConnectivity
from t8gpu_tpu.ops.euler import numerical_flux

# momentum-row permutations: state rows [rho, m_x, m_y, m_z, e] -> face frame
# [rho, m_normal, m_t1, m_t2, e] for an +axis normal, and back.
_ROTATE = {0: (0, 1, 2, 3, 4), 1: (0, 2, 1, 3, 4), 2: (0, 3, 1, 2, 4)}
_UNROTATE = {0: (0, 1, 2, 3, 4), 1: (0, 2, 1, 3, 4), 2: (0, 2, 3, 1, 4)}


def axis_rotate(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    return u[jnp.asarray(_ROTATE[axis])]


def axis_unrotate(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    return f[jnp.asarray(_UNROTATE[axis])]


def _guard_state(dtype):
    """Quiescent state used on padding lanes so flux math stays finite."""
    return jnp.asarray([1.0, 0.0, 0.0, 0.0, 2.5], dtype)


@functools.partial(jax.jit, static_argnames=("spec", "gamma", "flux"))
def inner_divergence(u: jnp.ndarray, volumes: jnp.ndarray,
                     spec: SubgridSpec, gamma: float, flux: str):
    """Interior cell-face flux divergence: [5, Ecap, *ext] -> same shape,
    plus the max interior wave speed.

    For each axis, KEPES/HLL fluxes on the ext-1 interior interfaces are
    computed from shifted slices and accumulated as D[i] += f[i-1] - f[i]
    (cell surface = (V^(1/dim)/ext)^(dim-1), ref kernels.inl:351-355)."""
    dim = spec.dim
    ext = spec.extent
    h_cell = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim) / ext
    surface = (h_cell ** (dim - 1)) * (volumes > 0)         # [Ecap]
    surface = surface.reshape((1, -1) + (1,) * dim)

    D = jnp.zeros_like(u)
    speed = jnp.zeros((), u.dtype)
    for a in range(dim):
        ax = 2 + a
        u_l = jax.lax.slice_in_dim(u, 0, ext - 1, axis=ax)
        u_r = jax.lax.slice_in_dim(u, 1, ext, axis=ax)
        f, sp = numerical_flux(axis_rotate(u_l, a), axis_rotate(u_r, a),
                               gamma=gamma, flux=flux)
        f = axis_unrotate(f, a) * surface
        pad_lo = [(0, 0)] * u.ndim
        pad_hi = [(0, 0)] * u.ndim
        pad_lo[ax] = (1, 0)   # f[i-1] lands on cell i
        pad_hi[ax] = (0, 1)   # f[i]   leaves  cell i
        D = D + jnp.pad(f, pad_lo) - jnp.pad(f, pad_hi)
        speed = jnp.maximum(speed, (sp * (surface[0] > 0)).max())
    return D, speed


@functools.partial(jax.jit, static_argnames=("gamma", "flux"))
def outer_apply(D_flat: jnp.ndarray, u_flat: jnp.ndarray,
                conn: SubgridConnectivity, gamma: float, flux: str):
    """Add mesh-face (element-boundary) fluxes into the flat divergence
    [5, Ecap*B].  Returns (D_flat, max outer wave speed)."""
    speed = jnp.zeros((), u_flat.dtype)
    for a, (lc, rc, ar) in enumerate(zip(conn.l_cell, conn.r_cell, conn.area)):
        u_l = u_flat[:, lc]
        u_r = u_flat[:, rc]
        f, sp = numerical_flux(axis_rotate(u_l, a), axis_rotate(u_r, a),
                               gamma=gamma, flux=flux)
        f = axis_unrotate(f, a) * ar
        D_flat = D_flat.at[:, lc].add(-f).at[:, rc].add(f)
        speed = jnp.maximum(speed, (sp * (ar > 0)).max())
    return D_flat, speed


@functools.partial(jax.jit, static_argnames=("gamma", "flux"))
def boundary_apply(D_flat: jnp.ndarray, u_flat: jnp.ndarray,
                   conn: SubgridConnectivity, gamma: float, flux: str):
    """Reflective-wall fluxes (mirror ghost: negated normal momentum,
    ref kernels.inl:913-1107) added into the flat divergence."""
    speed = jnp.zeros((), u_flat.dtype)
    for (axis, sign), bc, ar in zip(conn.b_groups, conn.b_cell, conn.b_area):
        u_own = axis_rotate(u_flat[:, bc], axis)
        u_ghost = u_own.at[1].multiply(-1.0)
        if sign > 0:   # outward normal +axis: owner is the left state
            f, sp = numerical_flux(u_own, u_ghost, gamma=gamma, flux=flux)
        else:          # outward normal -axis: in the +axis frame the owner
            f, sp = numerical_flux(u_ghost, u_own, gamma=gamma, flux=flux)
        f = axis_unrotate(f, axis) * ar
        D_flat = D_flat.at[:, bc].add(-f if sign > 0 else f)
        speed = jnp.maximum(speed, (sp * (ar > 0)).max())
    return D_flat, speed


@functools.partial(jax.jit, static_argnames=("spec", "gamma", "flux"))
def flux_divergence(u: jnp.ndarray, volumes: jnp.ndarray,
                    conn: SubgridConnectivity, spec: SubgridSpec,
                    gamma: float, flux: str):
    """Full surface-flux divergence for the subgrid scheme:
    inner + outer + boundary.  u: [5, Ecap, *ext].  Returns (D, max_speed)."""
    D, sp_i = inner_divergence(u, volumes, spec, gamma, flux)
    shape = u.shape
    u_flat = u.reshape(5, -1)
    D_flat = D.reshape(5, -1)
    D_flat, sp_o = outer_apply(D_flat, u_flat, conn, gamma, flux)
    if conn.b_groups:
        D_flat, sp_b = boundary_apply(D_flat, u_flat, conn, gamma, flux)
        sp_o = jnp.maximum(sp_o, sp_b)
    return D_flat.reshape(shape), jnp.maximum(sp_i, sp_o)


@functools.partial(jax.jit, static_argnames=("spec",))
def h1_criteria(u: jnp.ndarray, volumes: jnp.ndarray,
                spec: SubgridSpec) -> jnp.ndarray:
    """Density H1-seminorm / volume per element -> [Ecap]
    (ref compute_refinement_criteria kernels.inl:1109-1168)."""
    rho = u[0]                                  # [Ecap, *ext]
    dim = spec.dim
    h_cell = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim) / spec.extent
    s = jnp.zeros(rho.shape[0], u.dtype)
    for a in range(dim):
        d = jnp.diff(rho, axis=1 + a)
        s = s + (d * d).sum(axis=tuple(range(1, dim + 1)))
    return s * h_cell / jnp.where(volumes > 0, volumes, 1.0) * (volumes > 0)


@functools.partial(jax.jit, static_argnames=("spec", "capacity"))
def apply_subgrid_remap(u: jnp.ndarray, src: jnp.ndarray,
                        refined: jnp.ndarray, child_id: jnp.ndarray,
                        coarsened: jnp.ndarray,
                        spec: SubgridSpec, capacity: int) -> jnp.ndarray:
    """Remap subgrid state across an adapt (ref adapt_variables,
    subgrid_mesh_manager.inl:301-425).  All transfers are single-level
    (guaranteed by Forest.balance_flags).

    u: [5, cap_old, *ext]; src/refined/child_id/coarsened: [capacity].
      keep:    new[e, i]   = old[src, i]
      refine:  new[e, i]   = old[src, oct*ext/2 + i//2]   (parent octant)
      coarsen: new[e, i]   = pooled[src + z(i), i & (ext/2-1)]
               where pooled = 2x2(x2) cell means of old and z(i) selects the
               z-order child owning the coarse cell octant.
    """
    dim = spec.dim
    ext = spec.extent
    half = ext // 2
    cap_old = u.shape[1]

    cells = [jnp.arange(ext, dtype=jnp.int32) for _ in range(dim)]

    def bcast_cell(c, a):
        """[ext] -> [1, ext at axis a, 1...] over (elem, *ext)."""
        shape = [1] * (dim + 1)
        shape[1 + a] = ext
        return c.reshape(shape)

    # ---- path A: keep / refine (one gather) -------------------------------
    oct_bits = [(child_id >> a) & 1 for a in range(dim)]     # [capacity]
    idx_a = []
    for a in range(dim):
        i = bcast_cell(cells[a], a)
        o = (oct_bits[a] * half).reshape((-1,) + (1,) * dim)
        r = refined.reshape((-1,) + (1,) * dim)
        idx_a.append(jnp.where(r, o + (i >> 1), i))          # [capacity,*ext broadcast]
    src_b = src.reshape((-1,) + (1,) * dim)
    path_a = u[(slice(None), src_b) + tuple(idx_a)]          # [5, capacity, *ext]

    # ---- path B: coarsen (pool once, one gather) ---------------------------
    pool_shape = (5, cap_old) + sum(((half, 2),) * dim, ())
    pooled = u.reshape(pool_shape)
    pooled = pooled.mean(axis=tuple(3 + 2 * a for a in range(dim)))  # [5,cap_old,*half]
    z = jnp.zeros((1,) * (dim + 1), jnp.int32)
    idx_b = []
    for a in range(dim):
        i = bcast_cell(cells[a], a)
        z = z + ((i >> (spec.log2_extent - 1)) << a)         # z-order child id
        idx_b.append(i & (half - 1))
    src_z = jnp.minimum(src_b + z, cap_old - 1)
    path_b = pooled[(slice(None), src_z) + tuple(idx_b)]     # [5, capacity, *ext]

    c = coarsened.reshape((1, -1) + (1,) * dim)
    return jnp.where(c, path_b, path_a)
