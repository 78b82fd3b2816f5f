"""Face-flux evaluation and per-element accumulation.

TPU-native equivalent of the reference per-face CUDA kernels
(`kepes_compute_fluxes` examples/compressible_euler/kernels.cu:135-309,
`reflective_boundary_condition` kernels.cu:311-469): gather left/right
states, rotate into the face frame, evaluate the numerical flux, rotate
back, scale by face area, and accumulate signed contributions per element.

Accumulation is deterministic (no atomics): either a CSR gather over the
host-built incidence table or an XLA segment-sum — see
mesh/connectivity.py for the design rationale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t8gpu_tpu.mesh.connectivity import FaceConnectivity
from t8gpu_tpu.ops import euler


def gather_cols(u: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather columns of [5, N] along the minor axis -> [5, *idx.shape].

    TPU-critical: XLA gathers along the minor (lane) axis fall off a
    ~30x-slower elementwise path; transposing to row-major first makes
    every gathered slice contiguous (same finding as
    ops/subgrid._gather_layers)."""
    g = u.T[idx]                        # [*idx.shape, 5]
    return jnp.moveaxis(g, -1, 0)


def interior_face_fluxes(u: jnp.ndarray, conn: FaceConnectivity,
                         gamma: float = 1.4, flux: str = "kepes"):
    """Area-scaled interior face fluxes [5, Fcap] + per-face speeds [Fcap].

    `u` is the element state [5, capacity].  Mirrors kernels.cu:135-309.
    """
    u_l = gather_cols(u, conn.left)
    u_r = gather_cols(u, conn.right)
    basis = euler.face_basis(conn.normal)
    f_rot, speed = euler.numerical_flux(
        euler.rotate_state(u_l, *basis), euler.rotate_state(u_r, *basis),
        gamma=gamma, flux=flux)
    f = euler.inverse_rotate_state(f_rot, *basis) * conn.area
    return f, speed * (conn.area > 0)


def boundary_face_fluxes(u: jnp.ndarray, conn: FaceConnectivity,
                         gamma: float = 1.4, flux: str = "kepes"):
    """Reflective-wall fluxes [5, Fbcap] (ref kernels.cu:311-469): the ghost
    state is the owner's state with normal momentum negated."""
    if conn.boundary_capacity == 0:
        return jnp.zeros((5, 0), u.dtype), jnp.zeros((0,), u.dtype)
    u_in = gather_cols(u, conn.b_elem)
    basis = euler.face_basis(conn.b_normal)
    u_rot = euler.rotate_state(u_in, *basis)
    u_ghost = u_rot.at[1].multiply(-1.0)
    f_rot, speed = euler.numerical_flux(u_rot, u_ghost, gamma=gamma, flux=flux)
    f = euler.inverse_rotate_state(f_rot, *basis) * conn.b_area
    return f, speed * (conn.b_area > 0)


def accumulate(face_flux: jnp.ndarray, boundary_flux: jnp.ndarray,
               conn: FaceConnectivity, mode: str = "gather") -> jnp.ndarray:
    """Signed per-element sum of incident face fluxes -> [5, capacity].

    Replaces the reference's atomicAdd scatter (kernels.cu:295-308) with a
    deterministic formulation.
    """
    if mode == "gather":
        # all_f: [5, Fcap + Fbcap + 1], trailing zero sentinel column.
        all_f = jnp.concatenate(
            [face_flux, boundary_flux, jnp.zeros((5, 1), face_flux.dtype)], axis=1)
        contrib = gather_cols(all_f, conn.inc_slot)  # [5, capacity, D]
        return (contrib * conn.inc_sign).sum(axis=-1)
    elif mode == "segment_sum":
        n = conn.inc_slot.shape[0]
        out = jax.ops.segment_sum(
            -face_flux.T, conn.left, num_segments=n)
        out = out + jax.ops.segment_sum(
            face_flux.T, conn.right, num_segments=n)
        if conn.boundary_capacity:
            out = out + jax.ops.segment_sum(
                -boundary_flux.T, conn.b_elem, num_segments=n)
        return out.T
    raise ValueError(f"unknown accumulation mode: {mode}")


def flux_divergence(u: jnp.ndarray, conn: FaceConnectivity,
                    gamma: float = 1.4, flux: str = "kepes",
                    mode: str = "gather"):
    """Total surface-flux accumulation per element, plus the max wave speed
    (the CFL ingredient, ref solver.cu:213-229).

    Returns (accum [5, capacity], max_speed scalar).
    """
    f, speed = interior_face_fluxes(u, conn, gamma, flux)
    fb, speed_b = boundary_face_fluxes(u, conn, gamma, flux)
    acc = accumulate(f, fb, conn, mode)
    max_speed = jnp.maximum(
        speed.max() if speed.size else 0.0,
        speed_b.max() if speed_b.size else 0.0)
    return acc, max_speed
