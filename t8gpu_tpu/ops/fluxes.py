"""Face-flux evaluation and per-element accumulation (plain elements).

TPU-native equivalent of the reference per-face CUDA kernels
(`kepes_compute_fluxes` examples/compressible_euler/kernels.cu:135-309,
`reflective_boundary_condition` kernels.cu:311-469): gather left/right
states, rotate into the face frame, evaluate the numerical flux, rotate
back, scale by face area, and accumulate signed contributions per element.

TPU hot-path structure (round 2):
  * all per-cell transcendental work (logs, entropy variables, 1/rho) is
    precomputed ONCE per element per flux evaluation (ops/euler.cell_fields)
    behind an optimization barrier; faces consume the fields with pure
    arithmetic + one sqrt (ops/euler.kepes_fields_flux);
  * on axis-aligned Cartesian meshes (conn.axis_ranges set) faces are
    grouped by normal axis, so the face-frame rotation is a STATIC row
    permutation per group — no per-face basis construction and no
    rotate/inverse-rotate matrix products (the reference pays the general
    basis on every face, kernels.cu:174-193);
  * general meshes (e.g. the prismed spherical shell) keep the per-face
    orthonormal-basis path.

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
    """Gather columns of [C, N] along the minor axis -> [C, *idx.shape].

    TPU-critical: XLA gathers along the minor (lane) axis fall off a
    ~30x-slower elementwise path; transposing to row-major first makes
    every gathered slice contiguous (same finding as
    ops/subgrid._gather_layers)."""
    g = u.T[idx]                        # [*idx.shape, C]
    return jnp.moveaxis(g, -1, 0)


def interior_face_fluxes(u: jnp.ndarray, conn: FaceConnectivity,
                         gamma: float = 1.4, flux: str = "kepes"):
    """Area-scaled interior face fluxes [5, Fcap] + per-face speeds [Fcap]
    from an element state batch [5, capacity].  Mirrors kernels.cu:135-309."""
    return interior_face_fluxes_fields(
        euler.cell_fields(u, gamma, flux), conn, gamma, flux)


def _fields_of(g: jnp.ndarray, gamma: float, flux: str,
               derive: bool) -> jnp.ndarray:
    """Identity when g already holds field rows; derives the fields from
    gathered 5-row states when `derive` (GATHER_MODE == 'state')."""
    if not derive:
        return g
    return euler.cell_fields(g, gamma, flux)


def interior_face_fluxes_fields(q: jnp.ndarray, conn: FaceConnectivity,
                                gamma: float = 1.4, flux: str = "kepes",
                                derive: bool = False):
    """interior_face_fluxes from a precomputed cell-fields array
    [C, capacity] (ops/euler.cell_fields) — the hot-path entry shared with
    the boundary stage through flux_divergence.  derive=True instead takes
    the raw state and derives fields per gathered face side."""
    q_l = _fields_of(gather_cols(q, conn.left), gamma, flux, derive)
    q_r = _fields_of(gather_cols(q, conn.right), gamma, flux, derive)
    return face_fluxes_from_sides(q_l, q_r, conn, gamma, flux)


def face_fluxes_from_sides(q_l: jnp.ndarray, q_r: jnp.ndarray,
                           conn: FaceConnectivity,
                           gamma: float = 1.4, flux: str = "kepes"):
    """Interior face fluxes from per-face-side FIELD rows [C, Fcap] (one
    per side) — the shared back half of interior_face_fluxes_fields, also
    the entry point for reconstructed interface states
    (ops/reconstruct.py)."""
    if conn.axis_ranges is not None:
        fs, sps = [], []
        for a, s0, s1 in conn.axis_ranges:
            f_rot, sp = euler.fields_flux(
                euler.fields_axis_rotate(q_l[:, s0:s1], a),
                euler.fields_axis_rotate(q_r[:, s0:s1], a),
                gamma=gamma, flux=flux)
            fs.append(euler.flux_axis_unrotate(f_rot, a))
            sps.append(sp)
        f = jnp.concatenate(fs, axis=1) * conn.area
        speed = jnp.concatenate(sps)
    else:
        basis = euler.face_basis(conn.normal)
        f_rot, speed = euler.fields_flux(
            euler.fields_rotate(q_l, *basis),
            euler.fields_rotate(q_r, *basis), gamma=gamma, flux=flux)
        f = euler.inverse_rotate_state(f_rot, *basis) * conn.area
    return f, speed * (conn.area > 0)


def boundary_face_fluxes(u: jnp.ndarray, conn: FaceConnectivity,
                         gamma: float = 1.4, flux: str = "kepes"):
    """Reflective-wall fluxes [5, Fbcap] (ref kernels.cu:311-469) from an
    element state batch: the ghost state is the owner's state with normal
    momentum negated."""
    return boundary_face_fluxes_fields(
        euler.cell_fields(u, gamma, flux), conn, gamma, flux)


def boundary_face_fluxes_fields(q: jnp.ndarray, conn: FaceConnectivity,
                                gamma: float = 1.4, flux: str = "kepes",
                                derive: bool = False,
                                ghost: jnp.ndarray = None):
    """boundary_face_fluxes from a precomputed cell-fields array."""
    if conn.boundary_capacity == 0:
        return jnp.zeros((5, 0), q.dtype), jnp.zeros((0,), q.dtype)
    q_in = _fields_of(gather_cols(q, conn.b_elem), gamma, flux, derive)
    return boundary_fluxes_from_side(q_in, conn, gamma, flux, ghost)


def boundary_fluxes_from_side(q_in: jnp.ndarray, conn: FaceConnectivity,
                              gamma: float = 1.4, flux: str = "kepes",
                              ghost: jnp.ndarray = None):
    """Boundary fluxes from the owner-side FIELD rows [C, Fbcap] — shared
    back half of boundary_face_fluxes_fields; also the reconstruction
    entry point.

    ghost = None: reflective walls (mirror ghost built in the face
    frame, ref kernels.cu:311-469).  ghost = [C, 1] or [C, Fbcap] FIELD
    rows (UNROTATED frame): farfield/open boundaries — the ghost is the
    prescribed exterior state and the upwind numerical flux sorts
    inflow from outflow by itself (supersonic outflow takes the
    interior state, subsonic lets the exterior pressure act; use an
    upwind family — hll/hllc — rather than the central KEPES)."""
    if conn.boundary_capacity == 0:
        return jnp.zeros((5, 0), q_in.dtype), jnp.zeros((0,), q_in.dtype)
    if ghost is not None and ghost.shape[-1] == 1:
        ghost = jnp.broadcast_to(
            ghost, ghost.shape[:-1] + (conn.boundary_capacity,))
    if conn.b_axis_ranges is not None:
        fs, sps = [], []
        for a, sgn, s0, s1 in conn.b_axis_ranges:
            q_own = euler.fields_axis_rotate(q_in[:, s0:s1], a)
            if ghost is None:
                q_ghost = euler.fields_mirror(q_own)
            else:
                q_ghost = euler.fields_axis_rotate(ghost[:, s0:s1], a)
            # Outward normal sgn*e_a: F(own, ghost, sgn*e_a) computed in the
            # +a frame via F(l, r, n) = -F(r, l, -n).
            pair = (q_own, q_ghost) if sgn > 0 else (q_ghost, q_own)
            f_rot, sp = euler.fields_flux(*pair, gamma=gamma, flux=flux)
            f_a = euler.flux_axis_unrotate(f_rot, a)
            fs.append(f_a if sgn > 0 else -f_a)
            sps.append(sp)
        f = jnp.concatenate(fs, axis=1) * conn.b_area
        speed = jnp.concatenate(sps)
    else:
        basis = euler.face_basis(conn.b_normal)
        q_rot = euler.fields_rotate(q_in, *basis)
        q_ghost = (euler.fields_mirror(q_rot) if ghost is None
                   else euler.fields_rotate(ghost, *basis))
        f_rot, speed = euler.fields_flux(q_rot, q_ghost, gamma=gamma,
                                         flux=flux)
        f = euler.inverse_rotate_state(f_rot, *basis) * conn.b_area
    return f, speed * (conn.b_area > 0)


def accumulate_inc(face_flux: jnp.ndarray, boundary_flux: jnp.ndarray,
                   inc_slot: jnp.ndarray, inc_sign: jnp.ndarray):
    """Signed incidence accumulation from flux columns — the ONE place the
    gather-layout idiom lives: all_f is the C flux rows (5 for Euler, any
    count for other conservation laws) + a trailing zero sentinel column
    for empty incidence entries, zero-padded to the next multiple of 8
    rows so gathered rows are 32-byte aligned (measured 28% faster than
    5-float rows on v5e).  inc_slot may have ANY shape [*, D]; the result
    is [C, *]."""
    C = face_flux.shape[0]
    all_f = jnp.concatenate(
        [face_flux, boundary_flux, jnp.zeros((C, 1), face_flux.dtype)],
        axis=1)
    pad = -C % 8
    if pad:
        all_f = jnp.concatenate(
            [all_f, jnp.zeros((pad, all_f.shape[1]), all_f.dtype)], axis=0)
    contrib = gather_cols(all_f, inc_slot)[:C]           # [C, *, D]
    return (contrib * inc_sign).sum(axis=-1)


def accumulate(face_flux: jnp.ndarray, boundary_flux: jnp.ndarray,
               conn: FaceConnectivity, mode: str = "gather") -> jnp.ndarray:
    """Signed per-element sum of incident face fluxes -> [5, capacity].

    Replaces the reference's atomicAdd scatter (kernels.cu:295-308) with a
    deterministic formulation.
    """
    if mode == "gather":
        return accumulate_inc(face_flux, boundary_flux,
                              conn.inc_slot, conn.inc_sign)
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


# What the per-face gathers fetch: "fields" gathers the precomputed
# C-row cell fields per face side (no per-face transcendentals, 2x gather
# traffic); "state" gathers the 5-row conservative state and derives the
# fields per gathered side (per-face-side logs, half the gather traffic).
# Process-level switch, read at trace time.
GATHER_MODE = "fields"


def farfield_ghost_fields(state, gamma: float, flux: str, dtype):
    """Cell-field rows [C, 1] of a prescribed exterior (farfield)
    primitive state (rho, vx, vy, vz, p) — the `ghost` operand of the
    boundary flux for open boundaries."""
    import numpy as np

    rho, vx, vy, vz, p = (float(x) for x in state)
    e = p / (gamma - 1.0) + 0.5 * rho * (vx * vx + vy * vy + vz * vz)
    u = jnp.asarray(np.array([rho, rho * vx, rho * vy, rho * vz, e],
                             np.float64)[:, None], dtype)
    return euler.cell_fields(u, gamma, flux)


def flux_divergence(u: jnp.ndarray, conn: FaceConnectivity,
                    gamma: float = 1.4, flux: str = "kepes",
                    mode: str = "gather", ghost: jnp.ndarray = None):
    """Total surface-flux accumulation per element, plus the max wave speed
    (the CFL ingredient, ref solver.cu:213-229).

    Returns (accum [5, capacity], max_speed scalar).
    """
    derive = GATHER_MODE == "state"
    q = (u if derive
         else euler.maybe_barrier(euler.cell_fields(u, gamma, flux)))
    f, speed = interior_face_fluxes_fields(q, conn, gamma, flux, derive)
    fb, speed_b = boundary_face_fluxes_fields(q, conn, gamma, flux, derive,
                                              ghost)
    acc = accumulate(f, fb, conn, mode)
    max_speed = jnp.maximum(
        speed.max() if speed.size else 0.0,
        speed_b.max() if speed_b.size else 0.0)
    return acc, max_speed
