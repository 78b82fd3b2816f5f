"""Second-order MUSCL reconstruction for the plain-element path.

Beyond-reference capability: the reference is strictly first order (its
face kernels consume the two adjacent CELL states directly,
examples/compressible_euler/kernels.cu:150-172).  Here interface states
are linearly reconstructed from per-element Green-Gauss gradients with a
Barth-Jespersen limiter, giving second-order accuracy in smooth regions on
ANY element class (bricks, prisms, triangles, tets) while remaining
monotone at shocks.  Everything is built from the same TPU-friendly
primitives as the first-order path: transposed column gathers + the CSR
incidence accumulate (no scatters, deterministic).

Scheme
------
1. grad(u)_e = (1/V_e) sum_f  u_bar_f A_f n_f^out   (Green-Gauss; the mean
   u_bar_f = (u_L + u_R)/2 is exact for linear fields when the face
   centroid bisects the centroid segment — true on uniform bricks, an
   O(h) consistent approximation on distorted/hanging meshes).
2. Barth-Jespersen: alpha_e = min over faces of the largest fraction of
   the extrapolation du_{e,f} = grad_e . (x_f - x_e) that keeps
   u_e + alpha du within [min, max] over the face neighbors.
3. Interface states u_{L,f} = u_L + alpha_L du_{L,f} (ditto right); a
   positivity guard falls back to the first-order state on any face side
   whose reconstructed density or pressure is non-positive.
4. The reconstructed states feed the SAME numerical fluxes (KEPES/HLL)
   through ops/fluxes.face_fluxes_from_sides.

The face-centroid displacements (x_f - x_e for both sides, wrapped on
periodic meshes) are host-built per mesh install and live on
FaceConnectivity.d_left / d_right / d_b (mesh/connectivity.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from t8gpu_tpu.mesh.connectivity import FaceConnectivity
from t8gpu_tpu.ops import euler
from t8gpu_tpu.ops.fluxes import (accumulate, boundary_fluxes_from_side,
                                  face_fluxes_from_sides, gather_cols)


def _require_geometry(conn: FaceConnectivity):
    if conn.d_left is None:
        raise ValueError(
            "order-2 reconstruction needs face-centroid geometry on the "
            "connectivity (FaceConnectivity.d_left is None) — the mesh "
            "builder did not supply face_center/centers to "
            "build_connectivity")


def green_gauss_gradients(u: jnp.ndarray, conn: FaceConnectivity,
                          inv_volume: jnp.ndarray, mode: str = "gather"):
    """Per-element gradient of each conserved variable: [C, 3, capacity]
    (row-generic: C = u.shape[0] — 5 for Euler, 9 for GLM-MHD).

    Same incidence machinery as the flux accumulate (signs give the
    outward orientation per side); boundary faces use the owner state
    (mirror ghosts share every component's face-normal mean except the
    normal momentum — the O(h) wall error is limited away)."""
    C = u.shape[0]
    u_l = gather_cols(u, conn.left)
    u_r = gather_cols(u, conn.right)
    mean = 0.5 * (u_l + u_r)                               # [C, F]
    an = conn.normal * conn.area                           # [3, F]
    c = (mean[:, None, :] * an[None]).reshape(3 * C, -1)   # [3C, F]
    if conn.boundary_capacity:
        u_b = gather_cols(u, conn.b_elem)
        cb = (u_b[:, None, :] * (conn.b_normal * conn.b_area)[None]
              ).reshape(3 * C, -1)
    else:
        cb = jnp.zeros((3 * C, 0), u.dtype)
    acc = accumulate(c, cb, conn, mode)                    # [3C, cap]
    # accumulate is signed for flux divergence (emitter -, receiver +);
    # Green-Gauss wants the OUTWARD surface integral, which is its negation.
    return (-acc * inv_volume).reshape(C, 3, -1)


def _side_values(val_left, val_right, val_bowner, conn: FaceConnectivity):
    """[C, capacity, D]: for each element and incidence slot, the per-face
    quantity as seen from THAT element's side.  Empty slots land on the
    zero sentinel column (mask with conn.inc_sign != 0)."""
    C = val_left.shape[0]
    zero = jnp.zeros((C, 1), val_left.dtype)
    a = jnp.concatenate([val_left, val_bowner, zero], axis=1)
    b = jnp.concatenate([val_right, jnp.zeros_like(val_bowner), zero],
                        axis=1)
    ga = gather_cols(a, conn.inc_slot)
    gb = gather_cols(b, conn.inc_slot)
    return jnp.where(conn.inc_sign < 0, ga, gb)


def _neighbor_minmax(u, u_l, u_r, u_b, conn: FaceConnectivity):
    """Per-element min/max of {self} U {face neighbors}: two [5, capacity]
    arrays (the Barth-Jespersen bounds)."""
    nbr = _side_values(u_r, u_l, u_b, conn)    # the OTHER side per slot
    m = conn.inc_sign != 0
    u_min = jnp.minimum(u, jnp.where(m, nbr, jnp.inf).min(axis=-1))
    u_max = jnp.maximum(u, jnp.where(m, nbr, -jnp.inf).max(axis=-1))
    return u_min, u_max


def _bj_ratio(du, dmax, dmin):
    """Barth-Jespersen face-side limiter candidate in [0, 1]."""
    tiny = 1e-12
    denom = jnp.where(jnp.abs(du) > tiny, du, 1.0)
    r = jnp.where(du > tiny, dmax / denom,
                  jnp.where(du < -tiny, dmin / denom, 1.0))
    return jnp.clip(r, 0.0, 1.0)


# Venkatakrishnan's smoothness parameter: eps^2 = (K h)^3 with h the
# element size.  Larger K = less limiting (smoother convergence, more
# overshoot near discontinuities); 1.0 is the conventional default.
VENKAT_K = 1.0


def _venkat_ratio(du, dmax, dmin, eps2):
    """Venkatakrishnan face-side limiter candidate: the smooth rational
    relaxation of Barth-Jespersen (differentiable, and the eps^2 floor
    switches limiting OFF where variations are O(h^1.5) — smooth extrema —
    restoring full second order there; BJ clips to ~1.7 observed order)."""
    tiny = 1e-12
    a = jnp.where(du > 0.0, dmax, dmin)         # the binding bound
    du_s = jnp.where(jnp.abs(du) > tiny, du, 1.0)
    num = (a * a + eps2) * du + 2.0 * du * du * a
    den = a * a + 2.0 * du * du + a * du + eps2
    r = num / (jnp.where(jnp.abs(den) > tiny, den, tiny) * du_s)
    return jnp.where(jnp.abs(du) > tiny, jnp.clip(r, 0.0, 1.0), 1.0)


def _limiter_eps2(inv_volume, dim: int, dtype):
    """(K h)^3 per element from 1/V (padded slots -> huge eps2 -> no
    limiting there, harmless: their extrapolations are zero anyway)."""
    v = jnp.where(inv_volume > 0, 1.0 / jnp.where(inv_volume > 0,
                                                  inv_volume, 1.0), 1.0)
    h = v ** (1.0 / dim)
    return ((VENKAT_K * h) ** 3).astype(dtype)


def _positivity_guard(u_rec, u_first, gamma: float):
    """Fall back to the first-order state wherever the reconstructed
    density or pressure is non-positive (per face side, all 5 rows)."""
    _, p = euler.primitives(u_rec, gamma)
    ok = (u_rec[0] > 0.0) & (p > 0.0)
    return jnp.where(ok[None], u_rec, u_first)


def reconstruct_sides(u: jnp.ndarray, conn: FaceConnectivity,
                      inv_volume: jnp.ndarray, gamma: float,
                      mode: str = "gather", limiter: str = "bj",
                      dim: int = 2, guard=None):
    """Limited MUSCL interface states: (u_Lf [C,F], u_Rf [C,F], u_Bf [C,Fb])
    for any row count C = u.shape[0].

    limiter: "bj" (Barth-Jespersen, strictly monotone), "venkat"
    (Venkatakrishnan — smooth relaxation of BJ that keeps full second
    order at smooth extrema, slight bounded overshoot at jumps; `dim`
    sets the eps^2 = (K h)^3 length scale) or "none" (unlimited — clean
    second order on smooth fields, for convergence studies).

    guard: physical-admissibility fallback `(u_rec, u_first) -> u` applied
    per face side; None = the Euler density/pressure guard (with `gamma`).
    Other PDE families inject their own (GLM-MHD: models/mhd._mhd_guard)."""
    _require_geometry(conn)
    cap_b = conn.boundary_capacity
    C = u.shape[0]
    if guard is None:
        guard = lambda rec, first: _positivity_guard(rec, first, gamma)

    grad = green_gauss_gradients(u, conn, inv_volume, mode)   # [C,3,cap]
    gflat = grad.reshape(3 * C, -1)

    u_l = gather_cols(u, conn.left)
    u_r = gather_cols(u, conn.right)
    u_b = (gather_cols(u, conn.b_elem) if cap_b
           else jnp.zeros((C, 0), u.dtype))

    du_l = (gather_cols(gflat, conn.left).reshape(C, 3, -1)
            * conn.d_left[None]).sum(axis=1)                  # [C, F]
    du_r = (gather_cols(gflat, conn.right).reshape(C, 3, -1)
            * conn.d_right[None]).sum(axis=1)
    du_b = ((gather_cols(gflat, conn.b_elem).reshape(C, 3, -1)
             * conn.d_b[None]).sum(axis=1) if cap_b
            else jnp.zeros((C, 0), u.dtype))

    if limiter in ("bj", "venkat"):
        u_min, u_max = _neighbor_minmax(u, u_l, u_r, u_b, conn)
        dmax, dmin = u_max - u, u_min - u
        if limiter == "venkat":
            eps2 = _limiter_eps2(inv_volume, dim, u.dtype)[None]  # [1, cap]

            def ratio(du, idx):
                return _venkat_ratio(du, gather_cols(dmax, idx),
                                     gather_cols(dmin, idx),
                                     gather_cols(eps2, idx))
        else:
            def ratio(du, idx):
                return _bj_ratio(du, gather_cols(dmax, idx),
                                 gather_cols(dmin, idx))

        a_l = ratio(du_l, conn.left)
        a_r = ratio(du_r, conn.right)
        a_b = (ratio(du_b, conn.b_elem) if cap_b
               else jnp.zeros((C, 0), u.dtype))
        # one alpha per ELEMENT: the min over its face-side candidates
        side = _side_values(a_l, a_r, a_b, conn)
        alpha = jnp.where(conn.inc_sign != 0, side, 1.0).min(axis=-1)
        al_f = gather_cols(alpha, conn.left)
        ar_f = gather_cols(alpha, conn.right)
        ab_f = (gather_cols(alpha, conn.b_elem) if cap_b
                else jnp.zeros((C, 0), u.dtype))
    elif limiter == "none":
        al_f = ar_f = 1.0
        ab_f = 1.0
    else:
        raise ValueError(f"unknown limiter: {limiter!r}")

    u_lf = guard(u_l + al_f * du_l, u_l)
    u_rf = guard(u_r + ar_f * du_r, u_r)
    u_bf = guard(u_b + ab_f * du_b, u_b) if cap_b else u_b
    return u_lf, u_rf, u_bf


def flux_divergence_muscl(u: jnp.ndarray, conn: FaceConnectivity,
                          inv_volume: jnp.ndarray, gamma: float = 1.4,
                          flux: str = "kepes", mode: str = "gather",
                          limiter: str = "bj", dim: int = 2,
                          ghost: jnp.ndarray = None):
    """Second-order counterpart of ops/fluxes.flux_divergence: limited
    MUSCL interface states feeding the same KEPES/HLL numerical flux and
    the same deterministic accumulate.  Returns (accum [5, capacity],
    max_speed scalar)."""
    u_lf, u_rf, u_bf = reconstruct_sides(u, conn, inv_volume, gamma,
                                         mode, limiter, dim)
    q_l = euler.cell_fields(u_lf, gamma, flux)
    q_r = euler.cell_fields(u_rf, gamma, flux)
    f, speed = face_fluxes_from_sides(q_l, q_r, conn, gamma, flux)
    if conn.boundary_capacity:
        q_b = euler.cell_fields(u_bf, gamma, flux)
        fb, speed_b = boundary_fluxes_from_side(q_b, conn, gamma, flux,
                                                ghost)
    else:
        fb = jnp.zeros((5, 0), u.dtype)
        speed_b = jnp.zeros((0,), u.dtype)
    acc = accumulate(f, fb, conn, mode)
    max_speed = jnp.maximum(
        speed.max() if speed.size else 0.0,
        speed_b.max() if speed_b.size else 0.0)
    return acc, max_speed
