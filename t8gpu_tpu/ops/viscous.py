"""Viscous (compressible Navier-Stokes) terms for the plain-element path.

Beyond-reference physics: the reference integrates the inviscid Euler
system only (its flux kernels consume cell states and know no gradients,
examples/compressible_euler/kernels.cu:135-309).  Here the full
Newtonian stress tensor + Fourier heat conduction enter as a diffusive
face flux on ANY element class (bricks, prisms, triangles, tets),
built from the same TPU-friendly primitives as the inviscid path:
transposed column gathers + the CSR incidence accumulate — no scatters,
deterministic.

Scheme (standard cell-centered FV viscous discretization)
---------------------------------------------------------
1. Per-element primitive gradients grad(vx, vy, vz, T) by Green-Gauss
   (the machinery of ops/reconstruct.green_gauss_gradients, generalized
   to any row count), with T = p/rho (R = 1 nondimensionalization, so
   cp = gamma/(gamma-1) and kappa = mu*cp/Pr).
2. Face gradients = the neighbor average PLUS the compact normal
   correction (replace the average's component along the centroid
   segment e = (x_R - x_L)/|x_R - x_L| with the two-point difference
   (phi_R - phi_L)/|x_R - x_L|) — second order on smooth meshes and
   immune to odd-even decoupling (the pure average admits a
   checkerboard null space).
3. tau = mu (grad v + grad v^T) - (2/3) mu (div v) I   (Stokes
   hypothesis); face flux rows [0, tau.n, (tau.v_face + kappa grad T).n]
   scaled by the face area and accumulated with the conservative sign
   (momentum/energy flow from fast/hot to slow/cold; exactly
   conservative, like the inviscid accumulate).
4. Walls: "slip" (default) contributes NO viscous flux — the mirror
   ghost makes reflective walls free-slip adiabatic, consistent with
   the inviscid wall model; "noslip" adds the wall shear from the
   one-sided normal derivative (boundary_viscous_flux), still
   adiabatic.

Constant dynamic viscosity mu (the reference nondimensional setting for
shear-layer problems; Sutherland's law would slot into `face_mu`).
"""

from __future__ import annotations

import jax.numpy as jnp

from t8gpu_tpu.mesh.connectivity import FaceConnectivity
from t8gpu_tpu.ops.fluxes import accumulate, gather_cols
from t8gpu_tpu.ops.reconstruct import _require_geometry


def primitive_rows(u: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """[vx, vy, vz, T] rows from a conservative batch [5, cap]; T = p/rho
    (R = 1)."""
    s_rho = 1.0 / u[0]
    v1, v2, v3 = u[1] * s_rho, u[2] * s_rho, u[3] * s_rho
    ke = 0.5 * (v1 * u[1] + v2 * u[2] + v3 * u[3])
    p = (gamma - 1.0) * (u[4] - ke)
    return jnp.stack([v1, v2, v3, p * s_rho])


def green_gauss_rows(phi: jnp.ndarray, conn: FaceConnectivity,
                     inv_volume: jnp.ndarray, mode: str = "gather"):
    """Green-Gauss gradient of ANY row batch [C, cap] -> [C, 3, cap]
    (ops/reconstruct.green_gauss_gradients generalized beyond 5 rows;
    boundary faces use the owner value — the O(h) free-slip wall
    convention shared with the order-2 reconstruction)."""
    C = phi.shape[0]
    p_l = gather_cols(phi, conn.left)
    p_r = gather_cols(phi, conn.right)
    mean = 0.5 * (p_l + p_r)                              # [C, F]
    an = conn.normal * conn.area                          # [3, F]
    c = (mean[:, None, :] * an[None]).reshape(3 * C, -1)
    if conn.boundary_capacity:
        p_b = gather_cols(phi, conn.b_elem)
        cb = (p_b[:, None, :] * (conn.b_normal * conn.b_area)[None]
              ).reshape(3 * C, -1)
    else:
        cb = jnp.zeros((3 * C, 0), phi.dtype)
    acc = accumulate(c, cb, conn, mode)                   # [3C, cap]
    # accumulate is signed for flux divergence (emitter -, receiver +);
    # Green-Gauss wants the OUTWARD surface integral = its negation.
    return (-acc * inv_volume).reshape(C, 3, -1)


def face_flux_from_sides(phi_l, phi_r, g_l, g_r, normal, area, d_lr,
                         gamma: float, mu: float, prandtl: float):
    """Area-scaled PHYSICAL viscous face flux F_visc . n [5, F] from
    per-side primitive rows phi_{l,r} [4, F], per-side gradients g_{l,r}
    [4, 3, F], face normal/area and the centroid segment
    d_lr = x_R - x_L [3, F].  Shared by the single-device and sharded
    paths (the latter gathers its sides from halo-extended axes)."""
    kappa = mu * gamma / ((gamma - 1.0) * prandtl)        # mu cp / Pr
    dtype = phi_l.dtype
    g_avg = 0.5 * (g_l + g_r)                             # [4, 3, F]

    # compact normal correction along the centroid segment
    dist2 = (d_lr * d_lr).sum(axis=0)
    dist = jnp.sqrt(jnp.where(dist2 > 0, dist2, 1.0))
    live = (dist2 > 0).astype(dtype)                      # padded faces: off
    e = d_lr / dist                                       # [3, F]
    ddn = (phi_r - phi_l) / dist                          # two-point [4, F]
    g_e = (g_avg * e[None]).sum(axis=1)                   # [4, F]
    g_f = g_avg + ((ddn - g_e) * live)[:, None, :] * e[None]   # [4, 3, F]

    gv = g_f[:3]                                          # [3(v), 3(d), F]
    div_v = gv[0, 0] + gv[1, 1] + gv[2, 2]
    n = normal                                            # [3, F]
    v_f = 0.5 * (phi_l[:3] + phi_r[:3])                   # [3, F]

    # tau . n and (tau . v + kappa grad T) . n, tau symmetric
    tau_n = []
    for j in range(3):
        t_jn = sum((gv[j, i] + gv[i, j]) * n[i] for i in range(3))
        tau_n.append(mu * (t_jn - (2.0 / 3.0) * div_v * n[j]))
    work = v_f[0] * tau_n[0] + v_f[1] * tau_n[1] + v_f[2] * tau_n[2]
    heat = kappa * (g_f[3] * n).sum(axis=0)

    zero = jnp.zeros_like(div_v)
    fv = jnp.stack([zero, tau_n[0], tau_n[1], tau_n[2], work + heat])
    return fv * area


def viscous_face_flux(u: jnp.ndarray, conn: FaceConnectivity,
                      inv_volume: jnp.ndarray, gamma: float, mu: float,
                      prandtl: float, mode: str = "gather"):
    """Area-scaled PHYSICAL viscous flux F_visc . n per interior face
    [5, Fcap] (row 0 zero).  The conservative system is
    dU/dt + div(F_inv - F_visc) = 0, so callers accumulate its NEGATION
    alongside the inviscid flux."""
    _require_geometry(conn)
    phi = primitive_rows(u, gamma)                        # [4, cap]
    grad = green_gauss_rows(phi, conn, inv_volume, mode)  # [4, 3, cap]
    gflat = grad.reshape(12, -1)

    phi_l = gather_cols(phi, conn.left)                   # [4, F]
    phi_r = gather_cols(phi, conn.right)
    g_l = gather_cols(gflat, conn.left).reshape(4, 3, -1)
    g_r = gather_cols(gflat, conn.right).reshape(4, 3, -1)
    d_lr = conn.d_left - conn.d_right                     # x_R - x_L [3, F]
    return face_flux_from_sides(phi_l, phi_r, g_l, g_r, conn.normal,
                                conn.area, d_lr, gamma, mu, prandtl)


def boundary_viscous_flux(u: jnp.ndarray, conn: FaceConnectivity,
                          gamma: float, mu: float, wall_velocity=None,
                          prandtl: float = 0.72,
                          wall_temperature=None):
    """Area-scaled PHYSICAL viscous wall flux F_visc . n [5, Fbcap] for
    NO-SLIP adiabatic walls: the wall shear from the one-sided normal
    derivative toward the wall velocity (its tangential projection —
    the normal component would violate impermeability), the wall work
    tau . v_wall (zero for resting walls: drained kinetic energy
    reappears as interior heat, conserving total energy; a MOVING wall
    injects energy through its shear — lid-driven cavities, Couette
    flow), and the wall heat flux kappa (T_wall - T)/dn when a wall
    temperature is set (isothermal walls — heated/cooled cavities;
    None = adiabatic, zero heat flux).  Slip walls (the default)
    contribute nothing instead."""
    phi = primitive_rows(u, gamma)
    v_own = gather_cols(phi, conn.b_elem)[:3]             # [3, Fb]
    n = conn.b_normal
    if wall_velocity is None:
        vw = jnp.zeros((3, 1), u.dtype)
    else:
        # a uniform (3,) tuple/array, or a per-face [3, Fb] field (e.g.
        # only the lid moving) — both broadcast below
        vw = jnp.asarray(wall_velocity, u.dtype)
        if vw.ndim == 1:
            vw = vw[:, None]
    vw_t = vw - (vw * n).sum(axis=0) * n                  # tangential [3, Fb]
    # wall distance along the normal (d_b = x_face - x_own)
    dn = jnp.abs((conn.d_b * n).sum(axis=0))
    live = (dn > 0).astype(u.dtype)
    dn = jnp.where(dn > 0, dn, 1.0)
    dvdn = ((vw_t - v_own) / dn) * live
    # grad v ~ dvdn (x) n  =>  tau . n = mu (dvdn + (1/3)(dvdn.n) n)
    ddn_n = (dvdn * n).sum(axis=0)
    tau_n = mu * (dvdn + (1.0 / 3.0) * ddn_n * n)
    work = (vw_t * tau_n).sum(axis=0) * live
    if wall_temperature is not None:
        kappa = mu * gamma / ((gamma - 1.0) * prandtl)
        t_own = gather_cols(phi, conn.b_elem)[3]
        work = work + kappa * ((wall_temperature - t_own) / dn) * live
    zero = jnp.zeros_like(dn)
    return jnp.stack([zero, tau_n[0], tau_n[1], tau_n[2],
                      work]) * conn.b_area


def viscous_speed_bound(u: jnp.ndarray, inv_volume: jnp.ndarray,
                        gamma: float, mu: float, prandtl: float,
                        dim: int):
    """Conservative global wave-speed equivalent of the diffusive
    stability rate 2 dim nu_eff / h (nu_eff the larger of momentum and
    thermal diffusivity at the smallest density).  Callers must ADD this
    to the advective speed, not max it: the combined acoustic +
    diffusive eigenvalue leaves the SSP-RK3 stability region even when
    each part alone is inside (measured: grid-scale pressure noise with
    conduction blows up at the maxed dt and is stable at the summed
    one), so dt = cfl h / (speed_adv + speed_visc)."""
    live = inv_volume > 0
    rho_min = jnp.where(live, u[0], jnp.inf).min()
    h_min = jnp.where(live, inv_volume, 0.0).max() ** (-1.0 / dim)
    nu = (mu / rho_min) * max(1.0, gamma / prandtl)
    return 2.0 * dim * nu / h_min


def with_viscosity(flux_fn, conn: FaceConnectivity, inv_volume: jnp.ndarray,
                   gamma: float, mu: float, prandtl: float, dim: int,
                   mode: str = "gather", wall: str = "slip",
                   wall_velocity=None, wall_temperature=None):
    """Wrap a (u -> (divergence, speed)) closure so every evaluation adds
    the viscous divergence (and folds the diffusive dt limit into the
    returned speed) — the same unsplit-composition pattern as
    ops/source.with_gravity, so gravity + viscosity + any order compose.

    wall: "slip" (free-slip adiabatic, matching the inviscid reflective
    model — zero viscous wall flux) or "noslip" (wall shear from the
    one-sided normal derivative; still adiabatic)."""
    mu = float(mu)
    if wall not in ("slip", "noslip"):
        raise ValueError(f"unknown viscous wall model: {wall!r}")

    def fn(u):
        d, speed = flux_fn(u)
        fv = viscous_face_flux(u, conn, inv_volume, gamma, mu, prandtl,
                               mode)
        if wall == "noslip" and conn.boundary_capacity:
            fb = boundary_viscous_flux(u, conn, gamma, mu, wall_velocity,
                                       prandtl, wall_temperature)
        else:
            fb = jnp.zeros((5, conn.boundary_capacity), u.dtype)
        d = d + accumulate(-fv, -fb, conn, mode)
        # SUM the diffusive rate into the CFL speed (see
        # viscous_speed_bound: max() is NOT stable for the coupled system)
        speed = speed + viscous_speed_bound(u, inv_volume, gamma, mu,
                                            prandtl, dim)
        return d, speed

    return fn
