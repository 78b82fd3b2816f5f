"""Compressible-Euler numerical fluxes, vectorized over batches of faces.

Re-derivation of the reference device functions for TPU/XLA:

  - `ln_mean`           stable logarithmic mean      (ref examples/compressible_euler/kernels.cu:24-36)
  - `kepes_flux`        KEPES central flux           (ref kernels.cu:38-93)
  - `kepes_es_flux`     + entropy-variable jump dissipation via the
                        RHat.diag(DHat).RHat^T eigendecomposition
                                                     (ref kernels.cu:95-133,224-279)
  - `hll_flux`          Roe-speed HLL flux           (ref examples/subgrid/kernels.inl:264-332)
  - `face_basis` / rotations                         (ref kernels.cu:174-193, kernels.inl:132-186)

Conventions: a state batch is an array `u` of shape [5, F] whose component
rows are (rho, rho*v1, rho*v2, rho*v3, rho*e).  2D problems still carry all
three momentum components (the reference does the same: Rho_v3 is zero in the
2D subgrid solver, examples/subgrid/solver.inl:97).  All functions are pure,
jit-friendly and layout-agnostic over the trailing batch dimensions.

Unlike the reference (gamma hard-wired to 1.4 with a TODO, kernels.cu:49),
gamma is a parameter; it is a python float, hence static under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

N_VARS = 5  # rho, rho*v1, rho*v2, rho*v3, rho*e


def ln_mean(a_l: jnp.ndarray, a_r: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable logarithmic mean (aR - aL) / log(aR / aL).

    Uses the same 4-term Padé-style series as the reference near aL == aR
    (ref kernels.cu:24-36).
    """
    xi = a_r / a_l
    u = (xi * (xi - 2.0) + 1.0) / (xi * (xi + 2.0) + 1.0)
    series = (a_l + a_r) * 52.5 / (105.0 + u * (35.0 + u * (21.0 + u * 15.0)))
    # Guard the log against xi == 1 (u == 0 selects the series branch anyway).
    safe_xi = jnp.where(u < 1.0e-4, 2.0, xi)
    exact = (a_r - a_l) / jnp.log(safe_xi)
    return jnp.where(u < 1.0e-4, series, exact)


def primitives(u: jnp.ndarray, gamma: float):
    """(velocity[3,...], pressure) from a conservative state batch [5,...]."""
    s_rho = 1.0 / u[0]
    vel = u[1:4] * s_rho
    kinetic = 0.5 * (u[1] * vel[0] + u[2] * vel[1] + u[3] * vel[2])
    p = (gamma - 1.0) * (u[4] - kinetic)
    return vel, p


class KepesHats(NamedTuple):
    """Interface-averaged quantities produced alongside the KEPES flux."""

    u_hat: jnp.ndarray
    v_hat: jnp.ndarray
    w_hat: jnp.ndarray
    a_hat: jnp.ndarray
    rho_hat: jnp.ndarray
    h_hat: jnp.ndarray
    p1_hat: jnp.ndarray


def kepes_flux(u_l: jnp.ndarray, u_r: jnp.ndarray, gamma: float = 1.4):
    """Kinetic-energy- and entropy-preserving central flux (Chandrashekar).

    Inputs are face-normal-rotated states [5, F]; the flux is along the first
    momentum component (the face normal).  Returns (F_star [5,F], KepesHats).
    Mirrors ref kernels.cu:38-93.
    """
    kappa_m1 = gamma - 1.0

    s_rho_l = 1.0 / u_l[0]
    vel_l = u_l[1:4] * s_rho_l
    s_rho_r = 1.0 / u_r[0]
    vel_r = u_r[1:4] * s_rho_r

    vel2s2_l = 0.5 * (vel_l[0] ** 2 + vel_l[1] ** 2 + vel_l[2] ** 2)
    vel2s2_r = 0.5 * (vel_r[0] ** 2 + vel_r[1] ** 2 + vel_r[2] ** 2)

    p_l = kappa_m1 * (u_l[4] - u_l[0] * vel2s2_l)
    p_r = kappa_m1 * (u_r[4] - u_r[0] * vel2s2_r)

    beta_l = 0.5 * u_l[0] / p_l
    beta_r = 0.5 * u_r[0] / p_r

    rho_mean = 0.5 * (u_l[0] + u_r[0])
    rho_hat = ln_mean(u_l[0], u_r[0])
    beta_mean = 0.5 * (beta_l + beta_r)
    beta_hat = ln_mean(beta_l, beta_r)

    u_hat = 0.5 * (vel_l[0] + vel_r[0])
    v_hat = 0.5 * (vel_l[1] + vel_r[1])
    w_hat = 0.5 * (vel_l[2] + vel_r[2])
    a_hat = jnp.sqrt(gamma * 0.5 * (p_l + p_r) / rho_hat)
    h_hat = gamma / (2.0 * kappa_m1 * beta_hat) + 0.5 * (
        vel_l[0] * vel_r[0] + vel_l[1] * vel_r[1] + vel_l[2] * vel_r[2]
    )
    p1_hat = 0.5 * rho_mean / beta_mean
    vel2_m = vel2s2_l + vel2s2_r

    f0 = rho_hat * u_hat
    f1 = f0 * u_hat + p1_hat
    f2 = f0 * v_hat
    f3 = f0 * w_hat
    f4 = f0 * 0.5 * (1.0 / (kappa_m1 * beta_hat) - vel2_m) + u_hat * f1 + v_hat * f2 + w_hat * f3

    f_star = jnp.stack([f0, f1, f2, f3, f4])
    return f_star, KepesHats(u_hat, v_hat, w_hat, a_hat, rho_hat, h_hat, p1_hat)


def _entropy_variables(u: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Entropy variables v(u) used for the dissipation jump (ref kernels.cu:236-262)."""
    kappa_m1 = gamma - 1.0
    vel, p = primitives(u, gamma)
    s = jnp.log(p) - gamma * jnp.log(u[0])
    rho_p = u[0] / p
    v0 = (gamma - s) / kappa_m1 - 0.5 * rho_p * (vel[0] ** 2 + vel[1] ** 2 + vel[2] ** 2)
    return jnp.stack([v0, rho_p * vel[0], rho_p * vel[1], rho_p * vel[2], -rho_p])


def kepes_es_flux(u_l: jnp.ndarray, u_r: jnp.ndarray, gamma: float = 1.4):
    """Entropy-stable KEPES flux: central part minus 0.5 * R diag(D) R^T [[v]].

    Returns (flux [5, F], speed [F]) where speed = |uHat| + aHat is the
    per-face wave-speed estimate used for the CFL timestep
    (ref kernels.cu:222, solver.cu:213-229).
    """
    f_star, hats = kepes_flux(u_l, u_r, gamma)
    uh, vh, wh, ah, rhoh, hh, p1h = hats

    # Eigenvalue-scaled diagonal (ref kernels.cu:128-132).
    d0 = 0.5 * jnp.abs(uh - ah) * rhoh / gamma
    d1 = jnp.abs(uh) * ((gamma - 1.0) / gamma) * rhoh
    d2 = jnp.abs(uh) * p1h
    d3 = d2
    d4 = 0.5 * jnp.abs(uh + ah) * rhoh / gamma

    dv = _entropy_variables(u_r, gamma) - _entropy_variables(u_l, gamma)

    # w = R^T dv, with R the right-eigenvector matrix of ref kernels.cu:114-123.
    # Columns of R: k=0 (u-a), k=1 (entropy), k=2/3 (shear), k=4 (u+a).
    ek = 0.5 * (uh * uh + vh * vh + wh * wh)
    w0 = dv[0] + (uh - ah) * dv[1] + vh * dv[2] + wh * dv[3] + (hh - uh * ah) * dv[4]
    w1 = dv[0] + uh * dv[1] + vh * dv[2] + wh * dv[3] + ek * dv[4]
    w2 = dv[2] + vh * dv[4]
    w3 = dv[3] + wh * dv[4]
    w4 = dv[0] + (uh + ah) * dv[1] + vh * dv[2] + wh * dv[3] + (hh + uh * ah) * dv[4]

    g0, g1, g2, g3, g4 = d0 * w0, d1 * w1, d2 * w2, d3 * w3, d4 * w4

    # diss = R g (rows of R, ref kernels.cu:272-275).
    diss0 = g0 + g1 + g4
    diss1 = (uh - ah) * g0 + uh * g1 + (uh + ah) * g4
    diss2 = vh * g0 + vh * g1 + g2 + vh * g4
    diss3 = wh * g0 + wh * g1 + g3 + wh * g4
    diss4 = (hh - uh * ah) * g0 + ek * g1 + vh * g2 + wh * g3 + (hh + uh * ah) * g4
    diss = jnp.stack([diss0, diss1, diss2, diss3, diss4])

    flux = f_star - 0.5 * diss
    speed = jnp.abs(uh) + ah
    return flux, speed


def hll_flux(u_l: jnp.ndarray, u_r: jnp.ndarray, gamma: float = 1.4):
    """HLL flux with Roe-averaged wave speed estimates (ref kernels.inl:264-332).

    Returns (flux [5, F], speed [F]) with speed = max(|S_l|, |S_r|).
    """
    vel_l, p_l = primitives(u_l, gamma)
    vel_r, p_r = primitives(u_r, gamma)

    h_l = (u_l[4] + p_l) / u_l[0]
    h_r = (u_r[4] + p_r) / u_r[0]
    c_l = jnp.sqrt((gamma - 1.0) * (h_l - 0.5 * (vel_l[0] ** 2 + vel_l[1] ** 2 + vel_l[2] ** 2)))
    c_r = jnp.sqrt((gamma - 1.0) * (h_r - 0.5 * (vel_r[0] ** 2 + vel_r[1] ** 2 + vel_r[2] ** 2)))

    sq_l = jnp.sqrt(u_l[0])
    sq_r = jnp.sqrt(u_r[0])
    inv_w = 1.0 / (sq_l + sq_r)
    v1 = (sq_l * vel_l[0] + sq_r * vel_r[0]) * inv_w
    v2 = (sq_l * vel_l[1] + sq_r * vel_r[1]) * inv_w
    v3 = (sq_l * vel_l[2] + sq_r * vel_r[2]) * inv_w
    h_roe = (sq_l * h_l + sq_r * h_r) * inv_w
    c_roe = jnp.sqrt((gamma - 1.0) * (h_roe - 0.5 * (v1 * v1 + v2 * v2 + v3 * v3)))

    s_l = jnp.minimum(v1 - c_roe, vel_l[0] - c_l)
    s_r = jnp.maximum(v1 + c_roe, vel_r[0] + c_r)

    f_l = jnp.stack([
        u_l[1],
        u_l[1] * vel_l[0] + p_l,
        u_l[1] * vel_l[1],
        u_l[1] * vel_l[2],
        u_l[1] * h_l,
    ])
    f_r = jnp.stack([
        u_r[1],
        u_r[1] * vel_r[0] + p_r,
        u_r[1] * vel_r[1],
        u_r[1] * vel_r[2],
        u_r[1] * h_r,
    ])

    s_l_c = jnp.minimum(s_l, 0.0)
    s_r_c = jnp.maximum(s_r, 0.0)
    flux = ((s_r_c * f_l - s_l_c * f_r) + (s_r_c * s_l_c) * (u_r - u_l)) / (s_r_c - s_l_c)
    speed = jnp.maximum(jnp.abs(s_l), jnp.abs(s_r))
    return flux, speed


# ---------------------------------------------------------------------------
# Face-local orthonormal basis and state rotations (ref kernels.cu:174-193,
# kernels.inl:132-186).  Normals always carry 3 components; 2D meshes set
# nz = 0, matching the reference 2D subgrid path (kernels.inl:824).
# ---------------------------------------------------------------------------


def face_basis(n: jnp.ndarray):
    """Complete unit normals [3, F] to an orthonormal basis (n, t1, t2).

    Same construction as the reference: seed t1 with a permuted normal,
    project out n, normalize, then t2 = n x t1 (ref kernels.cu:177-193).
    Degenerate only for n parallel to (1,-1,1)/sqrt(3), like the reference.
    """
    t1 = jnp.stack([n[1], n[2], -n[0]])
    dot = n[0] * t1[0] + n[1] * t1[1] + n[2] * t1[2]
    t1 = t1 - dot * n
    t1 = t1 / jnp.sqrt(t1[0] ** 2 + t1[1] ** 2 + t1[2] ** 2)
    t2 = jnp.stack([
        n[1] * t1[2] - n[2] * t1[1],
        n[2] * t1[0] - n[0] * t1[2],
        n[0] * t1[1] - n[1] * t1[0],
    ])
    return n, t1, t2


def rotate_state(u: jnp.ndarray, n, t1, t2) -> jnp.ndarray:
    """Rotate momentum from (x,y,z) into the face basis (n,t1,t2)."""
    return jnp.stack([
        u[0],
        u[1] * n[0] + u[2] * n[1] + u[3] * n[2],
        u[1] * t1[0] + u[2] * t1[1] + u[3] * t1[2],
        u[1] * t2[0] + u[2] * t2[1] + u[3] * t2[2],
        u[4],
    ])


def reflect_state(u: jnp.ndarray, n, t1, t2) -> jnp.ndarray:
    """Mirror ghost state: rotated state with negated normal momentum
    (ref kernels.cu:371-375, kernels.inl:168-176)."""
    r = rotate_state(u, n, t1, t2)
    return r.at[1].multiply(-1.0)


def inverse_rotate_state(u_rot: jnp.ndarray, n, t1, t2) -> jnp.ndarray:
    """Rotate momentum back from (n,t1,t2) to (x,y,z)."""
    return jnp.stack([
        u_rot[0],
        u_rot[1] * n[0] + u_rot[2] * t1[0] + u_rot[3] * t2[0],
        u_rot[1] * n[1] + u_rot[2] * t1[1] + u_rot[3] * t2[1],
        u_rot[1] * n[2] + u_rot[2] * t1[2] + u_rot[3] * t2[2],
        u_rot[4],
    ])


FLUXES = {
    "kepes": kepes_es_flux,
    "hll": hll_flux,
}


def numerical_flux(u_l, u_r, gamma: float = 1.4, flux: str = "kepes"):
    """Dispatch on the flux family (static under jit)."""
    return FLUXES[flux](u_l, u_r, gamma)
