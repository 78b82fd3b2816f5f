"""Exact solution of the 1D Euler Riemann problem (host-side, NumPy).

Validation utility: the classical two-shock/two-rarefaction exact solver
(Toro, "Riemann Solvers and Numerical Methods for Fluid Dynamics",
ch. 4) — Newton iteration for the star-region pressure, then vectorized
sampling of the self-similar solution W(x/t).  Used by
`examples/sod.py` and `tests/test_sod.py` to measure the solver's error
against the exact Sod shock-tube solution (shock / contact / rarefaction
plateaus), a validation artifact the reference lacks entirely (it has no
tests, SURVEY.md §4).

Pure NumPy on the host: this is a measurement tool, not a compute path.
"""

from __future__ import annotations

import numpy as np


def _f_and_deriv(p, rho_k, p_k, a_k, gamma):
    """Toro eq. 4.6/4.7: flux function f_K(p) and df/dp for one side."""
    g = gamma
    A = 2.0 / ((g + 1.0) * rho_k)
    B = (g - 1.0) / (g + 1.0) * p_k
    if p > p_k:          # shock
        q = np.sqrt(A / (p + B))
        f = (p - p_k) * q
        df = q * (1.0 - 0.5 * (p - p_k) / (p + B))
    else:                # rarefaction
        f = 2.0 * a_k / (g - 1.0) * ((p / p_k) ** ((g - 1.0) / (2.0 * g)) - 1.0)
        df = (p / p_k) ** (-(g + 1.0) / (2.0 * g)) / (rho_k * a_k)
    return f, df


def star_state(rho_l, u_l, p_l, rho_r, u_r, p_r, gamma=1.4,
               tol=1e-12, max_iter=100):
    """Pressure and velocity in the star region (Toro 4.3.2).

    Newton-Raphson on f_L(p) + f_R(p) + (u_r - u_l) = 0, seeded with the
    PVRS (primitive-variable) guess, floored to keep p positive.
    """
    a_l = np.sqrt(gamma * p_l / rho_l)
    a_r = np.sqrt(gamma * p_r / rho_r)
    du = u_r - u_l

    # PVRS guess (Toro eq. 4.47), floored
    p = max(0.5 * (p_l + p_r)
            - 0.125 * du * (rho_l + rho_r) * (a_l + a_r), 1e-8 * (p_l + p_r))
    for _ in range(max_iter):
        f_l, df_l = _f_and_deriv(p, rho_l, p_l, a_l, gamma)
        f_r, df_r = _f_and_deriv(p, rho_r, p_r, a_r, gamma)
        dp = (f_l + f_r + du) / (df_l + df_r)
        p_new = max(p - dp, 1e-10 * (p_l + p_r))
        if abs(p_new - p) <= tol * 0.5 * (p_new + p):
            p = p_new
            break
        p = p_new
    f_l, _ = _f_and_deriv(p, rho_l, p_l, a_l, gamma)
    f_r, _ = _f_and_deriv(p, rho_r, p_r, a_r, gamma)
    u = 0.5 * (u_l + u_r) + 0.5 * (f_r - f_l)
    return p, u


def sample(xi, rho_l, u_l, p_l, rho_r, u_r, p_r, gamma=1.4):
    """Sample the self-similar solution at speeds xi = x/t (vectorized).

    Returns (rho, u, p) arrays.  Toro 4.5 (fig. 4.14's decision tree),
    vectorized with np.where over the wave-pattern regions.
    """
    xi = np.asarray(xi, dtype=np.float64)
    g = gamma
    a_l = np.sqrt(g * p_l / rho_l)
    a_r = np.sqrt(g * p_r / rho_r)
    p_s, u_s = star_state(rho_l, u_l, p_l, rho_r, u_r, p_r, gamma)

    gm1, gp1 = g - 1.0, g + 1.0

    # left wave
    if p_s > p_l:        # left shock
        s_l = u_l - a_l * np.sqrt(gp1 / (2 * g) * p_s / p_l + gm1 / (2 * g))
        rho_sl = rho_l * ((p_s / p_l + gm1 / gp1)
                          / (gm1 / gp1 * p_s / p_l + 1.0))
        left_head = left_tail = s_l
    else:                # left rarefaction
        rho_sl = rho_l * (p_s / p_l) ** (1.0 / g)
        a_sl = a_l * (p_s / p_l) ** (gm1 / (2 * g))
        left_head = u_l - a_l
        left_tail = u_s - a_sl

    # right wave
    if p_s > p_r:        # right shock
        s_r = u_r + a_r * np.sqrt(gp1 / (2 * g) * p_s / p_r + gm1 / (2 * g))
        rho_sr = rho_r * ((p_s / p_r + gm1 / gp1)
                          / (gm1 / gp1 * p_s / p_r + 1.0))
        right_head = right_tail = s_r
    else:                # right rarefaction
        rho_sr = rho_r * (p_s / p_r) ** (1.0 / g)
        a_sr = a_r * (p_s / p_r) ** (gm1 / (2 * g))
        right_head = u_r + a_r
        right_tail = u_s + a_sr

    # fan interiors (Toro eq. 4.56 / 4.63)
    u_lf = 2.0 / gp1 * (a_l + gm1 / 2.0 * u_l + xi)
    a_lf = 2.0 / gp1 * (a_l + gm1 / 2.0 * (u_l - xi))
    rho_lf = rho_l * (a_lf / a_l) ** (2.0 / gm1)
    p_lf = p_l * (a_lf / a_l) ** (2.0 * g / gm1)

    u_rf = 2.0 / gp1 * (-a_r + gm1 / 2.0 * u_r + xi)
    a_rf = 2.0 / gp1 * (a_r - gm1 / 2.0 * (u_r - xi))
    rho_rf = rho_r * (a_rf / a_r) ** (2.0 / gm1)
    p_rf = p_r * (a_rf / a_r) ** (2.0 * g / gm1)

    rho = np.where(xi < left_head, rho_l,
          np.where(xi < left_tail, rho_lf,
          np.where(xi < u_s, rho_sl,
          np.where(xi < right_tail, rho_sr,
          np.where(xi < right_head, rho_rf, rho_r)))))
    u = np.where(xi < left_head, u_l,
        np.where(xi < left_tail, u_lf,
        np.where(xi < u_s, u_s,
        np.where(xi < right_tail, u_s,
        np.where(xi < right_head, u_rf, u_r)))))
    p = np.where(xi < left_head, p_l,
        np.where(xi < left_tail, p_lf,
        np.where(xi < u_s, p_s,
        np.where(xi < right_tail, p_s,
        np.where(xi < right_head, p_rf, p_r)))))
    return rho, u, p


def sod_solution(x, t, x0=0.5, gamma=1.4):
    """Exact Sod shock-tube solution at positions x and time t.

    Standard Sod states: left (1, 0, 1), right (0.125, 0, 0.1).
    Returns (rho, u, p).  At t=0 returns the initial discontinuity.
    """
    x = np.asarray(x, dtype=np.float64)
    if t <= 0.0:
        left = x < x0
        return (np.where(left, 1.0, 0.125), np.zeros_like(x),
                np.where(left, 1.0, 0.1))
    return sample((x - x0) / t, 1.0, 0.0, 1.0, 0.125, 0.0, 0.1, gamma)


def sod_ic(centers: np.ndarray, gamma: float = 1.4,
           x0: float = 0.5) -> np.ndarray:
    """Sod initial condition as a conservative state [5, N] (f32),
    matching the IC convention of models/initial_conditions.py."""
    x = centers[:, 0]
    left = x < x0
    rho = np.where(left, 1.0, 0.125)
    p = np.where(left, 1.0, 0.1)
    z = np.zeros_like(rho)
    rho_e = p / (gamma - 1.0)
    return np.stack([rho, z, z, z, rho_e]).astype(np.float32)
