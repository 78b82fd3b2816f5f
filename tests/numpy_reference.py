"""Independent scalar float64 NumPy implementations of the Euler numerics.

Written directly from the scheme definitions (Chandrashekar KEPES flux with
Barth-style eigen-dissipation; Roe-speed HLL) to serve as golden references
for the vectorized JAX kernels.  Deliberately scalar and simple.
"""

import numpy as np

GAMMA = 1.4


def ln_mean_ref(a, b):
    if abs(a - b) < 1e-12 * max(abs(a), abs(b)):
        return 0.5 * (a + b)
    return (b - a) / np.log(b / a)


def pressure(u, gamma=GAMMA):
    rho, m1, m2, m3, e = u
    return (gamma - 1.0) * (e - 0.5 * (m1 * m1 + m2 * m2 + m3 * m3) / rho)


def kepes_central_flux(uL, uR, gamma=GAMMA):
    """Chandrashekar's KEP/ES central flux along the first momentum axis."""
    rhoL, rhoR = uL[0], uR[0]
    vL = np.array([uL[1], uL[2], uL[3]]) / rhoL
    vR = np.array([uR[1], uR[2], uR[3]]) / rhoR
    pL, pR = pressure(uL, gamma), pressure(uR, gamma)
    betaL = rhoL / (2 * pL)
    betaR = rhoR / (2 * pR)

    rho_ln = ln_mean_ref(rhoL, rhoR)
    beta_ln = ln_mean_ref(betaL, betaR)
    v_avg = 0.5 * (vL + vR)
    p_avg = 0.5 * (rhoL + rhoR) / (betaL + betaR)  # = mean(rho)/(2 mean(beta))
    v_dot = np.dot(vL, vR)

    f = np.zeros(5)
    f[0] = rho_ln * v_avg[0]
    f[1] = f[0] * v_avg[0] + p_avg
    f[2] = f[0] * v_avg[1]
    f[3] = f[0] * v_avg[2]
    # Energy flux per Chandrashekar (2013): uses 1/(2*(gamma-1)*beta_ln)
    # and the product-mean of velocities.
    vel2_L = np.dot(vL, vL)
    vel2_R = np.dot(vR, vR)
    f[4] = (
        f[0] * 0.5 * (1.0 / ((gamma - 1.0) * beta_ln) - 0.5 * (vel2_L + vel2_R))
        + v_avg[0] * f[1] + v_avg[1] * f[2] + v_avg[2] * f[3]
    )
    return f


def entropy_vars(u, gamma=GAMMA):
    rho = u[0]
    v = np.array([u[1], u[2], u[3]]) / rho
    p = pressure(u, gamma)
    s = np.log(p) - gamma * np.log(rho)
    rp = rho / p
    return np.array([
        (gamma - s) / (gamma - 1.0) - 0.5 * rp * np.dot(v, v),
        rp * v[0], rp * v[1], rp * v[2], -rp,
    ])


def kepes_es_flux_ref(uL, uR, gamma=GAMMA):
    """KEPES central flux + entropy dissipation via R diag(D) R^T jump."""
    f_star = kepes_central_flux(uL, uR, gamma)

    rhoL, rhoR = uL[0], uR[0]
    vL = np.array([uL[1], uL[2], uL[3]]) / rhoL
    vR = np.array([uR[1], uR[2], uR[3]]) / rhoR
    pL, pR = pressure(uL, gamma), pressure(uR, gamma)
    betaL = rhoL / (2 * pL)
    betaR = rhoR / (2 * pR)

    rho_ln = ln_mean_ref(rhoL, rhoR)
    beta_ln = ln_mean_ref(betaL, betaR)
    uh, vh, wh = 0.5 * (vL + vR)
    a_hat = np.sqrt(gamma * 0.5 * (pL + pR) / rho_ln)
    h_hat = gamma / (2 * (gamma - 1.0) * beta_ln) + 0.5 * np.dot(vL, vR)
    p1_hat = 0.5 * (rhoL + rhoR) / (betaL + betaR)

    R = np.array([
        [1.0, 1.0, 0.0, 0.0, 1.0],
        [uh - a_hat, uh, 0.0, 0.0, uh + a_hat],
        [vh, vh, 1.0, 0.0, vh],
        [wh, wh, 0.0, 1.0, wh],
        [h_hat - uh * a_hat, 0.5 * (uh * uh + vh * vh + wh * wh), vh, wh, h_hat + uh * a_hat],
    ])
    D = np.array([
        0.5 * abs(uh - a_hat) * rho_ln / gamma,
        abs(uh) * ((gamma - 1.0) / gamma) * rho_ln,
        abs(uh) * p1_hat,
        abs(uh) * p1_hat,
        0.5 * abs(uh + a_hat) * rho_ln / gamma,
    ])
    dv = entropy_vars(uR, gamma) - entropy_vars(uL, gamma)
    diss = R @ (D * (R.T @ dv))
    speed = abs(uh) + a_hat
    return f_star - 0.5 * diss, speed


def hll_flux_ref(uL, uR, gamma=GAMMA):
    rhoL, rhoR = uL[0], uR[0]
    vL = np.array([uL[1], uL[2], uL[3]]) / rhoL
    vR = np.array([uR[1], uR[2], uR[3]]) / rhoR
    pL, pR = pressure(uL, gamma), pressure(uR, gamma)
    HL = (uL[4] + pL) / rhoL
    HR = (uR[4] + pR) / rhoR
    cL = np.sqrt((gamma - 1.0) * (HL - 0.5 * np.dot(vL, vL)))
    cR = np.sqrt((gamma - 1.0) * (HR - 0.5 * np.dot(vR, vR)))

    sl, sr = np.sqrt(rhoL), np.sqrt(rhoR)
    w = sl + sr
    v_roe = (sl * vL + sr * vR) / w
    H_roe = (sl * HL + sr * HR) / w
    c_roe = np.sqrt((gamma - 1.0) * (H_roe - 0.5 * np.dot(v_roe, v_roe)))

    SL = min(v_roe[0] - c_roe, vL[0] - cL)
    SR = max(v_roe[0] + c_roe, vR[0] + cR)

    FL = np.array([uL[1], uL[1] * vL[0] + pL, uL[1] * vL[1], uL[1] * vL[2], uL[1] * HL])
    FR = np.array([uR[1], uR[1] * vR[0] + pR, uR[1] * vR[1], uR[1] * vR[2], uR[1] * HR])

    SLc, SRc = min(SL, 0.0), max(SR, 0.0)
    return ((SRc * FL - SLc * FR) + SRc * SLc * (uR - uL)) / (SRc - SLc)


def physical_flux(u, gamma=GAMMA):
    """Exact Euler flux along x — for consistency checks F(u,u) = F_phys(u)."""
    rho, m1, m2, m3, e = u
    v1 = m1 / rho
    p = pressure(u, gamma)
    return np.array([m1, m1 * v1 + p, m2 * v1, m3 * v1, (e + p) * v1])


def radial_blast_reference(dim, t_end, n=4096, r_max=0.55, r0=0.06,
                           energy=1.0, rho0=1.0, p0=1e-3, gamma=GAMMA,
                           cfl=0.4):
    """Converged 1D radial (cylindrical dim=2 / spherical dim=3) Euler
    solution of the Sedov blast — an INDEPENDENT discretization (shell
    finite volumes, Rusanov flux, well-balanced lateral-pressure
    geometric source) the multi-D Cartesian runs are binned against.
    At n=4096 the shell width is ~60x finer than a 64^2 Cartesian cell,
    so this serves as the reference profile.  Returns (r_centers,
    rho, u, p) at t_end."""
    m = dim - 1                           # area ~ r^m
    edges = np.linspace(0.0, r_max, n + 1)
    rc = 0.5 * (edges[:-1] + edges[1:])
    A = edges ** m                        # face areas (A[0]=0 at r=0)
    V = (edges[1:] ** (m + 1) - edges[:-1] ** (m + 1)) / (m + 1)

    vol0 = np.pi * r0 ** 2 if dim == 2 else 4.0 / 3.0 * np.pi * r0 ** 3
    # per-radian (2D) / per-steradian-free FV volumes drop the angular
    # factor consistently on both sides of the comparison
    p = np.where(rc < r0, (gamma - 1.0) * energy / vol0, p0)
    rho = np.full(n, rho0)
    u = np.zeros(n)

    def cons():
        return np.stack([rho, rho * u, p / (gamma - 1.0) + 0.5 * rho * u * u])

    U = cons()
    t = 0.0
    while t < t_end:
        rho, mom, E = U
        u = mom / rho
        p = (gamma - 1.0) * (E - 0.5 * rho * u * u)
        c = np.sqrt(gamma * p / rho)
        dt = min(cfl * (edges[1] - edges[0]) / (np.abs(u) + c).max(),
                 t_end - t)

        # faces 1..n (Rusanov): left cells 0..n-1, right cells 1..n-1
        # plus an AMBIENT ghost outside face n (farfield; the blast
        # never reaches it inside the comparison window).  Face 0 sits
        # at the symmetry center: A[0] = 0 for m > 0, no flux needed.
        amb = np.array([rho0, 0.0, p0 / (gamma - 1.0)])
        WL = U
        WR = np.concatenate([U[:, 1:], amb[:, None]], axis=1)
        uL, uR = u, np.append(u[1:], 0.0)
        pL, pR = p, np.append(p[1:], p0)
        cR = np.append(c[1:], np.sqrt(gamma * p0 / rho0))
        FL = np.stack([WL[1], WL[1] * uL + pL, (WL[2] + pL) * uL])
        FR = np.stack([WR[1], WR[1] * uR + pR, (WR[2] + pR) * uR])
        s = np.maximum(np.abs(uL) + c, np.abs(uR) + cR)
        F = 0.5 * (FL + FR) - 0.5 * s * (WR - WL)   # [3, n] faces 1..n

        flux = A[1:] * F
        div = flux.copy()                           # leaves through face i+1
        div[:, 1:] -= flux[:, :-1]                  # enters through face i
        U = U - dt * div / V
        # well-balanced geometric source: ambient pressure on the
        # lateral shell faces enters the radial momentum exactly
        U[1] += dt * p * (A[1:] - A[:-1]) / V
        t += dt
        rho, mom, E = U
        if not (np.isfinite(U).all() and rho.min() > 0):
            raise FloatingPointError(f"radial reference broke at t={t}")

    rho, mom, E = U
    u = mom / rho
    p = (gamma - 1.0) * (E - 0.5 * rho * u * u)
    return rc, rho, u, p


def mhd_tube_reference(t_end, n=2048, gamma=2.0, bx=0.75, cfl=0.4,
                       left=(1.0, 1.0, 1.0), right=(0.125, 0.1, -1.0)):
    """Converged 1D ideal-MHD shock tube (Brio & Wu 1988 by default) —
    an INDEPENDENT discretization (scalar forward-Euler Rusanov on a
    fine grid, Bx constant so no cleaning is involved) that the multi-D
    GLM-MHD runs are compared against.  left/right = (rho, p, By) of
    the two initial states; jump at x = 0.5, outflow ends.  Returns
    (x_centers, rho, u, p, By) at t_end."""
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    l = x < 0.5
    rho = np.where(l, left[0], right[0])
    p = np.where(l, left[1], right[1])
    by = np.where(l, left[2], right[2])
    E = p / (gamma - 1.0) + 0.5 * (bx * bx + by * by)
    # state rows: rho, mx, my, mz, E, By, Bz
    U = np.stack([rho, np.zeros(n), np.zeros(n), np.zeros(n), E,
                  by, np.zeros(n)])

    def flux_and_speed(W):
        rho = W[0]
        u, v, w = W[1] / rho, W[2] / rho, W[3] / rho
        by, bz = W[5], W[6]
        b2 = bx * bx + by * by + bz * bz
        p = (gamma - 1.0) * (W[4] - 0.5 * rho * (u * u + v * v + w * w)
                             - 0.5 * b2)
        pt = p + 0.5 * b2
        vb = u * bx + v * by + w * bz
        F = np.stack([
            W[1],
            W[1] * u + pt - bx * bx,
            W[2] * u - bx * by,
            W[3] * u - bx * bz,
            (W[4] + pt) * u - bx * vb,
            by * u - v * bx,
            bz * u - w * bx,
        ])
        a2 = gamma * np.maximum(p, 1e-12) / rho
        bb2 = b2 / rho
        s = a2 + bb2
        cf = np.sqrt(0.5 * (s + np.sqrt(np.maximum(
            s * s - 4.0 * a2 * bx * bx / rho, 0.0))))
        return F, np.abs(u) + cf

    t = 0.0
    while t < t_end:
        _, sp = flux_and_speed(U)
        dt = min(cfl * dx / sp.max(), t_end - t)
        # outflow (copy) ghosts at both ends
        Ue = np.concatenate([U[:, :1], U, U[:, -1:]], axis=1)
        F, s = flux_and_speed(Ue)
        WL, WR = Ue[:, :-1], Ue[:, 1:]
        smax = np.maximum(s[:-1], s[1:])
        Fface = 0.5 * (F[:, :-1] + F[:, 1:]) - 0.5 * smax * (WR - WL)
        U = U - dt / dx * (Fface[:, 1:] - Fface[:, :-1])
        t += dt
        if not np.isfinite(U).all():
            raise FloatingPointError(f"MHD tube reference broke at t={t}")

    rho = U[0]
    u = U[1] / rho
    by, bz = U[5], U[6]
    b2 = bx * bx + by * by + bz * bz
    p = (gamma - 1.0) * (U[4] - 0.5 * (U[1] ** 2 + U[2] ** 2
                                       + U[3] ** 2) / rho - 0.5 * b2)
    return x, rho, u, p, by
