"""Initial conditions for the bundled Kelvin-Helmholtz test cases.

Vectorized re-derivations of the reference ICs:
  * kh_planar — periodic square/cube shear layer
    (examples/subgrid/solver.inl:35-103, 2D and 3D variants)
  * kh_sphere — KH on a spherical shell in the tangent basis
    (examples/compressible_euler/solver.cu:17-73)
"""

from __future__ import annotations

import numpy as np


def kh_planar(centers: np.ndarray, dim: int, gamma: float = 1.4) -> np.ndarray:
    """Planar Kelvin-Helmholtz shear layer -> conservative state [5, N].

    centers: [N, dim] cell centers in the unit square/cube.  The shear layer
    normal is the last axis (y in 2D, z in 3D); streaming is along x
    (ref solver.inl:42-56 3D, :90-103 2D).
    """
    x = centers[:, 0]
    c = centers[:, dim - 1]          # layer coordinate: y (2D) or z (3D)
    sigma = 0.05 / np.sqrt(2.0)

    inside = np.abs(c - 0.5) < 0.25
    rho = np.where(inside, 2.0, 1.0)
    v_stream = np.where(inside, -0.5, 0.5)

    bump = np.exp(-(((c - 0.75) / (2 * sigma)) ** 2)) + np.exp(-(((c - 0.25) / (2 * sigma)) ** 2))
    v_perturb = 0.1 * np.sin(4.0 * np.pi * (x - 0.5)) * bump

    rho_v1 = rho * 0.0 + v_stream          # note: ref stores momentum = +-0.5
    rho_v2 = np.zeros_like(rho)
    rho_v3 = np.zeros_like(rho)
    if dim == 2:
        rho_v2 = rho * v_perturb            # ref solver.inl:93-96
    else:
        rho_v3 = rho * v_perturb            # ref solver.inl:46-49

    rho_e = 2.5 / (gamma - 1.0) + 0.5 * (rho_v1**2 + rho_v2**2 + rho_v3**2) / rho
    return np.stack([rho, rho_v1, rho_v2, rho_v3, rho_e]).astype(np.float32)


def kh_sphere(centers: np.ndarray, gamma: float = 1.4) -> np.ndarray:
    """Kelvin-Helmholtz on a spherical shell (ref solver.cu:17-73).

    centers: [N, 3] element centroids of the shell mesh.  Velocity is built
    in the local tangent basis (e_phi along latitudes, e_theta along
    longitudes) with a latitude-dependent shear and a longitude perturbation.
    """
    x, y, z = centers[:, 0], centers[:, 1], centers[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    sigma = 0.2 / np.sqrt(2.0)

    e_r = np.stack([x / r, y / r, z / r])
    hyp = np.sqrt(e_r[0] ** 2 + e_r[1] ** 2)
    e_phi = np.stack([e_r[1] / hyp, -e_r[0] / hyp, np.zeros_like(hyp)])
    e_theta = np.cross(e_r.T, e_phi.T).T

    phi = np.where(y >= 0.0, np.arccos(x / np.sqrt(x * x + y * y)),
                   2.0 * np.pi - np.arccos(x / np.sqrt(x * x + y * y)))
    theta = np.arcsin(z / r)

    v_phi = r * np.cos(theta) * np.where(theta < 0, -0.5, 0.5)
    v_theta = 0.5 * r * np.sin(2.0 * phi) * np.exp(-((theta / (2 * sigma)) ** 2))

    rho = np.where(theta < 0.0, 2.0, 1.0)
    mom = rho * (v_phi * e_phi + v_theta * e_theta)
    rho_e = 2.5 / (gamma - 1.0) + 0.5 * (mom**2).sum(axis=0) / rho
    return np.concatenate([rho[None], mom, rho_e[None]]).astype(np.float32)


def sedov_blast(centers: np.ndarray, dim: int, gamma: float = 1.4,
                energy: float = 1.0, r0: float = 0.06,
                rho0: float = 1.0, p0: float = 1e-3,
                center=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Sedov-Taylor point blast -> conservative state [5, N].

    Total energy `energy` is deposited as internal energy spread over a
    small disc/ball of radius r0 around `center` (the standard finite-
    volume regularization of the delta-function blast), on a cold
    uniform ambient (rho0, p0).  The resulting strong shock expands
    self-similarly: R(t) = (E t^2 / (alpha rho0))^(1/(dim+2)) — the
    EXPONENT 2/(dim+2) and the strong-shock density jump
    (gamma+1)/(gamma-1) are parameter-free exact predictions used by
    tests/test_sedov.py and examples/sedov.py.  The pressure ratio
    across the IC is ~1e5: the canonical strong-shock robustness
    stress (positivity, limiter behavior) the KH cases never reach.
    The reference ships no blast case (its ICs are the two KH shear
    layers, solver.cu:17-73, solver.inl:35-103)."""
    d = centers[:, :dim] - np.asarray(center[:dim])[None, :]
    r = np.sqrt((d * d).sum(axis=1))
    vol = np.pi * r0 * r0 if dim == 2 else 4.0 / 3.0 * np.pi * r0 ** 3
    p_in = (gamma - 1.0) * energy / vol
    p = np.where(r < r0, p_in, p0)
    rho = np.full_like(p, rho0)
    z = np.zeros_like(p)
    rho_e = p / (gamma - 1.0)
    return np.stack([rho, z, z, z, rho_e]).astype(np.float32)


def isentropic_vortex(centers: np.ndarray, t: float = 0.0,
                      gamma: float = 1.4, beta: float = 5.0,
                      radius: float = 0.08, v0=(1.0, 0.5),
                      center=(0.5, 0.5)) -> np.ndarray:
    """Isentropic vortex on the periodic unit square -> state [5, N].

    The classical smooth EXACT solution of the 2D Euler equations (Shu,
    1997): an isentropic vortex superposed on a uniform stream advects
    without deformation, so the exact state at time t is this field
    evaluated with the center shifted by v0*t (mod 1).  Coordinates are
    measured in units of `radius`; at the domain edge (>= 5 radii) the
    perturbation is < exp(-12), compatible with periodicity to f32
    roundoff.  Used for order-of-accuracy verification on a genuinely
    nonlinear, non-grid-aligned exact solution (tests/test_vortex.py)
    — the reference has no quantitative accuracy artifact at all.
    """
    xc = (centers[:, 0] - center[0] - v0[0] * t) % 1.0
    yc = (centers[:, 1] - center[1] - v0[1] * t) % 1.0
    # wrap displacements into [-0.5, 0.5)
    xs = (xc + 0.5) % 1.0 - 0.5
    ys = (yc + 0.5) % 1.0 - 0.5
    x, y = xs / radius, ys / radius
    r2 = x * x + y * y

    e = np.exp(0.5 * (1.0 - r2))
    du = -beta / (2.0 * np.pi) * e * y
    dv = beta / (2.0 * np.pi) * e * x
    dT = -(gamma - 1.0) * beta * beta / (8.0 * gamma * np.pi**2) * e * e

    T = 1.0 + dT
    rho = T ** (1.0 / (gamma - 1.0))
    p = rho ** gamma
    u = v0[0] + du
    v = v0[1] + dv

    z = np.zeros_like(rho)
    rho_e = p / (gamma - 1.0) + 0.5 * rho * (u * u + v * v)
    return np.stack([rho, rho * u, rho * v, z, rho_e]).astype(np.float32)
