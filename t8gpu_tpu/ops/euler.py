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

import jax
import jax.numpy as jnp

N_VARS = 5  # rho, rho*v1, rho*v2, rho*v3, rho*e


def fast_log(x: jnp.ndarray) -> jnp.ndarray:
    """f32 natural log for POSITIVE NORMAL inputs: exponent split +
    degree-9 minimax polynomial.  Built to attack the two per-cell logs
    (~36% of the fused RK-stage kernel's time by the round-3b
    monkeypatch), but the paired A/B MEASURED IT ~4% SLOWER than
    Mosaic's native log on every fused config (BENCHMARKS.md round-3f)
    — the hardware transcendental path beats an 18-op VPU polynomial —
    so it is OPT-IN (T8GPU_FAST_LOG=1), kept as a documented negative
    result + a re-measurement hook for other TPU generations.
    No accuracy loss for the scheme's inputs (rho, p > 0,
    no subnormals/inf/nan by the positivity of the state + GUARD_STATE
    padding): measured max abs error 3.0e-7 over [1e-3, 1e3] vs 3.3e-7
    for the native f32 log (both against f64).

    x = 2^e * m, m in [1, 2); after a sqrt(2) re-centering m is in
    [sqrt(1/2), sqrt(2)) so log(m) = log1p(u), u in [-0.293, 0.415],
    fitted with c0=0, c1=1 pinned (exactness at u=0, where the ln_mean
    series handoff needs absolute accuracy).  ~18 VPU ops, all
    elementwise (bitcast/shift/and/select/FMA) — Mosaic-friendly.
    """
    assert x.dtype == jnp.float32, \
        f"fast_log is an f32 bit-pattern routine (got {x.dtype})"
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    e = jax.lax.shift_right_logical(bits, 23) - 127
    m = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_or(jax.lax.bitwise_and(bits, 0x007FFFFF),
                           0x3F800000), jnp.float32)
    big = m > 1.4142135623730951
    m = jnp.where(big, m * 0.5, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    u = m - 1.0
    # degree-9 minimax of log1p on [sqrt(1/2)-1, sqrt(2)-1], c0/c1 pinned
    poly = jnp.float32(9.0042032353e-02)
    for c in (-1.4257796701e-01, 1.4806459916e-01, -1.6575047926e-01,
              1.9973105843e-01, -2.5001609627e-01, 3.3333659790e-01,
              -4.9999994808e-01):
        poly = poly * u + jnp.float32(c)
    return e * jnp.float32(0.6931471805599453) + (u + (u * u) * poly)


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


def cfl_sum_speed(u: jnp.ndarray, gamma: float, dim: int,
                  live: jnp.ndarray = None):
    """Axis-summed CFL wave speed: max over live cells of
    sum_a |v_a| + dim * c — the stability speed for a flux divergence
    that SUMS per-axis (or per-face) updates.

    The reference bounds dt with the max per-face speed |u_n| + c
    (solver.cu:213-229), i.e. dt = cfl h / max_f s_f.  That bound is
    von-Neumann UNSTABLE for the dim-summed update at cfl 0.7 in 3D:
    a 1e-6 noise-seeded 3D KH at the max-speed dt blows up in ~20 RK3
    steps on BOTH the XLA and kernel paths, at every mu in [0, 1e-3]
    (the canonical planar-KH states survive only because they are exactly
    y-invariant, so the unstable 3-axis modes are never excited —
    BENCHMARKS.md round-3e).  The summed speed restores the standard
    multi-D bound dt * sum_a(|v_a| + c) / h <= cfl; the measured
    stability boundary for the KEPES/RK3 scheme sits at summed-CFL
    ~0.95-1.15, so the default cfl = 0.7 keeps ~1.4x margin.

    `live` masks padded element slots (broadcast against u[0]'s shape)."""
    vel, p = primitives(u, gamma)
    c = jnp.sqrt(gamma * jnp.maximum(p, 0.0) / u[0])
    s = sum(jnp.abs(vel[a]) for a in range(dim)) + dim * c
    if live is not None:
        s = jnp.where(live, s, 0.0)
    return s.max()


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

    The reference seeds t1 with a permuted normal and projects out n
    (kernels.cu:177-193), which is DEGENERATE for n parallel to
    (1,-1,1)/sqrt(3): the seed equals -n, the projection leaves a
    roundoff-sized vector along n, and normalizing it silently yields
    t1 = +-n, t2 = 0 — a collapsed basis that zeroes the tangential
    momentum flux and dissipation on that face.  The prismed icosahedral
    shell (the reference's own flagship cmesh, main.cu:23) contains
    radial faces with EXACTLY this normal, so the reference construction
    is wrong on its own headline mesh (found by the blocked-shell-AMR
    cell-exactness tests, models/blocked_shell_amr.py).  Here the seed is
    the coordinate axis least aligned with n (|h.n| <= 1/sqrt(3) always,
    so the projected seed has norm >= sqrt(2/3)) — branchless selects,
    never degenerate.
    """
    a0, a1, a2 = jnp.abs(n[0]), jnp.abs(n[1]), jnp.abs(n[2])
    use0 = (a0 <= a1) & (a0 <= a2)
    use1 = (~use0) & (a1 <= a2)
    one = jnp.ones_like(n[0])
    zero = jnp.zeros_like(n[0])
    h = jnp.stack([jnp.where(use0, one, zero),
                   jnp.where(use1, one, zero),
                   jnp.where(use0 | use1, zero, one)])
    dot = n[0] * h[0] + n[1] * h[1] + n[2] * h[2]
    t1 = h - dot * n
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


def hllc_flux(u_l: jnp.ndarray, u_r: jnp.ndarray, gamma: float = 1.4):
    """HLLC flux from raw conservative states (face frame): derives the
    hll-family cell fields per side and dispatches to hllc_fields_flux
    (where the scheme lives and is documented)."""
    return hllc_fields_flux(cell_fields_tuple(u_l, gamma, "hllc"),
                            cell_fields_tuple(u_r, gamma, "hllc"), gamma)


FLUXES = {
    "kepes": kepes_es_flux,
    "hll": hll_flux,
    "hllc": hllc_flux,
}


def numerical_flux(u_l, u_r, gamma: float = 1.4, flux: str = "kepes"):
    """Dispatch on the flux family (static under jit)."""
    return FLUXES[flux](u_l, u_r, gamma)


# ---------------------------------------------------------------------------
# Precomputed per-cell fields (the TPU hot-path formulation).
#
# The straightforward per-face evaluation above recomputes every
# transcendental per face and per side: kepes_es_flux costs 6 logs + 1 sqrt
# per face (2 ln_mean logs + 2x2 entropy-variable logs), and each cell is
# touched by ~2*dim faces per flux evaluation.  Measured on v5e the KEPES
# stencil is VPU-transcendental-bound (BENCHMARKS.md), so the rebuild
# computes all logarithm- and division-heavy per-cell quantities ONCE per
# cell per flux evaluation and evaluates faces with pure arithmetic (+ one
# sqrt for a_hat).  The ln_mean log difference log(a_r/a_l) becomes
# log(a_r) - log(a_l) of the precomputed logs, exact in the regime where
# the exact branch is selected (|xi-1| > ~1e-2) and bypassed by the series
# branch elsewhere.
#
# Fields are stacked as rows of ONE array [C, ...] so all the slab/gather
# machinery built for [5, ...] states applies unchanged; rows 1..3 are the
# velocity vector and rotate exactly like momentum.
#
# Row layouts (velocity always rows 1..3, rotation-covariant; all other
# rows are rotation-invariant scalars):
#   kepes: [rho, vx, vy, vz, p, rho/p, log(rho), log(p), vent0, ke]
#   hll:   [rho, vx, vy, vz, p, h, c, sqrt(rho), ke]
# with ke = |v|^2/2, vent0 the first entropy variable (kernels.cu:236-262),
# h total specific enthalpy, c the sound speed.
# ---------------------------------------------------------------------------

N_FIELDS = {"kepes": 10, "hll": 9}

# Optionally force one materialization of the per-cell fields per flux
# evaluation (prevents XLA from re-fusing the logs into every face
# consumer).  Measured on v5e (BENCHMARKS.md): letting XLA fuse freely is
# ~10% faster on the flagship step (17.2 vs 19.1 ms) — the stencil is
# HBM-bound enough that re-fused transcendentals beat extra
# materializations — so the barrier is OFF by default.  Process-level
# switch, read at trace time.
FIELDS_BARRIER = False


def maybe_barrier(q):
    import jax

    return jax.lax.optimization_barrier(q) if FIELDS_BARRIER else q


def cell_fields_tuple(u, gamma: float, flux: str = "kepes",
                      logs=None, log_fn=jnp.log) -> tuple:
    """Per-cell face-flux ingredients as a TUPLE of row arrays (each shaped
    like u[0]).  Computed once per flux evaluation; every per-face quantity
    then derives from these rows with arithmetic only (kepes_fields_flux).

    The tuple-of-rows representation (rather than one stacked [C, ...]
    array) matters on TPU: face-frame "rotation" is a pure tuple
    permutation (zero copies), and XLA materializes each row buffer once
    behind the optimization barrier instead of copying a stacked block per
    axis sweep.  `u` may be a [5, ...] array or a 5-tuple of rows.
    """
    kappa_m1 = gamma - 1.0
    rho, m1, m2, m3, e = u
    inv_rho = 1.0 / rho
    v1, v2, v3 = m1 * inv_rho, m2 * inv_rho, m3 * inv_rho
    ke = 0.5 * (v1 * v1 + v2 * v2 + v3 * v3)
    p = kappa_m1 * (e - rho * ke)
    if flux == "kepes":
        rho_p = rho / p
        if logs is not None:
            # precomputed transcendentals (the RK_STAGE_INPUTS="logs"
            # kernel variant: XLA evaluates the 2 logs once per cell;
            # the kernel then derives fields log-free for its own tile
            # AND the duplicated neighbor facing layers)
            log_rho, log_p = logs
        else:
            # log_fn: jnp.log everywhere by default (fast_log is the
            # opt-in polynomial variant — measured slower, see fast_log)
            log_rho = log_fn(rho)
            log_p = log_fn(p)
        s = log_p - gamma * log_rho
        vent0 = (gamma - s) / kappa_m1 - rho_p * ke
        return (rho, v1, v2, v3, p, rho_p, log_rho, log_p, vent0, ke)
    elif flux in ("hll", "hllc"):
        h = (e + p) * inv_rho
        c = jnp.sqrt(kappa_m1 * (h - ke))
        return (rho, v1, v2, v3, p, h, c, jnp.sqrt(rho), ke)
    raise ValueError(f"unknown flux family: {flux}")


def cell_fields(u: jnp.ndarray, gamma: float, flux: str = "kepes") -> jnp.ndarray:
    """cell_fields_tuple stacked into one [C, ...] array (the plain-element
    path gathers whole field columns per face, which wants one operand)."""
    return jnp.stack(cell_fields_tuple(u, gamma, flux))


def _ln_mean_d(a_l, a_r, dlog):
    """ln_mean from precomputed log difference dlog = log(a_r) - log(a_l).

    Same series/exact split as ln_mean (ref kernels.cu:24-36); the exact
    branch divides by the precomputed log difference instead of evaluating
    a per-face log.  The series selector v = (xi-1)^2/(xi+1)^2 is computed
    as ((a_r-a_l)/(a_r+a_l))^2 — algebraically identical — and numerator/
    denominator are selected BEFORE one shared divide, so the whole
    ln_mean costs 2 divides (divisions dominate the per-face cost once
    the logs are hoisted per cell)."""
    d = a_r - a_l
    s = a_l + a_r
    t = d / s
    v = t * t
    c = v < 1.0e-4
    num = jnp.where(c, s * 52.5, d)
    den = jnp.where(c, 105.0 + v * (35.0 + v * (21.0 + v * 15.0)), dlog)
    return num / den


def _ln_mean_d_recip(a_l, a_r, dlog):
    """RECIPROCAL of _ln_mean_d in the same 2 divides — for consumers that
    only ever use 1/ln_mean (the KEPES beta_hat enters exclusively as
    1/beta_hat), saving the extra reciprocal."""
    d = a_r - a_l
    s = a_l + a_r
    t = d / s
    v = t * t
    c = v < 1.0e-4
    num = jnp.where(c, s * 52.5, d)
    den = jnp.where(c, 105.0 + v * (35.0 + v * (21.0 + v * 15.0)), dlog)
    return den / num


def kepes_fields_flux(q_l: jnp.ndarray, q_r: jnp.ndarray, gamma: float):
    """Entropy-stable KEPES flux from precomputed cell fields (face frame:
    row 1 is the normal velocity).  Matches kepes_es_flux to fp tolerance
    (the exact-branch ln_mean divides a difference of precomputed logs).
    Returns (flux [5, ...], speed [...]).

    Division economy round 3 (per-interface divides measured as ~35% of
    the flagship step): the FIVE ratios of the round-2 formulation
    (2x ln_mean at 2 divides each + p1_hat) collapse into TWO divides via
    combined reciprocals — one shared 1/(s_rho^2 s_beta^2) feeding both
    series selectors v = (d/s)^2, and one shared 1/(den_r num_b s_b)
    feeding rho_hat, 1/beta_hat and p1_hat as products.  Equal values up
    to ~1-ulp rounding differences; gamma factors fold into static python
    floats; a_hat uses sqrt*rsqrt instead of divide-then-sqrt."""
    kappa_m1 = gamma - 1.0
    rho_l, u_l, v_l, w_l, p_l, rhop_l, lrho_l, lp_l, vent0_l, ke_l = q_l
    rho_r, u_r, v_r, w_r, p_r, rhop_r, lrho_r, lp_r, vent0_r, ke_r = q_r

    # ln_mean ingredients for rho (r) and beta ~ rho/p (b)
    d_r = rho_r - rho_l
    s_r = rho_l + rho_r
    d_b = rhop_r - rhop_l
    s_b = rhop_l + rhop_r
    s_r2 = s_r * s_r
    s_b2 = s_b * s_b
    q2 = 1.0 / (s_r2 * s_b2)                 # divide 1 of 2
    vsq_r = (d_r * d_r) * s_b2 * q2          # = (d_r/s_r)^2
    vsq_b = (d_b * d_b) * s_r2 * q2
    c_r = vsq_r < 1.0e-4
    c_b = vsq_b < 1.0e-4
    num_r = jnp.where(c_r, s_r * 52.5, d_r)
    den_r = jnp.where(
        c_r, 105.0 + vsq_r * (35.0 + vsq_r * (21.0 + vsq_r * 15.0)),
        lrho_r - lrho_l)
    num_b = jnp.where(c_b, s_b * 52.5, d_b)
    den_b = jnp.where(
        c_b, 105.0 + vsq_b * (35.0 + vsq_b * (21.0 + vsq_b * 15.0)),
        (lrho_r - lp_r) - (lrho_l - lp_l))
    # rho_hat = num_r/den_r, 1/beta_hat = 2 den_b/num_b,
    # p1_hat = s_r/s_b — one shared reciprocal
    Q = 1.0 / (den_r * num_b * s_b)          # divide 2 of 2
    nbsb = num_b * s_b
    rho_hat = num_r * nbsb * Q
    inv_bh = (2.0 * den_b * den_r * s_b) * Q
    p1_hat = s_r * den_r * num_b * Q

    u_hat = 0.5 * (u_l + u_r)
    v_hat = 0.5 * (v_l + v_r)
    w_hat = 0.5 * (w_l + w_r)
    a_hat = (jnp.sqrt((gamma * 0.5) * (p_l + p_r))
             * jax.lax.rsqrt(rho_hat))
    h_hat = (gamma / (2.0 * kappa_m1)) * inv_bh + 0.5 * (
        u_l * u_r + v_l * v_r + w_l * w_r)
    vel2_m = ke_l + ke_r

    f0 = rho_hat * u_hat
    f1 = f0 * u_hat + p1_hat
    f2 = f0 * v_hat
    f3 = f0 * w_hat
    f4 = (f0 * 0.5 * ((1.0 / kappa_m1) * inv_bh - vel2_m)
          + u_hat * f1 + v_hat * f2 + w_hat * f3)

    # Dissipation (ref kernels.cu:95-133): same algebra as kepes_es_flux
    # with the entropy-variable jump assembled from per-cell rows.
    d0 = (0.5 / gamma) * jnp.abs(u_hat - a_hat) * rho_hat
    d1 = jnp.abs(u_hat) * (kappa_m1 / gamma) * rho_hat
    d2 = jnp.abs(u_hat) * p1_hat
    d4 = (0.5 / gamma) * jnp.abs(u_hat + a_hat) * rho_hat

    dv0 = vent0_r - vent0_l
    dv1 = rhop_r * u_r - rhop_l * u_l
    dv2 = rhop_r * v_r - rhop_l * v_l
    dv3 = rhop_r * w_r - rhop_l * w_l
    dv4 = -(rhop_r - rhop_l)

    ek = 0.5 * (u_hat * u_hat + v_hat * v_hat + w_hat * w_hat)
    w0 = dv0 + (u_hat - a_hat) * dv1 + v_hat * dv2 + w_hat * dv3 + (h_hat - u_hat * a_hat) * dv4
    w1 = dv0 + u_hat * dv1 + v_hat * dv2 + w_hat * dv3 + ek * dv4
    w2 = dv2 + v_hat * dv4
    w3 = dv3 + w_hat * dv4
    w4 = dv0 + (u_hat + a_hat) * dv1 + v_hat * dv2 + w_hat * dv3 + (h_hat + u_hat * a_hat) * dv4

    g0, g1, g2, g3, g4 = d0 * w0, d1 * w1, d2 * w2, d2 * w3, d4 * w4

    diss0 = g0 + g1 + g4
    diss1 = (u_hat - a_hat) * g0 + u_hat * g1 + (u_hat + a_hat) * g4
    diss2 = v_hat * (g0 + g1 + g4) + g2
    diss3 = w_hat * (g0 + g1 + g4) + g3
    diss4 = ((h_hat - u_hat * a_hat) * g0 + ek * g1 + v_hat * g2
             + w_hat * g3 + (h_hat + u_hat * a_hat) * g4)

    flux = jnp.stack([f0 - 0.5 * diss0, f1 - 0.5 * diss1, f2 - 0.5 * diss2,
                      f3 - 0.5 * diss3, f4 - 0.5 * diss4])
    speed = jnp.abs(u_hat) + a_hat
    return flux, speed


def hll_fields_flux(q_l: jnp.ndarray, q_r: jnp.ndarray, gamma: float):
    """Roe-speed HLL flux from precomputed cell fields (face frame).
    Matches hll_flux; the per-cell sqrt(rho)/c/h are precomputed, leaving
    one sqrt (c_roe) per face.  Returns (flux [5, ...], speed [...])."""
    kappa_m1 = gamma - 1.0
    rho_l, u_l, v_l, w_l, p_l, h_l, c_l, sq_l, ke_l = q_l
    rho_r, u_r, v_r, w_r, p_r, h_r, c_r, sq_r, ke_r = q_r

    inv_w = 1.0 / (sq_l + sq_r)
    v1 = (sq_l * u_l + sq_r * u_r) * inv_w
    v2 = (sq_l * v_l + sq_r * v_r) * inv_w
    v3 = (sq_l * w_l + sq_r * w_r) * inv_w
    h_roe = (sq_l * h_l + sq_r * h_r) * inv_w
    c_roe = jnp.sqrt(kappa_m1 * (h_roe - 0.5 * (v1 * v1 + v2 * v2 + v3 * v3)))

    s_l = jnp.minimum(v1 - c_roe, u_l - c_l)
    s_r = jnp.maximum(v1 + c_roe, u_r + c_r)

    m_l = rho_l * u_l
    m_r = rho_r * u_r
    e_l = rho_l * h_l - p_l
    e_r = rho_r * h_r - p_r
    f_l = jnp.stack([m_l, m_l * u_l + p_l, m_l * v_l, m_l * w_l, m_l * h_l])
    f_r = jnp.stack([m_r, m_r * u_r + p_r, m_r * v_r, m_r * w_r, m_r * h_r])
    du = jnp.stack([rho_r - rho_l, m_r - m_l, rho_r * v_r - rho_l * v_l,
                    rho_r * w_r - rho_l * w_l, e_r - e_l])

    s_l_c = jnp.minimum(s_l, 0.0)
    s_r_c = jnp.maximum(s_r, 0.0)
    flux = ((s_r_c * f_l - s_l_c * f_r) + (s_r_c * s_l_c) * du) / (s_r_c - s_l_c)
    speed = jnp.maximum(jnp.abs(s_l), jnp.abs(s_r))
    return flux, speed


def hllc_fields_flux(q_l: jnp.ndarray, q_r: jnp.ndarray, gamma: float):
    """HLLC flux (Toro) from precomputed cell fields (face frame): HLL's
    two-wave fan plus the restored contact wave s*, so stationary and
    slowly-moving contacts/shear layers are NOT smeared (HLL diffuses
    them; tested).  Beyond-reference: the reference ships KEPES + an
    unused HLL only (kernels.inl:264-332).  Same Roe-average wave-speed
    bounds as hll_fields_flux; shares the "hll" cell-fields layout so it
    runs on every path (plain, subgrid stencil, fused Pallas kernels,
    sharded) through the same static `flux=` dispatch."""
    kappa_m1 = gamma - 1.0
    rho_l, u_l, v_l, w_l, p_l, h_l, c_l, sq_l, ke_l = q_l
    rho_r, u_r, v_r, w_r, p_r, h_r, c_r, sq_r, ke_r = q_r

    inv_w = 1.0 / (sq_l + sq_r)
    v1 = (sq_l * u_l + sq_r * u_r) * inv_w
    v2 = (sq_l * v_l + sq_r * v_r) * inv_w
    v3 = (sq_l * w_l + sq_r * w_r) * inv_w
    h_roe = (sq_l * h_l + sq_r * h_r) * inv_w
    c_roe = jnp.sqrt(kappa_m1 * (h_roe - 0.5 * (v1 * v1 + v2 * v2 + v3 * v3)))

    s_l = jnp.minimum(v1 - c_roe, u_l - c_l)
    s_r = jnp.maximum(v1 + c_roe, u_r + c_r)

    m_l, m_r = rho_l * u_l, rho_r * u_r
    e_l, e_r = rho_l * h_l - p_l, rho_r * h_r - p_r   # total energy E

    # contact speed (den < 0 strictly for physical states: s_l < u_l,
    # s_r > u_r; the where guards padded/degenerate lanes)
    num = p_r - p_l + m_l * (s_l - u_l) - m_r * (s_r - u_r)
    den = rho_l * (s_l - u_l) - rho_r * (s_r - u_r)
    tiny = 1e-30
    s_m = num / jnp.where(jnp.abs(den) > tiny, den, -tiny)

    def side(rho_k, u_k, v_k, w_k, p_k, e_k, m_k, s_k):
        f_k = jnp.stack([m_k, m_k * u_k + p_k, m_k * v_k, m_k * w_k,
                         u_k * (e_k + p_k)])
        u_vec = jnp.stack([rho_k, m_k, rho_k * v_k, rho_k * w_k, e_k])
        gap = s_k - s_m
        gap_s = jnp.where(jnp.abs(gap) > tiny, gap, tiny)
        r_star = rho_k * (s_k - u_k) / gap_s
        ugap = s_k - u_k
        ugap_s = jnp.where(jnp.abs(ugap) > tiny, ugap, tiny)
        e_star = r_star * (e_k / rho_k
                           + (s_m - u_k) * (s_m + p_k / (rho_k * ugap_s)))
        u_star = jnp.stack([r_star, r_star * s_m, r_star * v_k,
                            r_star * w_k, e_star])
        return f_k, f_k + s_k * (u_star - u_vec)

    f_l, f_l_star = side(rho_l, u_l, v_l, w_l, p_l, e_l, m_l, s_l)
    f_r, f_r_star = side(rho_r, u_r, v_r, w_r, p_r, e_r, m_r, s_r)

    flux = jnp.where(s_l >= 0.0, f_l,
                     jnp.where(s_m >= 0.0, f_l_star,
                               jnp.where(s_r >= 0.0, f_r_star, f_r)))
    speed = jnp.maximum(jnp.abs(s_l), jnp.abs(s_r))
    return flux, speed


FIELDS_FLUXES = {
    "kepes": kepes_fields_flux,
    "hll": hll_fields_flux,
    "hllc": hllc_fields_flux,
}


def fields_flux(q_l, q_r, gamma: float = 1.4, flux: str = "kepes"):
    """Dispatch the fields-based flux (static under jit)."""
    return FIELDS_FLUXES[flux](q_l, q_r, gamma)


def kepes_pair_fields(u, gamma: float) -> tuple:
    """LOG-FREE per-state ingredients for `kepes_pair_flux` — the
    once-used-state variant of `cell_fields_tuple`.

    The fields formulation amortizes 2 logs per CELL across its 2*dim
    interfaces; a MUSCL-reconstructed interface state is consumed by
    exactly ONE interface, so precomputing its logs buys nothing — the
    pair flux instead takes the two log differences as ratio logs
    (2 logs per interface, vs 4 with per-state fields; the order-2 fused
    kernel is VPU-issue-bound and ~40% of it was these logs,
    BENCHMARKS.md round-4).  Tuple: (rho, v1, v2, v3, p, rho_p,
    inv_rho, inv_p, ke)."""
    kappa_m1 = gamma - 1.0
    rho, m1, m2, m3, e = u
    inv_rho = 1.0 / rho
    v1, v2, v3 = m1 * inv_rho, m2 * inv_rho, m3 * inv_rho
    ke = 0.5 * (v1 * v1 + v2 * v2 + v3 * v3)
    p = kappa_m1 * (e - rho * ke)
    inv_p = 1.0 / p
    rho_p = rho * inv_p
    return (rho, v1, v2, v3, p, rho_p, inv_rho, inv_p, ke)


def prim_rows(u, gamma: float) -> tuple:
    """(rho, v1, v2, v3, p) rows from conserved rows — the
    reconstruction variables of primitive-space MUSCL (limiter
    "<lim>-prim"): slopes/limiting/admissibility on primitives make the
    per-side positivity guard two compares (no kinetic-energy rebuild)
    and the per-interface field derivation ~5 ops cheaper, the op-count
    levers the round-4 measurements located in the RECONSTRUCTION
    (BENCHMARKS.md: the pair-flux restructure proved the MUSCL kernel is
    not log-bound)."""
    kappa_m1 = gamma - 1.0
    rho, m1, m2, m3, e = u
    inv_rho = 1.0 / rho
    v1, v2, v3 = m1 * inv_rho, m2 * inv_rho, m3 * inv_rho
    p = kappa_m1 * (e - 0.5 * (m1 * v1 + m2 * v2 + m3 * v3))
    return (rho, v1, v2, v3, p)


def prim_pair_fields(w) -> tuple:
    """`kepes_pair_fields` tuple from primitive rows (rho, v1, v2, v3,
    p): only the reciprocals/derived products remain to compute."""
    rho, v1, v2, v3, p = w
    inv_rho = 1.0 / rho
    inv_p = 1.0 / p
    rho_p = rho * inv_p
    ke = 0.5 * (v1 * v1 + v2 * v2 + v3 * v3)
    return (rho, v1, v2, v3, p, rho_p, inv_rho, inv_p, ke)


def kepes_pair_flux(q_l: tuple, q_r: tuple, gamma: float,
                    log_fn=jnp.log):
    """Entropy-stable KEPES flux from `kepes_pair_fields` tuples (face
    frame; same algebra + combined-reciprocal division economy as
    `kepes_fields_flux`, equal to it to ~ulp).  The exact-branch ln_mean
    denominators use RATIO logs — log(rho_r * (1/rho_l)) and
    log(p_r * (1/p_l)) — so an interface costs 2 logs regardless of how
    its end states were produced.  Matches ref kernels.cu:38-133."""
    kappa_m1 = gamma - 1.0
    rho_l, u_l, v_l, w_l, p_l, rhop_l, irho_l, ip_l, ke_l = q_l
    rho_r, u_r, v_r, w_r, p_r, rhop_r, irho_r, ip_r, ke_r = q_r

    # the 2 per-interface transcendentals
    dlrho = log_fn(rho_r * irho_l)           # log(rho_r/rho_l)
    dlp = log_fn(p_r * ip_l)                 # log(p_r/p_l)

    d_r = rho_r - rho_l
    s_r = rho_l + rho_r
    d_b = rhop_r - rhop_l
    s_b = rhop_l + rhop_r
    s_r2 = s_r * s_r
    s_b2 = s_b * s_b
    q2 = 1.0 / (s_r2 * s_b2)                 # divide 1 of 2
    vsq_r = (d_r * d_r) * s_b2 * q2
    vsq_b = (d_b * d_b) * s_r2 * q2
    c_r = vsq_r < 1.0e-4
    c_b = vsq_b < 1.0e-4
    num_r = jnp.where(c_r, s_r * 52.5, d_r)
    den_r = jnp.where(
        c_r, 105.0 + vsq_r * (35.0 + vsq_r * (21.0 + vsq_r * 15.0)),
        dlrho)
    num_b = jnp.where(c_b, s_b * 52.5, d_b)
    den_b = jnp.where(
        c_b, 105.0 + vsq_b * (35.0 + vsq_b * (21.0 + vsq_b * 15.0)),
        dlrho - dlp)                         # log(beta_r/beta_l)
    Q = 1.0 / (den_r * num_b * s_b)          # divide 2 of 2
    nbsb = num_b * s_b
    rho_hat = num_r * nbsb * Q
    inv_bh = (2.0 * den_b * den_r * s_b) * Q
    p1_hat = s_r * den_r * num_b * Q

    u_hat = 0.5 * (u_l + u_r)
    v_hat = 0.5 * (v_l + v_r)
    w_hat = 0.5 * (w_l + w_r)
    a_hat = (jnp.sqrt((gamma * 0.5) * (p_l + p_r))
             * jax.lax.rsqrt(rho_hat))
    h_hat = (gamma / (2.0 * kappa_m1)) * inv_bh + 0.5 * (
        u_l * u_r + v_l * v_r + w_l * w_r)
    vel2_m = ke_l + ke_r

    f0 = rho_hat * u_hat
    f1 = f0 * u_hat + p1_hat
    f2 = f0 * v_hat
    f3 = f0 * w_hat
    f4 = (f0 * 0.5 * ((1.0 / kappa_m1) * inv_bh - vel2_m)
          + u_hat * f1 + v_hat * f2 + w_hat * f3)

    d0 = (0.5 / gamma) * jnp.abs(u_hat - a_hat) * rho_hat
    d1 = jnp.abs(u_hat) * (kappa_m1 / gamma) * rho_hat
    d2 = jnp.abs(u_hat) * p1_hat
    d4 = (0.5 / gamma) * jnp.abs(u_hat + a_hat) * rho_hat

    # entropy-variable jump: dv0 = vent0_r - vent0_l with
    # vent0 = (gamma - s)/kappa_m1 - rho_p*ke, s = log p - gamma log rho
    # => the s jump is exactly dlp - gamma*dlrho (ratio logs again)
    dv0 = (-(dlp - gamma * dlrho) * (1.0 / kappa_m1)
           - (rhop_r * ke_r - rhop_l * ke_l))
    dv1 = rhop_r * u_r - rhop_l * u_l
    dv2 = rhop_r * v_r - rhop_l * v_l
    dv3 = rhop_r * w_r - rhop_l * w_l
    dv4 = -(rhop_r - rhop_l)

    ek = 0.5 * (u_hat * u_hat + v_hat * v_hat + w_hat * w_hat)
    w0 = (dv0 + (u_hat - a_hat) * dv1 + v_hat * dv2 + w_hat * dv3
          + (h_hat - u_hat * a_hat) * dv4)
    w1 = dv0 + u_hat * dv1 + v_hat * dv2 + w_hat * dv3 + ek * dv4
    w2 = dv2 + v_hat * dv4
    w3 = dv3 + w_hat * dv4
    w4 = (dv0 + (u_hat + a_hat) * dv1 + v_hat * dv2 + w_hat * dv3
          + (h_hat + u_hat * a_hat) * dv4)

    g0, g1, g2, g3, g4 = d0 * w0, d1 * w1, d2 * w2, d2 * w3, d4 * w4

    diss0 = g0 + g1 + g4
    diss1 = (u_hat - a_hat) * g0 + u_hat * g1 + (u_hat + a_hat) * g4
    diss2 = v_hat * (g0 + g1 + g4) + g2
    diss3 = w_hat * (g0 + g1 + g4) + g3
    diss4 = ((h_hat - u_hat * a_hat) * g0 + ek * g1 + v_hat * g2
             + w_hat * g3 + (h_hat + u_hat * a_hat) * g4)

    flux = jnp.stack([f0 - 0.5 * diss0, f1 - 0.5 * diss1, f2 - 0.5 * diss2,
                      f3 - 0.5 * diss3, f4 - 0.5 * diss4])
    speed = jnp.abs(u_hat) + a_hat
    return flux, speed


def fields_mirror(q):
    """Reflective-wall ghost fields: negate the normal velocity (row 1).
    All other rows (p, logs, vent0, ke, h, c, ...) depend only on rho, p,
    |v|^2 and are mirror-invariant (ref reflect_state, kernels.cu:371-375).
    Accepts a stacked [C, ...] array or a tuple of rows."""
    if isinstance(q, tuple):
        return (q[0], -q[1]) + q[2:]
    return q.at[1].multiply(-1.0)


def fields_rotate(q: jnp.ndarray, n, t1, t2) -> jnp.ndarray:
    """Rotate the velocity rows 1..3 into a general face basis (n, t1, t2);
    scalar rows pass through (general-normal path, ref kernels.cu:174-193)."""
    vn = q[1] * n[0] + q[2] * n[1] + q[3] * n[2]
    vt1 = q[1] * t1[0] + q[2] * t1[1] + q[3] * t1[2]
    vt2 = q[1] * t2[0] + q[2] * t2[1] + q[3] * t2[2]
    return jnp.concatenate(
        [q[:1], vn[None], vt1[None], vt2[None], q[4:]], axis=0)


# Axis-aligned face frames are static row permutations — no per-face basis
# math.  State rows [rho, m_x, m_y, m_z, e] -> face frame
# [rho, m_normal, m_t1, m_t2, e] for a +axis normal, and back; velocity
# rows of a fields array permute identically (rows 1..3).
AXIS_ROTATE = {0: (0, 1, 2, 3, 4), 1: (0, 2, 1, 3, 4), 2: (0, 3, 1, 2, 4)}
AXIS_UNROTATE = {0: (0, 1, 2, 3, 4), 1: (0, 2, 1, 3, 4), 2: (0, 2, 3, 1, 4)}


def fields_axis_rotate(q, axis: int):
    """Rotate cell fields into the +axis face frame: only the velocity
    rows 1..3 permute (all other field rows are scalars).  On a tuple of
    rows this is a free reordering; on a stacked [C, ...] array it
    materializes a permuted copy."""
    if axis == 0:
        return q
    perm = AXIS_ROTATE[axis]
    if isinstance(q, tuple):
        return (q[0], q[perm[1]], q[perm[2]], q[perm[3]]) + q[4:]
    rows = [q[0], q[perm[1]], q[perm[2]], q[perm[3]]]
    return jnp.concatenate([jnp.stack(rows), q[4:]], axis=0)


def flux_axis_unrotate(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Rotate a 5-row flux back from the +axis face frame."""
    if axis == 0:
        return f
    return jnp.stack([f[i] for i in AXIS_UNROTATE[axis]])
