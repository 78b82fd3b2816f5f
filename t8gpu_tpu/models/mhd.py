"""Ideal MHD with GLM divergence cleaning: a fourth conservation-law family.

The hardest stress of the PDE-agnostic seams (SURVEY §1: the reference's
layers 1-4 know nothing about the physics; it ships ONE system): nine
coupled variables [rho, m, E, B, psi], two vector fields that must rotate
into the face frame, a mixed hyperbolic/constraint structure (div B = 0),
and a scheme ingredient no other family has — a GLOBAL wave speed (the
cleaning speed c_h) threaded through every face flux.  Built from the
same public seams as the Euler/advection/shallow-water solvers:
`FaceConnectivity` + `gather_cols`/`accumulate_inc`, `ops.rk.ssp_rk3`,
`MeshManager.adapt`, capacity buckets, and the sharded
`_flux_divergence` hook (parallel/mhd.py).

Scheme (Dedner et al. 2002 GLM-MHD, JCP 175; the widely used "divergence
wave" formulation):

  * state u = [rho, rho v, E, B, psi] with E = p/(g-1) + rho|v|^2/2
    + |B|^2/2;
  * the 7 Galilean rows take a Rusanov (local Lax-Friedrichs) flux in
    the face frame with the fast magnetosonic speed
    c_f^2 = ((a^2+b^2) + sqrt((a^2+b^2)^2 - 4 a^2 b_n^2))/2;
  * the (B_n, psi) 2x2 linear subsystem is solved EXACTLY at each
    interface (it decouples with eigenvalues +-c_h):
        B_n* = avg(B_n) - [psi]/(2 c_h),  psi* = avg(psi) - c_h [B_n]/2,
        F(B_n) = psi*,  F(psi) = c_h^2 B_n*,
    and B_n* replaces B_n in the 7-row flux (Dedner's consistent
    substitution);
  * parabolic damping psi_t = -alpha c_h psi / h enters the divergence
    as a source row, so it is integrated by the same SSP-RK3 stages
    (no operator split);
  * c_h is the global maximum signal speed, recomputed ON DEVICE from
    the current state at every flux evaluation (a cell reduction — and
    a `lax.pmax` over the device mesh in the sharded solver), so the
    cleaning wave always rides at the CFL limit with zero staleness.

Boundary model: perfect-conductor wall — the ghost mirrors the normal
momentum (like the Euler reflective wall, ref kernels.cu:371-375), keeps
B, and NEGATES psi.  That choice makes the GLM interface solve give
F(B_n) = psi* = 0 exactly (the conductor condition dB_n/dt = 0) while
F(psi) = c_h^2 B_n + c_h psi pumps any wall-normal field error into psi
where the damping removes it.

Validation (tests/test_mhd.py): the circularly polarized Alfven wave —
an EXACT nonlinear solution of ideal MHD — advects one period and
converges to itself under refinement; the Brio-Wu tube matches an
independent fine-grid 1D reference discretization
(tests/numpy_reference.mhd_tube_reference); div B stays bounded on
Orszag-Tang (examples/orszag_tang.py); conservation of all 8 conserved
rows to f32 roundoff; sharded == single-device.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.mesh.connectivity import FaceConnectivity
from t8gpu_tpu.ops import rk
from t8gpu_tpu.ops.amr import refinement_criteria
from t8gpu_tpu.ops.euler import face_basis
from t8gpu_tpu.ops.fluxes import accumulate_inc, gather_cols
from t8gpu_tpu.utils.config import AMRConfig

N_ROWS = 9      # rho, m_x, m_y, m_z, E, B_x, B_y, B_z, psi

# Quiescent guard for padded slots: unit density at rest, p = gamma - 1
# (so E = 1 for any gamma > 1), no field — keeps 1/rho and the sound
# speed finite without masking branches (GUARD_STATE rationale).
MHD_GUARD = np.array([1.0, 0, 0, 0, 1.0, 0, 0, 0, 0], np.float32)


def _dot3(ax, ay, az, b):
    return ax * b[0] + ay * b[1] + az * b[2]


def _rotate(u, n, t1, t2):
    """[9, F] state with momentum AND field expressed in (n, t1, t2)."""
    mn = _dot3(u[1], u[2], u[3], n)
    mt1 = _dot3(u[1], u[2], u[3], t1)
    mt2 = _dot3(u[1], u[2], u[3], t2)
    bn = _dot3(u[5], u[6], u[7], n)
    bt1 = _dot3(u[5], u[6], u[7], t1)
    bt2 = _dot3(u[5], u[6], u[7], t2)
    return u[0], mn, mt1, mt2, u[4], bn, bt1, bt2, u[8]


def _unrotate_rows(f, n, t1, t2):
    """Face-frame flux rows (tuple of 9) -> lab-frame [9, F]."""
    f_rho, f_mn, f_mt1, f_mt2, f_e, f_bn, f_bt1, f_bt2, f_psi = f
    return jnp.stack([
        f_rho,
        f_mn * n[0] + f_mt1 * t1[0] + f_mt2 * t2[0],
        f_mn * n[1] + f_mt1 * t1[1] + f_mt2 * t2[1],
        f_mn * n[2] + f_mt1 * t1[2] + f_mt2 * t2[2],
        f_e,
        f_bn * n[0] + f_bt1 * t1[0] + f_bt2 * t2[0],
        f_bn * n[1] + f_bt1 * t1[1] + f_bt2 * t2[1],
        f_bn * n[2] + f_bt1 * t1[2] + f_bt2 * t2[2],
        f_psi,
    ])


def _pressure(rho, mn, mt1, mt2, e, b2, gamma):
    inv = 1.0 / rho
    ke = 0.5 * (mn * mn + mt1 * mt1 + mt2 * mt2) * inv
    return (gamma - 1.0) * (e - ke - 0.5 * b2)


def _fast_speed(rho, p, b2, bn, gamma):
    """Fast magnetosonic speed along n."""
    inv = 1.0 / rho
    a2 = gamma * jnp.maximum(p, 1e-12) * inv
    bb2 = b2 * inv
    bn2 = bn * bn * inv
    s = a2 + bb2
    disc = jnp.sqrt(jnp.maximum(s * s - 4.0 * a2 * bn2, 0.0))
    return jnp.sqrt(0.5 * (s + disc))


def _phys_flux(rho, mn, mt1, mt2, e, bn, bt1, bt2, gamma):
    """Face-frame ideal-MHD flux of the 7 Galilean rows (B_n handled by
    the GLM subsystem).  Returns the 7 flux rows + (p_tot, |un|+c_f)."""
    inv = 1.0 / rho
    un, ut1, ut2 = mn * inv, mt1 * inv, mt2 * inv
    b2 = bn * bn + bt1 * bt1 + bt2 * bt2
    p = _pressure(rho, mn, mt1, mt2, e, b2, gamma)
    pt = p + 0.5 * b2
    vb = un * bn + ut1 * bt1 + ut2 * bt2
    cf = _fast_speed(rho, p, b2, bn, gamma)
    return ((mn,
             mn * un + pt - bn * bn,
             mt1 * un - bn * bt1,
             mt2 * un - bn * bt2,
             (e + pt) * un - bn * vb,
             bt1 * un - ut1 * bn,
             bt2 * un - ut2 * bn),
            jnp.abs(un) + cf)


def _rusanov_rows(l_rows, r_rows, gamma, ch):
    """Face-frame flux tuple (9 rows) + max signal speed from the two
    rotated side-state tuples."""
    rho_l, mn_l, mt1_l, mt2_l, e_l, bn_l, bt1_l, bt2_l, psi_l = l_rows
    rho_r, mn_r, mt1_r, mt2_r, e_r, bn_r, bt1_r, bt2_r, psi_r = r_rows

    # exact GLM 2x2 interface solve (Dedner eq. 42)
    bn_s = 0.5 * (bn_l + bn_r) - 0.5 / ch * (psi_r - psi_l)
    psi_s = 0.5 * (psi_l + psi_r) - 0.5 * ch * (bn_r - bn_l)

    f_l, s_l = _phys_flux(rho_l, mn_l, mt1_l, mt2_l, e_l,
                          bn_s, bt1_l, bt2_l, gamma)
    f_r, s_r = _phys_flux(rho_r, mn_r, mt1_r, mt2_r, e_r,
                          bn_s, bt1_r, bt2_r, gamma)
    smax = jnp.maximum(s_l, s_r)

    d = lambda ql, qr: 0.5 * smax * (qr - ql)
    f7 = (
        0.5 * (f_l[0] + f_r[0]) - d(rho_l, rho_r),
        0.5 * (f_l[1] + f_r[1]) - d(mn_l, mn_r),
        0.5 * (f_l[2] + f_r[2]) - d(mt1_l, mt1_r),
        0.5 * (f_l[3] + f_r[3]) - d(mt2_l, mt2_r),
        0.5 * (f_l[4] + f_r[4]) - d(e_l, e_r),
        0.5 * (f_l[5] + f_r[5]) - d(bt1_l, bt1_r),
        0.5 * (f_l[6] + f_r[6]) - d(bt2_l, bt2_r),
    )
    f = (f7[0], f7[1], f7[2], f7[3], f7[4],
         psi_s,                 # F(B_n): the GLM divergence wave
         f7[5], f7[6],
         ch * ch * bn_s)        # F(psi)
    return f, smax


def mhd_face_flux(u_l, u_r, normal, area, gamma, ch):
    """Area-scaled left->right GLM-MHD flux [9, F] + signal speed [F]
    from raw gathered states — the signature the PDE-agnostic sharded
    hook feeds (parallel/halo.sharded_divergence)."""
    basis = face_basis(normal)
    f, smax = _rusanov_rows(_rotate(u_l, *basis), _rotate(u_r, *basis),
                            gamma, ch)
    return _unrotate_rows(f, *basis) * area, smax


def mhd_wall_flux(u_own, b_normal, b_area, gamma, ch):
    """Perfect-conductor wall flux: ghost = (mirror m_n, keep B, negate
    psi).  GLM then yields F(B_n) = 0 exactly (dB_n/dt = 0 at the
    conductor) and F(psi) = c_h^2 B_n + c_h psi (wall-normal field error
    radiates into psi; see module docstring)."""
    basis = face_basis(b_normal)
    rho, mn, mt1, mt2, e, bn, bt1, bt2, psi = _rotate(u_own, *basis)
    own = (rho, mn, mt1, mt2, e, bn, bt1, bt2, psi)
    ghost = (rho, -mn, mt1, mt2, e, bn, bt1, bt2, -psi)
    f, smax = _rusanov_rows(own, ghost, gamma, ch)
    return _unrotate_rows(f, *basis) * b_area, smax


def glm_ch(u: jnp.ndarray, gamma: float, live) -> jnp.ndarray:
    """Global cleaning speed: max over live cells of |v|_inf + c_f^max,
    where c_f^max = sqrt(a^2 + |B|^2/rho) bounds the fast speed over all
    directions.  A device scalar — callers inside shard_map must pmax it
    over the mesh axis."""
    inv = 1.0 / jnp.maximum(u[0], 1e-12)
    v = jnp.maximum(jnp.maximum(jnp.abs(u[1]), jnp.abs(u[2])),
                    jnp.abs(u[3])) * inv
    b2 = u[5] ** 2 + u[6] ** 2 + u[7] ** 2
    p = _pressure(u[0], u[1], u[2], u[3], u[4], b2, gamma)
    cf = jnp.sqrt(gamma * jnp.maximum(p, 1e-12) * inv + b2 * inv)
    return jnp.where(live, v + cf, 0.0).max()


def mhd_cfl_speed(u: jnp.ndarray, gamma: float, dim: int, live):
    """Axis-summed CFL cell speed sum_a |v_a| + dim * c_f^max (the
    per-face max bound is noise-unstable for the dim-summed update —
    ops/euler.cfl_sum_speed rationale, BENCHMARKS.md round-3e)."""
    inv = 1.0 / jnp.maximum(u[0], 1e-12)
    vsum = (jnp.abs(u[1]) + jnp.abs(u[2]) + jnp.abs(u[3])) * inv
    b2 = u[5] ** 2 + u[6] ** 2 + u[7] ** 2
    p = _pressure(u[0], u[1], u[2], u[3], u[4], b2, gamma)
    cf = jnp.sqrt(gamma * jnp.maximum(p, 1e-12) * inv + b2 * inv)
    return jnp.where(live, vsum + dim * cf, 0.0).max()


def mhd_divergence(u: jnp.ndarray, conn: FaceConnectivity, gamma: float,
                   alpha: float, volume, h_cell):
    """Signed per-element flux sums [9, capacity] + max signal speed.

    Computes c_h fresh from `u` (zero staleness), evaluates all faces
    through the shared gather/accumulate primitives, and adds the GLM
    damping source -alpha c_h psi V / h on the psi row (integrated by
    the enclosing RK stages)."""
    live = volume > 0
    ch = jnp.maximum(glm_ch(u, gamma, live), 1e-12)
    f, sp = mhd_face_flux(gather_cols(u, conn.left),
                          gather_cols(u, conn.right),
                          conn.normal, conn.area, gamma, ch)
    sp = sp * (conn.area > 0)
    if conn.boundary_capacity:
        fb, sp_b = mhd_wall_flux(gather_cols(u, conn.b_elem),
                                 conn.b_normal, conn.b_area, gamma, ch)
        sp_b = sp_b * (conn.b_area > 0)
    else:
        fb = jnp.zeros((N_ROWS, 0), u.dtype)
        sp_b = jnp.zeros((0,), u.dtype)
    acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)
    if alpha > 0.0:
        acc = acc.at[8].add(-alpha * ch * u[8] * volume / h_cell)
    speed = jnp.maximum(sp.max(), sp_b.max() if sp_b.size else 0.0)
    return acc, speed


def _mhd_guard(u_rec, u_first, gamma):
    """Admissibility fallback for reconstructed MHD states: first-order
    wherever the reconstructed density or THERMAL pressure is non-positive
    (the magnetic pressure is always >= 0 and must be excluded from the
    check — a strong field with small plasma beta would otherwise mask a
    negative p).  Per face side, all 9 rows (ops/reconstruct guard
    contract)."""
    b2 = u_rec[5] ** 2 + u_rec[6] ** 2 + u_rec[7] ** 2
    p = _pressure(u_rec[0], u_rec[1], u_rec[2], u_rec[3], u_rec[4], b2,
                  gamma)
    ok = (u_rec[0] > 0.0) & (p > 0.0)
    return jnp.where(ok[None], u_rec, u_first)


def mhd_divergence_muscl(u: jnp.ndarray, conn: FaceConnectivity,
                         gamma: float, alpha: float, volume, h_cell,
                         inv_volume, limiter: str = "bj", dim: int = 2):
    """Second-order counterpart of mhd_divergence: limited MUSCL interface
    states (ops/reconstruct.reconstruct_sides, row-generic over the 9 GLM
    rows, with the MHD admissibility guard) feeding the SAME Rusanov +
    exact-GLM face flux.  c_h comes from the CELL states (fresh, zero
    staleness) — reconstruction never raises the cleaning speed.

    Beyond-reference on two axes at once: the reference ships neither MHD
    nor any second-order scheme (SURVEY §2.2, kernels.cu:150-172)."""
    from t8gpu_tpu.ops.reconstruct import reconstruct_sides

    live = volume > 0
    ch = jnp.maximum(glm_ch(u, gamma, live), 1e-12)
    u_lf, u_rf, u_bf = reconstruct_sides(
        u, conn, inv_volume, gamma, limiter=limiter, dim=dim,
        guard=lambda rec, first: _mhd_guard(rec, first, gamma))
    f, sp = mhd_face_flux(u_lf, u_rf, conn.normal, conn.area, gamma, ch)
    sp = sp * (conn.area > 0)
    if conn.boundary_capacity:
        fb, sp_b = mhd_wall_flux(u_bf, conn.b_normal, conn.b_area, gamma,
                                 ch)
        sp_b = sp_b * (conn.b_area > 0)
    else:
        fb = jnp.zeros((N_ROWS, 0), u.dtype)
        sp_b = jnp.zeros((0,), u.dtype)
    acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)
    if alpha > 0.0:
        acc = acc.at[8].add(-alpha * ch * u[8] * volume / h_cell)
    speed = jnp.maximum(sp.max(), sp_b.max() if sp_b.size else 0.0)
    return acc, speed


def divergence_b(u: jnp.ndarray, conn: FaceConnectivity, volume):
    """Green-Gauss cell divergence of B: (sum_faces avg(B).n A) / V —
    the constraint-violation diagnostic GLM exists to control.  Boundary
    faces use the owner's B (the conductor ghost keeps B).  [capacity],
    zero on padded slots."""
    b_l = gather_cols(u[5:8], conn.left)
    b_r = gather_cols(u[5:8], conn.right)
    bn = 0.5 * ((b_l[0] + b_r[0]) * conn.normal[0]
                + (b_l[1] + b_r[1]) * conn.normal[1]
                + (b_l[2] + b_r[2]) * conn.normal[2]) * conn.area
    if conn.boundary_capacity:
        b_o = gather_cols(u[5:8], conn.b_elem)
        bnb = (b_o[0] * conn.b_normal[0] + b_o[1] * conn.b_normal[1]
               + b_o[2] * conn.b_normal[2]) * conn.b_area
    else:
        bnb = jnp.zeros((0,), u.dtype)
    acc = accumulate_inc(bn[None], bnb[None], conn.inc_slot, conn.inc_sign)
    return jnp.where(volume > 0, acc[0] / jnp.where(volume > 0, volume, 1.0),
                     0.0)


# -- per-step observables (models/observables.py contract) --------------------
# Signature (u, cell_volume, gamma) -> scalar; padded slots carry zero
# volume (masked for extrema).

MHD_OBSERVABLES = {
    "mass": lambda u, vol, g: (u[0] * vol).sum(),
    "momentum_x": lambda u, vol, g: (u[1] * vol).sum(),
    "momentum_y": lambda u, vol, g: (u[2] * vol).sum(),
    "momentum_z": lambda u, vol, g: (u[3] * vol).sum(),
    "total_energy": lambda u, vol, g: (u[4] * vol).sum(),
    "magnetic_energy": lambda u, vol, g: (
        0.5 * (u[5] ** 2 + u[6] ** 2 + u[7] ** 2) * vol).sum(),
    "kinetic_energy": lambda u, vol, g: (
        0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2)
        / jnp.maximum(u[0], 1e-12) * vol).sum(),
    # cleaning diagnostic: energy content of the divergence wave
    "psi_energy": lambda u, vol, g: (0.5 * u[8] ** 2 * vol).sum(),
    "max_signal": lambda u, vol, g: glm_ch(u, g, vol > 0),
}
MHD_REDUCERS = {name: "sum" for name in MHD_OBSERVABLES}
MHD_REDUCERS["max_signal"] = "max"


@functools.partial(jax.jit,
                   static_argnames=("n_steps", "gamma", "alpha", "order",
                                    "limiter", "dim", "observables"),
                   donate_argnames=("u",))
def _rk3_multi(u, conn: FaceConnectivity, inv_volume, volume, h_cell, dt, *,
               n_steps: int, gamma: float, alpha: float, order: int = 1,
               limiter: str = "bj", dim: int = 2, observables: tuple = ()):
    if order == 2:
        flux_fn = lambda w: mhd_divergence_muscl(w, conn, gamma, alpha,
                                                 volume, h_cell, inv_volume,
                                                 limiter, dim)
    else:
        flux_fn = lambda w: mhd_divergence(w, conn, gamma, alpha, volume,
                                           h_cell)

    if observables:
        from t8gpu_tpu.models.observables import resolve
        fns = resolve(observables, MHD_OBSERVABLES)

        def sbody(carry, _):
            v, sp = rk.ssp_rk3(carry[0], flux_fn, dt, inv_volume)
            row = jnp.stack([f(v, volume, gamma) for f in fns])
            return (v, sp), row

        carry0 = (u, jnp.zeros((), u.dtype))
        (u, sp), rows = jax.lax.scan(sbody, carry0, None, length=n_steps)
        return u, sp, rows

    def body(_i, carry):
        v, _ = carry
        return rk.ssp_rk3(v, flux_fn, dt, inv_volume)

    return jax.lax.fori_loop(0, n_steps, body, (u, jnp.zeros((), u.dtype)))


class MHDSolver:
    """Finite-volume GLM-MHD on any mesh the Euler solver runs on
    (2D meshes evolve the full 2.5D state: all three components of v
    and B are carried).

    ic: callable mapping centers [N, dim] -> state [9, N]
    (rho, m, E, B, psi — build E with `mhd_state`).
    """

    def __init__(self, mesh, ic: Callable[[np.ndarray], np.ndarray],
                 gamma: float = 5.0 / 3.0, glm_alpha: float = 0.1,
                 amr: AMRConfig = AMRConfig(), cfl: float = 0.45,
                 order: int = 1, limiter: str = "bj"):
        from t8gpu_tpu.mesh.manager import MeshManager

        self.gamma = float(gamma)
        self.glm_alpha = float(glm_alpha)
        self.cfl = cfl
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        self.order = int(order)
        self.limiter = str(limiter)
        self.amr = amr
        self.manager: Optional[MeshManager] = None
        if isinstance(mesh, MeshManager):
            self.manager = mesh
            self.amr = mesh.amr
            mesh = mesh.mesh
        self.mesh = mesh
        self._max_speed = None
        self.install_mesh(mesh, jnp.asarray(np.asarray(ic(mesh.centers),
                                                       np.float32)))

    def install_mesh(self, mesh, u: jnp.ndarray):
        self._crit_pending = None
        self.mesh = mesh
        self.conn: FaceConnectivity = mesh.conn
        cap = self.conn.inc_slot.shape[0]
        n = self.conn.n_elements
        vol = np.zeros(cap, np.float32)
        vol[:n] = np.asarray(mesh.volumes)
        self.volume = jnp.asarray(vol)
        inv = np.zeros(cap, np.float32)
        inv[:n] = 1.0 / vol[:n]
        self.inv_volume = jnp.asarray(inv)
        h = np.ones(cap, np.float32)
        h[:n] = vol[:n] ** (1.0 / mesh.dim)
        self.h_cell = jnp.asarray(h)
        if u.shape[-1] < cap:
            guard = jnp.broadcast_to(jnp.asarray(MHD_GUARD)[:, None],
                                     (N_ROWS, cap - u.shape[-1]))
            u = jnp.concatenate([u, guard], axis=1)
        self.u = u

    # -- stepping --------------------------------------------------------------

    def iterate(self, dt: float):
        self.iterate_many(1, dt)

    def iterate_many(self, n_steps: int, dt: float):
        self.u, self._max_speed = _rk3_multi(
            self.u, self.conn, self.inv_volume, self.volume, self.h_cell,
            jnp.float32(dt), n_steps=n_steps, gamma=self.gamma,
            alpha=self.glm_alpha, order=self.order, limiter=self.limiter,
            dim=self.mesh.dim)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "total_energy",
                                    "magnetic_energy", "psi_energy")):
        """n_steps steps AND a per-step observable history [n_steps, K]
        in one dispatch (same contract as the other families; the
        psi_energy column audits the divergence cleaning)."""
        from t8gpu_tpu.models.observables import resolve
        resolve(observables, MHD_OBSERVABLES)          # eager validation
        self.u, self._max_speed, rows = _rk3_multi(
            self.u, self.conn, self.inv_volume, self.volume, self.h_cell,
            jnp.float32(dt), n_steps=n_steps, gamma=self.gamma,
            alpha=self.glm_alpha, order=self.order, limiter=self.limiter,
            dim=self.mesh.dim, observables=tuple(observables))
        return rows

    # -- diagnostics -----------------------------------------------------------

    def compute_integral(self) -> float:
        return float((self.u[0] * self.volume).sum())

    def compute_divergence_b(self) -> np.ndarray:
        """Cell Green-Gauss div B, unpadded [N] — the constraint GLM
        controls.  The reference framework has no analogous constraint
        diagnostic (it ships no MHD at all)."""
        d = divergence_b(self.u, self.conn, self.volume)
        return np.asarray(d[: self.n_elements])

    def compute_timestep(self) -> float:
        return float(self.compute_timestep_device())

    def compute_timestep_device(self):
        """CFL dt as a DEVICE scalar (fresh axis-summed speed; see
        CompressibleEulerSolver.compute_timestep_device)."""
        speed = mhd_cfl_speed(self.u, self.gamma, self.mesh.dim,
                              self.volume > 0)
        h = getattr(self.mesh, "cfl_h", None)
        if h is None:
            level = getattr(self.mesh, "max_level", None)
            if level is None:
                level = getattr(self.mesh, "level", self.amr.max_level)
            h = 0.5 ** level
        return jnp.asarray(self.cfl * float(h), jnp.float32) / speed

    # -- AMR -------------------------------------------------------------------

    def adapt(self):
        """Gradient-criteria (on rho) AMR cycle through the shared
        MeshManager seam (volume-weighted remap keeps all 9 rows
        conservative; psi is remapped like a density)."""
        if self.manager is None:
            raise RuntimeError("adapt() requires an adaptive MeshManager mesh")
        if self._crit_pending is not None:
            crit, self._crit_pending = self._crit_pending, None
        else:
            crit = refinement_criteria(self.u, self.conn, self.volume,
                                       dim=self.manager.dim)
        u_new = self.manager.adapt(np.asarray(crit), self.u)
        self.install_mesh(self.manager.mesh, u_new)
        self._max_speed = None

    def adapt_prefetch(self):
        """AMR pipelining (see CompressibleEulerSolver.adapt_prefetch)."""
        if self.manager is None:
            raise RuntimeError("adapt_prefetch() requires a MeshManager")
        crit = refinement_criteria(self.u, self.conn, self.volume,
                                   dim=self.manager.dim)
        try:
            crit.copy_to_host_async()
        except AttributeError:
            pass
        self._crit_pending = crit

    @property
    def n_elements(self) -> int:
        return self.conn.n_elements

    def conserved_state(self) -> np.ndarray:
        """Unpadded [9, N] state on host."""
        return np.asarray(self.u[:, : self.n_elements])


# -- canonical initial conditions ---------------------------------------------


def mhd_state(rho, v, p, B, psi=0.0, gamma: float = 5.0 / 3.0) -> np.ndarray:
    """[9, N] conservative state from primitives (any broadcastable
    rho/p scalars or [N], v/B as length-3 sequences of the same)."""
    rho = np.asarray(rho, np.float64)
    n = rho.shape[-1] if rho.ndim else 1
    rho = np.broadcast_to(rho, (n,))
    row = lambda x: np.broadcast_to(np.asarray(x, np.float64), (n,))
    vx, vy, vz = (row(c) for c in v)
    bx, by, bz = (row(c) for c in B)
    p = row(p)
    e = (p / (gamma - 1.0) + 0.5 * rho * (vx ** 2 + vy ** 2 + vz ** 2)
         + 0.5 * (bx ** 2 + by ** 2 + bz ** 2))
    return np.stack([rho, rho * vx, rho * vy, rho * vz, e,
                     bx, by, bz, row(psi)]).astype(np.float32)


def cp_alfven_wave(centers: np.ndarray, gamma: float = 5.0 / 3.0,
                   amplitude: float = 0.1,
                   direction=(1, 0)) -> np.ndarray:
    """Circularly polarized Alfven wave — an EXACT nonlinear solution of
    ideal MHD (Toth 2000 §6.3.1): rho = 1, p = 0.1, |B_parallel| = 1,
    transverse B_perp = A (sin, cos)(phase), v_perp = -B_perp (the wave
    moves at +v_A = 1 along the propagation direction).

    direction: integer wave counts (m, n) per unit box — the wave vector
    is k = 2 pi (m, n), so ANY integer pair is periodic on the unit
    square.  (1, 0) propagates along +x (face-aligned); (1, 1) runs
    diagonally and exercises the full face-frame vector rotation of both
    axis families.  The temporal period is 1 / (v_A |(m, n)|): after
    that time the solution returns to the initial condition exactly."""
    x = np.asarray(centers)[:, 0]
    y = np.asarray(centers)[:, 1]
    m, n = direction
    norm = float(np.hypot(m, n))
    kx, ky = m / norm, n / norm                   # unit propagation dir
    ph = 2.0 * np.pi * (m * x + n * y)
    # in-plane transverse unit vector t = (-ky, kx); out-of-plane = z
    bt = amplitude * np.sin(ph)                   # B . t
    bz = amplitude * np.cos(ph)
    bx = kx - ky * bt
    by = ky + kx * bt
    return mhd_state(np.ones_like(x),
                     (ky * bt, -kx * bt, -bz), 0.1,
                     (bx, by, bz), gamma=gamma)


def alfven_period(direction=(1, 0)) -> float:
    """Temporal period of cp_alfven_wave on the unit box (v_A = 1)."""
    m, n = direction
    return 1.0 / float(np.hypot(m, n))


def orszag_tang(centers: np.ndarray, gamma: float = 5.0 / 3.0) -> np.ndarray:
    """The Orszag-Tang vortex (unit square, periodic): the standard 2D
    MHD turbulence benchmark — smooth IC that develops interacting
    shocks and current sheets."""
    x = np.asarray(centers)[:, 0]
    y = np.asarray(centers)[:, 1]
    b0 = 1.0 / np.sqrt(4.0 * np.pi)
    rho = np.full_like(x, gamma ** 2 / (4.0 * np.pi))
    p = gamma / (4.0 * np.pi)
    v = (-np.sin(2.0 * np.pi * y), np.sin(2.0 * np.pi * x), 0.0)
    B = (-b0 * np.sin(2.0 * np.pi * y), b0 * np.sin(4.0 * np.pi * x), 0.0)
    return mhd_state(rho, v, p, B, gamma=gamma)


def brio_wu(centers: np.ndarray, gamma: float = 2.0) -> np.ndarray:
    """Brio & Wu (1988) MHD shock tube along x (jump at x = 0.5):
    left (rho, p, B_y) = (1, 1, 1), right (0.125, 0.1, -1), B_x = 0.75.
    gamma = 2 by convention."""
    x = np.asarray(centers)[:, 0]
    left = x < 0.5
    rho = np.where(left, 1.0, 0.125)
    p = np.where(left, 1.0, 0.1)
    by = np.where(left, 1.0, -1.0)
    return mhd_state(rho, (0.0, 0.0, 0.0), p, (0.75, by, 0.0), gamma=gamma)
