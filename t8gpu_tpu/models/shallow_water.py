"""2D shallow-water equations: a third conservation-law model family.

h_t + div(h v) = 0;  (h v)_t + div(h v v + 0.5 g h^2 I) = 0 — a genuinely
NONLINEAR second system (unlike scalar advection) built from the same
PDE-agnostic seams the Euler solvers use (SURVEY §1: the reference's
layers 1-4 know nothing about the physics; it ships only Euler):
`FaceConnectivity` + `gather_cols`/`accumulate`, `ops.rk.ssp_rk3`,
`MeshManager.adapt` with the gradient criteria, capacity buckets, and —
for multi-chip — the `ShardedEulerSolver._flux_divergence` hook.

Scheme: Rusanov (local Lax-Friedrichs) flux in the face-normal frame —
rotate (hu, hv) onto (n, t), flux [h un, h un^2 + g h^2/2, h un ut],
dissipation 0.5 smax (u_r - u_l) with smax = max(|un| + sqrt(g h)).
Reflective walls mirror the normal momentum (same convention as the
Euler reflective BC, ref kernels.cu:371-375).

State is [3, capacity]: h, hu, hv (2D meshes only).
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
from t8gpu_tpu.ops.fluxes import accumulate, gather_cols
from t8gpu_tpu.utils.config import AMRConfig

# Quiescent state for padded element slots (unit depth at rest): keeps
# 1/h finite without masking branches (GUARD_STATE rationale).
SW_GUARD = np.array([1.0, 0.0, 0.0], np.float32)


def _rotate(u, nx, ny):
    """(h, hu, hv) with momentum expressed in the (n, t) face frame."""
    h, hu, hv = u[0], u[1], u[2]
    return h, hu * nx + hv * ny, -hu * ny + hv * nx


def _unrotate_rows(f_h, f_n, f_t, nx, ny):
    return jnp.stack([f_h, f_n * nx - f_t * ny, f_n * ny + f_t * nx])


def rusanov_face_flux(u_l, u_r, normal, area, g: float):
    """Area-scaled left->right Rusanov flux rows [3, F] + wave speed [F].

    Works on raw state rows gathered per face — the shape the generic
    sharded_divergence hook feeds (parallel/halo.py)."""
    nx, ny = normal[0], normal[1]
    h_l, un_l, ut_l = _rotate(u_l, nx, ny)
    h_r, un_r, ut_r = _rotate(u_r, nx, ny)

    def phys(h, un, ut):
        inv = 1.0 / h
        v_n = un * inv
        return un, un * v_n + 0.5 * g * h * h, ut * v_n, v_n

    f1_l, f2_l, f3_l, vn_l = phys(h_l, un_l, ut_l)
    f1_r, f2_r, f3_r, vn_r = phys(h_r, un_r, ut_r)
    c_l = jnp.sqrt(g * h_l)
    c_r = jnp.sqrt(g * h_r)
    smax = jnp.maximum(jnp.abs(vn_l) + c_l, jnp.abs(vn_r) + c_r)
    f_h = 0.5 * (f1_l + f1_r) - 0.5 * smax * (h_r - h_l)
    f_n = 0.5 * (f2_l + f2_r) - 0.5 * smax * (un_r - un_l)
    f_t = 0.5 * (f3_l + f3_r) - 0.5 * smax * (ut_r - ut_l)
    return _unrotate_rows(f_h, f_n, f_t, nx, ny) * area, smax


def wall_face_flux(u_own, b_normal, b_area, g: float):
    """Reflective wall: ghost mirrors the normal momentum (un -> -un),
    Rusanov against the mirror — reduces to a pure g h^2/2 pressure
    flux along n at rest."""
    nx, ny = b_normal[0], b_normal[1]
    h, un, ut = _rotate(u_own, nx, ny)
    ghost = jnp.stack([h, -un, ut])
    own = jnp.stack([h, un, ut])

    # flux in the face frame between own and mirrored state
    def phys(hh, uun, uut):
        inv = 1.0 / hh
        v_n = uun * inv
        return uun, uun * v_n + 0.5 * g * hh * hh, uut * v_n, v_n

    f1_l, f2_l, f3_l, vn_l = phys(*own)
    f1_r, f2_r, f3_r, vn_r = phys(*ghost)
    c = jnp.sqrt(g * h)
    smax = jnp.maximum(jnp.abs(vn_l), jnp.abs(vn_r)) + c
    f_h = 0.5 * (f1_l + f1_r) - 0.5 * smax * (ghost[0] - own[0])
    f_n = 0.5 * (f2_l + f2_r) - 0.5 * smax * (ghost[1] - own[1])
    f_t = 0.5 * (f3_l + f3_r) - 0.5 * smax * (ghost[2] - own[2])
    return _unrotate_rows(f_h, f_n, f_t, nx, ny) * b_area, smax


def sw_divergence(u: jnp.ndarray, conn: FaceConnectivity, g: float):
    """Signed per-element flux sums [3, capacity] + max wave speed."""
    f, sp = rusanov_face_flux(gather_cols(u, conn.left),
                              gather_cols(u, conn.right),
                              conn.normal, conn.area, g)
    sp = sp * (conn.area > 0)
    if conn.boundary_capacity:
        fb, sp_b = wall_face_flux(gather_cols(u, conn.b_elem),
                                  conn.b_normal, conn.b_area, g)
        sp_b = sp_b * (conn.b_area > 0)
    else:
        fb = jnp.zeros((3, 0), u.dtype)
        sp_b = jnp.zeros((0,), u.dtype)
    speed = jnp.maximum(sp.max(), sp_b.max() if sp_b.size else 0.0)
    return accumulate(f, fb, conn), speed


def _sw_guard(u_rec, u_first):
    """Admissibility fallback for reconstructed SWE states: first-order
    wherever the reconstructed depth is non-positive (dry-cell guard —
    the SWE analogue of the Euler density/pressure check)."""
    return jnp.where((u_rec[0] > 0.0)[None], u_rec, u_first)


def sw_divergence_muscl(u: jnp.ndarray, conn: FaceConnectivity, g: float,
                        inv_volume, limiter: str = "bj", dim: int = 2):
    """Second-order counterpart of sw_divergence: limited MUSCL interface
    states through the row-generic reconstruction (ops/reconstruct —
    the identical code path Euler and GLM-MHD ride at order 2) with the
    depth-positivity guard, feeding the SAME Rusanov flux; reflective
    walls mirror the RECONSTRUCTED owner state at the face."""
    from t8gpu_tpu.ops.reconstruct import reconstruct_sides

    u_lf, u_rf, u_bf = reconstruct_sides(u, conn, inv_volume, 0.0,
                                         limiter=limiter, dim=dim,
                                         guard=_sw_guard)
    f, sp = rusanov_face_flux(u_lf, u_rf, conn.normal, conn.area, g)
    sp = sp * (conn.area > 0)
    if conn.boundary_capacity:
        fb, sp_b = wall_face_flux(u_bf, conn.b_normal, conn.b_area, g)
        sp_b = sp_b * (conn.b_area > 0)
    else:
        fb = jnp.zeros((3, 0), u.dtype)
        sp_b = jnp.zeros((0,), u.dtype)
    speed = jnp.maximum(sp.max(), sp_b.max() if sp_b.size else 0.0)
    return accumulate(f, fb, conn), speed


# -- per-step observables (models/observables.py contract) --------------------
# Signature (u, cell_volume, g) -> scalar with u = [h, hu, hv]; padded
# slots carry zero volume (and are masked for the extremum).

SW_OBSERVABLES = {
    "volume": lambda u, vol, g: (u[0] * vol).sum(),
    "momentum_x": lambda u, vol, g: (u[1] * vol).sum(),
    "momentum_y": lambda u, vol, g: (u[2] * vol).sum(),
    # total energy 0.5 (hu^2 + hv^2)/h + 0.5 g h^2: non-increasing
    # under the dissipative Rusanov flux (flat bottom, walls/periodic)
    "energy": lambda u, vol, g: (
        (0.5 * (u[1] ** 2 + u[2] ** 2) / jnp.maximum(u[0], 1e-12)
         + 0.5 * g * u[0] ** 2) * vol).sum(),
    # max Froude number |v| / sqrt(g h) over live cells
    "max_froude": lambda u, vol, g: jnp.sqrt(jnp.where(
        vol > 0,
        (u[1] ** 2 + u[2] ** 2)
        / (g * jnp.maximum(u[0], 1e-12) ** 3), 0.0).max()),
}
SW_REDUCERS = {name: "sum" for name in SW_OBSERVABLES}
SW_REDUCERS["max_froude"] = "max"


@functools.partial(jax.jit, static_argnames=("n_steps", "g", "order",
                                             "limiter", "observables"),
                   donate_argnames=("u",))
def _rk3_multi(u, conn: FaceConnectivity, inv_volume, dt, volume=None, *,
               n_steps: int, g: float, order: int = 1,
               limiter: str = "bj", observables: tuple = ()):
    if order == 2:
        flux_fn = lambda w: sw_divergence_muscl(w, conn, g, inv_volume,
                                                limiter=limiter)
    else:
        flux_fn = lambda w: sw_divergence(w, conn, g)

    if observables:
        from t8gpu_tpu.models.observables import resolve
        fns = resolve(observables, SW_OBSERVABLES)

        def sbody(carry, _):
            v, sp = rk.ssp_rk3(carry[0], flux_fn, dt, inv_volume)
            row = jnp.stack([f(v, volume, g) for f in fns])
            return (v, sp), row

        carry0 = (u, jnp.zeros((), u.dtype))
        (u, sp), rows = jax.lax.scan(sbody, carry0, None, length=n_steps)
        return u, sp, rows

    def body(_i, carry):
        v, _ = carry
        return rk.ssp_rk3(v, flux_fn, dt, inv_volume)

    return jax.lax.fori_loop(0, n_steps, body,
                             (u, jnp.zeros((), u.dtype)))


class ShallowWaterSolver:
    """Finite-volume shallow water on any 2D mesh the Euler solver runs on.

    ic: callable mapping centers [N, dim] -> state [3, N] (h, hu, hv).
    """

    def __init__(self, mesh, ic: Callable[[np.ndarray], np.ndarray],
                 g: float = 9.81, amr: AMRConfig = AMRConfig(),
                 cfl: float = 0.45, order: int = 1, limiter: str = "bj"):
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order!r}")
        self.order = int(order)
        self.limiter = str(limiter)
        # default CFL is lower than the Euler solvers' 0.7: the wave-speed
        # estimate in compute_timestep comes from the PREVIOUS step batch,
        # and gravity-driven transients (dam breaks) accelerate from rest —
        # a stale estimate under-counts |un|+c, so the margin must absorb
        # the growth across a fused multi-step batch.
        from t8gpu_tpu.mesh.manager import MeshManager

        self.g = float(g)
        self.cfl = cfl
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
        if u.shape[-1] < cap:
            guard = jnp.broadcast_to(jnp.asarray(SW_GUARD)[:, None],
                                     (3, cap - u.shape[-1]))
            u = jnp.concatenate([u, guard], axis=1)
        self.u = u

    # -- stepping --------------------------------------------------------------

    def iterate(self, dt: float):
        self.iterate_many(1, dt)

    def iterate_many(self, n_steps: int, dt: float):
        self.u, self._max_speed = _rk3_multi(
            self.u, self.conn, self.inv_volume, jnp.float32(dt),
            n_steps=n_steps, g=self.g, order=self.order,
            limiter=self.limiter)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("volume", "energy")):
        """n_steps steps AND a per-step observable history in one
        dispatch — [n_steps, K] over SW_OBSERVABLES (volume /
        momentum_x/y / energy / max_froude; the energy column audits
        the Rusanov scheme's dissipativity).  Same contract as
        CompressibleEulerSolver.iterate_record."""
        from t8gpu_tpu.models.observables import resolve
        resolve(observables, SW_OBSERVABLES)          # eager validation
        self.u, self._max_speed, rows = _rk3_multi(
            self.u, self.conn, self.inv_volume, jnp.float32(dt),
            self.volume, n_steps=n_steps, g=self.g, order=self.order,
            limiter=self.limiter, observables=tuple(observables))
        return rows

    # -- diagnostics -----------------------------------------------------------

    def compute_integral(self) -> float:
        """Total water volume (the conserved mass analogue)."""
        return float((self.u[0] * self.volume).sum())

    def compute_timestep(self) -> float:
        return float(self.compute_timestep_device())

    def compute_timestep_device(self):
        """CFL timestep as a DEVICE scalar — feed it straight into
        iterate_many so adapt loops never pay a per-chunk D2H fetch
        (same contract as CompressibleEulerSolver.compute_timestep_device).
        Axis-summed cell speed sum_a |v_a| + dim * sqrt(g h) — the
        per-face max bound is noise-unstable for the dim-summed update
        (ops/euler.cfl_sum_speed rationale); computed FRESH from the
        current state, so the stale-batch concern in __init__'s cfl
        note no longer compounds it."""
        live = self.volume > 0
        hw = jnp.maximum(self.u[0], 1e-12)
        s = ((jnp.abs(self.u[1]) + jnp.abs(self.u[2])) / hw
             + 2.0 * jnp.sqrt(self.g * hw))
        speed = jnp.where(live, s, 0.0).max()
        h = getattr(self.mesh, "cfl_h", None)
        if h is None:
            level = getattr(self.mesh, "max_level", None)
            if level is None:
                level = getattr(self.mesh, "level", self.amr.max_level)
            h = 0.5 ** level
        return jnp.asarray(self.cfl * float(h), jnp.float32) / speed

    # -- AMR -------------------------------------------------------------------

    def adapt(self):
        """Gradient-criteria (on h) AMR cycle through the shared
        MeshManager seam."""
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
        """Unpadded [3, N] state on host."""
        return np.asarray(self.u[:, : self.n_elements])


# -- exact dam-break solution (Stoker 1957) ------------------------------------


def stoker_dam_break(h_l: float, h_r: float, g: float = 9.81):
    """The exact wet-bed dam-break solution (Stoker 1957, ch. 10.8): at
    t = 0 still water of depth h_l (x < x0) meets still water of depth
    h_r < h_l.  The solution is self-similar in xi = (x - x0) / t — a
    left rarefaction fan, a constant star region (h_m, u_m), and a right
    bore at speed s.

    Returns (profile, h_m, u_m, s) with profile(xi) -> (h, u) vectorized
    over xi.  Star state from the standard matching: the rarefaction
    invariant u_m = 2 (c_l - c_m) equals the bore jump
    u_m = (h_m - h_r) sqrt(g (h_m + h_r) / (2 h_m h_r)); solved by
    bisection in f64 (h_m is bracketed by (h_r, h_l)).

    This is the parameter-free quantitative validation artifact for the
    shallow-water family — the analogue of models/exact_riemann.py for
    Euler (the reference framework has no quantitative accuracy check
    anywhere, SURVEY §4)."""
    if not (h_l > h_r > 0):
        raise ValueError("Stoker solution needs h_l > h_r > 0 (wet bed)")
    c_l = float(np.sqrt(g * h_l))

    def f(h_m):
        c_m = np.sqrt(g * h_m)
        bore = (h_m - h_r) * np.sqrt(0.5 * g * (h_m + h_r) / (h_m * h_r))
        return 2.0 * (c_l - c_m) - bore

    lo, hi = h_r, h_l
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) > 0.0:
            lo = mid
        else:
            hi = mid
    h_m = 0.5 * (lo + hi)
    c_m = float(np.sqrt(g * h_m))
    u_m = 2.0 * (c_l - c_m)
    s = h_m * u_m / (h_m - h_r)          # bore speed (mass jump)

    def profile(xi):
        xi = np.asarray(xi, np.float64)
        # rarefaction fan: xi = u - c with u + 2c = 2 c_l
        c_fan = (2.0 * c_l - xi) / 3.0
        h_fan = c_fan * c_fan / g
        u_fan = 2.0 / 3.0 * (xi + c_l)
        h = np.where(xi < -c_l, h_l,
                     np.where(xi < u_m - c_m, h_fan,
                              np.where(xi < s, h_m, h_r)))
        u = np.where(xi < -c_l, 0.0,
                     np.where(xi < u_m - c_m, u_fan,
                              np.where(xi < s, u_m, 0.0)))
        return h, u

    return profile, float(h_m), float(u_m), float(s)
