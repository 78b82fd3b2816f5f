"""Device-side halo exchange + sharded flux evaluation (runs in shard_map).

The TPU-native replacement of the reference's CUDA-IPC remote loads and
remote atomicAdd (`examples/compressible_euler/kernels.cu:150-172,295-308`)
and its cudaDeviceSynchronize + MPI_Barrier consistency protocol
(`solver.cu:98-99`): one `lax.all_gather` over the `sfc` mesh axis
materializes every shard's published halo rows, flux kernels index the
concatenated [local | halo-pool] element axis, and accumulation stays
local per shard.  Reductions (CFL max speed, conservation integrals) are
`lax.pmax` / `lax.psum` (ref MPI_Allreduce, solver.cu:206-222).

All functions here execute INSIDE jax.shard_map: array arguments are the
per-shard slices (leading shard axis already consumed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t8gpu_tpu.ops import euler
from t8gpu_tpu.ops.fluxes import accumulate_inc, gather_cols
from t8gpu_tpu.parallel.partition import ShardedConnectivity

AXIS = "sfc"


def halo_exchange(u_local: jnp.ndarray, conn: ShardedConnectivity) -> jnp.ndarray:
    """Neighbor-wise halo exchange: for each active shard-offset round r,
    pack exactly the rows shard (s + r) mod S reads and `ppermute` them.

    u_local: [5, CL]; conn.send_rounds[i]: [H_r] local ids (this shard's
    slice).  Returns the extended element axis [5, CL + sum H_r] with the
    received round blocks concatenated in conn.halo_rounds order.

    Replaces the round-1 all_gather pool (O(S*H) rows per shard) with a
    ghost layer scoped to actual neighbors (ref mesh_manager.h:189-229):
    with the 1-D SFC partition, traffic concentrates on r in {1, S-1}, so
    the received pool stays O(local boundary) regardless of shard count.
    """
    S = conn.n_shards
    parts = [u_local]
    for r, idx in zip(conn.halo_rounds, conn.send_rounds):
        send = gather_cols(u_local, idx)                 # [5, H_r]
        perm = [(s, (s + r) % S) for s in range(S)]
        parts.append(jax.lax.ppermute(send, AXIS, perm))
    return jnp.concatenate(parts, axis=1)


def sharded_divergence(u_local: jnp.ndarray, conn: ShardedConnectivity,
                       face_flux, boundary_flux=None):
    """PDE-agnostic per-shard divergence (the distribution machinery the
    reference keeps physics-free, SURVEY §1): halo exchange, raw-state
    face gathers, a USER face flux, CSR accumulate, global pmax speed.

    face_flux(u_l, u_r, normal, area) -> (f [C, Fcap] area-scaled
    left->right flux, speed [Fcap]); boundary_flux(u_own, b_normal,
    b_area) -> (fb [C, Fbcap], speed_b) or None for no walls.  Row count
    C is the model's (Euler 5, scalar advection 1).  The Euler fast path
    (precomputed cell fields, static axis-group rotations) remains in
    sharded_flux_divergence."""
    C = u_local.shape[0]
    CL = u_local.shape[1]
    u_ext = halo_exchange(u_local, conn)
    f, speed = face_flux(gather_cols(u_ext, conn.left),
                         gather_cols(u_ext, conn.right),
                         conn.normal, conn.area)
    speed = speed * (conn.area > 0)
    if conn.boundary_capacity and boundary_flux is not None:
        fb, speed_b = boundary_flux(gather_cols(u_ext[:, :CL], conn.b_elem),
                                    conn.b_normal, conn.b_area)
        speed_b = speed_b * (conn.b_area > 0)
    else:
        fb = jnp.zeros((C, 0), u_local.dtype)
        speed_b = jnp.zeros((0,), u_local.dtype)

    acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)
    local_max = jnp.maximum(speed.max(),
                            speed_b.max() if speed_b.size else 0.0)
    return acc, jax.lax.pmax(jax.lax.stop_gradient(local_max), AXIS)


def sharded_flux_divergence(u_local: jnp.ndarray, conn: ShardedConnectivity,
                            gamma: float, flux: str, ghost=None):
    """Per-shard surface-flux accumulation [5, CL] + GLOBAL max wave speed.

    conn arrays arrive as this shard's slices (leading axis stripped by
    shard_map in_specs); the same face-flux math as ops/fluxes.py runs on
    the extended element axis.  Per-cell fields are computed once on the
    extended axis after the halo exchange (exchanging raw states keeps ICI
    traffic at 5 rows; the halo cells' fields are recomputed locally).
    """
    u_ext = halo_exchange(u_local, conn)
    q = euler.maybe_barrier(euler.cell_fields(u_ext, gamma, flux))

    f, speed = _fields_interior_flux(gather_cols(q, conn.left),
                                     gather_cols(q, conn.right),
                                     conn, gamma, flux)
    if conn.boundary_capacity:
        q_in = gather_cols(q[:, : u_local.shape[1]], conn.b_elem)
        fb, speed_b = _fields_boundary_flux(q_in, conn, gamma, flux, ghost)
    else:
        fb = jnp.zeros((5, 0), u_local.dtype)
        speed_b = jnp.zeros((0,), u_local.dtype)

    acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)

    local_max = jnp.maximum(speed.max(), speed_b.max() if speed_b.size else 0.0)
    return acc, jax.lax.pmax(jax.lax.stop_gradient(local_max), AXIS)


def _fields_interior_flux(q_l, q_r, conn: ShardedConnectivity,
                          gamma: float, flux: str):
    """Interior face fluxes from per-side FIELD rows [C, Fcap]: static
    axis-group rotations on Cartesian meshes, per-face basis otherwise."""
    if conn.axis_ranges is not None:
        # axis-grouped segments (common static ranges across shards):
        # static row-permutation rotations, no per-face basis math
        fs, sps = [], []
        for a, s0, s1 in conn.axis_ranges:
            f_rot, sp = euler.fields_flux(
                euler.fields_axis_rotate(q_l[:, s0:s1], a),
                euler.fields_axis_rotate(q_r[:, s0:s1], a),
                gamma=gamma, flux=flux)
            fs.append(euler.flux_axis_unrotate(f_rot, a))
            sps.append(sp)
        f = jnp.concatenate(fs, axis=1) * conn.area
        speed = jnp.concatenate(sps) * (conn.area > 0)
    else:
        basis = euler.face_basis(conn.normal)
        f_rot, speed = euler.fields_flux(
            euler.fields_rotate(q_l, *basis),
            euler.fields_rotate(q_r, *basis), gamma=gamma, flux=flux)
        f = euler.inverse_rotate_state(f_rot, *basis) * conn.area
        speed = speed * (conn.area > 0)
    return f, speed


def _fields_boundary_flux(q_in, conn: ShardedConnectivity,
                          gamma: float, flux: str, ghost=None):
    """Boundary fluxes from the owner-side FIELD rows [C, Bcap]:
    reflective mirror ghosts (default), or the prescribed farfield
    ghost fields [C, 1] (open boundaries, ops/fluxes docs)."""
    if ghost is not None:
        ghost = jnp.broadcast_to(ghost,
                                 ghost.shape[:-1] + (q_in.shape[-1],))
    if conn.b_axis_ranges is not None:
        fs, sps = [], []
        for a, sgn, s0, s1 in conn.b_axis_ranges:
            q_own = euler.fields_axis_rotate(q_in[:, s0:s1], a)
            if ghost is None:
                q_ghost = euler.fields_mirror(q_own)
            else:
                q_ghost = euler.fields_axis_rotate(ghost[:, s0:s1], a)
            pair = (q_own, q_ghost) if sgn > 0 else (q_ghost, q_own)
            fb_rot, sp = euler.fields_flux(*pair, gamma=gamma, flux=flux)
            f_a = euler.flux_axis_unrotate(fb_rot, a)
            fs.append(f_a if sgn > 0 else -f_a)
            sps.append(sp)
        fb = jnp.concatenate(fs, axis=1) * conn.b_area
        speed_b = jnp.concatenate(sps) * (conn.b_area > 0)
    else:
        basis_b = euler.face_basis(conn.b_normal)
        q_rot = euler.fields_rotate(q_in, *basis_b)
        q_ghost = (euler.fields_mirror(q_rot) if ghost is None
                   else euler.fields_rotate(ghost, *basis_b))
        fb_rot, speed_b = euler.fields_flux(q_rot, q_ghost, gamma=gamma,
                                            flux=flux)
        fb = euler.inverse_rotate_state(fb_rot, *basis_b) * conn.b_area
        speed_b = speed_b * (conn.b_area > 0)
    return fb, speed_b


def sharded_viscous_divergence(u_local: jnp.ndarray,
                               conn: ShardedConnectivity,
                               inv_volume: jnp.ndarray, gamma: float,
                               mu: float, prandtl: float, dim: int,
                               wall: str = "slip",
                               wall_velocity=(0.0, 0.0, 0.0),
                               wall_temperature=None):
    """Per-shard viscous (Navier-Stokes) divergence [5, CL] + the GLOBAL
    diffusive dt limit as a wave-speed equivalent — the multi-chip
    counterpart of ops/viscous.viscous_face_flux.

    Same two-round distribution design as the sharded MUSCL: every face
    of an owned element is present locally (duplicated cross-shard
    faces), so owned-element Green-Gauss primitive gradients are local
    after the round-1 state halo; a SECOND halo round ships the 12
    gradient rows so both sides of a shard-boundary face assemble the
    IDENTICAL face gradient — viscous momentum/energy exchange is
    exactly conservative across shards."""
    from t8gpu_tpu.ops.viscous import face_flux_from_sides, primitive_rows

    CL = u_local.shape[1]
    u_ext = halo_exchange(u_local, conn)
    phi_ext = primitive_rows(u_ext, gamma)               # [4, CL+H]

    # Green-Gauss over this shard's faces (all faces of owned elements)
    p_l = gather_cols(phi_ext, conn.left)
    p_r = gather_cols(phi_ext, conn.right)
    mean = 0.5 * (p_l + p_r)
    c = (mean[:, None, :] * (conn.normal * conn.area)[None]).reshape(12, -1)
    if conn.boundary_capacity:
        p_b = gather_cols(phi_ext[:, :CL], conn.b_elem)
        cb = (p_b[:, None, :] * (conn.b_normal * conn.b_area)[None]
              ).reshape(12, -1)
    else:
        cb = jnp.zeros((12, 0), u_local.dtype)
    grad = (-accumulate_inc(c, cb, conn.inc_slot, conn.inc_sign)
            * inv_volume)                                # [12, CL]

    # round 2: owners publish gradients for their halo elements
    grad_ext = halo_exchange(grad, conn)                 # [12, CL+H]
    g_l = gather_cols(grad_ext, conn.left).reshape(4, 3, -1)
    g_r = gather_cols(grad_ext, conn.right).reshape(4, 3, -1)
    d_lr = conn.d_left - conn.d_right                    # x_R - x_L [3, F]
    fv = face_flux_from_sides(p_l, p_r, g_l, g_r, conn.normal, conn.area,
                              d_lr, gamma, mu, prandtl)
    # walls: free-slip adiabatic (zero viscous flux) by default, or the
    # no-slip one-sided wall shear — same models as the single-device path
    if wall == "noslip" and conn.boundary_capacity:
        v_own = gather_cols(phi_ext[:, :CL], conn.b_elem)[:3]
        nb = conn.b_normal
        # uniform (3,) tuple, or a per-face [3, Bcap] lid field shipped
        # with the connectivity (ShardedConnectivity.b_wall_vel)
        vw = jnp.asarray(wall_velocity, u_local.dtype)
        if vw.ndim == 1:
            vw = vw[:, None]
        vw_t = vw - (vw * nb).sum(axis=0) * nb
        dn = jnp.abs((conn.d_b * nb).sum(axis=0))
        livew = (dn > 0).astype(u_local.dtype)
        dn = jnp.where(dn > 0, dn, 1.0)
        dvdn = ((vw_t - v_own) / dn) * livew
        ddn_n = (dvdn * nb).sum(axis=0)
        tau_n = mu * (dvdn + (1.0 / 3.0) * ddn_n * nb)
        work = (vw_t * tau_n).sum(axis=0) * livew
        if wall_temperature is not None:
            kappa = mu * gamma / ((gamma - 1.0) * prandtl)
            t_own = gather_cols(phi_ext[:, :CL], conn.b_elem)[3]
            work = work + kappa * ((wall_temperature - t_own) / dn) * livew
        zero = jnp.zeros_like(dn)
        fb = jnp.stack([zero, tau_n[0], tau_n[1], tau_n[2],
                        work]) * conn.b_area
    else:
        fb = jnp.zeros((5, conn.boundary_capacity), u_local.dtype)
    acc = accumulate_inc(-fv, -fb, conn.inc_slot, conn.inc_sign)

    # global diffusive dt limit as a speed: 2 dim nu_eff / h with the
    # GLOBAL smallest density and cell size (pmin/pmax of the local
    # extremes, so every shard applies the same conservative bound)
    live = inv_volume > 0
    # stop_gradient: the CFL speed is a dt diagnostic, not a
    # differentiation path — and pmax/pmin carry no AD rules, so this is
    # what makes sharded rollouts reverse-differentiable (models/adjoint)
    rho_min = jax.lax.pmin(
        jax.lax.stop_gradient(jnp.where(live, u_local[0], jnp.inf).min()),
        AXIS)
    inv_max = jax.lax.pmax(
        jax.lax.stop_gradient(jnp.where(live, inv_volume, 0.0).max()), AXIS)
    nu = (mu / rho_min) * max(1.0, gamma / prandtl)
    speed_v = 2.0 * dim * nu * inv_max ** (1.0 / dim)
    return acc, speed_v


def sharded_reconstruct_sides(u_local: jnp.ndarray,
                              conn: ShardedConnectivity,
                              inv_volume: jnp.ndarray,
                              limiter: str = "bj", dim: int = 2,
                              guard=None):
    """Limited MUSCL interface states per shard — the multi-chip
    counterpart of ops/reconstruct.reconstruct_sides, row-generic
    (C = u_local.shape[0]: Euler 5, GLM-MHD 9).  Returns
    (u_lf [C, Fcap], u_rf [C, Fcap], u_bf [C, Fbcap]).

    Distribution design: cross-shard faces are DUPLICATED on both shards
    (partition.py builds every face incident to an owned element), so the
    Green-Gauss gradient and limiter alpha of every OWNED element are
    computable locally after the round-1 state halo.  A SECOND halo
    round then ships concat([grad (3C rows), alpha (C rows)]) so both
    sides of a shard-boundary face reconstruct the IDENTICAL interface
    states — conservation holds exactly, like the first-order duplicated
    faces.

    guard(u_rec, u_first) -> u: physical-admissibility fallback per face
    side (Euler: ops/reconstruct._positivity_guard; MHD: _mhd_guard)."""
    from t8gpu_tpu.ops.reconstruct import (_bj_ratio, _limiter_eps2,
                                           _side_values, _venkat_ratio)

    C = u_local.shape[0]
    CL = u_local.shape[1]
    if guard is None:
        guard = lambda rec, first: rec
    u_ext = halo_exchange(u_local, conn)

    # Green-Gauss over this shard's faces (all faces of owned elements)
    u_l = gather_cols(u_ext, conn.left)
    u_r = gather_cols(u_ext, conn.right)
    mean = 0.5 * (u_l + u_r)
    c = (mean[:, None, :] * (conn.normal * conn.area)[None]
         ).reshape(3 * C, -1)
    if conn.boundary_capacity:
        u_b = gather_cols(u_local, conn.b_elem)
        cb = (u_b[:, None, :] * (conn.b_normal * conn.b_area)[None]
              ).reshape(3 * C, -1)
    else:
        u_b = jnp.zeros((C, 0), u_local.dtype)
        cb = jnp.zeros((3 * C, 0), u_local.dtype)
    grad = (-accumulate_inc(c, cb, conn.inc_slot, conn.inc_sign)
            * inv_volume).reshape(C, 3, CL)

    if limiter in ("bj", "venkat"):
        nbr = _side_values(u_r, u_l, u_b, conn)          # [C, CL, D]
        m = conn.inc_sign != 0
        u_min = jnp.minimum(u_local, jnp.where(m, nbr, jnp.inf).min(-1))
        u_max = jnp.maximum(u_local, jnp.where(m, nbr, -jnp.inf).max(-1))
        # extrapolation per incidence slot, from the owned element's side
        d_slots = _side_values(conn.d_left, conn.d_right, conn.d_b, conn)
        du = jnp.einsum("vkc,kcd->vcd", grad, d_slots)   # [C, CL, D]
        if limiter == "venkat":
            eps2 = _limiter_eps2(inv_volume, dim, u_local.dtype)
            r = _venkat_ratio(du, (u_max - u_local)[..., None],
                              (u_min - u_local)[..., None],
                              eps2[None, :, None])
        else:
            r = _bj_ratio(du, (u_max - u_local)[..., None],
                          (u_min - u_local)[..., None])
        alpha = jnp.where(m, r, 1.0).min(-1)             # [C, CL]
    elif limiter == "none":
        alpha = jnp.ones_like(u_local)
    else:
        raise ValueError(f"unknown limiter: {limiter!r}")

    # round 2: owners publish gradients + alpha for their halo elements
    ga_ext = halo_exchange(
        jnp.concatenate([grad.reshape(3 * C, CL), alpha]), conn)
    grad_ext = ga_ext[:3 * C]                            # [3C, CL+H]
    alpha_ext = ga_ext[3 * C:]

    du_l = (gather_cols(grad_ext, conn.left).reshape(C, 3, -1)
            * conn.d_left[None]).sum(axis=1)
    du_r = (gather_cols(grad_ext, conn.right).reshape(C, 3, -1)
            * conn.d_right[None]).sum(axis=1)
    u_lf = guard(u_l + gather_cols(alpha_ext, conn.left) * du_l, u_l)
    u_rf = guard(u_r + gather_cols(alpha_ext, conn.right) * du_r, u_r)
    if conn.boundary_capacity:
        du_b = (gather_cols(grad.reshape(3 * C, CL), conn.b_elem)
                .reshape(C, 3, -1) * conn.d_b[None]).sum(axis=1)
        u_bf = guard(u_b + gather_cols(alpha, conn.b_elem) * du_b, u_b)
    else:
        u_bf = u_b
    return u_lf, u_rf, u_bf


def sharded_flux_divergence_muscl(u_local: jnp.ndarray,
                                  conn: ShardedConnectivity,
                                  inv_volume: jnp.ndarray,
                                  gamma: float, flux: str,
                                  limiter: str = "bj", dim: int = 2,
                                  ghost=None):
    """Second-order (MUSCL) per-shard Euler divergence — the multi-chip
    counterpart of ops/reconstruct.flux_divergence_muscl: the generic
    sharded reconstruction above with the Euler positivity guard, feeding
    the same KEPES/HLL fields flux."""
    from t8gpu_tpu.ops.reconstruct import _positivity_guard

    u_lf, u_rf, u_bf = sharded_reconstruct_sides(
        u_local, conn, inv_volume, limiter, dim,
        guard=lambda rec, first: _positivity_guard(rec, first, gamma))

    f, speed = _fields_interior_flux(euler.cell_fields(u_lf, gamma, flux),
                                     euler.cell_fields(u_rf, gamma, flux),
                                     conn, gamma, flux)
    if conn.boundary_capacity:
        fb, speed_b = _fields_boundary_flux(
            euler.cell_fields(u_bf, gamma, flux), conn, gamma, flux, ghost)
    else:
        fb = jnp.zeros((5, 0), u_local.dtype)
        speed_b = jnp.zeros((0,), u_local.dtype)

    acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)
    local_max = jnp.maximum(speed.max(),
                            speed_b.max() if speed_b.size else 0.0)
    return acc, jax.lax.pmax(jax.lax.stop_gradient(local_max), AXIS)
