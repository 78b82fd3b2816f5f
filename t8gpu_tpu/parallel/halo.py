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
    return acc, jax.lax.pmax(local_max, AXIS)


def sharded_flux_divergence(u_local: jnp.ndarray, conn: ShardedConnectivity,
                            gamma: float, flux: str):
    """Per-shard surface-flux accumulation [5, CL] + GLOBAL max wave speed.

    conn arrays arrive as this shard's slices (leading axis stripped by
    shard_map in_specs); the same face-flux math as ops/fluxes.py runs on
    the extended element axis.  Per-cell fields are computed once on the
    extended axis after the halo exchange (exchanging raw states keeps ICI
    traffic at 5 rows; the halo cells' fields are recomputed locally).
    """
    u_ext = halo_exchange(u_local, conn)
    q = euler.maybe_barrier(euler.cell_fields(u_ext, gamma, flux))

    q_l = gather_cols(q, conn.left)
    q_r = gather_cols(q, conn.right)
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

    if conn.boundary_capacity:
        q_in = gather_cols(q[:, : u_local.shape[1]], conn.b_elem)
        if conn.b_axis_ranges is not None:
            fs, sps = [], []
            for a, sgn, s0, s1 in conn.b_axis_ranges:
                q_own = euler.fields_axis_rotate(q_in[:, s0:s1], a)
                q_ghost = euler.fields_mirror(q_own)
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
            fb_rot, speed_b = euler.fields_flux(
                q_rot, euler.fields_mirror(q_rot), gamma=gamma, flux=flux)
            fb = euler.inverse_rotate_state(fb_rot, *basis_b) * conn.b_area
            speed_b = speed_b * (conn.b_area > 0)
    else:
        fb = jnp.zeros((5, 0), u_local.dtype)
        speed_b = jnp.zeros((0,), u_local.dtype)

    acc = accumulate_inc(f, fb, conn.inc_slot, conn.inc_sign)

    local_max = jnp.maximum(speed.max(), speed_b.max() if speed_b.size else 0.0)
    return acc, jax.lax.pmax(local_max, AXIS)
