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
from t8gpu_tpu.ops.fluxes import gather_cols
from t8gpu_tpu.parallel.partition import ShardedConnectivity

AXIS = "sfc"


def halo_exchange(u_local: jnp.ndarray, send_idx: jnp.ndarray) -> jnp.ndarray:
    """Publish this shard's halo rows and gather every shard's pool.

    u_local: [5, CL]; send_idx: [H] local ids.
    Returns the extended element axis [5, CL + n_shards*H].
    """
    send = gather_cols(u_local, send_idx)                # [5, H]
    pool = jax.lax.all_gather(send, AXIS)                # [S, 5, H]
    pool = jnp.moveaxis(pool, 0, 1).reshape(u_local.shape[0], -1)
    return jnp.concatenate([u_local, pool], axis=1)


def sharded_flux_divergence(u_local: jnp.ndarray, conn: ShardedConnectivity,
                            gamma: float, flux: str):
    """Per-shard surface-flux accumulation [5, CL] + GLOBAL max wave speed.

    conn arrays arrive as this shard's slices (leading axis stripped by
    shard_map in_specs); the same face-flux math as ops/fluxes.py runs on
    the extended element axis.
    """
    u_ext = halo_exchange(u_local, conn.send_idx)

    u_l = gather_cols(u_ext, conn.left)
    u_r = gather_cols(u_ext, conn.right)
    basis = euler.face_basis(conn.normal)
    f_rot, speed = euler.numerical_flux(
        euler.rotate_state(u_l, *basis), euler.rotate_state(u_r, *basis),
        gamma=gamma, flux=flux)
    f = euler.inverse_rotate_state(f_rot, *basis) * conn.area
    speed = speed * (conn.area > 0)

    if conn.boundary_capacity:
        u_in = gather_cols(u_local, conn.b_elem)
        basis_b = euler.face_basis(conn.b_normal)
        u_rot = euler.rotate_state(u_in, *basis_b)
        fb_rot, speed_b = euler.numerical_flux(
            u_rot, u_rot.at[1].multiply(-1.0), gamma=gamma, flux=flux)
        fb = euler.inverse_rotate_state(fb_rot, *basis_b) * conn.b_area
        speed_b = speed_b * (conn.b_area > 0)
    else:
        fb = jnp.zeros((5, 0), u_local.dtype)
        speed_b = jnp.zeros((0,), u_local.dtype)

    all_f = jnp.concatenate([f, fb, jnp.zeros((5, 1), f.dtype)], axis=1)
    contrib = gather_cols(all_f, conn.inc_slot)          # [5, CL, D]
    acc = (contrib * conn.inc_sign).sum(axis=-1)

    local_max = jnp.maximum(speed.max(), speed_b.max() if speed_b.size else 0.0)
    return acc, jax.lax.pmax(local_max, AXIS)
