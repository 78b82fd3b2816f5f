"""Device-side AMR operations: refinement criteria + state remapping.

TPU-native equivalents of the reference AMR kernels:

  * `estimate_gradient` — per-face |Δρ| accumulated to both neighbor
    elements (ref examples/compressible_euler/kernels.cu:471-501, which
    atomicAdds into the Fluxes scratch step; here a deterministic gather).
  * `refinement_criteria` — gradient / V^(1/dim)
    (ref examples/compressible_euler/solver.cu:231-241, 243-267).
  * `apply_remap` — gather-based prolongation (copy parent value to
    children) / restriction (average the 2^dim family) driven by the
    host-built remap spec, replacing `adapt_variables_and_volume`
    (ref t8gpu/mesh/mesh_manager.inl:164-193).

All functions are jit-compiled with shapes padded to capacity buckets so
AMR cycles reuse compiled programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.mesh.connectivity import FaceConnectivity


@jax.jit
def estimate_gradient(u: jnp.ndarray, conn: FaceConnectivity) -> jnp.ndarray:
    """Per-element sum over incident faces of |rho_l - rho_r| -> [capacity].

    Mirrors ref kernels.cu:471-501 (both neighbors accumulate the same
    unsigned jump; boundary faces contribute nothing since the mirror ghost
    has equal density, ref kernels.cu:371-375).
    """
    rho = u[0]
    jump = jnp.abs(rho[conn.left] - rho[conn.right]) * (conn.area > 0)
    nb = conn.boundary_capacity
    all_j = jnp.concatenate([jump, jnp.zeros(nb + 1, u.dtype)])
    contrib = all_j[conn.inc_slot]                  # [capacity, D]
    return (contrib * jnp.abs(conn.inc_sign)).sum(axis=-1)


@functools.partial(jax.jit, static_argnames=("dim",))
def refinement_criteria(u: jnp.ndarray, conn: FaceConnectivity,
                        volume: jnp.ndarray, dim: int) -> jnp.ndarray:
    """criteria = gradient / V^(1/dim)  (ref solver.cu:243-267, 3D: cbrt)."""
    grad = estimate_gradient(u, conn)
    h = jnp.where(volume > 0, volume, 1.0) ** (1.0 / dim)
    return grad / h * (volume > 0)


@functools.partial(jax.jit, static_argnames=("k", "capacity"))
def apply_remap(u: jnp.ndarray, src_start: jnp.ndarray, src_count: jnp.ndarray,
                k: int, capacity: int) -> jnp.ndarray:
    """Remap element data old->new across an adapt (ref mesh_manager.inl:164-193).

    u: [..., cap_old]; src_start/src_count: [capacity] (padded with 0/1).
    New value = old[src_start] when count==1 (keep or prolongation copy) or
    the mean of old[src_start : src_start+k] when count==k (restriction).
    """
    idx = src_start[:, None] + jnp.arange(k, dtype=src_start.dtype)[None, :]
    idx = jnp.minimum(idx, u.shape[-1] - 1)          # guard tail reads
    valid = jnp.arange(k)[None, :] < src_count[:, None]
    vals = jnp.take(u, idx, axis=-1)                 # [..., capacity, k]
    return (vals * valid).sum(axis=-1) / src_count.astype(u.dtype)


@functools.partial(jax.jit, static_argnames=("k", "capacity"))
def apply_remap_weighted(u: jnp.ndarray, src_start: jnp.ndarray,
                         src_count: jnp.ndarray, w_old: jnp.ndarray,
                         k: int, capacity: int) -> jnp.ndarray:
    """Volume-weighted apply_remap: restriction averages the 2^dim family
    weighted by the OLD element volumes — required on meshes whose family
    members have unequal volumes (the shell prisms: radial children scale
    as r^2 dr), and identical to the plain mean on equal-volume forests.
    new = sum(u * w) / sum(w) over the source range; prolongation rows
    (count == 1) reduce to a plain copy.  Exactly mass-conserving since
    children tile their parent (sum w_children = V_parent)."""
    idx = src_start[:, None] + jnp.arange(k, dtype=src_start.dtype)[None, :]
    idx = jnp.minimum(idx, u.shape[-1] - 1)
    valid = jnp.arange(k)[None, :] < src_count[:, None]
    wv = w_old[idx] * valid                              # [capacity, k]
    vals = jnp.take(u, idx, axis=-1)                     # [..., capacity, k]
    return (vals * wv).sum(axis=-1) / wv.sum(axis=-1)


def pad_remap(src_start: np.ndarray, src_count: np.ndarray, capacity: int):
    """Pad host remap arrays to the element capacity bucket (start=0/count=1
    on padding rows so padded lanes read element 0 and stay finite)."""
    n = len(src_start)
    start = np.zeros(capacity, np.int32)
    count = np.ones(capacity, np.int32)
    start[:n] = src_start
    count[:n] = src_count
    return jnp.asarray(start), jnp.asarray(count)
