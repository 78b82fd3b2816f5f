"""Batched host->device uploads.

Mesh adapts rebuild many small connectivity arrays on the host; naive
per-array `jnp.asarray` pays one host->device round trip EACH, and in
latency-bound environments (the TPU tunnel here; PCIe generally) those
round trips dominate the adapt cycle.  `pack_put` concatenates the host
arrays into ONE byte buffer, uploads it once, and carves the device
arrays back out with device-side slices + bitcasts (async dispatches, no
further transfers) — the counterpart of the reference batching all its
connectivity uploads into a handful of cudaMemcpys per adapt
(mesh_manager.inl:446-480)."""

from __future__ import annotations

import numpy as np


def pack_put(arrays):
    """Upload a list of NumPy arrays with ONE host->device transfer.
    Returns device arrays with the original dtypes/shapes."""
    import jax
    import jax.numpy as jnp

    metas = []
    chunks = []
    off = 0
    for a in arrays:
        a = np.ascontiguousarray(a)
        nb = a.nbytes
        # align each segment to 4 bytes so bitcasts stay trivial
        pad = (-off) % 4
        if pad:
            chunks.append(np.zeros(pad, np.uint8))
            off += pad
        metas.append((a.dtype, a.shape, off, nb))
        chunks.append(a.view(np.uint8).ravel())
        off += nb
    if not metas:
        return []
    buf = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
    dev = jnp.asarray(buf)

    out = []
    for dtype, shape, o, nb in metas:
        seg = jax.lax.slice(dev, (o,), (o + nb,))
        itemsize = dtype.itemsize
        if itemsize > 1:
            seg = jax.lax.bitcast_convert_type(
                seg.reshape(-1, itemsize), jnp.dtype(dtype))
        elif dtype != np.uint8:
            seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dtype))
        out.append(seg.reshape(shape))
    return out
