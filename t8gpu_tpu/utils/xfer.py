"""Batched host->device uploads.

Mesh adapts rebuild many small connectivity arrays on the host; naive
per-array `jnp.asarray` pays one host->device round trip EACH, and in
latency-bound environments (the TPU tunnel here; PCIe generally) those
round trips dominate the adapt cycle.  `pack_put` concatenates the host
arrays into ONE byte buffer, uploads it once, and carves the device
arrays back out inside ONE jitted program (cached per segment-layout
signature) — a single transfer plus a single dispatch, the counterpart
of the reference batching its connectivity uploads into a handful of
cudaMemcpys per adapt (mesh_manager.inl:446-480)."""

from __future__ import annotations

import functools

import numpy as np

_UNPACK_CACHE: dict = {}


def _unpack(dev, *, metas):
    import jax
    import jax.numpy as jnp

    out = []
    for dtype_str, shape, o, nb in metas:
        dtype = np.dtype(dtype_str)
        seg = jax.lax.slice(dev, (o,), (o + nb,))
        itemsize = dtype.itemsize
        if itemsize > 1:
            seg = jax.lax.bitcast_convert_type(
                seg.reshape(-1, itemsize), jnp.dtype(dtype))
        elif dtype != np.uint8:
            seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dtype))
        out.append(seg.reshape(shape))
    return tuple(out)


def pack_put(arrays):
    """Upload a list of NumPy arrays with ONE host->device transfer and
    ONE carve-out dispatch.  Returns device arrays with the original
    dtypes/shapes."""
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
        metas.append((a.dtype.str, a.shape, off, nb))
        chunks.append(a.view(np.uint8).ravel())
        off += nb
    if not metas:
        return []
    buf = np.concatenate(chunks)
    dev = jnp.asarray(buf)

    key = tuple(metas)
    fn = _UNPACK_CACHE.get(key)
    if fn is None:
        fn = _UNPACK_CACHE[key] = jax.jit(
            functools.partial(_unpack, metas=key))
    return list(fn(dev))
