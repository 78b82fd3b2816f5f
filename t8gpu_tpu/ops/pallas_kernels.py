"""Pallas TPU kernels for the hot compute paths.

`inner_divergence_pallas` fuses the whole per-element interior-flux
stencil (3 axis sweeps x KEPES/HLL + divergence accumulation,
ref compute_inner_fluxes examples/subgrid/kernels.inl:335-662) into one
kernel over element tiles: the state tile is loaded into VMEM once,
every interface flux and the divergence are computed in registers, and
only D (+ a per-element speed bound) is written back — removing the
intermediate materializations XLA's fusion sometimes spills between the
slice / flux / pad stages.

Element-minor layout [5, *ext, E] as everywhere; the grid runs over
element tiles of TILE lanes.

STATUS (round 1, measured on v5e): bit-exact vs the XLA stencil, but
currently ~1000x SLOWER (3.9 s vs 3.4 ms per eval at 2.1 M cells) — the
small leading block axes ([5, 4, 4, 4, T]) force Mosaic relayouts/scalar
loops around every slice.  A fast version needs the kernel restructured
over 2-D [row, lane] tiles with explicit row arithmetic for the stencil
offsets.  Kept as an opt-in (flux_divergence(use_pallas=True)) and a
correctness-tested starting point; XLA's fusion of the same stencil is
the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.ops.euler import numerical_flux
from t8gpu_tpu.ops.subgrid import axis_rotate, axis_unrotate

DEFAULT_TILE = 1024


def _kernel(u_ref, vol_ref, d_ref, sp_ref, *, spec: SubgridSpec,
            gamma: float, flux: str):
    dim = spec.dim
    ext = spec.extent
    u = u_ref[...]                                   # [5, *ext, T]
    vol = vol_ref[0]                                 # [T] (stored [1, T])
    h_cell = jnp.where(vol > 0, vol, 1.0) ** (1.0 / dim) / ext
    surface = (h_cell ** (dim - 1)) * (vol > 0)

    D = jnp.zeros_like(u)
    speed = jnp.zeros_like(vol)
    for a in range(dim):
        ax = 1 + a
        u_l = jax.lax.slice_in_dim(u, 0, ext - 1, axis=ax)
        u_r = jax.lax.slice_in_dim(u, 1, ext, axis=ax)
        f, sp = numerical_flux(axis_rotate(u_l, a), axis_rotate(u_r, a),
                               gamma=gamma, flux=flux)
        f = axis_unrotate(f, a) * surface
        pad_lo = [(0, 0)] * u.ndim
        pad_hi = [(0, 0)] * u.ndim
        pad_lo[ax] = (1, 0)
        pad_hi[ax] = (0, 1)
        D = D + jnp.pad(f, pad_lo) - jnp.pad(f, pad_hi)
        speed = jnp.maximum(speed, sp.max(axis=tuple(range(sp.ndim - 1))))
    d_ref[...] = D
    sp_ref[0, :] = speed * (vol > 0)


@functools.partial(jax.jit,
                   static_argnames=("spec", "gamma", "flux", "tile",
                                    "interpret"))
def inner_divergence_pallas(u: jnp.ndarray, volumes: jnp.ndarray,
                            spec: SubgridSpec, gamma: float, flux: str,
                            tile: int = DEFAULT_TILE,
                            interpret: bool = False):
    """Drop-in replacement for ops.subgrid.inner_divergence
    ([5, *ext, Ecap] -> (D, max_speed)); requires Ecap % tile == 0."""
    E = u.shape[-1]
    if E % tile:
        tile = max(t for t in (512, 256, 128) if E % t == 0) if any(
            E % t == 0 for t in (512, 256, 128)) else E
    grid = (E // tile,)
    blk_u = (5,) + spec.extents + (tile,)

    def idx(i):
        return (0,) * (spec.dim + 1) + (i,)

    # 1-D arrays get ambiguous XLA lane tilings; carry volume/speed as
    # [1, E] so Mosaic and XLA agree on the (8, 128) layout
    D, sp = pl.pallas_call(
        functools.partial(_kernel, spec=spec, gamma=gamma, flux=flux),
        grid=grid,
        in_specs=[pl.BlockSpec(blk_u, idx),
                  pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_specs=[pl.BlockSpec(blk_u, idx),
                   pl.BlockSpec((1, tile), lambda i: (0, i))],
        out_shape=[jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct((1, E), u.dtype)],
        interpret=interpret,
    )(u, volumes.reshape(1, -1))
    return D, sp.max()
