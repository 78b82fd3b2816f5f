"""Pallas TPU kernels for the hot compute paths.

`fused_flux_pallas` evaluates the WHOLE per-element surface-flux
divergence of the subgrid scheme (interior stencil + equal/coarser mesh
faces) in ONE kernel pass per element tile — the restructured kernel the
round-1 notes called for (kernels over 2-D [row, lane] tiles):

  * the state tile lives in VMEM as [C, 8(x), 8(y), 8(z), TE] blocks —
    x, y are loop dims, (z=8 sublanes, TE lanes) is exactly one float32
    tile, so every shift is either a loop reindex (x, y) or a sublane
    roll (z) and no Mosaic relayouts occur (the failure mode of the
    round-1 [5, 4, 4, 4, T] kernel);
  * per axis, ONE flux evaluation covers all 8 interfaces per cell row:
    the "next" state is the rolled tile with the LAST slot substituted by
    the (pre-resolved) neighbor layer, so interior and mesh-face fluxes
    share the same vector code; a small extra pass adds the low-side
    mesh-face interface;
  * only D (+ a per-element speed bound) is written back: none of the
    [5, 7, 8, 8, E]-sized interface intermediates that the XLA stencil
    materializes in HBM ever leave VMEM.

The reference counterpart is compute_inner_fluxes + compute_outer_fluxes
(examples/subgrid/kernels.inl:335-911, one CUDA block per element with
__shared__ staging + per-face atomicAdd); virtual-fine (hanging 2:1)
contributions and reflective walls remain XLA-side additive passes, so
AMR meshes work unchanged (ops/subgrid.flux_divergence dispatches).

`inner_divergence_pallas` (the round-1 inner-only kernel) is kept for
comparison and correctness history.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.ops.euler import AXIS_ROTATE, fields_flux, numerical_flux
from t8gpu_tpu.ops.subgrid import axis_rotate, axis_unrotate

DEFAULT_TILE = 1024


def kernel_mode() -> str:
    """How the fused kernels should run, read at trace time:
      "tpu"       — compiled Mosaic kernels (TPU backends; the default)
      "interpret" — Pallas interpreter (any backend; set T8GPU_PALLAS=
                    interpret — lets the CPU test mesh exercise the full
                    kernel dispatch glue, including inside shard_map)
      "off"       — XLA stencil paths only
    Callers using this inside jitted functions should jax.clear_caches()
    after flipping the env var (the mode is baked into cached traces)."""
    import os

    force = os.environ.get("T8GPU_PALLAS", "")
    if force in ("interpret", "off"):
        return force
    return "tpu" if jax.default_backend() == "tpu" else "off"


def _kernel_log_fn():
    """Trace-time choice of the in-kernel log.  Default: jnp.log —
    Mosaic's native f32 log lowering MEASURES FASTER than the 18-op
    exponent-split polynomial (ops/euler.fast_log) on every fused
    config (quiet-host paired A/B, v5e: 3D flagship 5.27 vs 5.47 ms,
    2D 1.85 vs 1.90, ext-4 6.94 vs 7.21 — the polynomial costs ~4%;
    BENCHMARKS.md round-3f).  T8GPU_FAST_LOG=1 opts back into the
    polynomial for re-measurement on other TPU generations."""
    import os

    from t8gpu_tpu.ops.euler import fast_log

    return fast_log if os.environ.get("T8GPU_FAST_LOG", "0") == "1" \
        else jnp.log


def _rows_rotate(rows, axis):
    """Tuple-of-rows face-frame rotation (free row reordering)."""
    if axis == 0:
        return rows
    p = AXIS_ROTATE[axis]
    return (rows[0], rows[p[1]], rows[p[2]], rows[p[3]]) + tuple(rows[4:])


def _flux_unrotate_rows(f, axis):
    """Rotate a stacked 5-row flux back from the +axis frame."""
    if axis == 0:
        return f
    inv = {0: (0, 1, 2, 3, 4), 1: (0, 2, 1, 3, 4), 2: (0, 2, 3, 1, 4)}[axis]
    return jnp.stack([f[i] for i in inv])


def _tile_flux_divergence(q, others, w_ref, dim: int, ext: int,
                          gamma: float, flux: str):
    """Shared per-tile flux-divergence body of the fused kernels.

    q: tuple of C field rows [*(ext,)*dim, TE]; others: 2*dim refs of
    pre-resolved neighbor facing layers [C, *(ext,)*(dim-1), TE];
    w_ref: [8, TE] weights (row 0 interior surface, rows 1..2*dim sides).
    ext is 8 (the fast layout: the minor block axis fills the 8 sublanes
    exactly) or 4 (the reference's literal Subgrid<4,4(,4)>,
    main_3d.cu:34 — Mosaic pads the 4-sublane minor axis to a half tile).
    Returns (D [5, *(ext,)*dim, TE], per-cell speed [*(ext,)*dim, TE])."""
    C = len(q)
    TE = q[0].shape[-1]
    blk = (ext,) * dim + (TE,)
    surface = w_ref[0]

    D = jnp.zeros((5,) + blk, q[0].dtype)
    speed = jnp.zeros(blk, q[0].dtype)
    interior_ok = (surface > 0).astype(q[0].dtype)

    for a in range(dim):
        qa = _rows_rotate(q, a)
        hi = _rows_rotate(tuple(others[2 * a][i] for i in range(C)), a)
        lo = _rows_rotate(tuple(others[2 * a + 1][i] for i in range(C)), a)
        w_hi = w_ref[1 + 2 * a]                       # [TE]
        w_lo = w_ref[2 + 2 * a]

        idx = jax.lax.broadcasted_iota(jnp.int32, blk, a)
        at_end = idx == ext - 1
        last_axis = a == dim - 1   # the sublane axis: shift via roll

        # next state: shift -1 along axis a, last slot <- hi neighbor
        # layer.  Loop axes concatenate slices (free reindexing); only the
        # sublane axis needs a roll + masked substitute.
        def shift_next(r, h):
            if last_axis:
                rolled = jnp.roll(r, -1, axis=a)
                return jnp.where(at_end, jnp.expand_dims(h, a), rolled)
            return jnp.concatenate(
                [jax.lax.slice_in_dim(r, 1, ext, axis=a),
                 jnp.expand_dims(h, a)], axis=a)

        nxt = tuple(shift_next(r, h) for r, h in zip(qa, hi))
        f, sp = fields_flux(qa, nxt, gamma=gamma, flux=flux)
        # interface weight: interior surface everywhere, side weight at end
        wgt = jnp.where(at_end, w_hi, surface)
        f = _flux_unrotate_rows(f, a) * wgt
        sp_ok = jnp.where(at_end, (w_hi > 0).astype(sp.dtype), interior_ok)
        speed = jnp.maximum(speed, sp * sp_ok)

        # low-side mesh-face interface on the first slot
        q0 = tuple(jax.lax.index_in_dim(r, 0, axis=a, keepdims=True)
                   for r in qa)
        lo_e = tuple(jnp.expand_dims(h, a) for h in lo)
        f_lo, sp_lo = fields_flux(lo_e, q0, gamma=gamma, flux=flux)
        f_lo = _flux_unrotate_rows(f_lo, a) * w_lo
        speed = jnp.maximum(
            speed,
            jnp.where(idx == 0, sp_lo * (w_lo > 0), 0.0).astype(speed.dtype))

        # divergence: D[c] += f[c-1] - f[c]; f[-1] is the low-side flux
        if last_axis:
            prev = jnp.roll(f, 1, axis=1 + a)
            prev = jnp.where(idx == 0, f_lo, prev)
        else:
            prev = jnp.concatenate(
                [f_lo, jax.lax.slice_in_dim(f, 0, ext - 1, axis=1 + a)],
                axis=1 + a)
        D = D + prev - f

    return D, speed


def _fused_kernel(q_ref, w_ref, *refs, gamma: float, flux: str, dim: int,
                  ext: int):
    """One element tile: q [C, *(ext,)*dim, TE]; w [8, TE] (row 0 =
    interior cell-face surface, rows 1..2*dim = the sides' mesh-face
    weights mask*area*(rel<=0) [+ wall area on wall sides], in side order
    k = 2*axis + (0 hi, 1 lo)); o<k> [C, *(ext,)*(dim-1), TE] = the
    pre-resolved neighbor facing layer of side k (the MIRRORED own layer
    on wall sides — walls are in-kernel, ops/subgrid.pallas_side_inputs).
    Outputs: d [5, ...] divergence, sp [8, TE] (row-replicated
    per-element max wave speed)."""
    others = refs[: 2 * dim]
    d_ref, sp_ref = refs[2 * dim:]
    C = q_ref.shape[0]
    TE = q_ref.shape[-1]
    q = tuple(q_ref[i] for i in range(C))
    D, speed = _tile_flux_divergence(q, others, w_ref, dim, ext, gamma, flux)
    d_ref[...] = D
    smax = speed.max(axis=tuple(range(dim)))          # [TE]
    sp_ref[...] = jnp.broadcast_to(smax[None, :], (8, TE))


@functools.partial(jax.jit,
                   static_argnames=("gamma", "flux", "tile", "interpret"))
def fused_flux_pallas(q: jnp.ndarray, weights: jnp.ndarray, others,
                      gamma: float, flux: str, tile: int = 128,
                      interpret: bool = False):
    """Fused interior + equal/coarse mesh-face + wall flux divergence.

    q: [C, *(ext,)*dim, E] stacked cell fields (dim 2 or 3, ext 8 or 4);
    weights: [8, E]; others: 2*dim arrays [C, *(ext,)*(dim-1), E].
    Returns (D [5, *(ext,)*dim, E], speed [E]).

    Element capacities are geometric buckets (not lane-multiples), so the
    element axis is edge-padded to the tile size (padded slots carry
    finite states and zero weights; D is sliced back)."""
    C = q.shape[0]
    dim = q.ndim - 2
    ext = q.shape[1]
    E = q.shape[-1]
    E_pad = -(-E // tile) * tile
    if E_pad != E:
        pad = [(0, 0)] * q.ndim
        pad[-1] = (0, E_pad - E)
        q = jnp.pad(q, pad, mode="edge")
        others = tuple(jnp.pad(o, pad[1:], mode="edge") for o in others)
        weights = jnp.pad(weights, [(0, 0), (0, E_pad - E)])  # zero weights
    grid = (E_pad // tile,)

    def idx_blk(i):
        return (0,) * (dim + 1) + (i,)

    def idx_lay(i):
        return (0,) * dim + (i,)

    def idx2(i):
        return (0, i)

    D, sp = pl.pallas_call(
        functools.partial(_fused_kernel, gamma=gamma, flux=flux, dim=dim,
                          ext=ext),
        grid=grid,
        in_specs=[pl.BlockSpec((C,) + (ext,) * dim + (tile,), idx_blk),
                  pl.BlockSpec((8, tile), idx2)]
                 + [pl.BlockSpec((C,) + (ext,) * (dim - 1) + (tile,),
                                 idx_lay)] * (2 * dim),
        out_specs=[pl.BlockSpec((5,) + (ext,) * dim + (tile,), idx_blk),
                   pl.BlockSpec((8, tile), idx2)],
        out_shape=[jax.ShapeDtypeStruct((5,) + (ext,) * dim + (E_pad,),
                                        q.dtype),
                   jax.ShapeDtypeStruct((8, E_pad), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, weights, *others)
    return D[..., :E], sp[0, :E]


# ---------------------------------------------------------------------------
# Fused GLM-MHD kernel: the 9-row Rusanov + exact GLM interface solve
# (models/mhd._rusanov_rows) through the same tile layout and shift
# tricks as the Euler D-kernel.  The face-frame rotation swaps BOTH
# vector triplets (momentum and B); the global cleaning speed c_h rides
# row 7 of the weights block (the kernel's only scalar channel).
# ---------------------------------------------------------------------------


_ROT9 = {
    1: (0, 2, 1, 3, 4, 6, 5, 7, 8),
    2: (0, 3, 1, 2, 4, 7, 5, 6, 8),
}
_UNROT9 = {
    1: (0, 2, 1, 3, 4, 6, 5, 7, 8),
    2: (0, 2, 3, 1, 4, 6, 7, 5, 8),
}


def _rows_rotate9(rows, axis):
    if axis == 0:
        return rows
    p = _ROT9[axis]
    return tuple(rows[i] for i in p)


def _flux_unrotate_rows9(f, axis):
    if axis == 0:
        return f
    return jnp.stack([f[i] for i in _UNROT9[axis]])


def _tile_mhd_divergence(u, others, w_ref, dim: int, ext: int,
                         gamma: float):
    """Per-tile GLM-MHD flux divergence: the _tile_flux_divergence shift
    structure on 9 STATE rows with the Rusanov/GLM interface flux.
    u: tuple of 9 state rows [*(ext,)*dim, TE]; others: 2*dim refs of
    pre-resolved neighbor facing layers [9, *t_ext, TE] (conductor ghosts
    on wall sides); w_ref: [8, TE] (row 0 interior surface, rows 1..2*dim
    side weights, row 7 = c_h).  Returns (D [9, ...], per-cell speed)."""
    from t8gpu_tpu.models.mhd import _rusanov_rows

    TE = u[0].shape[-1]
    blk = (ext,) * dim + (TE,)
    surface = w_ref[0]
    ch = w_ref[7]                                  # [TE], global scalar

    def flux(l_rows, r_rows):
        f, sp = _rusanov_rows(l_rows, r_rows, gamma, ch)
        return f, sp

    D = jnp.zeros((9,) + blk, u[0].dtype)
    speed = jnp.zeros(blk, u[0].dtype)
    interior_ok = (surface > 0).astype(u[0].dtype)

    for a in range(dim):
        qa = _rows_rotate9(u, a)
        hi = _rows_rotate9(tuple(others[2 * a][i] for i in range(9)), a)
        lo = _rows_rotate9(tuple(others[2 * a + 1][i] for i in range(9)), a)
        w_hi = w_ref[1 + 2 * a]
        w_lo = w_ref[2 + 2 * a]

        idx = jax.lax.broadcasted_iota(jnp.int32, blk, a)
        at_end = idx == ext - 1
        last_axis = a == dim - 1   # the sublane axis: shift via roll

        def shift_next(r, h):
            if last_axis:
                rolled = jnp.roll(r, -1, axis=a)
                return jnp.where(at_end, jnp.expand_dims(h, a), rolled)
            return jnp.concatenate(
                [jax.lax.slice_in_dim(r, 1, ext, axis=a),
                 jnp.expand_dims(h, a)], axis=a)

        nxt = tuple(shift_next(r, h) for r, h in zip(qa, hi))
        f, sp = flux(qa, nxt)
        f = jnp.stack(f)
        wgt = jnp.where(at_end, w_hi, surface)
        f = _flux_unrotate_rows9(f, a) * wgt
        sp_ok = jnp.where(at_end, (w_hi > 0).astype(sp.dtype), interior_ok)
        speed = jnp.maximum(speed, sp * sp_ok)

        # low-side mesh-face interface on the first slot
        q0 = tuple(jax.lax.index_in_dim(r, 0, axis=a, keepdims=True)
                   for r in qa)
        lo_e = tuple(jnp.expand_dims(h, a) for h in lo)
        f_lo, sp_lo = flux(lo_e, q0)
        f_lo = _flux_unrotate_rows9(jnp.stack(f_lo), a) * w_lo
        speed = jnp.maximum(
            speed,
            jnp.where(idx == 0, sp_lo * (w_lo > 0), 0.0).astype(speed.dtype))

        if last_axis:
            prev = jnp.roll(f, 1, axis=1 + a)
            prev = jnp.where(idx == 0, f_lo, prev)
        else:
            prev = jnp.concatenate(
                [f_lo, jax.lax.slice_in_dim(f, 0, ext - 1, axis=1 + a)],
                axis=1 + a)
        D = D + prev - f

    return D, speed


def _fused_mhd_kernel(u_ref, w_ref, *refs, gamma: float, dim: int,
                      ext: int):
    others = refs[: 2 * dim]
    d_ref, sp_ref = refs[2 * dim:]
    TE = u_ref.shape[-1]
    u = tuple(u_ref[i] for i in range(9))
    D, speed = _tile_mhd_divergence(u, others, w_ref, dim, ext, gamma)
    d_ref[...] = D
    smax = speed.max(axis=tuple(range(dim)))
    sp_ref[...] = jnp.broadcast_to(smax[None, :], (8, TE))


@functools.partial(jax.jit,
                   static_argnames=("gamma", "tile", "interpret"))
def fused_mhd_flux_pallas(u: jnp.ndarray, weights: jnp.ndarray, others,
                          gamma: float, tile: int = 128,
                          interpret: bool = False):
    """Fused GLM-MHD interior + equal/coarse mesh-face + wall flux
    divergence.  u: [9, *(ext,)*dim, E] stacked states (dim 2 or 3,
    ext 8 or 4); weights: [8, E] (row 7 = c_h); others: 2*dim arrays
    [9, *(ext,)*(dim-1), E] (ops/subgrid_mhd.mhd_side_inputs).
    Returns (D [9, *(ext,)*dim, E], speed [E])."""
    dim = u.ndim - 2
    ext = u.shape[1]
    E = u.shape[-1]
    E_pad = -(-E // tile) * tile
    if E_pad != E:
        pad = [(0, 0)] * u.ndim
        pad[-1] = (0, E_pad - E)
        u = jnp.pad(u, pad, mode="edge")
        others = tuple(jnp.pad(o, pad[1:], mode="edge") for o in others)
        # zero side weights on padded slots; c_h row must stay live
        wp = jnp.pad(weights, [(0, 0), (0, E_pad - E)])
        weights = wp.at[7, E:].set(weights[7, E - 1])
    grid = (E_pad // tile,)

    def idx_blk(i):
        return (0,) * (dim + 1) + (i,)

    def idx_lay(i):
        return (0,) * dim + (i,)

    def idx2(i):
        return (0, i)

    D, sp = pl.pallas_call(
        functools.partial(_fused_mhd_kernel, gamma=gamma, dim=dim,
                          ext=ext),
        grid=grid,
        in_specs=[pl.BlockSpec((9,) + (ext,) * dim + (tile,), idx_blk),
                  pl.BlockSpec((8, tile), idx2)]
                 + [pl.BlockSpec((9,) + (ext,) * (dim - 1) + (tile,),
                                 idx_lay)] * (2 * dim),
        out_specs=[pl.BlockSpec((9,) + (ext,) * dim + (tile,), idx_blk),
                   pl.BlockSpec((8, tile), idx2)],
        out_shape=[jax.ShapeDtypeStruct((9,) + (ext,) * dim + (E_pad,),
                                        u.dtype),
                   jax.ShapeDtypeStruct((8, E_pad), u.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u, weights, *others)
    return D[..., :E], sp[0, :E]


# ---------------------------------------------------------------------------
# Fused second-order MUSCL kernel: limited linear reconstruction + full
# interior/equal-face flux divergence in one VMEM pass per element tile.
# The XLA counterpart is ops/subgrid.muscl_core; hanging (2:1) faces and
# walls stay XLA-side first-order closures exactly as in
# flux_divergence_muscl, so the kernel only ever needs the EQUAL-LEVEL
# neighbor's edge + second facing layers per side (one stacked
# [10, *t_ext, E] operand built by ops/subgrid.muscl_side_inputs).
# ---------------------------------------------------------------------------


def _tile_muscl_divergence(u, others, w_ref, dim: int, ext: int,
                           gamma: float, flux: str, limiter: str,
                           positivity: bool, space: str = "cons"):
    """Second-order per-tile flux divergence (states in, like the RK-fused
    kernel: interface fields are derived IN VMEM from the reconstructed
    states, cell_fields_tuple + fields_flux).

    u: tuple of 5 state rows [*(ext,)*dim, TE]; others: 2*dim refs
    [10, *(ext,)*(dim-1), TE] — rows 0-4 the equal-level neighbor's edge
    facing layer, rows 5-9 its second layer (garbage where the side is
    not equal-level: the eq mask below zeroes its influence); w_ref:
    [8, TE] with row 0 the interior cell-face surface and rows 1..2*dim
    the sides' equal-face weights mask*area*(rel==0) — (w > 0) doubles as
    the eq mask for the slope outward differences, so hanging faces and
    walls fall back to the one-sided (minmod: zero) edge slope exactly
    like the XLA path.  Returns (D [5, ...], per-cell speed).

    KEPES interfaces go through `kepes_pair_flux`: a MUSCL-reconstructed
    state feeds exactly ONE interface, so the per-cell log amortization
    of the fields formulation is void here — the pair flux's 2 ratio
    logs per interface halve the kernel's transcendental count (the
    round-3 finding that the fused kernels are VPU-issue-bound makes
    this the order-2 lever; measured in BENCHMARKS.md round 4)."""
    from t8gpu_tpu.ops.euler import (cell_fields_tuple, kepes_pair_fields,
                                     kepes_pair_flux, prim_pair_fields,
                                     prim_rows)

    log_fn = _kernel_log_fn()
    prim = space == "prim"

    if prim:
        # primitive-space reconstruction (euler.prim_rows rationale):
        # the state rows become (rho, v1, v2, v3, p) ONCE per cell; the
        # per-side positivity guard is two compares and the interface
        # tuples need only the reciprocals/products
        if flux != "kepes":
            raise ValueError("primitive-space MUSCL ('<lim>-prim') "
                             "supports the kepes flux")
        u = prim_rows(u, gamma)

        def iface_flux(l_states, r_states):
            return kepes_pair_flux(prim_pair_fields(l_states),
                                   prim_pair_fields(r_states),
                                   gamma, log_fn=log_fn)
    elif flux == "kepes":
        def iface_flux(l_states, r_states):
            return kepes_pair_flux(kepes_pair_fields(l_states, gamma),
                                   kepes_pair_fields(r_states, gamma),
                                   gamma, log_fn=log_fn)
    else:
        def iface_flux(l_states, r_states):
            return fields_flux(
                cell_fields_tuple(l_states, gamma, flux, log_fn=log_fn),
                cell_fields_tuple(r_states, gamma, flux, log_fn=log_fn),
                gamma=gamma, flux=flux)
    TE = u[0].shape[-1]
    blk = (ext,) * dim + (TE,)
    surface = w_ref[0]
    interior_ok = (surface > 0).astype(u[0].dtype)
    kappa_m1 = gamma - 1.0

    if limiter == "minmod":
        def lim(a, b):
            return jnp.where(a * b > 0.0,
                             jnp.sign(a) * jnp.minimum(jnp.abs(a),
                                                       jnp.abs(b)),
                             jnp.zeros_like(a))
    elif limiter == "none":
        def lim(a, b):
            return 0.5 * (a + b)
    else:
        raise ValueError(f"unknown fused-MUSCL limiter: {limiter!r}")

    def guard(rec, base):
        # same positivity fallback as muscl_core's guard (primitives-based)
        if not positivity:
            return rec
        if prim:
            ok = (rec[0] > 0.0) & (rec[4] > 0.0)
            return tuple(jnp.where(ok, r, b) for r, b in zip(rec, base))
        rho, m1, m2, m3, e = rec
        s_rho = 1.0 / rho
        kinetic = 0.5 * (m1 * m1 + m2 * m2 + m3 * m3) * s_rho
        p = kappa_m1 * (e - kinetic)
        ok = (rho > 0.0) & (p > 0.0)
        return tuple(jnp.where(ok, r, b) for r, b in zip(rec, base))

    D = jnp.zeros((5,) + blk, u[0].dtype)
    speed = jnp.zeros(blk, u[0].dtype)

    for a in range(dim):
        va = _rows_rotate(u, a)
        o_hi, o_lo = others[2 * a], others[2 * a + 1]
        cvt = (lambda t: prim_rows(t, gamma)) if prim else (lambda t: t)
        nb0_hi = _rows_rotate(cvt(tuple(o_hi[i] for i in range(5))), a)
        nb1_hi = _rows_rotate(cvt(tuple(o_hi[5 + i] for i in range(5))), a)
        nb0_lo = _rows_rotate(cvt(tuple(o_lo[i] for i in range(5))), a)
        nb1_lo = _rows_rotate(cvt(tuple(o_lo[5 + i] for i in range(5))), a)
        w_hi = w_ref[1 + 2 * a]                            # [TE]
        w_lo = w_ref[2 + 2 * a]
        eq_hi = (w_hi > 0).astype(u[0].dtype)
        eq_lo = (w_lo > 0).astype(u[0].dtype)

        idx = jax.lax.broadcasted_iota(jnp.int32, blk, a)
        at_end = idx == ext - 1
        at_lo = idx == 0
        last_axis = a == dim - 1

        def shift_next(r, h):
            if last_axis:
                rolled = jnp.roll(r, -1, axis=a)
                return jnp.where(at_end, jnp.expand_dims(h, a), rolled)
            return jnp.concatenate(
                [jax.lax.slice_in_dim(r, 1, ext, axis=a),
                 jnp.expand_dims(h, a)], axis=a)

        def shift_prev(r, h):
            if last_axis:
                rolled = jnp.roll(r, 1, axis=a)
                return jnp.where(at_lo, jnp.expand_dims(h, a), rolled)
            return jnp.concatenate(
                [jnp.expand_dims(h, a),
                 jax.lax.slice_in_dim(r, 0, ext - 1, axis=a)], axis=a)

        # one-sided differences per cell: d_hi[i] = u[i+1] - u[i],
        # d_lo[i] = u[i] - u[i-1]; the outward entries (block edges) come
        # from the equal-level neighbor layer and are eq-masked — minmod
        # then kills the edge slope at hanging faces and walls
        d_hi_rows, d_lo_rows = [], []
        for r, h0, l0 in zip(va, nb0_hi, nb0_lo):
            dh = shift_next(r, h0) - r
            dh = jnp.where(at_end, dh * eq_hi, dh)
            dl = r - shift_prev(r, l0)
            dl = jnp.where(at_lo, dl * eq_lo, dl)
            d_hi_rows.append(dh)
            d_lo_rows.append(dl)
        slope = tuple(lim(dl, dh)
                      for dl, dh in zip(d_lo_rows, d_hi_rows))

        u_l_t = guard(tuple(r + 0.5 * s for r, s in zip(va, slope)), va)
        u_r_t = guard(tuple(r - 0.5 * s for r, s in zip(va, slope)), va)

        # the neighbors' edge-cell reconstructions toward us, from the
        # same four layers both sides see (conservation is exact)
        my_hi = tuple(jax.lax.index_in_dim(r, ext - 1, axis=a,
                                           keepdims=False) for r in va)
        my_lo = tuple(jax.lax.index_in_dim(r, 0, axis=a,
                                           keepdims=False) for r in va)
        s_nbr_hi = tuple(lim(h0 - m, h1 - h0)
                         for m, h0, h1 in zip(my_hi, nb0_hi, nb1_hi))
        s_nbr_lo = tuple(lim(l0 - l1, m - l0)
                         for m, l0, l1 in zip(my_lo, nb0_lo, nb1_lo))
        hi_sub = guard(tuple(h0 - 0.5 * s
                             for h0, s in zip(nb0_hi, s_nbr_hi)), nb0_hi)
        lo_sub = guard(tuple(l0 + 0.5 * s
                             for l0, s in zip(nb0_lo, s_nbr_lo)), nb0_lo)

        # interior + hi mesh-face interfaces in one evaluation (the
        # shift trick of _tile_flux_divergence, on reconstructed states)
        nxt = tuple(shift_next(r, h) for r, h in zip(u_r_t, hi_sub))
        f, sp = iface_flux(u_l_t, nxt)
        wgt = jnp.where(at_end, w_hi, surface)
        f = _flux_unrotate_rows(f, a) * wgt
        sp_ok = jnp.where(at_end, (w_hi > 0).astype(sp.dtype), interior_ok)
        speed = jnp.maximum(speed, sp * sp_ok)

        # low-side mesh-face interface on the first slot
        u_rf0 = tuple(jnp.expand_dims(
            jax.lax.index_in_dim(r, 0, axis=a, keepdims=False), a)
            for r in u_r_t)
        lo_e = tuple(jnp.expand_dims(h, a) for h in lo_sub)
        f_lo, sp_lo = iface_flux(lo_e, u_rf0)
        f_lo = _flux_unrotate_rows(f_lo, a) * w_lo
        speed = jnp.maximum(
            speed,
            jnp.where(idx == 0, sp_lo * (w_lo > 0), 0.0).astype(speed.dtype))

        # divergence: D[c] += f[c-1] - f[c]; f[-1] is the low-side flux
        if last_axis:
            prev = jnp.roll(f, 1, axis=1 + a)
            prev = jnp.where(idx == 0, f_lo, prev)
        else:
            prev = jnp.concatenate(
                [f_lo, jax.lax.slice_in_dim(f, 0, ext - 1, axis=1 + a)],
                axis=1 + a)
        D = D + prev - f

    return D, speed


def _tile_mhd_muscl_divergence(u, others, w_ref, dim: int, ext: int,
                               gamma: float, limiter: str,
                               positivity: bool):
    """Second-order per-tile GLM-MHD flux divergence: the
    _tile_muscl_divergence reconstruction structure on 9 STATE rows with
    the Rusanov + exact-GLM interface flux (models/mhd._rusanov_rows)
    and the MHD admissibility guard (THERMAL-pressure positivity).

    u: tuple of 9 rows [*(ext,)*dim, TE]; others: 2*dim refs
    [18, *t_ext, TE] (equal-level neighbor edge + second layers);
    w_ref: [8, TE] — row 0 interior surface, rows 1..2*dim eq-face
    weights, row 7 the global cleaning speed c_h.  Hanging faces and
    walls are the caller's XLA first-order closure, exactly like the
    Euler MUSCL kernel."""
    from t8gpu_tpu.models.mhd import _rusanov_rows

    TE = u[0].shape[-1]
    blk = (ext,) * dim + (TE,)
    surface = w_ref[0]
    ch = w_ref[7]
    interior_ok = (surface > 0).astype(u[0].dtype)
    kappa_m1 = gamma - 1.0

    if limiter == "minmod":
        def lim(a, b):
            return jnp.where(a * b > 0.0,
                             jnp.sign(a) * jnp.minimum(jnp.abs(a),
                                                       jnp.abs(b)),
                             jnp.zeros_like(a))
    elif limiter == "none":
        def lim(a, b):
            return 0.5 * (a + b)
    else:
        raise ValueError(f"unknown fused-MUSCL limiter: {limiter!r}")

    def guard(rec, base):
        # thermal-pressure positivity (models/mhd._mhd_guard: the
        # magnetic pressure is >= 0 and must be excluded)
        if not positivity:
            return rec
        rho, m1, m2, m3, e, b1, b2, b3, psi = rec
        s_rho = 1.0 / rho
        ke = 0.5 * (m1 * m1 + m2 * m2 + m3 * m3) * s_rho
        b2s = b1 * b1 + b2 * b2 + b3 * b3
        p = kappa_m1 * (e - ke - 0.5 * b2s)
        ok = (rho > 0.0) & (p > 0.0)
        return tuple(jnp.where(ok, r, b) for r, b in zip(rec, base))

    def iface(l_rows, r_rows):
        f, sp = _rusanov_rows(l_rows, r_rows, gamma, ch)
        return jnp.stack(f), sp

    D = jnp.zeros((9,) + blk, u[0].dtype)
    speed = jnp.zeros(blk, u[0].dtype)

    for a in range(dim):
        va = _rows_rotate9(u, a)
        o_hi, o_lo = others[2 * a], others[2 * a + 1]
        nb0_hi = _rows_rotate9(tuple(o_hi[i] for i in range(9)), a)
        nb1_hi = _rows_rotate9(tuple(o_hi[9 + i] for i in range(9)), a)
        nb0_lo = _rows_rotate9(tuple(o_lo[i] for i in range(9)), a)
        nb1_lo = _rows_rotate9(tuple(o_lo[9 + i] for i in range(9)), a)
        w_hi = w_ref[1 + 2 * a]
        w_lo = w_ref[2 + 2 * a]
        eq_hi = (w_hi > 0).astype(u[0].dtype)
        eq_lo = (w_lo > 0).astype(u[0].dtype)

        idx = jax.lax.broadcasted_iota(jnp.int32, blk, a)
        at_end = idx == ext - 1
        at_lo = idx == 0
        last_axis = a == dim - 1

        def shift_next(r, h):
            if last_axis:
                rolled = jnp.roll(r, -1, axis=a)
                return jnp.where(at_end, jnp.expand_dims(h, a), rolled)
            return jnp.concatenate(
                [jax.lax.slice_in_dim(r, 1, ext, axis=a),
                 jnp.expand_dims(h, a)], axis=a)

        def shift_prev(r, h):
            if last_axis:
                rolled = jnp.roll(r, 1, axis=a)
                return jnp.where(at_lo, jnp.expand_dims(h, a), rolled)
            return jnp.concatenate(
                [jnp.expand_dims(h, a),
                 jax.lax.slice_in_dim(r, 0, ext - 1, axis=a)], axis=a)

        d_hi_rows, d_lo_rows = [], []
        for r, h0, l0 in zip(va, nb0_hi, nb0_lo):
            dh = shift_next(r, h0) - r
            dh = jnp.where(at_end, dh * eq_hi, dh)
            dl = r - shift_prev(r, l0)
            dl = jnp.where(at_lo, dl * eq_lo, dl)
            d_hi_rows.append(dh)
            d_lo_rows.append(dl)
        slope = tuple(lim(dl, dh)
                      for dl, dh in zip(d_lo_rows, d_hi_rows))

        u_l_t = guard(tuple(r + 0.5 * s for r, s in zip(va, slope)), va)
        u_r_t = guard(tuple(r - 0.5 * s for r, s in zip(va, slope)), va)

        my_hi = tuple(jax.lax.index_in_dim(r, ext - 1, axis=a,
                                           keepdims=False) for r in va)
        my_lo = tuple(jax.lax.index_in_dim(r, 0, axis=a,
                                           keepdims=False) for r in va)
        s_nbr_hi = tuple(lim(h0 - m, h1 - h0)
                         for m, h0, h1 in zip(my_hi, nb0_hi, nb1_hi))
        s_nbr_lo = tuple(lim(l0 - l1, m - l0)
                         for m, l0, l1 in zip(my_lo, nb0_lo, nb1_lo))
        hi_sub = guard(tuple(h0 - 0.5 * s
                             for h0, s in zip(nb0_hi, s_nbr_hi)), nb0_hi)
        lo_sub = guard(tuple(l0 + 0.5 * s
                             for l0, s in zip(nb0_lo, s_nbr_lo)), nb0_lo)

        nxt = tuple(shift_next(r, h) for r, h in zip(u_r_t, hi_sub))
        f, sp = iface(u_l_t, nxt)
        wgt = jnp.where(at_end, w_hi, surface)
        f = _flux_unrotate_rows9(f, a) * wgt
        sp_ok = jnp.where(at_end, (w_hi > 0).astype(sp.dtype), interior_ok)
        speed = jnp.maximum(speed, sp * sp_ok)

        u_rf0 = tuple(jnp.expand_dims(
            jax.lax.index_in_dim(r, 0, axis=a, keepdims=False), a)
            for r in u_r_t)
        lo_e = tuple(jnp.expand_dims(h, a) for h in lo_sub)
        f_lo, sp_lo = iface(lo_e, u_rf0)
        f_lo = _flux_unrotate_rows9(f_lo, a) * w_lo
        speed = jnp.maximum(
            speed,
            jnp.where(idx == 0, sp_lo * (w_lo > 0), 0.0).astype(speed.dtype))

        if last_axis:
            prev = jnp.roll(f, 1, axis=1 + a)
            prev = jnp.where(idx == 0, f_lo, prev)
        else:
            prev = jnp.concatenate(
                [f_lo, jax.lax.slice_in_dim(f, 0, ext - 1, axis=1 + a)],
                axis=1 + a)
        D = D + prev - f

    return D, speed


def _fused_mhd_muscl_kernel(u_ref, w_ref, *refs, gamma: float, dim: int,
                            ext: int, limiter: str, positivity: bool):
    others = refs[: 2 * dim]
    d_ref, sp_ref = refs[2 * dim:]
    TE = u_ref.shape[-1]
    u = tuple(u_ref[i] for i in range(9))
    D, speed = _tile_mhd_muscl_divergence(u, others, w_ref, dim, ext,
                                          gamma, limiter, positivity)
    d_ref[...] = D
    smax = speed.max(axis=tuple(range(dim)))
    sp_ref[...] = jnp.broadcast_to(smax[None, :], (8, TE))


@functools.partial(jax.jit,
                   static_argnames=("gamma", "limiter", "positivity",
                                    "tile", "interpret"))
def fused_mhd_muscl_pallas(u: jnp.ndarray, weights: jnp.ndarray, others,
                           gamma: float, limiter: str = "minmod",
                           positivity: bool = True, tile: int = 128,
                           interpret: bool = False):
    """Fused second-order GLM-MHD interior + equal-face divergence
    (see _tile_mhd_muscl_divergence).  u: [9, *(ext,)*dim, E]; weights:
    [8, E] (row 7 = c_h); others: 2*dim arrays [18, *(ext,)*(dim-1), E].
    Returns (D [9, ...], speed [E])."""
    dim = u.ndim - 2
    ext = u.shape[1]
    E = u.shape[-1]
    E_pad = -(-E // tile) * tile
    if E_pad != E:
        pad = [(0, 0)] * u.ndim
        pad[-1] = (0, E_pad - E)
        u = jnp.pad(u, pad, mode="edge")
        others = tuple(jnp.pad(o, pad[1:], mode="edge") for o in others)
        wp = jnp.pad(weights, [(0, 0), (0, E_pad - E)])
        weights = wp.at[7, E:].set(weights[7, E - 1])
    grid = (E_pad // tile,)

    def idx_blk(i):
        return (0,) * (dim + 1) + (i,)

    def idx_lay(i):
        return (0,) * dim + (i,)

    def idx2(i):
        return (0, i)

    D, sp = pl.pallas_call(
        functools.partial(_fused_mhd_muscl_kernel, gamma=gamma, dim=dim,
                          ext=ext, limiter=limiter, positivity=positivity),
        grid=grid,
        in_specs=[pl.BlockSpec((9,) + (ext,) * dim + (tile,), idx_blk),
                  pl.BlockSpec((8, tile), idx2)]
                 + [pl.BlockSpec((18,) + (ext,) * (dim - 1) + (tile,),
                                 idx_lay)] * (2 * dim),
        out_specs=[pl.BlockSpec((9,) + (ext,) * dim + (tile,), idx_blk),
                   pl.BlockSpec((8, tile), idx2)],
        out_shape=[jax.ShapeDtypeStruct((9,) + (ext,) * dim + (E_pad,),
                                        u.dtype),
                   jax.ShapeDtypeStruct((8, E_pad), u.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(u, weights, *others)
    return D[..., :E], sp[0, :E]


def _fused_muscl_kernel(u_ref, w_ref, *refs, gamma: float, flux: str,
                        dim: int, ext: int, limiter: str, positivity: bool,
                        space: str = "cons"):
    """One element tile of the fused MUSCL divergence: u [5, *(ext,)*dim,
    TE] states; w [8, TE]; o<k> [10, *(ext,)*(dim-1), TE] equal-level
    neighbor edge+second state layers of side k.  Outputs d [5, ...],
    sp [8, TE] (row-replicated per-element max wave speed)."""
    others = refs[: 2 * dim]
    d_ref, sp_ref = refs[2 * dim:]
    TE = u_ref.shape[-1]
    u = tuple(u_ref[i] for i in range(5))
    D, speed = _tile_muscl_divergence(u, others, w_ref, dim, ext, gamma,
                                      flux, limiter, positivity, space)
    d_ref[...] = D
    smax = speed.max(axis=tuple(range(dim)))
    sp_ref[...] = jnp.broadcast_to(smax[None, :], (8, TE))


@functools.partial(jax.jit,
                   static_argnames=("gamma", "flux", "limiter", "positivity",
                                    "tile", "interpret", "space"))
def fused_muscl_pallas(u: jnp.ndarray, weights: jnp.ndarray, others,
                       gamma: float, flux: str, limiter: str = "minmod",
                       positivity: bool = True, tile: int = 128,
                       interpret: bool = False, space: str = "cons"):
    """Fused second-order MUSCL interior + equal-level mesh-face flux
    divergence (see _tile_muscl_divergence; beyond-reference — the
    reference's subgrid kernels are first-order, kernels.inl:335-911).

    u: [5, *(ext,)*dim, E] states (dim 2 or 3, ext 8 or 4); weights:
    [8, E]; others: 2*dim arrays [10, *(ext,)*(dim-1), E] from
    ops/subgrid.muscl_side_inputs.  Returns (D [5, *(ext,)*dim, E],
    speed [E]).  Hanging-fine faces and walls are the caller's XLA-side
    first-order closure (flux_divergence_muscl)."""
    dim = u.ndim - 2
    ext = u.shape[1]
    E = u.shape[-1]
    E_pad = -(-E // tile) * tile
    if E_pad != E:
        pad = [(0, 0)] * u.ndim
        pad[-1] = (0, E_pad - E)
        u = jnp.pad(u, pad, mode="edge")
        others = tuple(jnp.pad(o, pad[1:], mode="edge") for o in others)
        weights = jnp.pad(weights, [(0, 0), (0, E_pad - E)])  # zero weights
    grid = (E_pad // tile,)

    def idx_blk(i):
        return (0,) * (dim + 1) + (i,)

    def idx_lay(i):
        return (0,) * dim + (i,)

    def idx2(i):
        return (0, i)

    D, sp = pl.pallas_call(
        functools.partial(_fused_muscl_kernel, gamma=gamma, flux=flux,
                          dim=dim, ext=ext, limiter=limiter,
                          positivity=positivity, space=space),
        grid=grid,
        in_specs=[pl.BlockSpec((5,) + (ext,) * dim + (tile,), idx_blk),
                  pl.BlockSpec((8, tile), idx2)]
                 + [pl.BlockSpec((10,) + (ext,) * (dim - 1) + (tile,),
                                 idx_lay)] * (2 * dim),
        out_specs=[pl.BlockSpec((5,) + (ext,) * dim + (tile,), idx_blk),
                   pl.BlockSpec((8, tile), idx2)],
        out_shape=[jax.ShapeDtypeStruct((5,) + (ext,) * dim + (E_pad,),
                                        u.dtype),
                   jax.ShapeDtypeStruct((8, E_pad), u.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(u, weights, *others)
    return D[..., :E], sp[0, :E]


# ---------------------------------------------------------------------------
# Fused viscous (Navier-Stokes) divergence: the in-VMEM evaluation of
# ops/subgrid_viscous.viscous_divergence, added to the RK-fused stage
# kernel when mu > 0 so viscous runs never fall back to the XLA stencil
# (measured: the XLA viscous pass put the 3D flagship at 22.6 ms/step vs
# 5.2-5.4 inviscid).  Same scope as the XLA pass: equal-level meshes
# (the solver rejects mu > 0 with AMR); walls contribute zero viscous
# flux (free-slip adiabatic) through the eq weights.
# ---------------------------------------------------------------------------


def _tile_viscous_divergence(q, others_q, wv_ref, surface, dim: int,
                             ext: int, gamma: float, flux: str,
                             mu: float, prandtl: float):
    """Viscous flux-divergence rows for one element tile — the VMEM
    transcription of ops/subgrid_viscous.viscous_divergence (see there
    for the scheme: compact two-point normal derivatives; tangential
    velocity derivatives from mask-aware centrals at interior interfaces
    and from the symmetric within-layer differences of the two facing
    layers at mesh faces, so both sides of every mesh face assemble the
    IDENTICAL flux).

    q: cell-fields tuple [*(ext,)*dim, TE] rows (kepes or hll/hllc
    layout — velocities are rows 1..3 and T = p/rho derives from rows
    4/5); others_q: per side k the neighbor facing layer's field rows
    [*(ext,)*(dim-1), TE]; wv_ref: [8, TE] with row 0 the guarded cell
    size h and rows 1..2*dim the per-side equal-level weights
    mask*(rel==0) (0 at walls: zero viscous wall flux); surface: [TE]
    interior face area (vol>0-masked).  Returns a list of 5 rows to ADD
    to the inviscid divergence."""
    dtype = q[0].dtype
    TE = q[0].shape[-1]
    blk = (ext,) * dim + (TE,)
    kappa = mu * gamma / ((gamma - 1.0) * prandtl)
    h = wv_ref[0]                                   # [TE], >0 everywhere
    inv_h = 1.0 / h
    eq = [wv_ref[1 + k] for k in range(2 * dim)]

    def phi_rows(f):
        # primitive (v1, v2, v3, T) rows from a cell-fields tuple;
        # T = p/rho = 1/(rho/p) (kepes row 5) or p/rho directly (hll)
        T = 1.0 / f[5] if flux == "kepes" else f[4] / f[0]
        return (f[1], f[2], f[3], T)

    phi = phi_rows(q)
    lay = [phi_rows(o) for o in others_q]

    def iota(a):
        return jax.lax.broadcasted_iota(jnp.int32, blk, a)

    def shift_next(r, hrow, a):
        if a == dim - 1:                     # sublane axis: roll trick
            rolled = jnp.roll(r, -1, axis=a)
            return jnp.where(iota(a) == ext - 1,
                             jnp.expand_dims(hrow, a), rolled)
        return jnp.concatenate(
            [jax.lax.slice_in_dim(r, 1, ext, axis=a),
             jnp.expand_dims(hrow, a)], axis=a)

    def shift_prev(r, lrow, a):
        if a == dim - 1:
            rolled = jnp.roll(r, 1, axis=a)
            return jnp.where(iota(a) == 0, jnp.expand_dims(lrow, a), rolled)
        return jnp.concatenate(
            [jnp.expand_dims(lrow, a),
             jax.lax.slice_in_dim(r, 0, ext - 1, axis=a)], axis=a)

    def lay_dt(row, d):
        # within-layer tangential derivative of a facing layer
        # [*(ext,)*(dim-1), TE] along layer dim d: central inside,
        # one-sided at the layer borders (ops/subgrid_viscous._layer_dt)
        n = row.shape[d]
        li = jax.lax.broadcasted_iota(jnp.int32, row.shape, d)
        if d == row.ndim - 2:                # the layer's sublane axis
            d_hi = jnp.roll(row, -1, axis=d) - row
            d_lo = row - jnp.roll(row, 1, axis=d)
        else:
            dif = (jax.lax.slice_in_dim(row, 1, n, axis=d)
                   - jax.lax.slice_in_dim(row, 0, n - 1, axis=d))
            zpad = jnp.zeros_like(jax.lax.slice_in_dim(row, 0, 1, axis=d))
            d_hi = jnp.concatenate([dif, zpad], axis=d)
            d_lo = jnp.concatenate([zpad, dif], axis=d)
        w_hi = (li < n - 1).astype(dtype)
        w_lo = (li > 0).astype(dtype)
        return (d_hi * w_hi + d_lo * w_lo) / (w_hi + w_lo) * inv_h

    def cell_dt(r, hi_row, lo_row, w_hi, w_lo, t):
        # mask-aware central derivative along block axis t: outward edge
        # differences use the equal-level facing layers, eq-masked
        # (one-sided at walls/non-equal sides) — subgrid_viscous._cell_dt
        d_hi = shift_next(r, hi_row, t) - r
        d_lo = r - shift_prev(r, lo_row, t)
        it = iota(t)
        one = jnp.ones((), dtype)
        m_hi = jnp.where(it == ext - 1, w_hi, one)
        m_lo = jnp.where(it == 0, w_lo, one)
        return (d_hi * m_hi + d_lo * m_lo) / (m_hi + m_lo) * inv_h

    # per-cell tangential derivatives of the velocity rows, per axis
    cell_d = [[cell_dt(phi[j], lay[2 * t][j], lay[2 * t + 1][j],
                       eq[2 * t], eq[2 * t + 1], t)
               for j in range(dim)] for t in range(dim)]

    zero_lay = jnp.zeros((ext,) * (dim - 1) + (TE,), dtype)
    D = [jnp.zeros(blk, dtype) for _ in range(5)]
    for a in range(dim):
        t_axes = [t for t in range(dim) if t != a]
        hi_lay, lo_lay = lay[2 * a], lay[2 * a + 1]
        w_hi_f = eq[2 * a] * surface                 # [TE] face weights
        w_lo_f = eq[2 * a + 1] * surface
        at_end = iota(a) == ext - 1

        my_hi = [jax.lax.index_in_dim(phi[j], ext - 1, axis=a,
                                      keepdims=False) for j in range(4)]
        my_lo = [jax.lax.index_in_dim(phi[j], 0, axis=a,
                                      keepdims=False) for j in range(4)]

        # ---- interfaces i+1/2 (i = ext-1 is the hi mesh face) --------
        nxt = [shift_next(phi[j], hi_lay[j], a) for j in range(4)]
        dn = [(nxt[j] - phi[j]) * inv_h for j in range(4)]
        v_f = [0.5 * (phi[j] + nxt[j]) for j in range(dim)]

        # face tangential velocity derivatives: only rows {t, a} enter
        # (t for the divergence, a for the shear)
        face_dt = {}
        for t in t_axes:
            d_lay = t_axes.index(t)          # layer dim of tangent axis t
            rows = {}
            for j in {t, a}:
                interior = 0.5 * (cell_d[t][j]
                                  + shift_next(cell_d[t][j], zero_lay, a))
                mesh = 0.5 * (jnp.expand_dims(lay_dt(my_hi[j], d_lay), a)
                              + jnp.expand_dims(lay_dt(hi_lay[j], d_lay),
                                                a))
                rows[j] = jnp.where(at_end, mesh, interior)
            face_dt[t] = rows

        div_f = dn[a] + sum(face_dt[t][t] for t in t_axes)
        tau = {a: mu * (2.0 * dn[a] - (2.0 / 3.0) * div_f)}
        for t in t_axes:
            tau[t] = mu * (dn[t] + face_dt[t][a])
        work = sum(v_f[j] * tau[j] for j in range(dim))
        heat = kappa * dn[3]
        wgt = jnp.where(at_end, w_hi_f, surface)
        f = [jnp.zeros(blk, dtype)]
        for j in range(3):
            f.append(tau[j] * wgt if j < dim else jnp.zeros(blk, dtype))
        f.append((work + heat) * wgt)

        # ---- lo mesh face (layer-shaped) -----------------------------
        dn_lo = [(my_lo[j] - lo_lay[j]) * inv_h for j in range(4)]
        v_lo = [0.5 * (lo_lay[j] + my_lo[j]) for j in range(dim)]
        fdt_lo = {}
        for t in t_axes:
            d_lay = t_axes.index(t)
            fdt_lo[t] = {j: 0.5 * (lay_dt(my_lo[j], d_lay)
                                   + lay_dt(lo_lay[j], d_lay))
                         for j in {t, a}}
        div_lo = dn_lo[a] + sum(fdt_lo[t][t] for t in t_axes)
        tau_lo = {a: mu * (2.0 * dn_lo[a] - (2.0 / 3.0) * div_lo)}
        for t in t_axes:
            tau_lo[t] = mu * (dn_lo[t] + fdt_lo[t][a])
        work_lo = sum(v_lo[j] * tau_lo[j] for j in range(dim))
        heat_lo = kappa * dn_lo[3]
        f_lo = [jnp.zeros_like(div_lo)]
        for j in range(3):
            f_lo.append(tau_lo[j] * w_lo_f if j < dim
                        else jnp.zeros_like(div_lo))
        f_lo.append((work_lo + heat_lo) * w_lo_f)

        # D_visc[i] += f[i] - f[i-1]; f[-1] is the lo mesh-face flux
        # (opposite sign pattern of the advective stencil — callers ADD)
        for i in range(5):
            if a == dim - 1:
                prev = jnp.roll(f[i], 1, axis=a)
                prev = jnp.where(iota(a) == 0,
                                 jnp.expand_dims(f_lo[i], a), prev)
            else:
                prev = jnp.concatenate(
                    [jnp.expand_dims(f_lo[i], a),
                     jax.lax.slice_in_dim(f[i], 0, ext - 1, axis=a)],
                    axis=a)
            D[i] = D[i] + f[i] - prev
    return D


# ---------------------------------------------------------------------------
# RK-fused variant: one kernel per RK stage computes the per-cell fields
# IN VMEM from the 5-row state, evaluates the full flux divergence, and
# applies the SSP-RK stage update — u_next is the only tensor written.
# Usable when the mesh needs no XLA-side D additions (no hanging-fine
# sides, no walls): the uniform periodic flagship.  Neighbor layer slabs
# are 5-row STATES (their fields are derived in-kernel too), regathered
# between stages by XLA (cheap [5, 64, E] gathers).
# ---------------------------------------------------------------------------


def _fused_rk_kernel(u_ref, *refs,
                     gamma: float, flux: str, coeffs, dim: int, ext: int,
                     extra_sides=(), share_prev: bool = False,
                     mu: float = 0.0, prandtl: float = 0.72,
                     gravity=(0.0, 0.0, 0.0)):
    """u_next = a*u_prev + b*u_stage + c*(dt/V_cell)*(D(u_stage) + extras).
    u/up [5, *(ext,)*dim, TE] states — or [7, ...] with rows 5-6 carrying
    XLA-precomputed [log rho, log p] (RK_STAGE_INPUTS="logs": the kernel
    then derives every field log-free, removing the ~1.75x duplicated
    in-VMEM transcendentals at +40% state-read traffic — the step sits
    6.9x above the HBM roofline, so reads are cheap); w [8, TE] rows
    0..2*dim as in _fused_kernel, row 7 = dt * inv_cell_volume; o<k>
    [5, *(ext,)*(dim-1), TE] neighbor state layers whose fields are
    derived IN VMEM (cell_fields_tuple); x<j> [5, *(ext,)*(dim-1), TE]
    XLA-computed additive side-layer divergences for the hanging-fine
    (2:1) subfaces of side extra_sides[j] (ops/subgrid.fine_side_extras)
    — un-fencing the RK-fused path from uniform-only meshes (the
    reference handles hanging faces in-kernel too, kernels.inl:664-911)."""
    from t8gpu_tpu.ops.euler import cell_fields_tuple

    # stage 1 has u_prev == u_stage: the operand is dropped statically
    # (share_prev) so the tile reads one state from HBM, not two
    if share_prev:
        up_ref = None
    else:
        up_ref, refs = refs[0], refs[1:]
    w_ref, refs = refs[0], refs[1:]
    if mu > 0.0:
        wv_ref, refs = refs[0], refs[1:]
    others = refs[: 2 * dim]
    extras = refs[2 * dim: 2 * dim + len(extra_sides)]
    out_ref, sp_ref = refs[2 * dim + len(extra_sides):]
    a_c, b_c, c_c = coeffs
    TE = u_ref.shape[-1]
    C_in = u_ref.shape[0]                    # 5 state rows, or 7 with logs
    u_rows = tuple(u_ref[i] for i in range(5))
    logs = (u_ref[5], u_ref[6]) if C_in == 7 else None
    log_fn = _kernel_log_fn()
    q = cell_fields_tuple(u_rows, gamma, flux, logs=logs, log_fn=log_fn)
    dt_inv = w_ref[7]

    # tuple-of-row-tuples: no stacked materialization in VMEM
    others_q = tuple(
        cell_fields_tuple(tuple(o[i] for i in range(5)), gamma, flux,
                          logs=(o[5], o[6]) if C_in == 7 else None,
                          log_fn=log_fn)
        for o in others)
    D, speed = _tile_flux_divergence(q, others_q, w_ref, dim, ext,
                                     gamma, flux)
    if mu > 0.0:
        Dv = _tile_viscous_divergence(q, others_q, wv_ref, w_ref[0],
                                      dim, ext, gamma, flux, mu, prandtl)
        D = D + jnp.stack(Dv)

    for k, x_ref in zip(extra_sides, extras):
        a = k // 2
        at = ext - 1 if k % 2 == 0 else 0          # hi side / lo side layer
        idx = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1 + a)
        D = D + jnp.where(idx == at, jnp.expand_dims(x_ref[...], 1 + a), 0.0)

    g = tuple(float(c) for c in gravity)
    if any(c != 0.0 for c in g):
        # unsplit gravity source IN-KERNEL (ops/source.with_gravity's
        # math): D carries surface-integral units, so the source enters
        # as S * V_cell.  V_cell derives from the surface row (w[0] =
        # h_cell^(dim-1), 0 on guard slots — which zeroes the source on
        # padding exactly like volume_from_inverse).
        surface = w_ref[0]
        v_cell = (surface * surface if dim == 2
                  else surface * jnp.sqrt(surface))
        zero = jnp.zeros_like(u_rows[0])
        src = jnp.stack([
            zero,
            u_rows[0] * g[0] if g[0] else zero,
            u_rows[0] * g[1] if g[1] else zero,
            u_rows[0] * g[2] if g[2] else zero,
            u_rows[1] * g[0] + u_rows[2] * g[1] + u_rows[3] * g[2],
        ])
        D = D + src * v_cell
    u_b = u_ref[...] if C_in == 5 else u_ref[:5]
    up_b = u_b if up_ref is None else up_ref[...]
    out_ref[...] = a_c * up_b + b_c * u_b + c_c * dt_inv * D
    smax = speed.max(axis=tuple(range(dim)))
    sp_ref[...] = jnp.broadcast_to(smax[None, :], (8, TE))


@functools.partial(jax.jit,
                   static_argnames=("gamma", "flux", "coeffs", "tile",
                                    "interpret", "extra_sides", "mu",
                                    "prandtl", "gravity"))
def fused_rk_stage_pallas(u_stage: jnp.ndarray, u_prev,
                          weights: jnp.ndarray, others,
                          gamma: float, flux: str, coeffs,
                          tile: int = 128, interpret: bool = False,
                          extra_sides=(), extras=(), viscous_weights=None,
                          mu: float = 0.0, prandtl: float = 0.72,
                          gravity=(0.0, 0.0, 0.0)):
    """One SSP-RK stage fully in-kernel (see _fused_rk_kernel).
    u_stage/u_prev: [5, *(ext,)*dim, E] (dim 2 or 3, ext 8 or 4);
    u_prev may be None when it equals u_stage (stage 1) — the kernel then
    reads ONE state operand instead of two; weights: [8, E]; others:
    2*dim arrays [5, *(ext,)*(dim-1), E]; extras: per extra_sides[j] an
    additive side-layer divergence [5, *(ext,)*(dim-1), E] (hanging-fine
    contributions, XLA-computed); viscous_weights: [8, E]
    (ops/subgrid.viscous_weight_rows) when mu > 0 — the stage then also
    adds the in-VMEM Navier-Stokes divergence (_tile_viscous_divergence).
    Returns (u_next like u_stage, speed [E])."""
    dim = u_stage.ndim - 2
    ext = u_stage.shape[1]
    E = u_stage.shape[-1]
    C_in = u_stage.shape[0]                  # 5, or 7 with log rows
    share_prev = u_prev is None
    viscous = mu > 0.0
    E_pad = -(-E // tile) * tile
    if E_pad != E:
        pad = [(0, 0)] * u_stage.ndim
        pad[-1] = (0, E_pad - E)
        u_stage = jnp.pad(u_stage, pad, mode="edge")
        if not share_prev:
            u_prev = jnp.pad(u_prev, pad, mode="edge")
        others = tuple(jnp.pad(o, pad[1:], mode="edge") for o in others)
        extras = tuple(jnp.pad(x, pad[1:]) for x in extras)  # zero-padded
        weights = jnp.pad(weights, [(0, 0), (0, E_pad - E)])
        if viscous:
            # edge mode keeps row 0 (the guarded cell size h) positive on
            # padded slots; their D is finite garbage and sliced off
            viscous_weights = jnp.pad(viscous_weights,
                                      [(0, 0), (0, E_pad - E)], mode="edge")
    grid = (E_pad // tile,)

    def idx_blk(i):
        return (0,) * (dim + 1) + (i,)

    def idx_lay(i):
        return (0,) * dim + (i,)

    def idx2(i):
        return (0, i)

    blk5 = (5,) + (ext,) * dim + (tile,)
    blk_in = (C_in,) + (ext,) * dim + (tile,)
    lay5 = pl.BlockSpec((5,) + (ext,) * (dim - 1) + (tile,), idx_lay)
    lay_in = pl.BlockSpec((C_in,) + (ext,) * (dim - 1) + (tile,), idx_lay)
    prev_ops = () if share_prev else (u_prev,)
    visc_ops = (viscous_weights,) if viscous else ()
    u_next, sp = pl.pallas_call(
        functools.partial(_fused_rk_kernel, gamma=gamma, flux=flux,
                          coeffs=coeffs, dim=dim, ext=ext,
                          extra_sides=extra_sides, share_prev=share_prev,
                          mu=mu, prandtl=prandtl, gravity=gravity),
        grid=grid,
        in_specs=[pl.BlockSpec(blk_in, idx_blk)]
                 + [pl.BlockSpec(blk5, idx_blk)] * len(prev_ops)
                 + [pl.BlockSpec((8, tile), idx2)] * (1 + len(visc_ops))
                 + [lay_in] * (2 * dim)
                 + [lay5] * len(extra_sides),
        out_specs=[pl.BlockSpec(blk5, idx_blk),
                   pl.BlockSpec((8, tile), idx2)],
        out_shape=[jax.ShapeDtypeStruct((5,) + (ext,) * dim + (E_pad,),
                                        u_stage.dtype),
                   jax.ShapeDtypeStruct((8, E_pad), u_stage.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u_stage, *prev_ops, weights, *visc_ops, *others, *extras)
    return u_next[..., :E], sp[0, :E]


def _recover_state_rows(q, gamma: float, flux: str):
    """Conservative state rows from cell-field rows (exact up to ~1-ulp
    rounding: the fields are algebraic in the state).  kepes rows:
    [rho, v1, v2, v3, p, rho/p, log rho, log p, vent0, ke]; hll rows:
    [rho, v1, v2, v3, p, h, c, sqrt(rho), ke]."""
    rho = q[0]
    m1, m2, m3 = rho * q[1], rho * q[2], rho * q[3]
    if flux == "kepes":
        e = q[4] * (1.0 / (gamma - 1.0)) + rho * q[9]
    else:                                     # hll: h = (e + p) / rho
        e = rho * q[5] - q[4]
    return (rho, m1, m2, m3, e)


def _fused_rk_fields_kernel(q_ref, *refs, gamma: float, flux: str, coeffs,
                            dim: int, ext: int, extra_sides=(),
                            share_prev: bool = False):
    """RK stage from PRECOMPUTED cell fields: q [C, *(ext,)*dim, TE] and
    the 2*dim neighbor layers as FIELD rows [C, *(ext,)*(dim-1), TE]
    (built once per stage by XLA — removes the ~75% duplicate in-VMEM
    field derivation of the state-input kernel, where every element
    recomputes its 2*dim neighbors' facing-layer fields).  The stage
    state is recovered from q algebraically for the update."""
    if share_prev:
        up_rows = None
    else:
        up_ref, refs = refs[0], refs[1:]
        up_rows = tuple(up_ref[i] for i in range(5))
    w_ref, refs = refs[0], refs[1:]
    others = refs[: 2 * dim]
    extras = refs[2 * dim: 2 * dim + len(extra_sides)]
    out_ref, sp_ref = refs[2 * dim + len(extra_sides):]
    a_c, b_c, c_c = coeffs
    C = q_ref.shape[0]
    TE = q_ref.shape[-1]
    q = tuple(q_ref[i] for i in range(C))
    dt_inv = w_ref[7]

    others_q = tuple(tuple(o[i] for i in range(C)) for o in others)
    D, speed = _tile_flux_divergence(q, others_q, w_ref, dim, ext,
                                     gamma, flux)

    for k, x_ref in zip(extra_sides, extras):
        a = k // 2
        at = ext - 1 if k % 2 == 0 else 0
        idx = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1 + a)
        D = D + jnp.where(idx == at, jnp.expand_dims(x_ref[...], 1 + a), 0.0)

    u_rows = _recover_state_rows(q, gamma, flux)
    if up_rows is None:
        up_rows = u_rows
    out_ref[...] = jnp.stack([
        a_c * up_rows[i] + b_c * u_rows[i] + c_c * dt_inv * D[i]
        for i in range(5)])
    smax = speed.max(axis=tuple(range(dim)))
    sp_ref[...] = jnp.broadcast_to(smax[None, :], (8, TE))


@functools.partial(jax.jit,
                   static_argnames=("gamma", "flux", "coeffs", "tile",
                                    "interpret", "extra_sides"))
def fused_rk_stage_fields_pallas(q: jnp.ndarray, u_prev,
                                 weights: jnp.ndarray, others,
                                 gamma: float, flux: str, coeffs,
                                 tile: int = 128, interpret: bool = False,
                                 extra_sides=(), extras=()):
    """One SSP-RK stage from stacked cell fields q [C, *(ext,)*dim, E]
    (see _fused_rk_fields_kernel).  weights: [8, E] with row 7 =
    dt * inv_cell_volume; others: 2*dim FIELD layers
    [C, *(ext,)*(dim-1), E]; u_prev: [5, ...] state or None (stage 1).
    Returns (u_next [5, *(ext,)*dim, E], speed [E])."""
    C = q.shape[0]
    dim = q.ndim - 2
    ext = q.shape[1]
    E = q.shape[-1]
    share_prev = u_prev is None
    E_pad = -(-E // tile) * tile
    if E_pad != E:
        pad = [(0, 0)] * q.ndim
        pad[-1] = (0, E_pad - E)
        q = jnp.pad(q, pad, mode="edge")
        if not share_prev:
            u_prev = jnp.pad(u_prev, pad, mode="edge")
        others = tuple(jnp.pad(o, pad[1:], mode="edge") for o in others)
        extras = tuple(jnp.pad(x, pad[1:]) for x in extras)
        weights = jnp.pad(weights, [(0, 0), (0, E_pad - E)])
    grid = (E_pad // tile,)

    def idx_blk(i):
        return (0,) * (dim + 1) + (i,)

    def idx_lay(i):
        return (0,) * dim + (i,)

    def idx2(i):
        return (0, i)

    blk_q = pl.BlockSpec((C,) + (ext,) * dim + (tile,), idx_blk)
    blk_u = pl.BlockSpec((5,) + (ext,) * dim + (tile,), idx_blk)
    lay_q = pl.BlockSpec((C,) + (ext,) * (dim - 1) + (tile,), idx_lay)
    lay_u = pl.BlockSpec((5,) + (ext,) * (dim - 1) + (tile,), idx_lay)
    prev_ops = () if share_prev else (u_prev,)
    u_next, sp = pl.pallas_call(
        functools.partial(_fused_rk_fields_kernel, gamma=gamma, flux=flux,
                          coeffs=coeffs, dim=dim, ext=ext,
                          extra_sides=extra_sides, share_prev=share_prev),
        grid=grid,
        in_specs=[blk_q] + [blk_u] * len(prev_ops)
                 + [pl.BlockSpec((8, tile), idx2)]
                 + [lay_q] * (2 * dim) + [lay_u] * len(extra_sides),
        out_specs=[blk_u, pl.BlockSpec((8, tile), idx2)],
        out_shape=[jax.ShapeDtypeStruct((5,) + (ext,) * dim + (E_pad,),
                                        q.dtype),
                   jax.ShapeDtypeStruct((8, E_pad), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, *prev_ops, weights, *others, *extras)
    return u_next[..., :E], sp[0, :E]


# ---------------------------------------------------------------------------
# Round-1 inner-only kernel (kept for comparison; see module docstring).
# ---------------------------------------------------------------------------


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
    """Round-1 inner-flux-only kernel ([5, *ext, Ecap] -> (D, max_speed));
    requires Ecap % tile == 0.  Superseded by fused_flux_pallas."""
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
