"""Blocked fast path for ADAPTED prismed-shell forests (virtual-fine lattice).

The uniform blocked shell path (models/blocked_shell.py) steps a uniform
prism forest as per-root triangular lattices; the moment the forest adapts,
shells fell back to the general gather path at ~10-11 M elem-upd/s
(BENCHMARKS.md "Plain-path status") — while the reference pays no
per-mesh-kind cliff at all (one per-face kernel serves every element class,
examples/compressible_euler/kernels.cu:135-309).  This module removes the
shell AMR cliff the way round 4 removed the brick one (models/
blocked_euler.py), but with a formulation that fits the prism lattice:

**Virtual-fine embedding.**  Each root tri-column is embedded at its own
finest active level m (the max element level over the column): the column
becomes a dense lattice [Ei=2^m, Ej=2^m, 2(up/down), Rg=n_layers*2^m] and
every element at level l < m occupies its aligned triangle sub-block of
8^(m-l) virtual slots, all carrying the element's state.  Columns with the
same m are batched on a minor (lane-aligned) root axis; classes are the
static set range(min_level, max_level+1).

Why this is EXACT plain FV on the adapted mesh (not an approximation):

  * the shell geometry is linear-barycentric per root below the cmesh
    (mesh/shell_forest.py::_geometry_rows: lattice vertices are barycentric
    combinations of the root corners, scaled radially — no re-projection),
    so a real face's fine sub-faces are COPLANAR pieces of it: per-position
    fluxes F(q_l, q_r, n) * A_p share one normal and their areas sum to the
    real face's.  With states constant across each element's slots, the
    summed sub-face flux equals the gather path's single-face flux.
  * virtual faces INTERIOR to one element contribute +F to one slot and -F
    to another slot of the same element; the pooled update (below) sums
    them back out (to f32 roundoff).
  * each RK stage accumulates per-slot divergences, then a POOLED
    PER-PARENT update applies du = dt/V_parent * sum(acc over the parent's
    slots) to every slot, so slots of one element stay bit-identical — the
    scheme IS cell-centered FV at element granularity, stepped on a dense
    lattice.  The parent sums ride the triangle-subdivision recursion
    (UP children = 3 UP + 1 DOWN sub-triangles, _child_step convention),
    an O(S) log-depth pass, fully fused by XLA.

Hanging (2:1) faces need no special path: the finer side's sub-faces are
real lattice faces whose coarse-side slot is a virtual slot of the coarse
neighbor — exactly the reference's level_difference/neighbor_offset
stitching (subgrid_mesh_manager.h:102-126) resolved by construction.

Only CROSS-ROOT faces are gathered (O(root surface), like the uniform
path's packed boundary): each side reads/accumulates through ONE anchor
slot of its element — any slot works, because the pooled update
distributes the contribution over the parent exactly.

The dense per-class face geometry (areas/normals/cell volumes) is computed
ANALYTICALLY ON DEVICE once per adapt from the root corner vertices + the
fine radial grid — nothing lattice-shaped is ever uploaded; per adapt the
host ships only the per-slot depth map (int8), element anchor indices, and
the small cross-root tables.

Scope: single-device.  For the sharded deployment of adapted shells use
ShardedEulerSolver over ShellForestMesh (parallel/solver.py); the uniform
sharded lattice path is ShardedBlockedShellEulerSolver.

Measured (BENCHMARKS.md round 5): this is the path that carried the
reference's 20k-step flagship protocol END TO END (the gather path's
adapted-shell programs OOM the server-side compile helper), with
~10 s warm 100-step+adapt cycles at 250 k prisms.  Per-step slope at
2-adapt dilution 9.6x is ~31 M slot-upd/s = 3.2 M elem-upd/s — the
arithmetic is diluted by the column-granular embedding and the
general-normal per-direction stencil; the named next levers are
sub-root column classes (the linear-barycentric geometry restricts to
any subtree exactly) and an in-VMEM Mosaic lattice kernel.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import bucket_capacity
from t8gpu_tpu.mesh.shell_forest import PrismForest, _decode_paths
from t8gpu_tpu.models.compressible_euler import GUARD_STATE
from t8gpu_tpu.ops import euler
from t8gpu_tpu.ops.amr import apply_remap_weighted, pad_remap
from t8gpu_tpu.ops.fluxes import accumulate_inc, gather_cols
from t8gpu_tpu.models.blocked_shell import _dir_flux
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig


class ClassGeo(NamedTuple):
    """Device dense geometry of one class lattice (analytic, rebuilt per
    adapt by `_class_geometry`).  Lateral arrays are indexed by the UP slot
    of the pair (direction d0: UP(i,j)|DOWN(i,j); d1: UP(i,j)|DOWN(i,j-1);
    d2: UP(i,j)|DOWN(i-1,j)); zero area marks "no face here"."""

    lat_area: tuple     # 3 x [E, E, Rg, T]
    lat_normal: tuple   # 3 x [3, E, E, Rg, T], oriented UP -> DOWN
    rad_area: jnp.ndarray    # [E, E, 2, Rg, T]  (face between rg, rg+1)
    rad_normal: jnp.ndarray  # [3, E, E, 2, Rg, T], oriented low -> high
    cap_area: jnp.ndarray    # [E, E, 2, 2, T]   (rg=0 row, rg=Rg-1 row)
    cap_normal: jnp.ndarray  # [3, E, E, 2, 2, T], outward
    vol: jnp.ndarray         # [E, E, 2, Rg, T] fine-slot volumes (0 dead)


class ClassState(NamedTuple):
    """Per-class device tables that change with the element distribution."""

    delta: jnp.ndarray       # i32 [E, E, 2, Rg, T] slot depth m - level
    inv_vol: jnp.ndarray     # f32 lattice: 1/V_parent (0 on dead slots)
    pool_slots: jnp.ndarray  # i32 [K] flat slots feeding the cross pool
    inc: jnp.ndarray         # i32 [K, D] cross-face columns (sentinel M)
    inc_sign: jnp.ndarray    # f32 [K, D]


class CrossTables(NamedTuple):
    ext_l: jnp.ndarray       # i32 [M] global pool position (emitter side)
    ext_r: jnp.ndarray       # i32 [M]
    normal: jnp.ndarray      # f32 [3, M], emitter -> neighbor
    area: jnp.ndarray        # f32 [M] (0 on padding)


# ---------------------------------------------------------------------------
# Triangle-subdivision pooling (parent sums + broadcast)
# ---------------------------------------------------------------------------

def _combine(S):
    """One level of parent summation on [C, E, E, 2, Rg, T]:
    radial pairs + the 4-way triangle recursion (_child_step convention:
    UP parent = UP(2i,2j) + UP(2i+1,2j) + UP(2i,2j+1) + DOWN(2i,2j))."""
    C, E, _, _, Rg, T = S.shape
    Sr = S.reshape(C, E, E, 2, Rg // 2, 2, T).sum(axis=5)
    up = (Sr[:, 0::2, 0::2, 0] + Sr[:, 1::2, 0::2, 0]
          + Sr[:, 0::2, 1::2, 0] + Sr[:, 0::2, 0::2, 1])
    dn = (Sr[:, 1::2, 0::2, 1] + Sr[:, 0::2, 1::2, 1]
          + Sr[:, 1::2, 1::2, 1] + Sr[:, 1::2, 1::2, 0])
    return jnp.stack([up, dn], axis=3)


def _up_member_mask(E: int, d: int) -> np.ndarray:
    """Static bool [E, E, 2]: slot belongs to the UP parent of its
    2^d-aligned box iff (i % 2^d) + (j % 2^d) + orient <= 2^d - 1
    (the triangle-subdivision descendant sets, by induction on
    _child_step)."""
    D = 1 << d
    i = np.arange(E)[:, None, None] % D
    j = np.arange(E)[None, :, None] % D
    o = np.arange(2)[None, None, :]
    return (i + j + o) <= D - 1


def _broadcast(S, d: int, E: int, Rg: int):
    """Expand level-d parent sums [C, E/2^d, E/2^d, 2, Rg/2^d, T] back to
    per-slot resolution."""
    D = 1 << d
    rep = lambda A: jnp.repeat(
        jnp.repeat(jnp.repeat(A, D, axis=1), D, axis=2), D, axis=3)
    upf = rep(S[:, :, :, 0])                     # [C, E, E, Rg, T]
    dnf = rep(S[:, :, :, 1])
    mask = jnp.asarray(_up_member_mask(E, d))    # [E, E, 2] (constant)
    m = mask[None, :, :, :, None, None]
    return jnp.where(m, upf[:, :, :, None], dnf[:, :, :, None])


def _pool(acc, delta, n_deltas: int):
    """Per-slot sum of `acc` over the slot's OWNING element (depth
    delta[slot] in 0..n_deltas-1) — the pooled-update / embed-broadcast
    primitive.  acc: [C, E, E, 2, Rg, T]."""
    if n_deltas <= 1:
        return acc
    E, Rg = acc.shape[1], acc.shape[4]
    res = acc
    S = acc
    for d in range(1, n_deltas):
        S = _combine(S)
        res = jnp.where(delta == d, _broadcast(S, d, E, Rg), res)
    return res


# ---------------------------------------------------------------------------
# Analytic dense geometry (device, once per adapt)
# ---------------------------------------------------------------------------

def _bary_weights(E: int) -> np.ndarray:
    """Static [E+1, E+1, 3] barycentric weights of the lattice points."""
    i = np.arange(E + 1)[:, None] / E
    j = np.arange(E + 1)[None, :] / E
    return np.stack([1.0 - i - j, np.broadcast_to(i, (E + 1, E + 1)),
                     np.broadcast_to(j, (E + 1, E + 1))], axis=-1)


def _quad_geom(a_lo, b_lo, b_hi, a_hi):
    """(nvec, centroid) of the planar quad (a_lo, b_lo, b_hi, a_hi) —
    the host lateral_geom formula (shell_forest._build_faces_impl)."""
    nvec = 0.5 * jnp.cross(b_hi - a_lo, a_hi - b_lo, axis=0)
    cent = (a_lo + b_lo + b_hi + a_hi) / 4.0
    return nvec, cent


@functools.partial(jax.jit, static_argnames=("E", "Rg", "T"))
def _class_geometry(V3, r_of, n_cols, *, E: int, Rg: int, T: int) -> ClassGeo:
    """Dense fine-face geometry of one class from root corners V3 [T, 3, 3]
    and the fine radial grid r_of [Rg+1].  Matches the host face walk
    (same quad/tri formulas, shell_forest.py) on real faces; sub-faces of
    coarser real faces are coplanar partitions of them (linear-barycentric
    shell geometry), so per-position fluxes sum to the gather path's."""
    w = jnp.asarray(_bary_weights(E), jnp.float32)         # [E+1, E+1, 3]
    X = jnp.einsum("ijk,tkc->cijt", w, V3)                 # [3, E+1, E+1, T]
    col_live = (jnp.arange(T) < n_cols)                    # [T]

    ii = jnp.arange(E)[:, None, None]
    jj = jnp.arange(E)[None, :, None]
    foot_up = (ii + jj <= E - 1) & col_live                # [E, E, T]
    foot_dn = (ii + jj <= E - 2) & col_live

    P00 = X[:, :-1, :-1]                                   # [3, E, E, T]
    P10 = X[:, 1:, :-1]
    P01 = X[:, :-1, 1:]
    P11 = X[:, 1:, 1:]
    c_up = (P00 + P10 + P01) / 3.0                         # footprint centers
    c_dn = (P10 + P01 + P11) / 3.0

    r0 = r_of[:-1][:, None]                                # [Rg, 1]
    r1 = r_of[1:][:, None]
    r_mid = 0.5 * (r0 + r1)

    ex = jnp.zeros((3, 1, 1, 1, 1), jnp.float32).at[0].set(1.0)

    def lateral(A, B, partner_c, valid):
        # quad corners r0*A, r0*B, r1*B, r1*A per (x, y, rg, t)
        A4 = A[:, :, :, None, :]                           # [3, E, E, 1, T]
        B4 = B[:, :, :, None, :]
        nvec = 0.5 * jnp.cross(r1 * B4 - r0 * A4, r1 * A4 - r0 * B4, axis=0)
        s = jnp.sign(jnp.sum(nvec * (partner_c - c_up)[:, :, :, None], 0))
        nvec = nvec * s
        area = jnp.linalg.norm(nvec, axis=0) * valid[:, :, None]
        unit = jnp.where(area > 0, nvec / jnp.maximum(area, 1e-30), ex)
        return area.astype(jnp.float32), unit.astype(jnp.float32)

    # d0: shared hypotenuse edge X[x+1,y]--X[x,y+1]; partner DOWN(x,y)
    lat0 = lateral(P10, P01, c_dn, foot_dn)
    # d1: bottom edge X[x,y]--X[x+1,y]; partner DOWN(x,y-1)
    lat1 = lateral(P00, P10, jnp.roll(c_dn, 1, axis=2),
                   foot_up & (jj >= 1))
    # d2: left edge X[x,y]--X[x,y+1]; partner DOWN(x-1,y)
    lat2 = lateral(P00, P01, jnp.roll(c_dn, 1, axis=1),
                   foot_up & (ii >= 1))

    # radial faces: footprint tri at r_of[rg+1], oriented low -> high
    def rad_tri(Pa, Pb, Pc, foot):
        nv = 0.5 * jnp.cross(Pb - Pa, Pc - Pa, axis=0)     # [3, E, E, T]
        cent = (Pa + Pb + Pc) / 3.0
        s = jnp.sign(jnp.sum(nv * cent, axis=0))           # outward radial
        return nv * s, foot

    nv_up, fu = rad_tri(P00, P10, P01, foot_up)
    nv_dn, fd = rad_tri(P10, P01, P11, foot_dn)
    nv = jnp.stack([nv_up, nv_dn], axis=3)                 # [3, E, E, 2, T]
    foot = jnp.stack([fu, fd], axis=2)                     # [E, E, 2, T]
    rsq = (r_of[1:] ** 2)[:, None]                         # faces at rg+1
    rad_valid = (jnp.arange(Rg) < Rg - 1)[:, None]
    nvec = nv[:, :, :, :, None, :] * rsq                   # [3,E,E,2,Rg,T]
    area = (jnp.linalg.norm(nvec, axis=0)
            * foot[:, :, :, None, :] * rad_valid)
    rad_unit = jnp.where(area > 0, nvec / jnp.maximum(area, 1e-30),
                         ex[:, :, :, :, None])
    rad_area = area.astype(jnp.float32)

    # caps: the shell's only boundary (ref main.cu:23 shell has no lateral
    # hull) — footprint tris at r_of[0] (outward = -radial) and r_of[Rg]
    cap_r = jnp.stack([r_of[0] ** 2, r_of[Rg] ** 2])       # [2]
    cap_sgn = jnp.asarray([-1.0, 1.0])
    cap_nvec = (nv[:, :, :, :, None, :] * cap_r[:, None]
                * cap_sgn[:, None])                        # [3,E,E,2,2,T]
    cap_area = (jnp.linalg.norm(cap_nvec, axis=0)
                * foot[:, :, :, None, :]).astype(jnp.float32)
    cap_unit = jnp.where(cap_area > 0,
                         cap_nvec / jnp.maximum(cap_area, 1e-30),
                         ex[:, :, :, :, None])

    # fine-slot volumes via the divergence theorem over the 5 planar faces
    # (the host _geometry_rows formula, vectorized over the lattice); the
    # two radial caps collapse to (r1^3 - r0^3) |cc . n0| / 3 since both
    # have centroid r*cc and normal r^2*n0
    def cell_vols(Pa, Pb, Pc):
        cc = (Pa + Pb + Pc) / 3.0                          # [3, E, E, T]
        nv0 = 0.5 * jnp.cross(Pb - Pa, Pc - Pa, axis=0)
        v = ((r1 ** 3 - r0 ** 3)
             * jnp.abs(jnp.sum(cc * nv0, axis=0))[:, :, None] / 3.0)
        for A, B in ((Pa, Pb), (Pb, Pc), (Pc, Pa)):
            A4 = A[:, :, :, None, :]
            B4 = B[:, :, :, None, :]
            nvec = 0.5 * jnp.cross(r1 * B4 - r0 * A4, r1 * A4 - r0 * B4,
                                   axis=0)
            cent = r_mid * (A4 + B4) / 2.0
            out = cent - r_mid * cc[:, :, :, None, :]
            s = jnp.sign(jnp.sum(nvec * out, axis=0))
            v = v + jnp.sum(cent * nvec, axis=0) / 3.0 * s
        return v                                           # [E, E, Rg, T]

    vol = jnp.stack([cell_vols(P00, P10, P01),
                     cell_vols(P10, P01, P11)], axis=2)
    vol = (vol * foot[:, :, :, None, :]).astype(jnp.float32)

    return ClassGeo(
        lat_area=(lat0[0], lat1[0], lat2[0]),
        lat_normal=(lat0[1], lat1[1], lat2[1]),
        rad_area=rad_area, rad_normal=rad_unit.astype(jnp.float32),
        cap_area=cap_area, cap_normal=cap_unit.astype(jnp.float32),
        vol=vol)


# ---------------------------------------------------------------------------
# Flux divergence (per-class stencil + global cross-root gather)
# ---------------------------------------------------------------------------

def _class_stencil(q, geo: ClassGeo, gamma: float, flux: str):
    """Per-slot signed flux accumulation [5, E, E, 2, Rg, T] + max speed —
    the uniform lattice stencil (models/blocked_shell._lattice_divergence)
    without its packed cross-root part."""
    q_up = q[:, :, :, 0]                                  # [C, E, E, Rg, T]
    q_dn = q[:, :, :, 1]
    acc_up = 0.0
    acc_dn = 0.0
    speed = jnp.zeros((), jnp.float32)
    for d in range(3):
        if d == 0:
            q_r = q_dn
        elif d == 1:
            q_r = jnp.roll(q_dn, 1, axis=2)               # DOWN(i, j-1)
        else:
            q_r = jnp.roll(q_dn, 1, axis=1)               # DOWN(i-1, j)
        F, sp = _dir_flux(q_up, q_r, geo.lat_normal[d], geo.lat_area[d],
                          gamma, flux)
        acc_up = acc_up - F
        if d == 1:
            F = jnp.roll(F, -1, axis=2)
        elif d == 2:
            F = jnp.roll(F, -1, axis=1)
        acc_dn = acc_dn + F
        speed = jnp.maximum(speed, sp)

    acc = jnp.stack([acc_up, acc_dn], axis=3)             # [5, E, E, 2, Rg, T]

    q_hi = jnp.roll(q, -1, axis=4)
    F, sp = _dir_flux(q, q_hi, geo.rad_normal, geo.rad_area, gamma, flux)
    acc = acc - F + jnp.roll(F, 1, axis=4)
    speed = jnp.maximum(speed, sp)

    Rg = q.shape[4]
    q_cap = q[:, :, :, :, (0, Rg - 1)]                    # [C, E, E, 2, 2, T]
    basis = euler.face_basis(geo.cap_normal)
    q_rot = euler.fields_rotate(q_cap, *basis)
    f_rot, sp = euler.fields_flux(q_rot, euler.fields_mirror(q_rot),
                                  gamma=gamma, flux=flux)
    Fc = euler.inverse_rotate_state(f_rot, *basis) * geo.cap_area
    acc = acc.at[:, :, :, :, 0].add(-Fc[:, :, :, :, 0])
    acc = acc.at[:, :, :, :, Rg - 1].add(-Fc[:, :, :, :, 1])
    speed = jnp.maximum(speed, (sp * (geo.cap_area > 0)).max())
    return acc, speed


def _divergence(us, geos, states, cross: CrossTables, gamma: float,
                flux: str):
    """Pooled per-parent flux divergence for every class + max speed."""
    qs = [euler.maybe_barrier(euler.cell_fields(u, gamma, flux))
          for u in us]
    accs = []
    speed = jnp.zeros((), jnp.float32)

    # cross-root faces: gather one anchor slot per incident element
    M = cross.area.shape[0]
    if M:
        pool = jnp.concatenate(
            [gather_cols(q.reshape(q.shape[0], -1), st.pool_slots)
             for q, st in zip(qs, states)], axis=1)
        basis = euler.face_basis(cross.normal)
        f_rot, sp = euler.fields_flux(
            euler.fields_rotate(pool[:, cross.ext_l], *basis),
            euler.fields_rotate(pool[:, cross.ext_r], *basis),
            gamma=gamma, flux=flux)
        f_ext = euler.inverse_rotate_state(f_rot, *basis) * cross.area
        speed = jnp.maximum(speed, (sp * (cross.area > 0)).max())

    for q, geo, st in zip(qs, geos, states):
        acc, sp = _class_stencil(q, geo, gamma, flux)
        speed = jnp.maximum(speed, sp)
        if M:
            acc_pk = accumulate_inc(
                f_ext, jnp.zeros((f_ext.shape[0], 0), f_ext.dtype),
                st.inc, st.inc_sign)                       # [5, K]
            flat = acc.reshape(acc.shape[0], -1)
            flat = flat.at[:, st.pool_slots].add(acc_pk)   # unique slots
            acc = flat.reshape(acc.shape)
        n_d = int(np.round(np.log2(acc.shape[1]))) + 1     # deltas 0..m
        accs.append(_pool(acc, st.delta[None], n_d))
    return tuple(accs), speed


# ---------------------------------------------------------------------------
# RK3 over the class tuple
# ---------------------------------------------------------------------------

def _stage(coef_prev, u_prev, coef_mid, u_mid, coef_f, fs, dt, states):
    out = []
    for u0, um, f, st in zip(u_prev, u_mid, fs, states):
        du = (coef_f * dt * st.inv_vol) * f
        out.append(coef_prev * u0 + coef_mid * um + du)
    return tuple(out)


def _rk3(us, geos, states, cross, dt, gamma, flux):
    fn = lambda vs: _divergence(vs, geos, states, cross, gamma, flux)
    f0, speed = fn(us)
    u1 = _stage(1.0, us, 0.0, us, 1.0, f0, dt, states)
    f1, _ = fn(u1)
    u2 = _stage(0.75, us, 0.25, u1, 0.25, f1, dt, states)
    f2, _ = fn(u2)
    u3 = _stage(1.0 / 3.0, us, 2.0 / 3.0, u2, 2.0 / 3.0, f2, dt, states)
    return u3, speed


@functools.partial(jax.jit, static_argnames=("n_steps", "gamma", "flux"),
                   donate_argnames=("us",))
def _rk3_multi(us, geos, states, cross, dt, *, n_steps: int, gamma: float,
               flux: str):
    def body(_i, carry):
        vs, _ = carry
        return _rk3(vs, geos, states, cross, dt, gamma, flux)

    return jax.lax.fori_loop(0, n_steps, body,
                             (us, jnp.zeros((), jnp.float32)))


@functools.partial(jax.jit, static_argnames=("n_deltas",),
                   donate_argnames=())
def _embed(u_elem, anchors, elems, delta, live, *, n_deltas: int):
    """Scatter element states [5, N] to their anchor slots, broadcast over
    each element's slot block via the pooling recursion (anchors hold the
    value, other slots 0 -> the parent sum IS the anchor value), install
    GUARD_STATE on dead slots."""
    shape = delta.shape                                    # [E, E, 2, Rg, T]
    flat = jnp.zeros((u_elem.shape[0],) + (int(np.prod(shape)),),
                     u_elem.dtype)
    # anchors/elems are PADDED to the element capacity bucket so this
    # program's shapes are adapt-stable (exact per-adapt lengths were
    # recompiling it every adapt); padding rows carry out-of-range slot
    # ids and are dropped
    flat = flat.at[:, anchors].set(u_elem[:, elems], mode="drop")
    lat = _pool(flat.reshape((u_elem.shape[0],) + shape), delta[None],
                n_deltas)
    guard = jnp.asarray(GUARD_STATE, u_elem.dtype).reshape(
        (5,) + (1,) * len(shape))
    return jnp.where(live, lat, guard)


# ---------------------------------------------------------------------------
# Host-side tables (rebuilt per adapt)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _foot_offsets(d: int):
    """Local (a, b, o) footprint offsets of the level-d descendants of an
    UP / DOWN parent (the triangle-subdivision descendant sets)."""
    D = 1 << d
    a, b, o = np.meshgrid(np.arange(D), np.arange(D), np.arange(2),
                          indexing="ij")
    up = (a + b + o) <= D - 1
    mk = lambda m: np.stack([a[m], b[m], o[m]], axis=1)
    return mk(up), mk(~up)


def _next_pow2(n: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)


class _ClassHost(NamedTuple):
    m: int
    E: int
    Rg: int
    T: int                  # padded column capacity
    n_cols: int
    V3: np.ndarray          # [T, 3, 3] root tri corners (0 on padding)
    r_of: np.ndarray        # [Rg + 1]
    delta: np.ndarray       # i8 [S] (-1 dead)
    anchors: np.ndarray     # i32 [n_c] anchor flat slots of class elements
    elems: np.ndarray       # i32 [n_c] element ids (into [5, N])
    pool_slots: np.ndarray  # i32 [K]
    inc: np.ndarray         # i32 [K, D]
    inc_sign: np.ndarray    # f32 [K, D]


def _build_host_tables(forest: PrismForest, amr: AMRConfig,
                       cap_n: int = 0):
    """Per-adapt host tables: class assignment, per-slot depth maps,
    element anchors, cross-root face tables.  All O(elements + faces)
    vectorized NumPy; nothing lattice-dense crosses the host<->device
    boundary except the int8 depth map."""
    roots = forest.roots
    nl = roots.n_layers
    lv = forest.level.astype(np.int64)
    i, j, o, rk_ = _decode_paths(forest.path, forest.level)
    t = forest.root // nl
    layer = forest.root % nl
    N = forest.n_elements

    cap_n = cap_n or bucket_capacity(N, amr.growth_factor)
    class_lo = max(int(amr.min_level), 0)
    class_hi = int(amr.max_level)
    m_col = np.zeros(roots.n_tris, np.int64)
    np.maximum.at(m_col, t, lv)
    m_col = np.clip(m_col, class_lo, class_hi)
    assert (lv <= m_col[t]).all()

    # per-element class geometry
    m_e = m_col[t]
    dlt = (m_e - lv).astype(np.int64)
    rg_el = layer * (1 << lv) + rk_
    x0 = i << dlt
    y0 = j << dlt
    rg0 = rg_el << dlt
    D_e = np.int64(1) << dlt
    ax = np.where(o == 0, x0, x0 + D_e - 1)        # anchor slot: a fine
    ay = np.where(o == 0, y0, y0 + D_e - 1)        # descendant of either
    arg = rg0                                      # orientation

    classes = []
    cls_of = (m_e - class_lo).astype(np.int64)
    colpos = np.full(roots.n_tris, -1, np.int64)
    caps = []
    for ci, m in enumerate(range(class_lo, class_hi + 1)):
        cols = np.flatnonzero(m_col == m)
        T = bucket_capacity(max(len(cols), 1), growth=2.0, base=16)
        colpos[cols] = np.arange(len(cols))
        V3 = np.zeros((T, 3, 3), np.float32)
        if len(cols):
            V3[: len(cols)] = roots.verts[roots.tris[cols]]
        E = 1 << m
        Rg = nl << m
        rr = np.arange(Rg + 1)
        lay = np.minimum(rr >> m, nl - 1)
        r_of = (roots.radii[lay] + (roots.radii[lay + 1] - roots.radii[lay])
                * (rr - (lay << m)) / (1 << m)).astype(np.float32)
        caps.append((m, E, Rg, T, len(cols), V3, r_of))
        classes.append(None)

    # per-slot depth maps + per-class element lists
    S_of = [E * E * 2 * Rg * T for (_, E, Rg, T, *_r) in caps]
    deltas = [np.full(S, -1, np.int8) for S in S_of]
    tpos = colpos[t]
    anchors_g = np.empty(N, np.int64)
    class_elems = []
    class_anchors = []
    for ci in range(len(caps)):
        m, E, Rg, T, n_cols, V3, r_of = caps[ci]
        sel = np.flatnonzero(cls_of == ci)
        el = sel
        if len(sel):
            af = (((ax[sel] * E + ay[sel]) * 2 + o[sel].astype(np.int64))
                  * Rg + arg[sel]) * T + tpos[sel]
        else:
            af = np.zeros(0, np.int64)
        S_ci = E * E * 2 * Rg * T
        el_pad = np.zeros(cap_n, np.int32)
        el_pad[: len(sel)] = sel
        af_pad = np.full(cap_n, S_ci, np.int32)     # OOB -> drop in _embed
        af_pad[: len(sel)] = af
        class_elems.append(el_pad)
        class_anchors.append(af_pad)
        anchors_g[sel] = af  # global offset added later
        # depth scatter per (delta, orientation) group
        for d in sorted(set((m_e[sel] - lv[sel]).tolist())):
            up_off, dn_off = _foot_offsets(d)
            Dd = 1 << d
            for oo, offs in ((0, up_off), (1, dn_off)):
                g = sel[(m_e[sel] - lv[sel] == d) & (o[sel] == oo)]
                if not len(g):
                    continue
                # slots = box corner + (offsets x radial)
                a = offs[:, 0][None, :, None]
                b = offs[:, 1][None, :, None]
                so = offs[:, 2][None, :, None]
                r = np.arange(Dd)[None, None, :]
                xs = x0[g][:, None, None] + a
                ys = y0[g][:, None, None] + b
                rs = rg0[g][:, None, None] + r
                fl = ((((xs * E + ys) * 2 + so) * Rg + rs) * T
                      + tpos[g][:, None, None])
                deltas[ci][fl.ravel()] = d

    # global flat offsets for readout
    off = np.concatenate([[0], np.cumsum(S_of)[:-1]])
    for ci in range(len(caps)):
        sel = np.flatnonzero(cls_of == ci)
        anchors_g[sel] += off[ci]

    # ---- cross-root faces (lateral faces whose tri columns differ) ------
    ml = forest._build_face_lists()
    lat, rad = ml["lateral"], ml["radial"]
    f = forest.build_faces()
    n1, n2 = len(lat["eq_l"]), len(lat["hang_f"])
    n3, n4 = len(rad["eq_l"]), len(rad["hang_f"])
    assert len(f["area"]) == n1 + n2 + n3 + n4
    assert (t[rad["eq_l"]] == t[rad["eq_r"]]).all()
    assert (t[rad["hang_f"]] == t[rad["hang_c"]]).all()
    em = np.concatenate([lat["eq_l"], lat["hang_f"]])
    nb = np.concatenate([lat["eq_r"], lat["hang_c"]])
    area_l = f["area"][: n1 + n2]
    norm_l = f["normal"][:, : n1 + n2]
    cross = t[em] != t[nb]
    em, nb = em[cross], nb[cross]
    c_area = area_l[cross].astype(np.float32)
    c_norm = norm_l[:, cross].astype(np.float32)
    M = len(em)
    # coarse bases: these arrays are tiny, and every distinct
    # (T*, K*, M) combination is a fresh XLA step program — overshoot
    # the padding so the combination changes (almost) never
    Mcap = bucket_capacity(max(M, 1), growth=2.0, base=8192)

    pool_pos = np.full(N, -1, np.int64)
    pool_elems = [np.unique(np.concatenate([em[cls_of[em] == ci],
                                            nb[cls_of[nb] == ci]]))
                  for ci in range(len(caps))]
    Kcaps = [bucket_capacity(max(len(p), 1), growth=2.0, base=4096)
             for p in pool_elems]
    koff = np.concatenate([[0], np.cumsum(Kcaps)[:-1]])
    for ci, p in enumerate(pool_elems):
        pool_pos[p] = koff[ci] + np.arange(len(p))

    ext_l = np.zeros(Mcap, np.int32)
    ext_r = np.zeros(Mcap, np.int32)
    ext_a = np.zeros(Mcap, np.float32)
    ext_n = np.zeros((3, Mcap), np.float32)
    ext_n[0] = 1.0
    ext_l[:M] = pool_pos[em]
    ext_r[:M] = pool_pos[nb]
    ext_a[:M] = c_area
    ext_n[:, :M] = c_norm

    # per-class pool slots + incidence (local pool row -> face columns)
    for ci in range(len(caps)):
        m, E, Rg, T, n_cols, V3, r_of = caps[ci]
        p = pool_elems[ci]
        K = Kcaps[ci]
        slots = np.zeros(K, np.int32)
        if len(p):
            slots[: len(p)] = (anchors_g[p] - off[ci]).astype(np.int32)
        ents_pos, ents_face, ents_sign = [], [], []
        for side, sgn in ((em, -1.0), (nb, 1.0)):
            selc = cls_of[side] == ci
            ents_pos.append(pool_pos[side[selc]] - koff[ci])
            ents_face.append(np.flatnonzero(selc))
            ents_sign.append(np.full(selc.sum(), sgn, np.float32))
        ep = np.concatenate(ents_pos).astype(np.int64)
        ef = np.concatenate(ents_face).astype(np.int64)
        es = np.concatenate(ents_sign)
        order = np.argsort(ep, kind="stable")
        eps, efs, ess = ep[order], ef[order], es[order]
        new = np.r_[True, eps[1:] != eps[:-1]] if len(eps) else \
            np.zeros(0, bool)
        depth = (np.arange(len(eps))
                 - np.maximum.accumulate(np.where(new, np.arange(len(eps)),
                                                  0))) if len(eps) else eps
        # FIXED depth: a per-adapt next_pow2 of the observed max jitters
        # across adapts and recompiles the step program (the round-4
        # fine-table lesson); 16 bounds any 2:1 corner configuration
        Dmax = 16
        assert int(depth.max(initial=0)) < Dmax,             f"cross-face collision depth {int(depth.max())+1} > {Dmax}"
        inc = np.full((K, Dmax), Mcap, np.int32)           # sentinel col
        sgn_t = np.zeros((K, Dmax), np.float32)
        if len(eps):
            inc[eps, depth] = efs
            sgn_t[eps, depth] = ess
        classes[ci] = _ClassHost(
            m=m, E=E, Rg=Rg, T=T, n_cols=n_cols, V3=V3, r_of=r_of,
            delta=deltas[ci], anchors=class_anchors[ci],
            elems=class_elems[ci], pool_slots=slots, inc=inc,
            inc_sign=sgn_t)

    cross_h = (ext_l, ext_r, ext_n, ext_a)
    assert sum(S_of) < 2 ** 31, "lattice slot space exceeds int32"
    ag_pad = np.zeros(cap_n, np.int64)
    ag_pad[:N] = anchors_g
    return classes, cross_h, ag_pad.astype(np.int32), off


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_deltas",))
def _inv_volume(vol, delta, *, n_deltas: int):
    """1/V_parent per slot from the analytic fine-slot volumes: children
    tile their parent exactly (shared planar faces), so the pooled sum of
    fine volumes IS the parent volume."""
    live = delta >= 0
    Vp = _pool((vol * live)[None], delta[None], n_deltas)[0]
    return jnp.where(live, 1.0 / jnp.maximum(Vp, 1e-30), 0.0)


@jax.jit
def _gather_elem(u_flat_all, anchors_g):
    return gather_cols(u_flat_all, anchors_g)


class BlockedShellAMRSolver:
    """Euler solver with dynamic AMR on prismed-shell forests, stepped on
    per-class virtual-fine lattices (module docstring) — the shell
    counterpart of BlockedAMREulerSolver.  Drop-in for
    CompressibleEulerSolver's stepping surface on ShellForestMesh:
    iterate / iterate_many / adapt / adapt_prefetch / compute_integral /
    compute_timestep(_device) / n_elements / conserved_state (forest SFC
    element order restored on readout).

    Unlike the gather path the ADAPTATION here is still element-granular
    (same criteria -> flags -> 2:1 balance -> volume-weighted remap
    pipeline, ref solver.cu:243-277); only the STEPPING representation
    changes, and it is exact plain FV on the same forest."""

    dim = 3

    def __init__(self, forest: PrismForest,
                 ic: Callable[[np.ndarray], np.ndarray],
                 amr: AMRConfig = None,
                 config: EulerConfig = EulerConfig()):
        assert isinstance(forest, PrismForest)
        assert config.order == 1, \
            "blocked shell AMR is a first-order fast path (use the gather " \
            "path for order=2)"
        assert float(config.mu) == 0.0 and not any(config.gravity), \
            "blocked shell AMR path is inviscid/unforced"
        assert config.dtype == "float32", \
            "blocked shell AMR computes in float32"
        self.config = config
        self.amr = amr or AMRConfig()
        self._crit_rho = None
        u0 = np.asarray(ic(forest.centers().astype(np.float32)), np.float32)
        self._install(forest, jnp.asarray(u0))

    # -- install (per construction / adapt) -----------------------------------

    def _install(self, forest: PrismForest, u_elem):
        from t8gpu_tpu.utils.profiling import phase
        from t8gpu_tpu.utils.xfer import pack_put

        self.forest = forest
        self._crit_rho = None
        cap_n = bucket_capacity(forest.n_elements, self.amr.growth_factor)
        if u_elem.shape[-1] != cap_n:   # shape-stable embed/readout
            u_elem = jnp.pad(u_elem,
                             [(0, 0), (0, cap_n - u_elem.shape[-1])])
        with phase("adapt/blocked-tables"):
            classes, cross_h, anchors_g, off = _build_host_tables(
                forest, self.amr, cap_n)
        with phase("adapt/blocked-upload"):
            flat = []
            for ch in classes:
                flat += [ch.V3, ch.r_of, ch.delta, ch.anchors, ch.elems,
                         ch.pool_slots, ch.inc, ch.inc_sign]
            flat += list(cross_h) + [anchors_g]
            dev = list(pack_put(flat))
        with phase("adapt/blocked-install"):
            self._geos, self._states, us = [], [], []
            P = 8
            for ci, ch in enumerate(classes):
                V3, r_of, delta_i8, anchors, elems, pool, inc, sgn = \
                    dev[ci * P: (ci + 1) * P]
                shape = (ch.E, ch.E, 2, ch.Rg, ch.T)
                geo = _class_geometry(V3, r_of,
                                      jnp.asarray(ch.n_cols, jnp.int32),
                                      E=ch.E, Rg=ch.Rg, T=ch.T)
                delta = delta_i8.astype(jnp.int32).reshape(shape)
                n_d = ch.m + 1
                inv = _inv_volume(geo.vol, delta, n_deltas=n_d)
                live = delta >= 0
                u_c = _embed(u_elem, anchors, elems, delta, live,
                             n_deltas=n_d)
                self._geos.append(geo)
                self._states.append(ClassState(
                    delta=delta, inv_vol=inv, pool_slots=pool,
                    inc=inc, inc_sign=sgn))
                us.append(u_c)
            nc = len(classes) * P
            self._cross = CrossTables(ext_l=dev[nc], ext_r=dev[nc + 1],
                                      normal=dev[nc + 2], area=dev[nc + 3])
            self._anchors_g = dev[nc + 4]
            self.us = tuple(us)
        self._classes_meta = classes
        self._max_speed = None

    # -- stepping -------------------------------------------------------------

    def iterate(self, dt: float):
        self.iterate_many(1, dt)

    def iterate_many(self, n_steps: int, dt: float):
        self.us, self._max_speed = _rk3_multi(
            self.us, tuple(self._geos), tuple(self._states), self._cross,
            jnp.asarray(dt, jnp.float32), n_steps=n_steps,
            gamma=self.config.gamma, flux=self.config.flux)

    # -- AMR cycle ------------------------------------------------------------

    def _rho_device(self):
        u_flat = jnp.concatenate([u.reshape(5, -1) for u in self.us],
                                 axis=1)
        return _gather_elem(u_flat, self._anchors_g)[0]

    def _criteria_host(self, rho: np.ndarray) -> np.ndarray:
        """Reference gradient criteria (ref solver.cu:243-267 /
        kernels.cu:471-501) computed on host from element densities:
        per-element sum of |rho_l - rho_r| over incident faces, divided
        by V^(1/3); boundary (cap) faces contribute nothing (mirror ghost
        has equal density)."""
        ml = self.forest._build_face_lists()
        lat, rad = ml["lateral"], ml["radial"]
        l = np.concatenate([lat["eq_l"], lat["hang_f"],
                            rad["eq_l"], rad["hang_f"]])
        r = np.concatenate([lat["eq_r"], lat["hang_c"],
                            rad["eq_r"], rad["hang_c"]])
        jump = np.abs(rho[l] - rho[r])
        N = self.forest.n_elements
        grad = (np.bincount(l, jump, N) + np.bincount(r, jump, N))
        vol = self.forest.volumes()
        return (grad / np.maximum(vol, 1e-30) ** (1.0 / 3.0)).astype(
            np.float32)

    def adapt_prefetch(self):
        rho = self._rho_device()
        try:
            rho.copy_to_host_async()
        except AttributeError:
            pass
        self._crit_rho = rho

    def adapt(self):
        from t8gpu_tpu.utils.profiling import phase

        rho = self._crit_rho if self._crit_rho is not None \
            else self._rho_device()
        self._crit_rho = None
        with phase("adapt/criteria-fetch"):
            rho = np.asarray(rho)[: self.forest.n_elements]
        with phase("adapt/flags+balance"):
            crit = self._criteria_host(rho)
            flags = self.forest.flags_from_criteria(
                crit, b=self.amr.refine_threshold,
                min_level=self.amr.min_level,
                max_level=self.amr.max_level)
            flags = self.forest.balance_flags(flags)
        with phase("adapt/forest-adapt"):
            new_forest, remap = self.forest.adapt(flags)
        with phase("adapt/remap-dispatch"):
            u_old = _gather_elem(
                jnp.concatenate([u.reshape(5, -1) for u in self.us],
                                axis=1), self._anchors_g)
            cap_new = bucket_capacity(new_forest.n_elements,
                                      self.amr.growth_factor)
            start, count = pad_remap(remap.src_start, remap.src_count,
                                     cap_new)
            vols = self.forest.volumes().astype(np.float32)
            w_old = np.ones(u_old.shape[-1], np.float32)   # padded lanes
            w_old[: len(vols)] = vols
            u_new = apply_remap_weighted(u_old, start, count,
                                         jnp.asarray(w_old),
                                         k=8, capacity=cap_new)
        self._install(new_forest, u_new)

    # -- diagnostics ----------------------------------------------------------

    def compute_integral(self) -> float:
        tot = 0.0
        for u, geo in zip(self.us, self._geos):
            tot = tot + (u[0] * geo.vol).sum()
        return float(tot)

    def compute_timestep_device(self):
        from t8gpu_tpu.ops.euler import cfl_sum_speed

        speed = jnp.zeros((), jnp.float32)
        for u, st in zip(self.us, self._states):
            speed = jnp.maximum(
                speed, cfl_sum_speed(u, self.config.gamma, 3,
                                     live=st.delta >= 0))
        return jnp.asarray(self.config.cfl * self.forest.cfl_h(),
                           jnp.float32) / speed

    def compute_timestep(self) -> float:
        return float(self.compute_timestep_device())

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    @property
    def n_slots(self) -> int:
        """Total lattice slots stepped (the dense embedding overhead vs
        n_elements — logged by drivers so coverage cost is never silent)."""
        return sum(int(np.prod(s.delta.shape)) for s in self._states)

    @property
    def mesh(self):
        from types import SimpleNamespace
        return SimpleNamespace(forest=self.forest,
                               volumes=self.forest.volumes(),
                               centers=self.forest.centers())

    def conserved_state(self) -> np.ndarray:
        """[5, N] in the forest's SFC element order."""
        u_flat = jnp.concatenate([u.reshape(5, -1) for u in self.us],
                                 axis=1)
        out = np.asarray(_gather_elem(u_flat, self._anchors_g))
        return out[:, : self.forest.n_elements]
