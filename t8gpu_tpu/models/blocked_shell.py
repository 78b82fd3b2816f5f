"""Uniform prismed-shell meshes as lattice blocks: the shell fast path.

The general-normal gather path is latency-bound at ~90 ns/element
(BENCHMARKS.md "Plain-path status"), and the prismed icosahedral shell —
the reference flagship geometry (examples/compressible_euler/main.cu:23-24)
— runs on it.  But a UNIFORM shell has per-root structure the gather
formulation cannot see: inside one root triangle, the level-l prisms form
a triangular lattice [i, j, up/down] x radial column, and every intra-root
neighbor relation is a constant lattice offset:

    UP(i,j) <-> DOWN(i,j)     (shared hypotenuse, same cell)
    UP(i,j) <-> DOWN(i,j-1)   (shared bottom edge)
    UP(i,j) <-> DOWN(i-1,j)   (shared left edge)
    radial  <-> rg +- 1       (same footprint, neighboring radial cell)

This module steps a uniform shell as a dense lattice
[5, 2^l, 2^l, 2, Rg, n_tris] where

  * all intra-root interior fluxes are four full-array stencil passes
    (XLA fuses them; no gathers, no CSR);
  * the shell-cap WALLS are two more stencil rows (reflective flux on the
    rg=0 / rg=Rg-1 slices with outward radial normals);
  * only the O(N^(2/3)) cross-root lateral faces are gathered — and only
    from a compact PACKED boundary array (the union lattice-edge pattern
    of every root), with a lattice-shaped incidence table accumulating
    the results.

The per-face math is IDENTICAL to the gather path (same `face_basis`
rotation, same KEPES flux, same areas from the same face walk), so the two
paths agree cell-for-cell up to summation order — tested like the brick
blocked path (models/blocked_euler.py, BASELINE config 1's lever applied to
config 4).

Multi-chip: everything except the packed-boundary exchange is elementwise
over the root axis (minor, lane-aligned), so `ShardedBlockedShellEulerSolver`
shards the root axis across a device mesh with `jax.sharding` annotations
and lets GSPMD insert ONE all-gather of the packed boundary columns per
flux evaluation — the lattice analogue of the ghost-layer exchange
(ref mesh_manager.h:189-229).

Lattice slots with i+j beyond the triangular footprint hold GUARD_STATE and
zero face areas; unclaimed normals are unit-x so `face_basis` stays finite
(0-area x NaN would poison the accumulation).

Scope: uniform static shells (no AMR — refinement breaks the per-root
lattice; AMR shells keep the general path, models/compressible_euler.py
over ShellForestMesh).  Reference counterpart: the flagship driver's
pre-adapt uniform phase, main.cu:24.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.mesh.shell_forest import PrismForest, _decode_paths
from t8gpu_tpu.models.compressible_euler import GUARD_STATE
from t8gpu_tpu.ops import euler, rk
from t8gpu_tpu.ops.fluxes import accumulate_inc
from t8gpu_tpu.utils.config import EulerConfig


class ShellLatticeGeometry(NamedTuple):
    """Static per-face geometry + topology of the lattice step (a pytree).

    Lateral arrays are indexed by the UP slot of each of the 3 intra-root
    directions; cap arrays by the (rg=0, rg=Rg-1) slices with OUTWARD
    normals.  Zero area marks "no face here"; placeholder normals are
    unit-x.  `pat_i/pat_j` select the packed boundary columns (the union
    lattice-edge pattern, identical for every root); `ext_*` describe the
    cross-root faces over packed positions; `inc/inc_sign` accumulate the
    external fluxes back onto lattice slots.
    """

    lat_area: tuple    # 3 x [Ei, Ej, Rg, T]
    lat_normal: tuple  # 3 x [3, Ei, Ej, Rg, T], oriented UP -> DOWN
    rad_area: jnp.ndarray    # [Ei, Ej, 2, Rg, T]
    rad_normal: jnp.ndarray  # [3, Ei, Ej, 2, Rg, T], oriented low -> high
    cap_area: jnp.ndarray    # [Ei, Ej, 2, 2, T]  (rg=0 row, rg=Rg-1 row)
    cap_normal: jnp.ndarray  # [3, Ei, Ej, 2, 2, T], outward
    pat_i: jnp.ndarray       # i32 [P] boundary-pattern lattice rows
    pat_j: jnp.ndarray       # i32 [P]
    ext_l: jnp.ndarray       # i32 [M] packed position of the left slot
    ext_r: jnp.ndarray       # i32 [M]
    ext_normal: jnp.ndarray  # f32 [3, M], left -> right
    ext_area: jnp.ndarray    # f32 [M]
    inc: jnp.ndarray         # i32 [Ei, Ej, 2, Rg, T, D] -> column of all_f
    inc_sign: jnp.ndarray    # f32 [Ei, Ej, 2, Rg, T, D]


def can_block_shell(forest) -> bool:
    """Whether a forest qualifies for the blocked shell fast path."""
    if not isinstance(forest, PrismForest):
        return False
    lv = forest.level
    return len(lv) > 0 and int(lv.min()) == int(lv.max()) and int(lv[0]) >= 1


def _decode_slots(forest: PrismForest):
    """Per element: (tri, i, j, orient, rg) lattice coords + flat slot id
    under the [Ei, Ej, 2, Rg, T] layout (T minor: the root-triangle count
    is the largest axis, so it rides the TPU lane dimension)."""
    n_layers = forest.roots.n_layers
    E = 1 << int(forest.level[0])
    Rg = n_layers * E
    T = forest.roots.n_tris
    tt = forest.root // n_layers
    layer = forest.root % n_layers
    i, j, o, rk_ = _decode_paths(forest.path, forest.level)
    rg = layer * E + rk_
    flat = (((i * E + j) * 2 + o.astype(np.int64)) * Rg + rg) * T + tt
    return (tt, i, j, o.astype(np.int64), rg), flat, (E, Rg, T)


def _build_lattice(forest: PrismForest):
    """Classify every face of the uniform shell: the 3 lateral stencil
    directions, radial-internal, cap walls (all scattered into dense
    lattice arrays), or the cross-root external list (packed positions)."""
    (tt, i, j, o, rg), flat, (E, Rg, T) = _decode_slots(forest)
    f = forest.build_faces()
    l, r = np.asarray(f["left"]), np.asarray(f["right"])
    normal = np.asarray(f["normal"], np.float64)  # [3, F]
    area = np.asarray(f["area"], np.float64)

    same_root = tt[l] == tt[r]
    is_rad = (same_root & (i[l] == i[r]) & (j[l] == j[r]) & (o[l] == o[r])
              & (np.abs(rg[l] - rg[r]) == 1))
    lat_cand = same_root & (rg[l] == rg[r]) & (o[l] != o[r])
    up_is_l = o[l] == 0
    ui = np.where(up_is_l, i[l], i[r])
    uj = np.where(up_is_l, j[l], j[r])
    di = np.where(up_is_l, i[r], i[l])
    dj = np.where(up_is_l, j[r], j[l])
    d0 = lat_cand & (di == ui) & (dj == uj)
    d1 = lat_cand & (di == ui) & (dj == uj - 1)
    d2 = lat_cand & (di == ui - 1) & (dj == uj)
    claimed = is_rad | d0 | d1 | d2

    lat_area, lat_normal = [], []
    for dm in (d0, d1, d2):
        a = np.zeros((E, E, Rg, T))
        nn = np.zeros((3, E, E, Rg, T))
        nn[0] = 1.0                                   # finite face_basis
        idx = np.flatnonzero(dm)
        sl = (ui[idx], uj[idx], rg[l][idx], tt[l][idx])
        a[sl] = area[idx]
        # stored normals point left -> right; the stencil wants UP -> DOWN
        sgn = np.where(up_is_l[idx], 1.0, -1.0)
        for c in range(3):
            nn[c][sl] = normal[c, idx] * sgn
        lat_area.append(a)
        lat_normal.append(nn)

    ra = np.zeros((E, E, 2, Rg, T))
    rn = np.zeros((3, E, E, 2, Rg, T))
    rn[0] = 1.0
    idx = np.flatnonzero(is_rad)
    lo_is_l = rg[l][idx] < rg[r][idx]
    rg_lo = np.minimum(rg[l][idx], rg[r][idx])
    sl = (i[l][idx], j[l][idx], o[l][idx], rg_lo, tt[l][idx])
    ra[sl] = area[idx]
    sgn = np.where(lo_is_l, 1.0, -1.0)
    for c in range(3):
        rn[c][sl] = normal[c, idx] * sgn

    # cap walls (the only boundary of a shell) as the rg=0 / rg=Rg-1 rows
    ca = np.zeros((E, E, 2, 2, T))
    cn = np.zeros((3, E, E, 2, 2, T))
    cn[0] = 1.0
    be = np.asarray(f["b_elem"])
    bn = np.asarray(f["b_normal"], np.float64)
    ba = np.asarray(f["b_area"], np.float64)
    assert ((rg[be] == 0) | (rg[be] == Rg - 1)).all(), \
        "shell boundary faces must be radial caps"
    cap_row = (rg[be] == Rg - 1).astype(np.int64)
    sl = (i[be], j[be], o[be], cap_row, tt[be])
    ca[sl] = ba
    for c in range(3):
        cn[c][sl] = bn[c]

    # cross-root lateral faces over the packed boundary pattern
    ext = np.flatnonzero(~claimed)
    el, er = l[ext], r[ext]
    assert (o[el] == 0).all() and (o[er] == 0).all(), \
        "cross-root faces touch UP lattice-edge cells only"
    pat = np.unique(np.stack([np.concatenate([i[el], i[er]]),
                              np.concatenate([j[el], j[er]])], 1), axis=0)
    pat_of = {(int(a), int(b)): k for k, (a, b) in enumerate(pat)}
    P = len(pat)

    def packed(e):
        pk = np.array([pat_of[(int(a), int(b))] for a, b in
                       zip(i[e], j[e])], np.int64)
        return (pk * Rg + rg[e]) * T + tt[e]

    M = len(ext)
    S = E * E * 2 * Rg * T
    slots = np.concatenate([flat[el], flat[er]])
    signs = np.concatenate([np.full(M, -1.0, np.float32),
                            np.full(M, 1.0, np.float32)])
    fids = np.concatenate([np.arange(M), np.arange(M)])
    # depth = rank within equal-slot group (a corner cell is the endpoint
    # of up to 3 cross-root faces); (slot, depth) pairs are then unique
    order = np.argsort(slots, kind="stable")
    ss = slots[order]
    new = np.r_[True, ss[1:] != ss[:-1]]
    depth = np.arange(len(ss)) - np.maximum.accumulate(
        np.where(new, np.arange(len(ss)), 0))
    D = int(depth.max(initial=-1)) + 1 if len(ss) else 1
    assert D <= 3, f"cross-root faces per slot: {D}"
    D = max(D, 1)
    inc = np.full((S, D), M, np.int64)                  # M -> sentinel col
    inc_sign = np.zeros((S, D), np.float32)
    inc[ss, depth] = fids[order]
    inc_sign[ss, depth] = signs[order]
    inc = inc.reshape(E, E, 2, Rg, T, D)
    inc_sign = inc_sign.reshape(E, E, 2, Rg, T, D)

    geo = ShellLatticeGeometry(            # host arrays; placed by _install
        lat_area=tuple(np.asarray(a, np.float32) for a in lat_area),
        lat_normal=tuple(np.asarray(nn, np.float32) for nn in lat_normal),
        rad_area=np.asarray(ra, np.float32),
        rad_normal=np.asarray(rn, np.float32),
        cap_area=np.asarray(ca, np.float32),
        cap_normal=np.asarray(cn, np.float32),
        pat_i=np.asarray(pat[:, 0], np.int32),
        pat_j=np.asarray(pat[:, 1], np.int32),
        ext_l=np.asarray(packed(el), np.int32),
        ext_r=np.asarray(packed(er), np.int32),
        ext_normal=np.asarray(normal[:, ext], np.float32),
        ext_area=np.asarray(area[ext], np.float32),
        inc=np.asarray(inc, np.int32),
        inc_sign=np.asarray(inc_sign, np.float32))
    return geo, flat, (E, Rg, T), M, P


def _dir_flux(q_l, q_r, normal, area, gamma, flux):
    """Area-scaled flux + masked max speed for one stencil direction."""
    basis = euler.face_basis(normal)
    f_rot, sp = euler.fields_flux(euler.fields_rotate(q_l, *basis),
                                  euler.fields_rotate(q_r, *basis),
                                  gamma=gamma, flux=flux)
    return (euler.inverse_rotate_state(f_rot, *basis) * area,
            (sp * (area > 0)).max())


def _lattice_divergence(u, geo: ShellLatticeGeometry, gamma: float,
                        flux: str):
    """Signed flux accumulation per lattice slot [5, Ei, Ej, 2, Rg, T]
    (plain-path convention: acc[left] -= F, acc[right] += F) + max speed.

    Axes: 1=i, 2=j, 3=o(up/down), 4=rg, 5=tri.  All intra-root neighbor
    access is rolls (concat-of-slices under XLA); rolled-in garbage rows
    always carry zero area.  Under the sharded solver GSPMD replicates the
    packed boundary array (one all-gather) — no explicit collective here.
    """
    q = euler.maybe_barrier(euler.cell_fields(u, gamma, flux))
    q_up = q[:, :, :, 0]                         # [C, Ei, Ej, Rg, T]
    q_dn = q[:, :, :, 1]
    acc_up = 0.0
    acc_dn = 0.0
    speed = jnp.zeros((), u.dtype)
    for d in range(3):
        if d == 0:
            q_r = q_dn
        elif d == 1:
            q_r = jnp.roll(q_dn, 1, axis=2)      # DOWN(i, j-1) at (i, j)
        else:
            q_r = jnp.roll(q_dn, 1, axis=1)      # DOWN(i-1, j) at (i, j)
        F, sp = _dir_flux(q_up, q_r, geo.lat_normal[d], geo.lat_area[d],
                          gamma, flux)
        acc_up = acc_up - F                      # UP is the left side
        if d == 1:
            F = jnp.roll(F, -1, axis=2)
        elif d == 2:
            F = jnp.roll(F, -1, axis=1)
        acc_dn = acc_dn + F
        speed = jnp.maximum(speed, sp)

    acc = jnp.stack([acc_up, acc_dn], axis=3)

    q_hi = jnp.roll(q, -1, axis=4)               # cell rg+1 at rg
    F, sp = _dir_flux(q, q_hi, geo.rad_normal, geo.rad_area, gamma, flux)
    acc = acc - F + jnp.roll(F, 1, axis=4)       # lower side is left
    speed = jnp.maximum(speed, sp)

    # cap walls: reflective flux on the two radial boundary rows
    Rg = u.shape[4]
    q_cap = q[:, :, :, :, (0, Rg - 1)]           # [C, Ei, Ej, 2, 2, T]
    basis = euler.face_basis(geo.cap_normal)
    q_rot = euler.fields_rotate(q_cap, *basis)
    f_rot, sp = euler.fields_flux(q_rot, euler.fields_mirror(q_rot),
                                  gamma=gamma, flux=flux)
    Fc = euler.inverse_rotate_state(f_rot, *basis) * geo.cap_area
    acc = acc.at[:, :, :, :, 0].add(-Fc[:, :, :, :, 0])
    acc = acc.at[:, :, :, :, Rg - 1].add(-Fc[:, :, :, :, 1])
    speed = jnp.maximum(speed, (sp * (geo.cap_area > 0)).max())

    # cross-root faces over the packed boundary columns [C, P, Rg, T]
    q_bnd = q[:, geo.pat_i, geo.pat_j, 0]
    q_bnd = q_bnd.reshape(q.shape[0], -1)
    basis = euler.face_basis(geo.ext_normal)
    f_rot, sp = euler.fields_flux(
        euler.fields_rotate(q_bnd[:, geo.ext_l], *basis),
        euler.fields_rotate(q_bnd[:, geo.ext_r], *basis),
        gamma=gamma, flux=flux)
    f_ext = euler.inverse_rotate_state(f_rot, *basis) * geo.ext_area
    speed = jnp.maximum(speed, (sp * (geo.ext_area > 0)).max())
    acc = acc + accumulate_inc(f_ext,
                               jnp.zeros((f_ext.shape[0], 0), f_ext.dtype),
                               geo.inc, geo.inc_sign)
    return acc, speed


@functools.partial(jax.jit, static_argnames=("gamma", "flux"),
                   donate_argnames=("u",))
def _rk3_step(u, geo, inv_volume, dt, *, gamma: float, flux: str):
    fn = lambda v: _lattice_divergence(v, geo, gamma, flux)
    return rk.ssp_rk3(u, fn, dt, inv_volume)


@functools.partial(jax.jit, static_argnames=("gamma", "flux", "n_steps",
                                             "observables"),
                   donate_argnames=("u",))
def _rk3_multi(u, geo, inv_volume, dt, volume=None, *, n_steps: int,
               gamma: float, flux: str, observables: tuple = ()):
    fn = lambda v: _lattice_divergence(v, geo, gamma, flux)

    if observables:
        # lax.scan variant recording per-step global reductions
        # (models/observables.py; guard slots carry zero volume).  On the
        # sharded subclass the same program runs under GSPMD, which
        # partitions the reductions into mesh collectives automatically.
        from t8gpu_tpu.models.observables import resolve
        fns = resolve(observables)

        def body(carry, _):
            v, sp = rk.ssp_rk3(carry[0], fn, dt, inv_volume)
            row = jnp.stack([f(v, volume, gamma) for f in fns])
            return (v, sp), row

        carry0 = (u, jnp.zeros((), u.dtype))
        (u, sp), rows = jax.lax.scan(body, carry0, None, length=n_steps)
        return u, sp, rows

    def body(_i, carry):
        v, _ = carry
        return rk.ssp_rk3(v, fn, dt, inv_volume)

    return jax.lax.fori_loop(0, n_steps, body, (u, jnp.zeros((), u.dtype)))


class BlockedShellEulerSolver:
    """Euler solver on a uniform prismed shell, stepped as per-root lattice
    blocks (see module docstring).  Drop-in for CompressibleEulerSolver's
    stepping surface: iterate / iterate_many / compute_integral /
    compute_timestep(_device) / n_elements / conserved_state (element SFC
    order restored on readout)."""

    dim = 3

    def __init__(self, forest: PrismForest,
                 ic: Callable[[np.ndarray], np.ndarray],
                 config: EulerConfig = EulerConfig()):
        assert can_block_shell(forest), \
            "blocked shell path needs a uniform PrismForest (level >= 1)"
        assert config.dtype == "float32", \
            "the blocked shell path computes in float32 (use " \
            "CompressibleEulerSolver for EulerConfig(dtype='float64'))"
        self.config = config
        self.forest = forest
        self._n = forest.n_elements
        geo_np, flat, (E, Rg, T), n_ext, n_pat = _build_lattice(forest)
        self._perm = flat                       # element k -> flat slot
        self.n_external_faces = n_ext
        self.n_boundary_columns = n_pat * Rg * T
        self._shape = (E, E, 2, Rg, T)
        S = E * E * 2 * Rg * T

        centers = forest.centers().astype(np.float32)
        volumes = forest.volumes().astype(np.float32)
        u0 = np.asarray(ic(centers), np.float32)        # [5, N]
        u_flat = np.broadcast_to(GUARD_STATE[:, None], (5, S)).copy()
        u_flat[:, flat] = u0
        vol = np.zeros(S, np.float32)
        vol[flat] = volumes
        inv = np.zeros(S, np.float32)                   # guard slots frozen
        inv[flat] = 1.0 / volumes
        self._install(geo_np, u_flat.reshape((5,) + self._shape),
                      vol.reshape(self._shape), inv.reshape(self._shape))
        self._cfl_h = forest.cfl_h()
        self._max_speed = None

    def _install(self, geo_np: ShellLatticeGeometry, u, vol, inv):
        """Place the host-built arrays on device: ONE batched upload
        (utils/xfer.pack_put — per-array transfers pay tunnel latency
        each).  The sharded subclass overrides this to place each array
        directly with its target sharding instead."""
        from t8gpu_tpu.utils.xfer import pack_put

        n_lat = len(geo_np.lat_area)
        flat_list = (list(geo_np.lat_area) + list(geo_np.lat_normal)
                     + [geo_np.rad_area, geo_np.rad_normal, geo_np.cap_area,
                        geo_np.cap_normal, geo_np.pat_i, geo_np.pat_j,
                        geo_np.ext_l, geo_np.ext_r, geo_np.ext_normal,
                        geo_np.ext_area, geo_np.inc, geo_np.inc_sign,
                        u, vol, inv])
        dev = list(pack_put(flat_list))
        self._geo = ShellLatticeGeometry(
            lat_area=tuple(dev[:n_lat]),
            lat_normal=tuple(dev[n_lat:2 * n_lat]),
            rad_area=dev[2 * n_lat], rad_normal=dev[2 * n_lat + 1],
            cap_area=dev[2 * n_lat + 2], cap_normal=dev[2 * n_lat + 3],
            pat_i=dev[2 * n_lat + 4], pat_j=dev[2 * n_lat + 5],
            ext_l=dev[2 * n_lat + 6], ext_r=dev[2 * n_lat + 7],
            ext_normal=dev[2 * n_lat + 8], ext_area=dev[2 * n_lat + 9],
            inc=dev[2 * n_lat + 10], inc_sign=dev[2 * n_lat + 11])
        self.u, self.volume, self.inv_volume = dev[-3], dev[-2], dev[-1]

    # -- time stepping --------------------------------------------------------

    def iterate(self, dt: float):
        self.u, self._max_speed = _rk3_step(
            self.u, self._geo, self.inv_volume,
            jnp.asarray(dt, jnp.float32),
            gamma=self.config.gamma, flux=self.config.flux)

    def iterate_many(self, n_steps: int, dt: float):
        self.u, self._max_speed = _rk3_multi(
            self.u, self._geo, self.inv_volume,
            jnp.asarray(dt, jnp.float32), n_steps=n_steps,
            gamma=self.config.gamma, flux=self.config.flux)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "kinetic_energy",
                                    "total_energy")):
        """n_steps fused RK3 steps AND a per-step observable history in
        one dispatch — [n_steps, K] device array (see
        CompressibleEulerSolver.iterate_record; global reductions are
        layout-invariant, so the lattice packing needs no unpermuting)."""
        from t8gpu_tpu.models.observables import resolve
        resolve(observables)  # validate eagerly: empty/unknown names
        self.u, self._max_speed, rows = _rk3_multi(
            self.u, self._geo, self.inv_volume,
            jnp.asarray(dt, jnp.float32), self.volume,
            n_steps=n_steps, observables=tuple(observables),
            gamma=self.config.gamma, flux=self.config.flux)
        return rows

    # -- diagnostics ----------------------------------------------------------

    def compute_integral(self) -> float:
        return float((self.u[0] * self.volume).sum())

    def compute_timestep_device(self):
        """CFL dt as a device scalar (contract of
        CompressibleEulerSolver.compute_timestep_device; axis-summed
        speed, ops/euler.cfl_sum_speed rationale)."""
        from t8gpu_tpu.ops.euler import cfl_sum_speed

        speed = cfl_sum_speed(self.u, self.config.gamma, 3,
                              live=self.volume > 0)
        return jnp.asarray(self.config.cfl * self._cfl_h,
                           jnp.float32) / speed

    def compute_timestep(self) -> float:
        return float(self.compute_timestep_device())

    @property
    def n_elements(self) -> int:
        return self._n

    @property
    def mesh(self):
        """Minimal mesh view (forest / volumes / centers) for IO consumers
        like write_forest_vtu — true wedge geometry from the forest."""
        from types import SimpleNamespace
        return SimpleNamespace(forest=self.forest,
                               volumes=self.forest.volumes(),
                               centers=self.forest.centers())

    def conserved_state(self) -> np.ndarray:
        """[5, N] in the forest's SFC element order."""
        flat = np.asarray(self.u).reshape(5, -1)
        return flat[:, self._perm]


# -----------------------------------------------------------------------------
# Multi-chip: shard the root-triangle axis
# -----------------------------------------------------------------------------

def _shard_geo(geo: ShellLatticeGeometry, mesh, P):
    """Place the lattice geometry on the device mesh: every lattice-shaped
    array shards its root axis (minor-most before the incidence depth);
    the packed external-face tables replicate."""
    from jax.sharding import NamedSharding

    def S(*spec):
        return NamedSharding(mesh, P(*spec))

    lat = lambda nd: S(*((None,) * (nd - 1) + ("roots",)))
    rep = S()
    return ShellLatticeGeometry(
        lat_area=tuple(jax.device_put(a, lat(4)) for a in geo.lat_area),
        lat_normal=tuple(jax.device_put(a, lat(5)) for a in geo.lat_normal),
        rad_area=jax.device_put(geo.rad_area, lat(5)),
        rad_normal=jax.device_put(geo.rad_normal, lat(6)),
        cap_area=jax.device_put(geo.cap_area, lat(5)),
        cap_normal=jax.device_put(geo.cap_normal, lat(6)),
        pat_i=jax.device_put(geo.pat_i, rep),
        pat_j=jax.device_put(geo.pat_j, rep),
        ext_l=jax.device_put(geo.ext_l, rep),
        ext_r=jax.device_put(geo.ext_r, rep),
        ext_normal=jax.device_put(geo.ext_normal, rep),
        ext_area=jax.device_put(geo.ext_area, rep),
        inc=jax.device_put(geo.inc, S(None, None, None, None, "roots",
                                      None)),
        inc_sign=jax.device_put(geo.inc_sign,
                                S(None, None, None, None, "roots", None)))


class ShardedBlockedShellEulerSolver(BlockedShellEulerSolver):
    """The blocked shell fast path over a device mesh: the root-triangle
    axis (minor, lane-aligned) is sharded; the stencil passes partition
    trivially (they are elementwise over roots) and the packed boundary
    columns replicate per flux evaluation — GSPMD inserts that one
    all-gather, the ghost exchange of this formulation.

    Same surface as the single-device solver; conserved_state() gathers.
    """

    def __init__(self, forest: PrismForest,
                 ic: Callable[[np.ndarray], np.ndarray],
                 devices=None, config: EulerConfig = EulerConfig()):
        from jax.sharding import Mesh

        if devices is None:
            devices = jax.devices()
        self.n_shards = len(devices)
        self._mesh = Mesh(np.array(devices), ("roots",))
        # _install (called by the base constructor) places every array
        # with its target sharding directly — no unsharded staging copy
        super().__init__(forest, ic, config=config)

    def _install(self, geo_np: ShellLatticeGeometry, u, vol, inv):
        from jax.sharding import NamedSharding, PartitionSpec as P

        T = self._shape[-1]
        assert T % self.n_shards == 0, \
            f"root count {T} must divide evenly over {self.n_shards} devices"
        mesh = self._mesh
        self._geo = _shard_geo(geo_np, mesh, P)
        lat6 = NamedSharding(mesh, P(None, None, None, None, None, "roots"))
        lat5 = NamedSharding(mesh, P(None, None, None, None, "roots"))
        self.u = jax.device_put(u, lat6)
        self.volume = jax.device_put(vol, lat5)
        self.inv_volume = jax.device_put(inv, lat5)
