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
[5, 2^l, 2^l, 2, Rg, n_tris] where all intra-root fluxes are four full-array
stencil passes (XLA fuses them; no gathers, no CSR), and only the O(N^(2/3))
cross-root + cap faces go through the general gather/accumulate machinery.
The per-face math is IDENTICAL to the gather path (same `face_basis`
rotation, same KEPES flux, same areas from the same face walk), so the two
paths agree cell-for-cell up to summation order — tested like the brick
blocked path (models/blocked_euler.py, BASELINE config 1's lever applied to
config 4).

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

from t8gpu_tpu.mesh.connectivity import FaceConnectivity, build_connectivity
from t8gpu_tpu.mesh.shell_forest import PrismForest, _decode_paths
from t8gpu_tpu.models.compressible_euler import GUARD_STATE
from t8gpu_tpu.ops import euler, fluxes, rk
from t8gpu_tpu.utils.config import EulerConfig


class ShellLatticeGeometry(NamedTuple):
    """Static per-face geometry of the lattice stencil (a jit pytree).

    Lateral arrays are indexed by the UP slot of each of the 3 intra-root
    directions; radial arrays by the LOWER slot of each radial pair.
    Zero area marks "no face here" (footprint guard slots, root borders,
    shell caps); their normals are unit-x placeholders.
    """

    lat_area: tuple    # 3 x [Ei, Ej, Rg, T]
    lat_normal: tuple  # 3 x [3, Ei, Ej, Rg, T], oriented UP -> DOWN
    rad_area: jnp.ndarray    # [Ei, Ej, 2, Rg, T]
    rad_normal: jnp.ndarray  # [3, Ei, Ej, 2, Rg, T], oriented low -> high


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
    """Classify every face of the uniform shell into the 4 stencil
    directions (scattered into dense per-direction area/normal arrays) or
    the external gather list (cross-root laterals + caps)."""
    (tt, i, j, o, rg), flat, (E, Rg, T) = _decode_slots(forest)
    S = E * E * 2 * Rg * T
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

    ext = np.flatnonzero(~claimed)
    conn_ext = build_connectivity(
        left=flat[l[ext]], right=flat[r[ext]],
        normal=np.asarray(normal[:, ext], np.float32),
        area=np.asarray(area[ext], np.float32), n_elements=S,
        b_elem=flat[np.asarray(f["b_elem"])],
        b_normal=np.asarray(f["b_normal"], np.float32),
        b_area=np.asarray(f["b_area"], np.float32),
        element_capacity=S)

    geo = ShellLatticeGeometry(
        lat_area=tuple(jnp.asarray(a, jnp.float32) for a in lat_area),
        lat_normal=tuple(jnp.asarray(nn, jnp.float32) for nn in lat_normal),
        rad_area=jnp.asarray(ra, jnp.float32),
        rad_normal=jnp.asarray(rn, jnp.float32))
    return geo, conn_ext, flat, (E, Rg, T), len(ext)


def _dir_flux(q_l, q_r, normal, area, gamma, flux):
    """Area-scaled flux + masked max speed for one stencil direction."""
    basis = euler.face_basis(normal)
    f_rot, sp = euler.fields_flux(euler.fields_rotate(q_l, *basis),
                                  euler.fields_rotate(q_r, *basis),
                                  gamma=gamma, flux=flux)
    return (euler.inverse_rotate_state(f_rot, *basis) * area,
            (sp * (area > 0)).max())


def _lattice_divergence(u, geo: ShellLatticeGeometry,
                        conn_ext: FaceConnectivity, gamma: float, flux: str):
    """Signed flux accumulation per lattice slot [5, Ei, Ej, 2, Rg, T]
    (accumulate convention: acc[left] -= F, acc[right] += F) + max speed.

    Axes: 1=i, 2=j, 3=o(up/down), 4=rg, 5=tri.  All intra-root neighbor
    access is rolls (concat-of-slices under XLA); rolled-in garbage rows
    always carry zero area.
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

    # cross-root + cap faces: the general gather path over flat slots
    q_flat = q.reshape(q.shape[0], -1)
    f, sp_f = fluxes.interior_face_fluxes_fields(q_flat, conn_ext,
                                                 gamma, flux)
    fb, sp_b = fluxes.boundary_face_fluxes_fields(q_flat, conn_ext,
                                                  gamma, flux)
    acc = acc + fluxes.accumulate(f, fb, conn_ext).reshape(acc.shape)
    speed = jnp.maximum(speed, jnp.maximum(sp_f.max(), sp_b.max()))
    return acc, speed


@functools.partial(jax.jit, static_argnames=("gamma", "flux"),
                   donate_argnames=("u",))
def _rk3_step(u, geo, conn_ext, inv_volume, dt, *, gamma: float, flux: str):
    fn = lambda v: _lattice_divergence(v, geo, conn_ext, gamma, flux)
    return rk.ssp_rk3(u, fn, dt, inv_volume)


@functools.partial(jax.jit, static_argnames=("gamma", "flux", "n_steps"),
                   donate_argnames=("u",))
def _rk3_multi(u, geo, conn_ext, inv_volume, dt, *, n_steps: int,
               gamma: float, flux: str):
    fn = lambda v: _lattice_divergence(v, geo, conn_ext, gamma, flux)

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
        self.config = config
        self.forest = forest
        self._n = forest.n_elements
        geo, conn_ext, flat, (E, Rg, T), n_ext = _build_lattice(forest)
        self._geo = geo
        self._conn_ext = conn_ext
        self._perm = flat                       # element k -> flat slot
        self.n_external_faces = n_ext
        self._shape = (E, E, 2, Rg, T)
        S = E * E * 2 * Rg * T

        centers = forest.centers().astype(np.float32)
        volumes = forest.volumes().astype(np.float32)
        u0 = np.asarray(ic(centers), np.float32)        # [5, N]
        u_flat = np.broadcast_to(GUARD_STATE[:, None], (5, S)).copy()
        u_flat[:, flat] = u0
        self.u = jnp.asarray(u_flat.reshape((5,) + self._shape))

        vol = np.zeros(S, np.float32)
        vol[flat] = volumes
        self.volume = jnp.asarray(vol.reshape(self._shape))
        inv = np.zeros(S, np.float32)                   # guard slots frozen
        inv[flat] = 1.0 / volumes
        self.inv_volume = jnp.asarray(inv.reshape(self._shape))
        self._cfl_h = forest.cfl_h()
        self._max_speed = None

    # -- time stepping --------------------------------------------------------

    def iterate(self, dt: float):
        self.u, self._max_speed = _rk3_step(
            self.u, self._geo, self._conn_ext, self.inv_volume,
            jnp.asarray(dt, jnp.float32),
            gamma=self.config.gamma, flux=self.config.flux)

    def iterate_many(self, n_steps: int, dt: float):
        self.u, self._max_speed = _rk3_multi(
            self.u, self._geo, self._conn_ext, self.inv_volume,
            jnp.asarray(dt, jnp.float32), n_steps=n_steps,
            gamma=self.config.gamma, flux=self.config.flux)

    # -- diagnostics ----------------------------------------------------------

    def compute_integral(self) -> float:
        return float((self.u[0] * self.volume).sum())

    def compute_timestep_device(self):
        """CFL dt as a device scalar (contract of
        CompressibleEulerSolver.compute_timestep_device)."""
        if self._max_speed is None:
            _, self._max_speed = _lattice_divergence(
                self.u, self._geo, self._conn_ext,
                self.config.gamma, self.config.flux)
        return jnp.asarray(self.config.cfl * self._cfl_h,
                           jnp.float32) / self._max_speed

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
