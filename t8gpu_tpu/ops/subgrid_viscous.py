"""Viscous (Navier-Stokes) terms for the subgrid scheme — XLA stencil.

Beyond-reference (the reference's subgrid kernels are inviscid,
examples/subgrid/kernels.inl:335-911): the Newtonian stress tensor +
Fourier heat conduction on dense Cartesian blocks, evaluated per
interface with

  * the NORMAL derivative from the compact two-point difference
    (phi_R - phi_L)/h — second order at the face, no odd-even null
    space;
  * TANGENTIAL velocity derivatives at interior interfaces from the
    mask-aware central difference of the two adjacent cells (block
    cells see their tangential neighbors through the t-side facing
    layers), and at MESH faces from within-layer differences of the
    two facing layers — the only data both elements share, so both
    sides of every mesh face assemble the IDENTICAL flux and
    conservation is exact (the invariant every equivalence test leans
    on).

Hanging (2:1) mesh faces are handled by a separate additive pass
(viscous_hanging_sides) mirroring the advective scheme's virtual-fine
construction (ops/subgrid.outer_apply pass 2): at each fine subface the
normal derivative is the compact two-point difference over the 1.5 h_f
center distance, the tangential derivatives are the mean of the fine
element's within-layer derivative and the coarse element's within-layer
derivative (windowed/replicated to the subface), and BOTH sides of the
face evaluate the identical expression tree from the identical operand
pairs — so the fine element's per-face flux and the coarse element's
pooled subface sum cancel exactly (conservation without scatters).
First-order accurate at hanging faces, like the scheme's MUSCL 2:1
closure.  Wall faces contribute zero viscous flux here (free-slip
adiabatic, the wall model of the inviscid scheme).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.ops.subgrid import (_coarse_window, _expand_compact,
                                   _fine_interleave, _gather_layers,
                                   _pool2, _slab_add, _upsample2)
from t8gpu_tpu.ops.viscous import primitive_rows


def _layer_dt(layer: jnp.ndarray, t_axes, h) -> tuple:
    """Within-layer tangential derivatives of a facing layer
    [C, *t_ext, E]: central inside, one-sided at the layer borders.
    Returns one array per tangent axis (layer-axis order)."""
    outs = []
    for ax in t_axes:
        n = layer.shape[ax]
        if n == 1:
            outs.append(jnp.zeros_like(layer))
            continue
        d_hi = jnp.concatenate(
            [jax.lax.slice_in_dim(layer, 1, n, axis=ax)
             - jax.lax.slice_in_dim(layer, 0, n - 1, axis=ax),
             jnp.zeros_like(jax.lax.slice_in_dim(layer, 0, 1, axis=ax))],
            axis=ax)
        d_lo = jnp.concatenate(
            [jnp.zeros_like(jax.lax.slice_in_dim(layer, 0, 1, axis=ax)),
             jax.lax.slice_in_dim(layer, 1, n, axis=ax)
             - jax.lax.slice_in_dim(layer, 0, n - 1, axis=ax)], axis=ax)
        w_hi = (jnp.arange(n) < n - 1).astype(layer.dtype)
        w_lo = (jnp.arange(n) > 0).astype(layer.dtype)
        shape = [1] * layer.ndim
        shape[ax] = n
        w_hi = w_hi.reshape(shape)
        w_lo = w_lo.reshape(shape)
        outs.append((d_hi * w_hi + d_lo * w_lo) / ((w_hi + w_lo) * h))
    return tuple(outs)


def _cell_dt(phi: jnp.ndarray, layers, weights, axis: int, h) -> jnp.ndarray:
    """Mask-aware central derivative of [C, *ext, E] along block axis
    `axis`: outward edge values come from that side's equal-level facing
    layers (eq-masked: one-sided at walls/non-equal sides)."""
    ax = 1 + axis
    ext = phi.shape[ax]
    hi_lay, lo_lay = layers[2 * axis], layers[2 * axis + 1]
    w_hi = weights[2 * axis]                       # [E]
    w_lo = weights[2 * axis + 1]

    d_int = (jax.lax.slice_in_dim(phi, 1, ext, axis=ax)
             - jax.lax.slice_in_dim(phi, 0, ext - 1, axis=ax))
    d_hi_out = (hi_lay - jax.lax.index_in_dim(phi, ext - 1, axis=ax,
                                              keepdims=False)) * w_hi
    d_lo_out = (jax.lax.index_in_dim(phi, 0, axis=ax,
                                     keepdims=False) - lo_lay) * w_lo
    d_hi = jnp.concatenate([d_int, jnp.expand_dims(d_hi_out, ax)], axis=ax)
    d_lo = jnp.concatenate([jnp.expand_dims(d_lo_out, ax), d_int], axis=ax)

    idx = jax.lax.broadcasted_iota(jnp.int32, phi.shape[1:], axis)
    m_hi = jnp.where(idx == ext - 1, w_hi, 1.0)
    m_lo = jnp.where(idx == 0, w_lo, 1.0)
    return (d_hi * m_hi + d_lo * m_lo) / ((m_hi + m_lo) * h)


def viscous_divergence(u: jnp.ndarray, volumes: jnp.ndarray, conn,
                       spec: SubgridSpec, gamma: float, mu: float,
                       prandtl: float, u_src: jnp.ndarray = None):
    """Viscous surface integral per cell: D_visc [5, *ext, E] to ADD to
    the inviscid divergence (D_visc = +SUM_faces F_visc . n A, the
    opposite sign pattern of the advective stencil).  `u_src` supplies
    the layer-gather source (halo-extended axis in the sharded path)."""
    dim = spec.dim
    ext = spec.extent
    kappa = mu * gamma / ((gamma - 1.0) * prandtl)
    if u_src is None:
        u_src = u

    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    h = h_e / ext                                   # [E] cell size
    area = (h ** (dim - 1)) * (volumes > 0)         # interior face area

    phi = primitive_rows(u, gamma)                  # [4, *ext, E]
    phi_src = phi if u_src is u else primitive_rows(u_src, gamma)

    # equal-level facing layers + eq weights per side
    layers, weights = [], []
    for a in range(dim):
        for s_i, hi in ((0, True), (1, False)):
            k = 2 * a + s_i
            lay = jnp.stack([
                jax.lax.index_in_dim(phi_src[i], 0 if hi else ext - 1,
                                     axis=a, keepdims=False)
                for i in range(4)])
            layers.append(_gather_layers(lay, conn.nbr[k][:, :1])[..., 0])
            weights.append((conn.mask[k] * (conn.rel[k] == 0))
                           .astype(u.dtype))

    # mask garbage layers (walls/hanging gather slot junk): eq-masked
    # layers only ever enter multiplied by w, but keep them finite
    layers = [jnp.where(w > 0, l, 0.0) for l, w in zip(layers, weights)]

    # per-cell tangential derivatives of the velocity rows (per axis)
    cell_d = [ _cell_dt(phi[:3], [l[:3] for l in layers], weights, a, h)
               for a in range(dim)]                  # dim x [3, *ext, E]

    D = jnp.zeros((5,) + u.shape[1:], u.dtype)
    for a in range(dim):
        ax = 1 + a
        t_axes = [t for t in range(dim) if t != a]
        hi_lay = layers[2 * a]
        lo_lay = layers[2 * a + 1]
        w_hi = weights[2 * a] * area                 # [E] face weights
        w_lo = weights[2 * a + 1] * area

        my_hi = jax.lax.index_in_dim(phi, ext - 1, axis=ax, keepdims=False)
        my_lo = jax.lax.index_in_dim(phi, 0, axis=ax, keepdims=False)

        # ---- interfaces i+1/2, i = 0..ext-1 (i = ext-1 is the hi mesh
        # face): next cell values with the hi layer substituted
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(phi, 1, ext, axis=ax),
             jnp.expand_dims(hi_lay, ax)], axis=ax)
        dn = (nxt - phi) / h                         # [4, *ext, E]
        v_f = 0.5 * (phi[:3] + nxt[:3])

        # tangential velocity derivatives at the faces: interior = mean
        # of the two cells' mask-aware centrals; mesh face = mean of the
        # two facing layers' within-layer derivatives (symmetric)
        idx = jax.lax.broadcasted_iota(jnp.int32, u.shape[1:], a)
        at_end = idx == ext - 1
        face_dt = {}
        lay_t_axes = [1 + t_axes.index(t) for t in t_axes]  # layer dims
        dtl_hi_mine = _layer_dt(my_hi[:3], lay_t_axes, h)
        dtl_hi_nbr = _layer_dt(hi_lay[:3], lay_t_axes, h)
        for ti, t in enumerate(t_axes):
            c = cell_d[t]
            c_next = jnp.concatenate(
                [jax.lax.slice_in_dim(c, 1, ext, axis=ax),
                 jnp.zeros_like(jax.lax.slice_in_dim(c, 0, 1, axis=ax))],
                axis=ax)
            interior = 0.5 * (c + c_next)
            mesh = 0.5 * (jnp.expand_dims(dtl_hi_mine[ti], ax)
                          + jnp.expand_dims(dtl_hi_nbr[ti], ax))
            face_dt[t] = jnp.where(at_end, mesh, interior)

        div_f = dn[a] + sum(face_dt[t][t] for t in t_axes)
        tau = {a: mu * (2.0 * dn[a] - (2.0 / 3.0) * div_f)}
        for t in t_axes:
            tau[t] = mu * (dn[t] + face_dt[t][a])
        work = sum(v_f[j] * tau[j] for j in range(dim))
        heat = kappa * dn[3]

        wgt = jnp.where(at_end, w_hi, area)
        rows = [jnp.zeros_like(div_f)]
        for j in range(3):
            rows.append(tau[j] * wgt if j < dim else jnp.zeros_like(div_f))
        rows.append((work + heat) * wgt)
        f = jnp.stack(rows)                          # [5, *ext, E]

        # ---- lo mesh face (normal +a, neighbor on the left) ----------
        dn_lo = (my_lo - lo_lay) / h                 # [4, *t_ext..., E]
        v_lo = 0.5 * (lo_lay[:3] + my_lo[:3])
        dtl_lo_mine = _layer_dt(my_lo[:3], lay_t_axes, h)
        dtl_lo_nbr = _layer_dt(lo_lay[:3], lay_t_axes, h)
        fdt_lo = {t: 0.5 * (dtl_lo_mine[ti] + dtl_lo_nbr[ti])
                  for ti, t in enumerate(t_axes)}
        div_lo = dn_lo[a] + sum(fdt_lo[t][t] for t in t_axes)
        tau_lo = {a: mu * (2.0 * dn_lo[a] - (2.0 / 3.0) * div_lo)}
        for t in t_axes:
            tau_lo[t] = mu * (dn_lo[t] + fdt_lo[t][a])
        work_lo = sum(v_lo[j] * tau_lo[j] for j in range(dim))
        heat_lo = kappa * dn_lo[3]
        rows_lo = [jnp.zeros_like(div_lo)]
        for j in range(3):
            rows_lo.append(tau_lo[j] * w_lo if j < dim
                           else jnp.zeros_like(div_lo))
        rows_lo.append((work_lo + heat_lo) * w_lo)
        f_lo = jnp.stack([jnp.expand_dims(r, a) for r in rows_lo])

        # D_visc[i] += f[i] - f[i-1]  (f[-1] = the lo mesh-face flux)
        prev = jnp.concatenate(
            [f_lo, jax.lax.slice_in_dim(f, 0, ext - 1, axis=ax)], axis=ax)
        D = D + f - prev

    # hanging (2:1) mesh faces: additive virtual-fine pass (compiled away
    # entirely on equal-level meshes — has_fine/has_coarse are static)
    if any(conn.has_fine) or any(conn.has_coarse):
        sides, extras = viscous_hanging_sides(
            u, volumes, conn, spec, gamma, mu, prandtl, u_src=u_src,
            phi=phi, phi_src=phi_src)
        for k, c in zip(sides, extras):
            D = _slab_add(D, c.reshape(5, -1), k // 2,
                          layer_hi=(k % 2 == 0), spec=spec)

    return D


def _hanging_face_rows(dn, face_dt, v_f, a: int, t_axes, dim: int,
                       mu: float, kappa: float):
    """Unweighted viscous flux rows (list of 5) at a hanging subface —
    the ONE expression tree both sides of the face evaluate, from operand
    pairs ordered identically on both sides, so the two contributions are
    bitwise negations (exact conservation)."""
    div_f = dn[a] + sum(face_dt[t][t] for t in t_axes)
    tau = {a: mu * (2.0 * dn[a] - (2.0 / 3.0) * div_f)}
    for t in t_axes:
        tau[t] = mu * (dn[t] + face_dt[t][a])
    work = sum(v_f[j] * tau[j] for j in range(dim))
    heat = kappa * dn[3]
    rows = [jnp.zeros_like(div_f)]
    for j in range(3):
        rows.append(tau[j] if j < dim else jnp.zeros_like(div_f))
    rows.append(work + heat)
    return rows


def viscous_hanging_sides(u: jnp.ndarray, volumes: jnp.ndarray, conn,
                          spec: SubgridSpec, gamma: float, mu: float,
                          prandtl: float, u_src: jnp.ndarray = None,
                          phi: jnp.ndarray = None,
                          phi_src: jnp.ndarray = None):
    """Viscous fluxes of the hanging (2:1) mesh faces, as additive
    boundary-layer contributions per side — the viscous counterpart of
    the advective virtual-fine pass (ops/subgrid.outer_apply pass 2 /
    fine_side_extras).

    Returns (sides, contribs): for each side k with hanging faces, a
    dense [5, *t_ext, E] layer in the VISCOUS sign convention (+ on hi
    sides, - on lo sides — viscous_divergence's mesh-face pattern, the
    OPPOSITE of the advective extras' sign).  Consumed two ways: the XLA
    stencil path slab-adds them into D (viscous_divergence above); the
    RK-fused Pallas path merges them into the stage kernel's additive
    `extras` input (ops/subgrid.ssp_rk3_fused), which un-fences mu > 0
    from equal-level meshes.

    Scheme per virtual-fine subface (fine cell f, coarse cell c,
    h_f = h_c / 2, center distance 1.5 h_f):
      * normal derivative (upper - lower) / (1.5 h_f) — operands ordered
        by geometric side, identical on both evaluations;
      * tangential derivatives 0.5 * (fine element's within-layer
        derivative at h_f + coarse element's within-layer derivative at
        h_c windowed/replicated to the subface) — the window/replicate
        steps are pure selections, so derivative-then-window (fine side)
        equals derivative-then-upsample (coarse side) exactly;
      * flux rows and the h_f-subface area evaluated by the shared
        _hanging_face_rows tree; the coarse side pools the 2^(dim-1)
        subfaces (exact sum).
    `u_src` supplies the layer-gather source (halo-extended axis in the
    sharded path); `phi`/`phi_src` let viscous_divergence share its
    primitive rows."""
    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    lay_axes = tuple(range(1, 1 + n_t))
    kappa = mu * gamma / ((gamma - 1.0) * prandtl)
    if u_src is None:
        u_src = u
    if phi is None:
        phi = primitive_rows(u, gamma)
    if phi_src is None:
        phi_src = phi if u_src is u else primitive_rows(u_src, gamma)

    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    h = h_e / ext                                    # [E] my cell size
    live = (volumes > 0).astype(u.dtype)

    sides, contribs = [], []
    for a in range(dim):
        t_axes = [t for t in range(dim) if t != a]
        for s_i, hi in ((0, True), (1, False)):
            k = 2 * a + s_i
            if not (conn.has_fine[k] or conn.has_coarse[k]):
                continue
            nbr, rel, bits, mask = (conn.nbr[k], conn.rel[k],
                                    conn.bits[k], conn.mask[k])
            my = jax.lax.index_in_dim(phi, ext - 1 if hi else 0,
                                      axis=1 + a, keepdims=False)
            opp = jax.lax.index_in_dim(phi_src, 0 if hi else ext - 1,
                                       axis=1 + a, keepdims=False)
            contrib = None

            # ---- fine element at its COARSER neighbor ----------------
            if conn.has_coarse[k]:
                base = _gather_layers(opp, nbr[:, :1])[..., 0]
                cw = _coarse_window(base, bits, spec)
                inv_d = 1.0 / (1.5 * h)
                dn = [(cw[j] - my[j]) * inv_d if hi
                      else (my[j] - cw[j]) * inv_d for j in range(4)]
                d_my = _layer_dt(my[:3], lay_axes, h)
                d_cw = tuple(_coarse_window(dz, bits, spec)
                             for dz in _layer_dt(base[:3], lay_axes,
                                                 2.0 * h))
                face_dt = {t: {} for t in t_axes}
                for ti, t in enumerate(t_axes):
                    for j in {t, a}:
                        face_dt[t][j] = 0.5 * (d_my[ti][j] + d_cw[ti][j])
                v_f = [0.5 * (my[j] + cw[j]) for j in range(dim)]
                rows = _hanging_face_rows(dn, face_dt, v_f, a, t_axes,
                                          dim, mu, kappa)
                w = mask * (rel == -1) * (h ** (dim - 1)) * live
                wr = w.reshape((1,) * (rows[0].ndim - 1) + (-1,))
                cb = jnp.stack(rows) * wr
                contrib = cb if hi else -cb

            # ---- coarse element at its FINER neighbors (virtual fine,
            # pooled) — on the COMPACT fine-element axis (conn.fine_idx:
            # only level-boundary elements), expanded by row gather, like
            # the advective fine_side_extras: the dense variant of that
            # pass measured 4x the whole step cost on a band-refined mesh
            if conn.has_fine[k]:
                idxk = conn.fine_idx[k]              # [K]
                my_k = _gather_layers(my, idxk[:, None])[..., 0]
                nb = _gather_layers(opp, nbr[idxk])  # [4, *t_ext, K, M]
                fine = _fine_interleave(nb, spec)    # [4, *(2 t_ext), K]
                mine = _upsample2(my_k, lay_axes)
                hf = 0.5 * h[idxk]
                inv_d = 1.0 / (1.5 * hf)
                dn = [(fine[j] - mine[j]) * inv_d if hi
                      else (mine[j] - fine[j]) * inv_d for j in range(4)]
                d_fine = tuple(_fine_interleave(dz, spec)
                               for dz in _layer_dt(nb[:3], lay_axes,
                                                   hf[:, None]))
                d_my_up = tuple(_upsample2(dz, lay_axes)
                                for dz in _layer_dt(my_k[:3], lay_axes,
                                                    h[idxk]))
                face_dt = {t: {} for t in t_axes}
                for ti, t in enumerate(t_axes):
                    for j in {t, a}:
                        face_dt[t][j] = 0.5 * (d_fine[ti][j]
                                               + d_my_up[ti][j])
                v_f = [0.5 * (mine[j] + fine[j]) for j in range(dim)]
                rows = _hanging_face_rows(dn, face_dt, v_f, a, t_axes,
                                          dim, mu, kappa)
                w = ((mask * (rel == 1) * live)[idxk]
                     * (hf ** (dim - 1)))
                wr = w.reshape((1,) * (rows[0].ndim - 1) + (-1,))
                f2 = _pool2(jnp.stack(rows) * wr, n_t)
                f2 = _expand_compact(f2 if hi else -f2, conn.fine_inv[k])
                contrib = f2 if contrib is None else contrib + f2

            sides.append(k)
            contribs.append(contrib)
    return tuple(sides), tuple(contribs)


def merge_viscous_extras(sides, extras, u_stage, volumes, conn, spec,
                         gamma: float, mu: float, prandtl: float,
                         wall: str, wall_velocity, wall_temperature,
                         u_src=None):
    """Merge the hanging 2:1 (viscous_hanging_sides) and no-slip wall
    (viscous_wall_sides) viscous contributions into the advective side
    extras — the additive input of the RK-fused stage kernels.  The ONE
    merge shared by the single-device and sharded fused stages
    (ops/subgrid.ssp_rk3_fused / parallel/subgrid.sharded_ssp_rk3_fused),
    so the two paths the sharded==single equivalence tests keep in
    lockstep cannot drift.  Returns (sides, extras) tuples sorted by
    side index."""
    merged = dict(zip(sides, extras))
    pairs = []
    if any(conn.has_fine) or any(conn.has_coarse):
        pairs.append(viscous_hanging_sides(
            u_stage, volumes, conn, spec, gamma, float(mu),
            float(prandtl), u_src=u_src))
    if wall == "noslip" and bool(conn.b_groups):
        pairs.append(viscous_wall_sides(
            u_stage, volumes, conn, spec, gamma, float(mu),
            float(prandtl), wall_velocity, wall_temperature))
    for vs, vx in pairs:
        for k, x in zip(vs, vx):
            merged[k] = merged[k] + x if k in merged else x
    out = tuple(sorted(merged))
    return out, tuple(merged[k] for k in out)


def viscous_wall_sides(u: jnp.ndarray, volumes: jnp.ndarray, conn,
                       spec: SubgridSpec, gamma: float, mu: float,
                       prandtl: float, wall_velocity=(0.0, 0.0, 0.0),
                       wall_temperature=None, phi: jnp.ndarray = None):
    """NO-SLIP wall viscous fluxes for the subgrid scheme, as additive
    boundary-layer contributions per wall side (viscous sign convention:
    + on hi sides, - on lo — same consumers as viscous_hanging_sides).

    The subgrid analogue of ops/viscous.boundary_viscous_flux on
    axis-aligned brick walls: wall shear from the one-sided derivative
    over the half-cell distance h/2 toward the TANGENTIAL projection of
    the wall velocity (component along the wall normal dropped —
    impermeability), tau.n = mu (dv/dn + (1/3)(dv/dn . n) n); wall work
    v_wall . tau (a moving lid injects energy; resting walls drain
    kinetic energy that reappears as interior heat, conserving the
    total); isothermal heat kappa (T_wall - T)/(h/2) when
    `wall_temperature` is set (None = adiabatic).  Mass flux zero.
    Slip walls (the solver default) never call this."""
    dim = spec.dim
    ext = spec.extent
    kappa = mu * gamma / ((gamma - 1.0) * prandtl)
    if phi is None:
        phi = primitive_rows(u, gamma)
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    h = h_e / ext
    live = (volumes > 0).astype(u.dtype)
    inv_dn = 2.0 / h                                  # 1 / (h/2), [E]

    wall_sides = sorted({2 * ax + (0 if sg > 0 else 1)
                         for ax, sg in conn.b_groups})
    sides, contribs = [], []
    for k in wall_sides:
        a, s_i = k // 2, k % 2
        hi = s_i == 0
        wmask = (conn.mask[k] == 0).astype(u.dtype) * live   # [E] walls
        my = jax.lax.index_in_dim(phi, ext - 1 if hi else 0,
                                  axis=1 + a, keepdims=False)
        vw = [float(wall_velocity[j]) for j in range(3)]
        vw[a] = 0.0                                   # tangential projection
        if hi:
            dv = [(vw[j] - my[j]) * inv_dn for j in range(3)]
        else:
            dv = [(my[j] - vw[j]) * inv_dn for j in range(3)]
        tau = [mu * dv[j] for j in range(3)]
        tau[a] = tau[a] + (mu / 3.0) * dv[a]
        work = sum(vw[j] * tau[j] for j in range(3))
        if wall_temperature is not None:
            dT = ((float(wall_temperature) - my[3]) if hi
                  else (my[3] - float(wall_temperature)))
            work = work + kappa * dT * inv_dn
        zero = jnp.zeros_like(my[0])
        rows = [zero, tau[0], tau[1], tau[2],
                work if isinstance(work, jnp.ndarray) else zero + work]
        w = wmask * (h ** (dim - 1))
        wr = w.reshape((1,) * (my.ndim - 1) + (-1,))
        cb = jnp.stack(rows) * wr
        sides.append(k)
        contribs.append(cb if hi else -cb)
    return tuple(sides), tuple(contribs)
