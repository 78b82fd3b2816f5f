"""GLM-MHD on the dense-block (subgrid) scheme.

The block-structured scheme is PDE-agnostic: the slab-exchange machinery
of ops/subgrid.py (interior shift stencils, per-side neighbor layer
gathers with the 2:1 coarse-window / fine-interleave selections, dense
pad-adds instead of scatters — the TPU replacement for the reference's
per-face kernels + atomicAdd, kernels.inl:335-911) never looks inside the
state rows.  This module instantiates it for the 9-row GLM-MHD system
(models/mhd.py: Dedner divergence cleaning, Rusanov + exact 2x2 GLM
interface solve), on stacked [9, *ext, Ecap] states:

  * the face-frame rotation is a static ROW PERMUTATION per axis — MHD
    rotates TWO vector fields (momentum and B), so the permutation swaps
    both triplets (the subgrid faces are axis-aligned, so this is exactly
    the reference's complete_orthonormal_basis rotation specialized to
    unit normals, kernels.inl:717-750);
  * the GLM cleaning speed c_h is ONE global device scalar recomputed
    from the current state per flux evaluation and threaded through every
    interface (interior, mesh-face and wall alike) — the scheme
    ingredient no other family has;
  * walls are perfect conductors: ghost = (mirror m_n, keep B, negate
    psi), giving F(B_n) = 0 exactly (models/mhd.py module docstring);
  * the parabolic damping -alpha c_h psi V_cell / h_cell enters the
    divergence as a source row (unsplit, integrated by the SSP-RK3
    stages).

The same `_interface_engine` also evaluates the Green-Gauss div B
constraint diagnostic (`subgrid_divergence_b`) — the interface function
is a parameter, so the flux and the diagnostic cannot disagree on the
surface decomposition (including hanging 2:1 subfaces).

Equivalence anchor (tests/test_subgrid_mhd.py): on a uniform forest a
level-l Subgrid<4,4> block mesh is the same discretization as a plain
level-(l+2) mesh, so full RK3 steps must agree with models/mhd.MHDSolver
cell for cell — cross-validating the permutation rotation against the
plain path's general face basis and the slab exchange against the
gather/incidence path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.subgrid import SubgridConnectivity
from t8gpu_tpu.models.mhd import N_ROWS, _rusanov_rows, glm_ch
from t8gpu_tpu.ops import subgrid as sg

# state rows [rho, m_x, m_y, m_z, E, B_x, B_y, B_z, psi] -> +axis face
# frame [rho, m_n, m_t1, m_t2, E, B_n, B_t1, B_t2, psi]: swap the normal
# component of BOTH vector triplets into slot 1 / slot 5.  The Rusanov
# flux treats the two tangential slots symmetrically, so the static swap
# is mathematically identical to the plain path's general rotation.
_ROT9 = {
    0: (0, 1, 2, 3, 4, 5, 6, 7, 8),
    1: (0, 2, 1, 3, 4, 6, 5, 7, 8),
    2: (0, 3, 1, 2, 4, 7, 5, 6, 8),
}
_UNROT9 = {
    0: (0, 1, 2, 3, 4, 5, 6, 7, 8),
    1: (0, 2, 1, 3, 4, 6, 5, 7, 8),
    2: (0, 2, 3, 1, 4, 6, 7, 5, 8),
}


def axis_rotate9(u: jnp.ndarray, axis: int) -> jnp.ndarray:
    if axis == 0:
        return u
    return jnp.stack([u[i] for i in _ROT9[axis]])


def axis_unrotate9(f: jnp.ndarray, axis: int) -> jnp.ndarray:
    if axis == 0:
        return f
    return jnp.stack([f[i] for i in _UNROT9[axis]])


def _rusanov_stack(u_l: jnp.ndarray, u_r: jnp.ndarray, gamma: float, ch):
    """Face-frame GLM-MHD flux on stacked rotated states [9, ...] ->
    (flux [9, ...], max signal speed [...])."""
    f, sp = _rusanov_rows(tuple(u_l[i] for i in range(N_ROWS)),
                          tuple(u_r[i] for i in range(N_ROWS)), gamma, ch)
    return jnp.stack(f), sp


def _conductor_ghost(q_rot: jnp.ndarray) -> jnp.ndarray:
    """Perfect-conductor wall ghost of a rotated [9, ...] state: mirror
    the normal momentum (row 1), keep B, negate psi (row 8)."""
    return jnp.concatenate([q_rot[:1], -q_rot[1:2], q_rot[2:8],
                            -q_rot[8:9]], axis=0)


def _conductor_ghost_unrot(layer: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Conductor ghost of an UNROTATED facing layer: negate the normal
    momentum row (1 + axis) and psi (row 8), keep B — the wall substitute
    for the pre-resolved side layers the fused kernel consumes (the Euler
    analogue is ops/subgrid._mirror_rows)."""
    neg_m = -layer[1 + axis]
    return jnp.concatenate([layer[: 1 + axis], neg_m[None],
                            layer[2 + axis: 8], -layer[8:9]], axis=0)


def _interface_engine(u: jnp.ndarray, volumes: jnp.ndarray,
                      conn, spec: SubgridSpec,
                      n_out: int, iface, unrotate, ghost, u_ext=None,
                      fine_only: bool = False,
                      exclude_equal: bool = False):
    """Surface accumulation over ALL cell interfaces of the block scheme —
    interior stencil, mesh faces (slab exchange incl. 2:1 hanging), and
    boundary groups — parameterized by the interface function.

    u: stacked [9, *ext, Ecap].  iface(u_l, u_r) -> (f [n_out, ...], sp)
    on axis-rotated stacked operands; unrotate(f, axis) restores the lab
    frame; ghost(q_rot) builds the wall ghost.  Returns the inward-
    oriented accumulation D [n_out, *ext, Ecap] (D = -closed-surface
    integral of f·n dA, the RHS sum the RK stages scale by 1/V_cell) and
    the max interface speed.  Mirrors ops/subgrid.inner_divergence_fields
    + outer_apply + boundary_apply, which stay specialized to the Euler
    cell-fields tuple (the transcendental-sharing optimization MHD's
    log-free Rusanov does not need).

    u_ext: halo-EXTENDED state [9, *ext, Ecap+H] for the sharded path
    (conn is then a ShardedSubgridConnectivity whose neighbor tables and
    wall cell indices address the extended element axis; see
    parallel/subgrid._halo_exchange_state).  Default: u itself — the
    single-device case, where the two axes coincide.

    fine_only=True evaluates ONLY the virtual-fine (hanging 2:1) pass —
    the additive term the fused Pallas kernel leaves to XLA (the Euler
    analogue is ops/subgrid.outer_fine_apply); compiled away entirely on
    meshes without finer neighbors.

    exclude_equal=True is the FIRST-ORDER CLOSURE of the MUSCL path:
    interior interfaces and equal-level (rel == 0) mesh faces are the
    second-order core's job (ops/subgrid.muscl_core_rows), so the engine
    evaluates only coarse-neighbor (rel < 0) faces, the virtual-fine
    pass, and walls — the Euler analogue is outer_apply(exclude_equal) +
    boundary_apply."""
    dim = spec.dim
    ext = spec.extent
    n_t = dim - 1
    t_axes = tuple(range(1, 1 + n_t))
    if u_ext is None:
        u_ext = u
    CL = u.shape[-1]

    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    surface = (h_e / ext) ** (dim - 1) * (volumes > 0)   # interior cell face
    area_t = (h_e / ext) ** n_t                          # mesh-face cell face
    area_v = area_t / (2 ** n_t)                         # virtual fine subface

    D = jnp.zeros((n_out,) + u.shape[1:], u.dtype)
    speed = jnp.zeros((), u.dtype)

    for a in range(dim):
        if fine_only and not (conn.has_fine[2 * a] or conn.has_fine[2 * a + 1]):
            continue
        u_rot = axis_rotate9(u_ext, a)
        ax = 1 + a
        u_loc = u_rot[..., :CL]

        if not fine_only and not exclude_equal:
            # ---- interior interfaces (ext-1 per axis) --------------------
            u_l = jax.lax.slice_in_dim(u_loc, 0, ext - 1, axis=ax)
            u_r = jax.lax.slice_in_dim(u_loc, 1, ext, axis=ax)
            f, sp = iface(u_l, u_r)
            f = unrotate(f, a) * surface
            pad_lo = [(0, 0)] * f.ndim
            pad_hi = [(0, 0)] * f.ndim
            pad_lo[ax] = (1, 0)     # f[i-1] lands on cell i
            pad_hi[ax] = (0, 1)     # f[i]   leaves  cell i
            D = D + jnp.pad(f, pad_lo) - jnp.pad(f, pad_hi)
            speed = jnp.maximum(speed, (sp * (surface > 0)).max())

        # ---- mesh faces: slab exchange (ops/subgrid.outer_apply shape) ---
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            if fine_only and not conn.has_fine[k]:
                continue
            nbr, rel, bits, mask = (conn.nbr[k], conn.rel[k],
                                    conn.bits[k], conn.mask[k])
            hi = sign > 0
            my_layer = jax.lax.index_in_dim(u_loc, ext - 1 if hi else 0,
                                            axis=ax, keepdims=False)
            opp_layer = jax.lax.index_in_dim(u_rot, 0 if hi else ext - 1,
                                             axis=ax, keepdims=False)
            nb = sg._gather_layers(opp_layer,
                                   nbr if conn.has_fine[k] else nbr[:, :1])
            base = nb[..., 0]

            contrib = None
            # under exclude_equal pass 1 carries only coarse neighbors:
            # compiled away entirely on sides without any (static bool)
            if not fine_only and not (exclude_equal
                                      and not conn.has_coarse[k]):
                # pass 1: my resolution (equal + coarser neighbors)
                r = rel.reshape((1,) * (base.ndim - 1) + (-1,))
                other = (jnp.where(r < 0,
                                   sg._coarse_window(base, bits, spec),
                                   base)
                         if conn.has_coarse[k] else base)
                q_l, q_r = (my_layer, other) if hi else (other, my_layer)
                f, sp = iface(q_l, q_r)
                w1 = mask * area_t * ((rel < 0) if exclude_equal
                                      else (rel <= 0))
                f = unrotate(f, a) * w1.reshape((1,) * (f.ndim - 1) + (-1,))
                contrib = -f if hi else f
                sp_m = (w1 > 0).reshape((1,) * (f.ndim - 2) + (-1,))
                speed = jnp.maximum(speed, (sp * sp_m).max())

            # pass 2: virtual fine resolution (finer neighbors)
            if conn.has_fine[k]:
                fine = sg._fine_interleave(nb, spec)
                mine = sg._upsample2(my_layer, t_axes)
                q_l, q_r = (mine, fine) if hi else (fine, mine)
                f2, sp2 = iface(q_l, q_r)
                w2 = mask * area_v * (rel > 0)
                f2 = (unrotate(f2, a)
                      * w2.reshape((1,) * (f2.ndim - 1) + (-1,)))
                f2 = sg._pool2(f2, n_t)
                f2 = -f2 if hi else f2
                contrib = f2 if contrib is None else contrib + f2
                sp_m2 = (w2 > 0).reshape((1,) * (f2.ndim - 2) + (-1,))
                speed = jnp.maximum(speed, (sp2 * sp_m2).max())

            if contrib is not None:
                D = sg._slab_add(D, contrib.reshape(n_out, -1), a,
                                 layer_hi=hi, spec=spec)

    # ---- boundary groups (walls; ops/subgrid.boundary_apply shape) --------
    if conn.b_groups and not fine_only:
        # flat cell = cell * (extended capacity) + elem
        u_flat = u_ext.reshape(u_ext.shape[0], -1)
        for (axis, sign), bc, ar, br in zip(conn.b_groups, conn.b_cell,
                                            conn.b_area, conn.b_recv):
            q_own = axis_rotate9(u_flat[:, bc], axis)
            q_ghost = ghost(q_own)
            if sign > 0:    # outward normal +axis: owner is the left state
                f, sp = iface(q_own, q_ghost)
            else:
                f, sp = iface(q_ghost, q_own)
            f = unrotate(f, axis) * ar
            f_pad = jnp.concatenate([f, jnp.zeros((n_out, 1), f.dtype)],
                                    axis=1)
            c = f_pad[:, br]
            D = sg._slab_add(D, -c if sign > 0 else c, axis,
                             layer_hi=sign > 0, spec=spec)
            speed = jnp.maximum(speed, (sp * (ar > 0)).max())
    return D, speed


def mhd_side_inputs(u: jnp.ndarray, conn, spec: SubgridSpec,
                    volumes: jnp.ndarray, ch, u_ext=None):
    """Inputs for ops.pallas_kernels.fused_mhd_flux_pallas: per side the
    RESOLVED equal/coarse neighbor facing layer as 9-row STATE slabs
    [9, *t_ext, E] (gather + coarse-window, identical to the engine's
    pass 1; wall sides carry the conductor ghost of the own layer), plus
    the packed per-element weights [8, E]: row 0 = interior cell surface,
    rows 1+k = side-k mesh-face weight mask*area*(rel<=0) [+ wall area on
    wall sides], row 7 = the global cleaning speed c_h (broadcast — the
    kernel has no other scalar operand channel).  Mirrors
    ops/subgrid.pallas_side_inputs / _state_side_layers.
    `u_ext` supplies the gather source on the halo-extended element axis
    (the sharded path); defaults to u."""
    dim = spec.dim
    ext = spec.extent
    if u_ext is None:
        u_ext = u
    h_e = jnp.where(volumes > 0, volumes, 1.0) ** (1.0 / dim)
    surface = ((h_e / ext) ** (dim - 1)) * (volumes > 0)
    area_t = (h_e / ext) ** (dim - 1)
    walls = sg._wall_masks(conn, spec, volumes)

    others = []
    w_rows = [surface]
    for a in range(dim):
        for s_i, sign in ((0, 1), (1, -1)):
            k = 2 * a + s_i
            nbr, rel, bits, mask = (conn.nbr[k], conn.rel[k],
                                    conn.bits[k], conn.mask[k])
            hi = sign > 0
            # layers are stored in UNROTATED rows (the kernel rotates)
            opp_layer = jax.lax.index_in_dim(
                u_ext, 0 if hi else ext - 1, axis=1 + a, keepdims=False)
            # pass 1 only ever reads quadrant 0 (the fine pass re-gathers)
            base = sg._gather_layers(opp_layer, nbr[:, :1])[..., 0]
            if conn.has_coarse[k]:
                r_b = rel.reshape((1,) * (base.ndim - 1) + (-1,))
                base = jnp.where(r_b < 0,
                                 sg._coarse_window(base, bits, spec), base)
            w = mask * area_t * (rel <= 0)
            if walls is not None:
                wall_b = walls[k].reshape((1,) * (base.ndim - 1) + (-1,))
                own_layer = jax.lax.index_in_dim(
                    u, ext - 1 if hi else 0, axis=1 + a, keepdims=False)
                sub = _conductor_ghost_unrot(own_layer, a)
                base = jnp.where(wall_b > 0, sub, base)
                w = w + walls[k] * area_t
            others.append(base)
            w_rows.append(w)
    while len(w_rows) < 7:           # fixed [8, E] block for the kernel
        w_rows.append(jnp.zeros_like(surface))
    w_rows.append(jnp.broadcast_to(ch, surface.shape))   # row 7: c_h
    return tuple(others), jnp.stack(w_rows)


@functools.partial(jax.jit,
                   static_argnames=("spec", "gamma", "alpha", "use_pallas"))
def mhd_subgrid_divergence(u: jnp.ndarray, volumes: jnp.ndarray,
                           conn: SubgridConnectivity, spec: SubgridSpec,
                           gamma: float, alpha: float, use_pallas=None):
    """Full GLM-MHD surface-flux divergence for the subgrid scheme:
    u [9, *ext, Ecap] -> (D [9, *ext, Ecap], max signal speed).

    c_h is recomputed from `u` (zero staleness, models/mhd.glm_ch) and
    threads through every interface; the GLM damping source lands on the
    psi row scaled by the CELL volume (the RK stages divide by it).

    On TPU backends (ops/pallas_kernels.kernel_mode) with ext 4/8, the
    interior + equal/coarse mesh-face + wall interfaces run as ONE fused
    VMEM-resident Pallas kernel per evaluation
    (fused_mhd_flux_pallas); hanging-fine subfaces remain the XLA
    additive pass (the engine's fine_only mode), exactly mirroring the
    Euler flux_divergence dispatch.  The XLA engine is the fallback and
    the CPU-test surface."""
    from t8gpu_tpu.ops.pallas_kernels import kernel_mode
    mode = kernel_mode()
    if use_pallas is None:
        use_pallas = mode != "off"
    live = volumes > 0
    ch = jnp.maximum(glm_ch(u, gamma, live), 1e-12)
    iface = lambda l, r: _rusanov_stack(l, r, gamma, ch)
    if use_pallas and spec.extent in (4, 8):
        from t8gpu_tpu.ops.pallas_kernels import fused_mhd_flux_pallas
        others, weights = mhd_side_inputs(u, conn, spec, volumes, ch)
        D, sp_e = fused_mhd_flux_pallas(u, weights, others, gamma=gamma,
                                        interpret=mode == "interpret")
        speed = sp_e.max()
        if any(conn.has_fine):
            D2, sp_f = _interface_engine(u, volumes, conn, spec, N_ROWS,
                                         iface, axis_unrotate9,
                                         _conductor_ghost, fine_only=True)
            D = D + D2
            speed = jnp.maximum(speed, sp_f)
    else:
        D, speed = _interface_engine(u, volumes, conn, spec, N_ROWS, iface,
                                     axis_unrotate9, _conductor_ghost)
    if alpha > 0.0:
        h_cell = (jnp.where(live, volumes, 1.0) ** (1.0 / spec.dim)
                  / spec.extent)
        cell_vol = volumes / spec.size
        D = D.at[8].add(-alpha * ch * u[8] * (cell_vol / h_cell) * live)
    return D, speed


def mhd_muscl_engine(u: jnp.ndarray, u_src: jnp.ndarray,
                     volumes: jnp.ndarray, conn, spec: SubgridSpec,
                     gamma: float, ch, limiter: str = "minmod",
                     positivity: bool = True):
    """Second-order GLM-MHD surface accumulation for the block scheme,
    shared by the single-device and sharded paths (u_src is the gather
    source: u itself, or the halo-extended axis per shard).

    The 9-row system rides the ROW-GENERIC per-axis MUSCL core
    (ops/subgrid.muscl_core_rows — the identical code path the subgrid
    Euler order-2 scheme runs) with the permutation rotation, the
    ch-threaded Rusanov + exact-GLM interface flux, and the MHD
    admissibility guard (THERMAL-pressure positivity,
    models/mhd._mhd_guard); hanging (2:1) faces and walls take the
    first-order closure through `_interface_engine(exclude_equal=True)`
    — coarse faces, virtual-fine subfaces and conductor walls only.
    Returns (D [9, *ext, E], max signal speed); the GLM damping source
    is the caller's (it needs the pmax'd ch on shards)."""
    from t8gpu_tpu.models.mhd import _mhd_guard
    from t8gpu_tpu.ops.pallas_kernels import kernel_mode

    iface = lambda l, r: _rusanov_stack(l, r, gamma, ch)
    mode = kernel_mode()
    if (mode != "off" and spec.extent in (4, 8)
            and limiter in ("minmod", "none")):
        # fused Pallas path (round 4): reconstruction + GLM interface
        # solve VMEM-resident, mirroring the Euler fused MUSCL kernel
        from t8gpu_tpu.ops.pallas_kernels import fused_mhd_muscl_pallas
        others, weights = sg.muscl_side_inputs(u, conn, spec, volumes,
                                               u_src=u_src)
        weights = weights.at[7].set(ch)
        D, sp_e = fused_mhd_muscl_pallas(
            u, weights, others, gamma=gamma, limiter=limiter,
            positivity=positivity, interpret=mode == "interpret")
        speed = sp_e.max()
    else:
        if positivity:
            guard = lambda rec, first: _mhd_guard(rec, first, gamma)
        else:
            guard = lambda rec, first: rec
        D, speed = sg.muscl_core_rows(
            u, u_src, volumes, conn, spec, n_rows=N_ROWS,
            rotate=axis_rotate9, unrotate=axis_unrotate9,
            iface=iface, guard=guard, limiter=limiter)
    D2, sp2 = _interface_engine(u, volumes, conn, spec, N_ROWS, iface,
                                axis_unrotate9, _conductor_ghost,
                                u_ext=u_src, exclude_equal=True)
    return D + D2, jnp.maximum(speed, sp2)


@functools.partial(jax.jit,
                   static_argnames=("spec", "gamma", "alpha", "limiter",
                                    "positivity"))
def mhd_subgrid_divergence_muscl(u: jnp.ndarray, volumes: jnp.ndarray,
                                 conn: SubgridConnectivity,
                                 spec: SubgridSpec, gamma: float,
                                 alpha: float, limiter: str = "minmod",
                                 positivity: bool = True):
    """Second-order counterpart of mhd_subgrid_divergence
    (`SubgridMHDSolver(order=2)`): limited per-axis MUSCL reconstruction
    feeding the SAME Rusanov + exact-GLM flux, c_h fresh from the cell
    states (reconstruction never raises the cleaning speed), the GLM
    damping unchanged.  Beyond-reference on three axes at once: the
    reference ships neither MHD, nor any second-order scheme, nor more
    than one physics on its subgrid machinery (SURVEY §2.2,
    kernels.cu:150-172, examples/subgrid/solver.h:32)."""
    live = volumes > 0
    ch = jnp.maximum(glm_ch(u, gamma, live), 1e-12)
    D, speed = mhd_muscl_engine(u, u, volumes, conn, spec, gamma, ch,
                                limiter=limiter, positivity=positivity)
    if alpha > 0.0:
        h_cell = (jnp.where(live, volumes, 1.0) ** (1.0 / spec.dim)
                  / spec.extent)
        cell_vol = volumes / spec.size
        D = D.at[8].add(-alpha * ch * u[8] * (cell_vol / h_cell) * live)
    return D, speed


@functools.partial(jax.jit, static_argnames=("spec",))
def subgrid_divergence_b(u: jnp.ndarray, volumes: jnp.ndarray,
                         conn: SubgridConnectivity, spec: SubgridSpec):
    """Per-cell Green-Gauss div B [*ext, Ecap] (zero on padded slots) —
    the constraint-violation diagnostic GLM exists to control, through the
    SAME surface decomposition as the flux (models/mhd.divergence_b is the
    plain-path analogue).  Interface value = avg of the two B_n; the
    conductor ghost keeps B, so wall faces use the owner's B_n."""
    iface = lambda l, r: ((0.5 * (l[5] + r[5]))[None],
                          jnp.zeros_like(l[0]))
    D, _ = _interface_engine(u, volumes, conn, spec, 1, iface,
                             lambda f, a: f, lambda q: q)
    live = volumes > 0
    cell_vol = jnp.where(live, volumes, 1.0) / spec.size
    # engine accumulation is inward-oriented: div B = -D / V_cell
    return jnp.where(live, -D[0] / cell_vol, 0.0)
