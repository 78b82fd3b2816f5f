"""Fused viscous (Navier-Stokes) Pallas kernel equivalence
(ops/pallas_kernels._tile_viscous_divergence): the in-VMEM viscous
divergence added to the RK-fused stage kernels == the XLA pass
(ops/subgrid_viscous.viscous_divergence) to fp tolerance, in interpret
mode on the CPU test mesh — single-device AND sharded dispatch, walls
and both block extents.  Beyond-reference (the reference's subgrid
kernels are inviscid, examples/subgrid/kernels.inl:335-911).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import t8gpu_tpu.ops.subgrid as sg
from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
from t8gpu_tpu.ops.rk import ssp_rk3
from t8gpu_tpu.utils.config import EulerConfig

GAMMA = 1.4
MU = 3e-3


def wavy_ic(c):
    """Smooth non-trivial state exercising every stress component."""
    dim = c.shape[1]
    x, y = c[:, 0], c[:, 1]
    z = c[:, 2] if dim == 3 else np.zeros_like(x)
    rho = 1.0 + 0.1 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * z)
    vx = 0.2 * np.sin(2 * np.pi * y)
    vy = 0.1 * np.cos(2 * np.pi * x)
    vz = (0.05 * np.sin(2 * np.pi * x)) if dim == 3 else np.zeros_like(x)
    p = 1.0 + 0.05 * np.cos(2 * np.pi * y)
    e = p / (GAMMA - 1) + 0.5 * rho * (vx**2 + vy**2 + vz**2)
    return np.stack([rho, rho * vx, rho * vy, rho * vz, e]).astype(
        np.float32)


def _ref_step(s, spec, dt, mu, prandtl=0.72):
    """rk.ssp_rk3 over the XLA stencil + XLA viscous pass, with the same
    summed diffusive speed bound the fused path folds in."""
    from t8gpu_tpu.ops.subgrid_viscous import viscous_divergence

    dim = spec.dim

    def flux_fn(v):
        d, sp = sg.flux_divergence(v, s.volumes, s.conn, spec, GAMMA,
                                   "kepes", use_pallas=False)
        d = d + viscous_divergence(v, s.volumes, s.conn, spec, GAMMA,
                                   mu, prandtl)
        live = s.volumes > 0
        rho_min = jnp.where(live, v[0].min(
            axis=tuple(range(v.ndim - 2))), jnp.inf).min()
        h_min = (jnp.where(live, s.volumes, jnp.inf).min()
                 ** (1.0 / dim)) / spec.extent
        nu = (mu / rho_min) * max(1.0, GAMMA / prandtl)
        return d, sp + 2.0 * dim * nu / h_min

    return ssp_rk3(s.u, flux_fn, dt, s.inv_cell_volume)


@pytest.mark.parametrize("dim,ext,periodic", [
    (2, 8, True), (2, 4, False), (3, 8, False), (3, 4, True)])
def test_fused_viscous_matches_xla(dim, ext, periodic):
    """One viscous RK3 step through the fused stage kernels (interpret
    mode) == the XLA stencil + viscous pass, on periodic and walled
    uniform meshes at both supported block extents."""
    spec = SubgridSpec((ext,) * dim)
    forest = Forest.uniform(2 if dim == 2 else 1, dim=dim,
                            periodic=periodic)
    mesh = SubgridMesh.from_forest(forest, spec)
    s = SubgridCompressibleEulerSolver(mesh, wavy_ic)
    dt = jnp.float32(1e-4)

    u_ref, sp_ref = _ref_step(s, spec, dt, MU)

    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        u_f, sp_f = sg.ssp_rk3_fused(s.u, s.volumes, s.conn, spec, GAMMA,
                                     "kepes", dt, s.inv_cell_volume,
                                     mu=MU, prandtl=0.72)
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    n = s.n_elements
    np.testing.assert_allclose(np.asarray(u_f[..., :n]),
                               np.asarray(u_ref[..., :n]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(sp_f), float(sp_ref), rtol=1e-5)


def test_solver_routes_viscous_through_fused_kernels():
    """SubgridCompressibleEulerSolver with mu > 0: the interpret-mode run
    (fused viscous stage kernels) matches the default XLA run step for
    step — the _fused_path dispatch is transparent to users."""
    spec = SubgridSpec((8, 8))
    mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2), spec)
    cfg = EulerConfig(mu=MU)
    dt = 1e-4

    a = SubgridCompressibleEulerSolver(mesh, wavy_ic, config=cfg)
    for _ in range(3):
        a.iterate(dt)
    u_xla = a.conserved_state().copy()

    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        b = SubgridCompressibleEulerSolver(mesh, wavy_ic, config=cfg)
        for _ in range(3):
            b.iterate(dt)
        u_fused = b.conserved_state().copy()
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    np.testing.assert_allclose(u_fused, u_xla, rtol=2e-5, atol=2e-6)


def test_sharded_fused_viscous_matches_single():
    """Sharded viscous RK-fused stepping (the in-VMEM viscous divergence
    inside shard_map, side layers from the halo-extended axis) ==
    single-device, interpret mode."""
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

    spec = SubgridSpec((8, 8))
    f = Forest.uniform(3, dim=2, periodic=(False, True))
    cfg = EulerConfig(mu=MU)
    dt = 1e-4

    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        ref = SubgridCompressibleEulerSolver(
            SubgridMesh.from_forest(f, spec), wavy_ic, config=cfg)
        sh = ShardedSubgridEulerSolver(f, spec, wavy_ic, config=cfg,
                                       devices=jax.devices()[:4])
        for _ in range(3):
            ref.iterate(dt)
            sh.iterate(dt)
        u_ref = ref.conserved_state().reshape(5, -1)
        u_sh = sh.conserved_state().reshape(5, -1)
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    np.testing.assert_allclose(u_sh, u_ref, rtol=2e-5, atol=2e-6)
