"""Farfield (open) boundaries: EulerConfig(boundary="farfield") replaces
the reflective mirror ghost with a prescribed exterior state, letting
waves LEAVE the domain (beyond-reference: the reference only has
reflective walls and periodic bricks).
"""

import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.utils.config import EulerConfig

GAMMA = 1.4
FF = (1.0, 0.5, 0.0, 0.0, 1.0)      # rho, vx, vy, vz, p


def uni_ic(c):
    rho, vx, vy, vz, p = FF
    r = np.full(len(c), rho, np.float32)
    e = p / (GAMMA - 1) + 0.5 * rho * (vx ** 2 + vy ** 2 + vz ** 2)
    return np.stack([r, rho * vx * np.ones_like(r),
                     rho * vy * np.ones_like(r),
                     rho * vz * np.ones_like(r), np.full_like(r, e)])


def bump_ic(c):
    u = uni_ic(c)
    g = 0.3 * np.exp(-200 * ((c[:, 0] - 0.5) ** 2
                             + (c[:, 1] - 0.5) ** 2)).astype(np.float32)
    u[0] += g
    u[4] += g / (GAMMA - 1)
    return u


CFG = EulerConfig(flux="hllc", boundary="farfield", farfield=FF)


def test_free_stream_passes_through():
    """A uniform moving state is EXACTLY preserved: the farfield ghost
    equals the interior, so the boundary flux is the exact upwind flux
    of the free stream (with reflective walls it would bounce)."""
    mesh = uniform_mesh(5, dim=2, periodic=False)
    s = CompressibleEulerSolver(mesh, uni_ic, config=CFG)
    u0 = s.conserved_state().copy()
    for _ in range(10):
        s.iterate(2e-3)
    assert np.abs(s.conserved_state() - u0).max() < 1e-5


def test_bump_exits_without_reflection():
    """A density/energy bump advects out of the open domain: the field
    relaxes back to the exterior state (residual < 1e-4 — reflective
    walls would trap the acoustic energy forever)."""
    mesh = uniform_mesh(5, dim=2, periodic=False)
    s = CompressibleEulerSolver(mesh, bump_ic, config=CFG)
    dt = s.compute_timestep()
    # 700 steps at the axis-summed CFL dt ~ the physical horizon the
    # original 300 steps covered at the (unstable) max-speed dt
    s.iterate_many(700, dt)
    u = s.conserved_state()
    assert np.isfinite(u).all()
    assert np.abs(u[0][: mesh.n_elements] - FF[0]).max() < 1e-4


def test_order2_and_sharded_match():
    """Farfield composes with MUSCL; the sharded path (ghost fields
    broadcast per shard) == single-device."""
    import jax

    from t8gpu_tpu.mesh.forest import Forest, ForestMesh
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    cfg = EulerConfig(flux="hllc", boundary="farfield", farfield=FF,
                      order=2)
    f = Forest.uniform(4, dim=2, periodic=False)
    ref = CompressibleEulerSolver(ForestMesh.from_forest(f), bump_ic,
                                  config=cfg)
    sh = ShardedEulerSolver(f, bump_ic, config=cfg,
                            devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(),
                               ref.conserved_state()[:, : f.n_elements],
                               rtol=2e-5, atol=2e-6)


def test_validation_errors():
    mesh = uniform_mesh(3, dim=2, periodic=False)
    with pytest.raises(ValueError, match="farfield"):
        CompressibleEulerSolver(mesh, uni_ic,
                                config=EulerConfig(boundary="farfield"))
    with pytest.raises(ValueError, match="no-slip"):
        CompressibleEulerSolver(
            mesh, uni_ic,
            config=EulerConfig(boundary="farfield", farfield=FF,
                               mu=1e-3, wall="noslip"))


# ---------------------------------------------------------------------------
# Subgrid path: the farfield ghost substitutes the mirror in the side-layer
# builders (ops/subgrid._state_side_layers / pallas_side_inputs /
# boundary_apply), so open boundaries ride both the XLA stencil and the
# fused Pallas kernels.
# ---------------------------------------------------------------------------


def _sg_mesh(level=2, ext=8):
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh

    f = Forest.uniform(level, dim=2, periodic=False)
    return SubgridMesh.from_forest(f, SubgridSpec((ext, ext)))


def test_subgrid_free_stream_passes_through():
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    s = SubgridCompressibleEulerSolver(_sg_mesh(), uni_ic, config=CFG)
    u0 = s.conserved_state().copy()
    for _ in range(10):
        s.iterate(2e-3)
    assert np.abs(s.conserved_state() - u0).max() < 1e-5


def test_subgrid_bump_exits_without_reflection():
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    mesh = _sg_mesh(level=2, ext=8)          # 32 cells/axis
    s = SubgridCompressibleEulerSolver(mesh, bump_ic, config=CFG)
    dt = s.compute_timestep()
    s.iterate_many(700, dt)
    u = s.conserved_state()
    assert np.isfinite(u).all()
    assert np.abs(u[0] - FF[0]).max() < 1e-4


def test_subgrid_farfield_fused_matches_stencil():
    """T8GPU_PALLAS=interpret (farfield ghost as the kernels' wall side
    layers) == the XLA stencil path, order 1 and order 2."""
    import os

    import jax

    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    for order in (1, 2):
        cfg = EulerConfig(flux="hllc", boundary="farfield", farfield=FF,
                          order=order)
        mesh = _sg_mesh()
        s0 = SubgridCompressibleEulerSolver(mesh, bump_ic, config=cfg)
        for _ in range(3):
            s0.iterate(1e-3)
        u_ref = s0.conserved_state()

        os.environ["T8GPU_PALLAS"] = "interpret"
        jax.clear_caches()
        try:
            s1 = SubgridCompressibleEulerSolver(mesh, bump_ic, config=cfg)
            for _ in range(3):
                s1.iterate(1e-3)
            u_kern = s1.conserved_state()
        finally:
            os.environ.pop("T8GPU_PALLAS", None)
            jax.clear_caches()
        np.testing.assert_allclose(u_kern.reshape(5, -1),
                                   u_ref.reshape(5, -1),
                                   rtol=2e-5, atol=2e-6)


def test_subgrid_farfield_sharded_matches_single():
    import jax

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

    spec = SubgridSpec((4, 4))
    f = Forest.uniform(3, dim=2, periodic=False)
    ref = SubgridCompressibleEulerSolver(SubgridMesh.from_forest(f, spec),
                                         bump_ic, config=CFG)
    sh = ShardedSubgridEulerSolver(f, spec, bump_ic, config=CFG,
                                   devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state().reshape(5, -1),
                               ref.conserved_state().reshape(5, -1),
                               rtol=2e-5, atol=2e-6)


def test_subgrid_validation_errors():
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    mesh = _sg_mesh()
    with pytest.raises(ValueError, match="farfield"):
        s = SubgridCompressibleEulerSolver(
            mesh, uni_ic, config=EulerConfig(boundary="farfield"))
        s.iterate(1e-3)
    with pytest.raises(ValueError, match="no-slip"):
        s = SubgridCompressibleEulerSolver(
            mesh, uni_ic,
            config=EulerConfig(boundary="farfield", farfield=FF,
                               mu=1e-3, wall="noslip"))
        s.iterate(1e-3)
