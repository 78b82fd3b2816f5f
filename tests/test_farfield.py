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
