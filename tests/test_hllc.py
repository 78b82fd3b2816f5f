"""HLLC flux (ops/euler.hllc_fields_flux): consistency, contact
restoration (the property HLL lacks), end-to-end conservation on plain
and subgrid paths.

Beyond-reference: the reference ships KEPES + an unused HLL
(kernels.inl:264-332); HLLC restores the contact wave so material
interfaces and shear layers are not smeared.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.ops import euler
from t8gpu_tpu.utils.config import EulerConfig

GAMMA = 1.4


def _state(rho, u, v, w, p):
    E = p / (GAMMA - 1) + 0.5 * rho * (u * u + v * v + w * w)
    return jnp.asarray([[rho], [rho * u], [rho * v], [rho * w], [E]],
                       jnp.float32)


class TestHLLCFlux:
    def test_consistency(self):
        """F(u, u) equals the exact Euler flux."""
        rho, u, v, w, p = 1.3, 0.7, -0.2, 0.4, 2.1
        U = _state(rho, u, v, w, p)
        f, speed = euler.hllc_flux(U, U, GAMMA)
        E = p / (GAMMA - 1) + 0.5 * rho * (u * u + v * v + w * w)
        exact = np.array([rho * u, rho * u * u + p, rho * u * v,
                          rho * u * w, u * (E + p)])
        np.testing.assert_allclose(np.asarray(f).ravel(), exact,
                                   rtol=1e-5, atol=1e-5)
        assert float(speed[0]) > 0

    def test_stationary_contact_exact(self):
        """rho jump, u = 0, equal p: HLLC returns the exact flux
        [0, p, 0, 0, 0]; HLL smears it (nonzero mass flux)."""
        p = 2.1
        UL = _state(1.0, 0, 0, 0, p)
        UR = _state(3.0, 0, 0, 0, p)
        fc, _ = euler.hllc_flux(UL, UR, GAMMA)
        assert abs(float(fc[0, 0])) < 1e-6
        np.testing.assert_allclose(float(fc[1, 0]), p, rtol=1e-5)
        assert abs(float(fc[2, 0])) < 1e-6

        fh, _ = euler.hll_flux(UL, UR, GAMMA)
        assert abs(float(fh[0, 0])) > 0.1       # HLL's contact diffusion

    def test_stationary_shear_exact(self):
        """Tangential-velocity jump at rest: HLLC passes it through
        undiffused (momentum-v flux = 0)."""
        p = 1.0
        UL = _state(1.0, 0, +0.5, 0, p)
        UR = _state(1.0, 0, -0.5, 0, p)
        fc, _ = euler.hllc_flux(UL, UR, GAMMA)
        assert abs(float(fc[2, 0])) < 1e-6
        fh, _ = euler.hll_flux(UL, UR, GAMMA)
        assert abs(float(fh[2, 0])) > 0.05

    def test_supersonic_upwind(self):
        """Fully supersonic left-moving-right flow: HLLC == exact left
        flux (pure upwinding)."""
        rho, u, p = 1.0, 5.0, 1.0       # M ~ 4.2
        UL = _state(rho, u, 0, 0, p)
        UR = _state(0.5, u, 0, 0, 0.7)
        f, _ = euler.hllc_flux(UL, UR, GAMMA)
        E = p / (GAMMA - 1) + 0.5 * rho * u * u
        exact = np.array([rho * u, rho * u * u + p, 0, 0, u * (E + p)])
        np.testing.assert_allclose(np.asarray(f).ravel(), exact,
                                   rtol=1e-5, atol=1e-5)


class TestHLLCSolver:
    def test_contact_preserved_end_to_end(self):
        """A stationary density interface advances unchanged under HLLC
        but visibly diffuses under HLL (the scheme-level consequence)."""
        def contact_ic(c):
            x = c[:, 0]
            rho = np.where((x > 0.25) & (x < 0.75), 2.0, 1.0)
            p = np.ones_like(x)
            z = np.zeros_like(x)
            return np.stack([rho, z, z, z, p / (GAMMA - 1)]).astype(np.float32)

        drifts = {}
        for flux in ("hllc", "hll"):
            mesh = uniform_mesh(5, dim=2, periodic=True)
            s = CompressibleEulerSolver(mesh, contact_ic,
                                        config=EulerConfig(flux=flux))
            rho0 = s.conserved_state()[0].copy()
            for _ in range(30):
                s.iterate(2e-3)
            drifts[flux] = float(np.abs(s.conserved_state()[0] - rho0).max())
        assert drifts["hllc"] < 1e-5, drifts
        assert drifts["hll"] > 0.01, drifts

    def test_kh_conservation_plain(self):
        mesh = uniform_mesh(4, dim=2, periodic=True)
        s = CompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2),
                                    config=EulerConfig(flux="hllc"))
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(25):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()

    def test_kh_conservation_subgrid(self):
        from t8gpu_tpu.memory.subgrid import SUBGRID_4x4
        from t8gpu_tpu.mesh.forest import Forest
        from t8gpu_tpu.mesh.subgrid import SubgridMesh
        from t8gpu_tpu.models.subgrid_euler import (
            SubgridCompressibleEulerSolver)

        mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2),
                                       SUBGRID_4x4)
        s = SubgridCompressibleEulerSolver(
            mesh, lambda c: kh_planar(c, dim=2),
            config=EulerConfig(flux="hllc"))
        m0 = s.compute_integral()
        dt = s.compute_timestep()
        for _ in range(25):
            s.iterate(dt)
        assert abs(s.compute_integral() - m0) / m0 < 1e-5
        assert np.isfinite(s.conserved_state()).all()

    def test_muscl_hllc_order2(self):
        """HLLC composes with the second-order reconstruction."""
        def wave_ic(c):
            x = c[:, 0]
            rho = 1.0 + 0.2 * np.sin(2 * np.pi * x)
            p = np.ones_like(x)
            u = np.ones_like(x)
            return np.stack([rho, rho * u, 0 * x, 0 * x,
                             p / (GAMMA - 1) + 0.5 * rho]).astype(np.float32)

        errs = []
        for level in (4, 5):
            mesh = uniform_mesh(level, dim=2, periodic=True)
            s = CompressibleEulerSolver(
                mesh, wave_ic,
                config=EulerConfig(flux="hllc", order=2, limiter="none"))
            dt = 0.2 * mesh.h / 2.4
            n = int(round(0.1 / dt))
            s.iterate_many(n, 0.1 / n)
            rho = s.conserved_state()[0]
            exact = 1.0 + 0.2 * np.sin(2 * np.pi * (mesh.centers[:, 0] - 0.1))
            errs.append(float(np.sqrt(np.mean((rho - exact) ** 2))))
        assert np.log2(errs[0] / errs[1]) > 1.7, errs
