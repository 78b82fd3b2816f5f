"""Pallas inner-flux kernel == XLA stencil (interpret mode on the CPU
test mesh; bit-exactness on real TPU verified manually)."""

import jax.numpy as jnp
import numpy as np
import pytest

from t8gpu_tpu.memory.subgrid import SUBGRID_4x4, SUBGRID_4x4x4
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
from t8gpu_tpu.ops import subgrid as sg
from t8gpu_tpu.ops.pallas_kernels import inner_divergence_pallas


@pytest.mark.parametrize("dim,spec", [(2, SUBGRID_4x4), (3, SUBGRID_4x4x4)])
@pytest.mark.parametrize("flux", ["kepes", "hll"])
def test_pallas_inner_matches_xla(dim, spec, flux):
    mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=dim), spec)
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=dim))
    D0, sp0 = sg.inner_divergence(s.u, s.volumes, spec, 1.4, flux)
    D1, sp1 = inner_divergence_pallas(s.u, s.volumes, spec, 1.4, flux,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(sp1), float(sp0), rtol=1e-6)
