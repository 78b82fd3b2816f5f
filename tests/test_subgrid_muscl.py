"""Second-order MUSCL on the subgrid path (ops/subgrid.flux_divergence_muscl):
convergence, conservation across element and hanging faces, free-stream,
wall stability.  Beyond-reference: the reference's subgrid kernels consume
cell states directly (kernels.inl:335-911) and are first order.
"""

import numpy as np
import pytest

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.initial_conditions import kh_planar
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
from t8gpu_tpu.utils.config import EulerConfig

GAMMA, T_END = 1.4, 0.1


def wave_ic(x):
    rho = 1.0 + 0.2 * np.sin(2 * np.pi * x)
    p = np.ones_like(x)
    u = np.ones_like(x)
    return np.stack([rho, rho * u, 0 * x, 0 * x,
                     p / (GAMMA - 1) + 0.5 * rho * u * u]).astype(np.float32)


def exact_rho(x, t):
    return 1.0 + 0.2 * np.sin(2 * np.pi * (x - t))


def _converge(limiter):
    errs = []
    for level in (2, 3, 4):
        mesh = SubgridMesh.from_forest(Forest.uniform(level, dim=2),
                                       SubgridSpec((4, 4)))
        s = SubgridCompressibleEulerSolver(
            mesh, lambda c: wave_ic(c[:, 0]),
            config=EulerConfig(order=2, limiter=limiter))
        h = 0.5 ** level / 4
        dt = 0.2 * h / 2.4
        n = int(round(T_END / dt))
        s.iterate_many(n, T_END / n)
        rho = s.conserved_state()[0].reshape(-1)
        cc = mesh.cell_centers()
        errs.append(float(np.sqrt(np.mean(
            (rho - exact_rho(cc[:, 0], T_END)) ** 2))))
    return errs


def test_second_order_unlimited():
    """Unlimited central slopes: clean order ~2 — and the SAME errors as
    the plain-element order-2 path at equal resolution (the two paths
    discretize the identical scheme on uniform meshes)."""
    errs = _converge("none")
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(orders) > 1.9, (errs, orders)


def test_second_order_minmod():
    """Minmod clips at smooth extrema (classic ~1.5-1.7 observed L2
    order) but still far below first order's error."""
    errs = _converge("bj")          # mapped to the subgrid minmod variant
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(orders) > 1.4, (errs, orders)
    # 1st-order error at the finest level for comparison
    mesh = SubgridMesh.from_forest(Forest.uniform(4, dim=2),
                                   SubgridSpec((4, 4)))
    s1 = SubgridCompressibleEulerSolver(mesh, lambda c: wave_ic(c[:, 0]))
    h = 0.5 ** 4 / 4
    dt = 0.2 * h / 2.4
    n = int(round(T_END / dt))
    s1.iterate_many(n, T_END / n)
    rho = s1.conserved_state()[0].reshape(-1)
    err1 = float(np.sqrt(np.mean(
        (rho - exact_rho(mesh.cell_centers()[:, 0], T_END)) ** 2)))
    assert errs[-1] < err1 / 3, (errs[-1], err1)


def test_conservation_hanging_mesh():
    """Element + hanging (2:1) faces: exact mass conservation — equal
    faces get the symmetric 4-layer reconstruction, hanging faces the
    first-order closure, both computing identical values on both sides."""
    f = Forest.uniform(2, dim=2)
    c = f.centers()
    flags = np.where((c[:, 1] > 0.4) & (c[:, 1] < 0.6), 1, 0)
    f2, _ = f.adapt(f.balance_flags(flags.astype(np.int32)))
    mesh = SubgridMesh.from_forest(f2, SubgridSpec((4, 4)))
    s = SubgridCompressibleEulerSolver(mesh, lambda cc: kh_planar(cc, dim=2),
                                       config=EulerConfig(order=2))
    m0 = s.compute_integral()
    dt = s.compute_timestep()
    for _ in range(20):
        s.iterate(dt)
    assert abs(s.compute_integral() - m0) / m0 < 1e-5
    assert np.isfinite(s.conserved_state()).all()


def test_free_stream_hanging_mesh():
    """Uniform state => all slopes zero => order 2 reduces exactly to the
    (free-stream-preserving) first-order scheme on hanging meshes."""
    f = Forest.uniform(2, dim=2)
    c = f.centers()
    f2, _ = f.adapt(f.balance_flags(
        np.where(c[:, 0] > 0.5, 1, 0).astype(np.int32)))
    mesh = SubgridMesh.from_forest(f2, SubgridSpec((4, 4)))

    def uniform_ic(cc):
        u = np.zeros((5, len(cc)), np.float32)
        u[0] = 1.0
        u[4] = 2.5
        return u

    s = SubgridCompressibleEulerSolver(mesh, uniform_ic,
                                       config=EulerConfig(order=2))
    u0 = s.conserved_state().copy()
    for _ in range(5):
        s.iterate(1e-3)
    assert np.abs(s.conserved_state() - u0).max() < 1e-6


def test_walls_stable_3d():
    """Non-periodic 3D mesh: reflective walls use the first-order closure;
    the run stays finite and conserves mass."""
    mesh = SubgridMesh.from_forest(Forest.uniform(1, dim=3, periodic=False),
                                   SubgridSpec((4, 4, 4)))
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=3),
                                       config=EulerConfig(order=2))
    m0 = s.compute_integral()
    dt = s.compute_timestep()
    for _ in range(15):
        s.iterate(dt)
    assert abs(s.compute_integral() - m0) / m0 < 1e-5
    assert np.isfinite(s.conserved_state()).all()


@pytest.mark.parametrize("dim,ext", [(2, 4), (2, 8), (3, 4), (3, 8)])
@pytest.mark.parametrize("limiter", ["minmod", "none"])
def test_fused_muscl_kernel_matches_stencil(dim, ext, limiter):
    """fused_muscl_pallas (interpret mode) == muscl_core on uniform
    periodic meshes: the in-VMEM reconstruction + interface math is the
    same discretization as the XLA stencil."""
    from t8gpu_tpu.ops import subgrid as sg
    from t8gpu_tpu.ops.pallas_kernels import fused_muscl_pallas

    spec = SubgridSpec((ext,) * dim)
    mesh = SubgridMesh.from_forest(
        Forest.uniform(2 if dim == 2 else 1, dim=dim), spec)
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=dim))
    D0, sp0 = sg.muscl_core(s.u, s.u, s.volumes, s.conn, spec, GAMMA,
                            "kepes", limiter)
    others, weights = sg.muscl_side_inputs(s.u, s.conn, spec, s.volumes)
    D1, sp_e = fused_muscl_pallas(s.u, weights, others, gamma=GAMMA,
                                  flux="kepes", limiter=limiter,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(sp_e.max()), float(sp0), rtol=1e-5)


@pytest.mark.parametrize("flux", ["hll", "hllc"])
def test_fused_muscl_kernel_hll_family(flux):
    """The fused MUSCL kernel shares the static flux dispatch: HLL/HLLC
    reconstructed-interface fluxes match the stencil too."""
    from t8gpu_tpu.ops import subgrid as sg
    from t8gpu_tpu.ops.pallas_kernels import fused_muscl_pallas

    spec = SubgridSpec((8, 8))
    mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2), spec)
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2))
    D0, sp0 = sg.muscl_core(s.u, s.u, s.volumes, s.conn, spec, GAMMA,
                            flux, "minmod")
    others, weights = sg.muscl_side_inputs(s.u, s.conn, spec, s.volumes)
    D1, sp_e = fused_muscl_pallas(s.u, weights, others, gamma=GAMMA,
                                  flux=flux, limiter="minmod",
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(sp_e.max()), float(sp0), rtol=1e-5)


@pytest.mark.parametrize("periodic", [True, False])
def test_fused_muscl_glue_hanging_walls(periodic):
    """flux_divergence_muscl with T8GPU_PALLAS=interpret (the dispatch TPU
    backends take) == the XLA path on a 2:1 hanging mesh, periodic and
    walled: the kernel covers interior + equal faces at order 2, the XLA
    closure adds hanging/wall faces at order 1 on both paths."""
    import os

    import jax

    from t8gpu_tpu.ops import subgrid as sg

    f = Forest.uniform(2, dim=2, periodic=periodic)
    flags = np.zeros(f.n_elements, np.int8)
    flags[0] = 1
    f, _ = f.adapt(f.balance_flags(flags))
    spec = SubgridSpec((8, 8))
    mesh = SubgridMesh.from_forest(f, spec)
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=2))

    D0, sp0 = sg.flux_divergence_muscl(s.u, s.volumes, s.conn, spec,
                                       GAMMA, "kepes")
    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        D1, sp1 = sg.flux_divergence_muscl(s.u, s.volumes, s.conn, spec,
                                           GAMMA, "kepes")
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(sp1), float(sp0), rtol=1e-5)


def test_matches_plain_order2_uniform():
    """On a uniform periodic mesh the subgrid order-2 unlimited scheme
    computes the same discretization as the plain order-2 unlimited path
    (per-axis central slopes == Green-Gauss on bricks): L2 errors agree
    to fp tolerance at equal resolution."""
    from t8gpu_tpu.mesh.uniform import uniform_mesh
    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver

    level = 3
    mesh_sg = SubgridMesh.from_forest(Forest.uniform(level, dim=2),
                                      SubgridSpec((4, 4)))
    s_sg = SubgridCompressibleEulerSolver(
        mesh_sg, lambda c: wave_ic(c[:, 0]),
        config=EulerConfig(order=2, limiter="none"))
    mesh_pl = uniform_mesh(level + 2, dim=2, periodic=True)
    s_pl = CompressibleEulerSolver(
        mesh_pl, lambda c: wave_ic(c[:, 0]),
        config=EulerConfig(order=2, limiter="none"))

    h = 0.5 ** level / 4
    dt = 0.2 * h / 2.4
    n = int(round(T_END / dt))
    s_sg.iterate_many(n, T_END / n)
    s_pl.iterate_many(n, T_END / n)

    cc = mesh_sg.cell_centers()
    e_sg = float(np.sqrt(np.mean(
        (s_sg.conserved_state()[0].reshape(-1)
         - exact_rho(cc[:, 0], T_END)) ** 2)))
    e_pl = float(np.sqrt(np.mean(
        (s_pl.conserved_state()[0]
         - exact_rho(mesh_pl.centers[:, 0], T_END)) ** 2)))
    np.testing.assert_allclose(e_sg, e_pl, rtol=1e-3)


# ---------------------------------------------------------------------------
# Primitive-space reconstruction ("<lim>-prim", ops/euler.prim_rows):
# the round-5 op-count restructure of the order-2 kernel
# ---------------------------------------------------------------------------


def test_prim_second_order_unlimited():
    errs = _converge("none-prim")
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(orders) > 1.9, (errs, orders)


def test_prim_second_order_minmod():
    errs = _converge("bj-prim")
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    assert min(orders) > 1.4, (errs, orders)
    # accuracy comparable to conserved-space reconstruction
    errs_cons = _converge("bj")
    assert errs[-1] < 2.0 * errs_cons[-1], (errs, errs_cons)


@pytest.mark.parametrize("dim,ext", [(2, 8), (3, 8)])
@pytest.mark.parametrize("limiter", ["minmod", "none"])
def test_prim_fused_kernel_matches_prim_stencil(dim, ext, limiter):
    from t8gpu_tpu.ops import subgrid as sg
    from t8gpu_tpu.ops.pallas_kernels import fused_muscl_pallas

    spec = SubgridSpec((ext,) * dim)
    mesh = SubgridMesh.from_forest(
        Forest.uniform(2 if dim == 2 else 1, dim=dim), spec)
    s = SubgridCompressibleEulerSolver(mesh, lambda c: kh_planar(c, dim=dim))
    D0, sp0 = sg.muscl_core(s.u, s.u, s.volumes, s.conn, spec, GAMMA,
                            "kepes", limiter, space="prim")
    others, weights = sg.muscl_side_inputs(s.u, s.conn, spec, s.volumes)
    D1, sp_e = fused_muscl_pallas(s.u, weights, others, gamma=GAMMA,
                                  flux="kepes", limiter=limiter,
                                  space="prim", interpret=True)
    np.testing.assert_allclose(np.asarray(D1), np.asarray(D0),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(sp_e.max()), float(sp0), rtol=1e-5)


def test_prim_conservation_and_hanging_stability():
    """Prim-space reconstruction on a HANGING (2:1) mesh: conservative,
    finite, quiescent-preserving (the first-order hanging closure is
    shared with cons mode)."""
    forest = Forest.uniform(2, dim=2)
    c = forest.centers()
    flags = forest.balance_flags(
        ((c[:, 0] > 0.5)).astype(np.int8))
    f2, _ = forest.adapt(flags)
    mesh = SubgridMesh.from_forest(f2, SubgridSpec((8, 8)))
    s = SubgridCompressibleEulerSolver(
        mesh, lambda c: kh_planar(c, dim=2),
        config=EulerConfig(order=2, limiter="bj-prim"))
    m0 = s.compute_integral()
    dt = s.compute_timestep()
    s.iterate_many(20, dt)
    assert np.isfinite(s.conserved_state()).all()
    assert abs(s.compute_integral() - m0) / m0 < 1e-5
