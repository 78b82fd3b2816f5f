"""Viscous (compressible Navier-Stokes) terms on the plain-element path
(ops/viscous.py; beyond-reference — the reference integrates inviscid
Euler only, kernels.cu:135-309): exact decay rates against the heat
equation, conservation to roundoff, free-stream preservation, sharded ==
single-device, and the all-element-class claim on the prism shell.
"""

import numpy as np
import pytest

from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.utils.config import EulerConfig

GAMMA = 1.4
MU = 2e-3
V0 = 1e-2


def shear_ic(c):
    """vx(y) = V0 sin(2 pi y), rho = p = 1: a nearly incompressible shear
    mode whose exact momentum diffusion rate is nu k^2 (heat equation)."""
    rho = np.ones(len(c), np.float32)
    vx = V0 * np.sin(2 * np.pi * c[:, 1]).astype(np.float32)
    p = np.ones(len(c), np.float32)
    e = p / (GAMMA - 1) + 0.5 * rho * vx * vx
    z = np.zeros_like(rho)
    return np.stack([rho, rho * vx, z, z, e])


def _sin_amp(vals, y):
    return 2.0 * np.mean(vals * np.sin(2 * np.pi * y))


def test_shear_decay_rate_exact():
    """The sinusoidal shear mode decays at exactly exp(-nu k^2 t): the
    full tau discretization reduces to the right scalar diffusion."""
    mesh = uniform_mesh(6, dim=2, periodic=True)
    s = CompressibleEulerSolver(mesh, shear_ic, config=EulerConfig(mu=MU))
    t_end = 0.5
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state()
    amp = _sin_amp(u[1] / u[0], mesh.centers[:, 1])
    expected = V0 * np.exp(-MU * (2 * np.pi) ** 2 * t_end)
    assert abs(amp / expected - 1.0) < 0.02, (amp, expected)


def test_heat_conduction_rate():
    """A temperature mode at rest decays at alpha k^2 with alpha =
    kappa/(rho cp) = nu/Pr — validates the Fourier heat-flux term."""
    pr = 0.72
    a0 = 1e-2

    def temp_ic(c):
        # uniform pressure (no acoustics), T = 1 + a0 sin(2 pi y),
        # rho = p/T
        T = (1.0 + a0 * np.sin(2 * np.pi * c[:, 1])).astype(np.float32)
        p = np.ones(len(c), np.float32)
        rho = p / T
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z, p / (GAMMA - 1) + 0 * rho])

    mesh = uniform_mesh(6, dim=2, periodic=True)
    s = CompressibleEulerSolver(mesh, temp_ic,
                                config=EulerConfig(mu=MU, prandtl=pr))
    t_end = 0.4
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state()
    ke = 0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / u[0]
    T = (GAMMA - 1) * (u[4] - ke) / u[0]
    amp = _sin_amp(T - T.mean(), mesh.centers[:, 1])
    # isobaric conduction relaxes T at alpha_p = k/(rho cp) = nu/Pr
    expected = a0 * np.exp(-(MU / pr) * (2 * np.pi) ** 2 * t_end)
    assert abs(amp / expected - 1.0) < 0.05, (amp, expected)


def test_conservation_and_free_stream():
    """Viscous exchange conserves mass exactly and momentum/energy to
    roundoff (antisymmetric accumulate); a uniform moving state generates
    ZERO viscous flux (gradients vanish identically)."""
    mesh = uniform_mesh(5, dim=2, periodic=True)
    s = CompressibleEulerSolver(mesh, shear_ic, config=EulerConfig(mu=MU))
    u0 = s.conserved_state()
    m0 = s.compute_integral()
    for _ in range(10):
        s.iterate(1e-3)
    u1 = s.conserved_state()
    assert s.compute_integral() == pytest.approx(m0, rel=1e-7)
    assert np.abs(u1[1:4].sum(axis=1) - u0[1:4].sum(axis=1)).max() < 1e-6
    assert abs(u1[4].sum() - u0[4].sum()) / abs(u0[4].sum()) < 1e-5

    def uni_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, 0.3 * rho, z, z,
                         np.full_like(rho, 2.5 + 0.5 * 0.09)])

    s2 = CompressibleEulerSolver(uniform_mesh(3, dim=2, periodic=True),
                                 uni_ic, config=EulerConfig(mu=MU))
    v0 = s2.conserved_state().copy()
    for _ in range(5):
        s2.iterate(1e-3)
    assert np.abs(s2.conserved_state() - v0).max() < 1e-6


def test_viscous_dt_limit():
    """With mu large enough that diffusion binds, the CFL dt shrinks to
    respect dt <= cfl h^2/(2 dim nu) (the viscous_speed_bound fold)."""
    mesh = uniform_mesh(5, dim=2, periodic=True)
    big_mu = 0.1
    s = CompressibleEulerSolver(mesh, shear_ic,
                                config=EulerConfig(mu=big_mu))
    dt = s.compute_timestep()
    h = 0.5 ** 5
    nu_eff = big_mu * max(1.0, GAMMA / 0.72)
    assert dt <= 0.7 * h * h / (2 * 2 * nu_eff) * 1.0001
    # and the run at that dt stays finite/stable
    for _ in range(10):
        s.iterate(dt)
    assert np.isfinite(s.conserved_state()).all()


@pytest.mark.parametrize("periodic", [True, False])
def test_sharded_matches_single(periodic):
    """Sharded viscous (two-round halo: states then gradients) == the
    single-device path on periodic and walled meshes."""
    import jax

    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    cfg = EulerConfig(mu=MU)
    f = Forest.uniform(4, dim=2, periodic=periodic)
    mesh = uniform_mesh(4, dim=2, periodic=periodic)
    ref = CompressibleEulerSolver(mesh, shear_ic, config=cfg)
    sh = ShardedEulerSolver(f, shear_ic, config=cfg,
                            devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(),
                               ref.conserved_state(),
                               rtol=2e-5, atol=2e-6)


def test_viscous_with_order2_and_gravity_compose():
    """mu, order=2 and gravity compose (all additive): the run is stable,
    conserves mass, and differs from the inviscid order-2 run."""
    cfg = EulerConfig(mu=MU, order=2, gravity=(0.0, -0.5, 0.0))
    mesh = uniform_mesh(4, dim=2, periodic=True)
    s = CompressibleEulerSolver(mesh, shear_ic, config=cfg)
    s0 = CompressibleEulerSolver(mesh, shear_ic,
                                 config=EulerConfig(order=2,
                                                    gravity=(0.0, -0.5, 0.0)))
    m0 = s.compute_integral()
    for _ in range(10):
        s.iterate(1e-3)
        s0.iterate(1e-3)
    assert s.compute_integral() == pytest.approx(m0, rel=1e-6)
    assert np.isfinite(s.conserved_state()).all()
    assert np.abs(s.conserved_state() - s0.conserved_state()).max() > 1e-7


def test_shell_prisms_viscous_stable():
    """Any-element-class claim: viscosity on the prismed icosahedral
    shell (general normals, prism centroid geometry) runs stable and
    conserves mass."""
    from t8gpu_tpu.mesh.shell import shell_mesh
    from t8gpu_tpu.models.initial_conditions import kh_sphere

    mesh = shell_mesh(subdiv=1, n_layers=1)
    s = CompressibleEulerSolver(mesh, kh_sphere,
                                config=EulerConfig(mu=1e-3))
    m0 = s.compute_integral()
    for _ in range(10):
        s.iterate(2e-4)
    assert np.isfinite(s.conserved_state()).all()
    assert s.compute_integral() == pytest.approx(m0, rel=1e-5)


def test_subgrid_viscous_decay_and_conservation():
    """Subgrid Navier-Stokes (ops/subgrid_viscous.py, equal-level
    meshes): the shear mode decays at exactly nu k^2 across block AND
    mesh faces, conserving mass exactly and momentum/energy to
    roundoff."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    mesh = SubgridMesh.from_forest(Forest.uniform(3, dim=2),
                                   SubgridSpec((8, 8)))   # 64 cells/axis
    s = SubgridCompressibleEulerSolver(mesh, lambda c: shear_ic(c),
                                       config=EulerConfig(mu=MU))
    m0 = s.compute_integral()
    u0 = s.conserved_state().reshape(5, -1)
    t_end = 0.5
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state().reshape(5, -1)
    y = mesh.cell_centers()[:, 1]
    amp = 2.0 * np.mean((u[1] / u[0]) * np.sin(2 * np.pi * y))
    expected = V0 * np.exp(-MU * (2 * np.pi) ** 2 * t_end)
    assert abs(amp / expected - 1.0) < 0.02, (amp, expected)
    assert s.compute_integral() == pytest.approx(m0, rel=1e-6)
    assert np.abs(u[1:4].sum(axis=1) - u0[1:4].sum(axis=1)).max() < 2e-5
    assert abs(u[4].sum() - u0[4].sum()) / abs(u0[4].sum()) < 1e-5


def test_subgrid_viscous_free_stream_and_plain_match():
    """Uniform moving state: exactly preserved (all derivatives vanish);
    and the subgrid NS decay matches the plain path's on the same
    physical problem (independent discretizations cross-validate)."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    def uni_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, 0.3 * rho, z, z,
                         np.full_like(rho, 2.5 + 0.5 * 0.09)])

    mesh = SubgridMesh.from_forest(Forest.uniform(2, dim=2),
                                   SubgridSpec((4, 4)))
    s = SubgridCompressibleEulerSolver(mesh, uni_ic,
                                       config=EulerConfig(mu=MU))
    v0 = s.conserved_state().copy()
    for _ in range(5):
        s.iterate(1e-3)
    assert np.abs(s.conserved_state() - v0).max() < 1e-6


def _hanging_forest(dim=2, level=2, periodic=True):
    """2:1 hanging mesh: refine element 0 (+ balance closure)."""
    from t8gpu_tpu.mesh.forest import Forest

    f = Forest.uniform(level, dim=dim, periodic=periodic)
    flags = np.zeros(f.n_elements, np.int8)
    flags[0] = 1
    f, _ = f.adapt(f.balance_flags(flags))
    return f


def test_subgrid_viscous_hanging_free_stream_and_conservation():
    """Hanging (2:1) subgrid meshes take mu > 0 through the virtual-fine
    viscous pass (ops/subgrid_viscous.viscous_hanging_sides): a uniform
    moving state is preserved exactly (all derivatives vanish on both
    sides of every hanging face), and a sheared state conserves mass
    exactly and momentum/energy to roundoff (both sides of each hanging
    subface evaluate the identical flux expression)."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    def uni_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, 0.3 * rho, z, z,
                         np.full_like(rho, 2.5 + 0.5 * 0.09)])

    mesh = SubgridMesh.from_forest(_hanging_forest(), SubgridSpec((4, 4)))
    assert any(mesh.conn.has_fine) and any(mesh.conn.has_coarse)
    s = SubgridCompressibleEulerSolver(mesh, uni_ic,
                                       config=EulerConfig(mu=MU))
    v0 = s.conserved_state().copy()
    for _ in range(5):
        s.iterate(1e-3)
    assert np.abs(s.conserved_state() - v0).max() < 1e-6

    s2 = SubgridCompressibleEulerSolver(mesh, shear_ic,
                                        config=EulerConfig(mu=MU))
    m0 = s2.compute_integral()
    # VOLUME-weighted sums: the conserved invariant on mixed-resolution
    # meshes (element-major cell volumes match conserved_state's layout)
    vols = np.repeat(np.asarray(mesh.volumes) / mesh.spec.size,
                     mesh.spec.size)
    u0 = s2.conserved_state().reshape(5, -1) @ vols
    for _ in range(20):
        s2.iterate(5e-4)
    u = s2.conserved_state().reshape(5, -1) @ vols
    assert s2.compute_integral() == pytest.approx(m0, rel=1e-6)
    assert np.abs(u[1:4] - u0[1:4]).max() < 1e-7
    assert abs(u[4] - u0[4]) / abs(u0[4]) < 1e-5


def test_subgrid_viscous_hanging_decay_rate():
    """The shear mode keeps its nu k^2 decay rate on a mesh with a
    refined (hanging) region — the 2:1 viscous closure is consistent,
    not just conservative."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    mesh = SubgridMesh.from_forest(_hanging_forest(level=2),
                                   SubgridSpec((8, 8)))
    s = SubgridCompressibleEulerSolver(mesh, shear_ic,
                                       config=EulerConfig(mu=MU))
    t_end = 0.5
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state().reshape(5, -1)
    # element-major cell volumes aligned with conserved_state [5, N, *ext]
    vols = np.repeat(np.asarray(mesh.volumes) / mesh.spec.size,
                     mesh.spec.size)
    y = s.mesh.cell_centers()[:, 1]
    # volume-weighted mode amplitude (mixed-resolution cells)
    amp = 2.0 * np.sum((u[1] / u[0]) * np.sin(2 * np.pi * y) * vols) \
        / np.sum(vols)
    expected = V0 * np.exp(-MU * (2 * np.pi) ** 2 * t_end)
    assert abs(amp / expected - 1.0) < 0.05, (amp, expected)


def test_subgrid_viscous_hanging_fused_matches_stencil():
    """T8GPU_PALLAS=interpret (the RK-fused dispatch TPU backends take,
    with the hanging viscous fluxes riding the kernel's additive extras
    input) == the XLA stencil path, on a hanging mesh with mu > 0."""
    import os

    import jax

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    mesh = SubgridMesh.from_forest(_hanging_forest(periodic=False),
                                   SubgridSpec((8, 8)))
    cfg = EulerConfig(mu=MU)
    s0 = SubgridCompressibleEulerSolver(mesh, shear_ic, config=cfg)
    for _ in range(3):
        s0.iterate(5e-4)
    u_ref = s0.conserved_state()

    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        s1 = SubgridCompressibleEulerSolver(mesh, shear_ic, config=cfg)
        for _ in range(3):
            s1.iterate(5e-4)
        u_kern = s1.conserved_state()
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    np.testing.assert_allclose(u_kern.reshape(5, -1), u_ref.reshape(5, -1),
                               rtol=2e-5, atol=2e-6)


def test_sharded_subgrid_viscous_hanging_matches_single():
    """Sharded subgrid Navier-Stokes on a HANGING mesh == single-device:
    shard-boundary hanging faces gather their virtual-fine operands from
    the halo-extended axis on both sides."""
    import jax

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

    cfg = EulerConfig(mu=MU)
    spec = SubgridSpec((4, 4))
    f = _hanging_forest(level=3)
    ref = SubgridCompressibleEulerSolver(SubgridMesh.from_forest(f, spec),
                                         shear_ic, config=cfg)
    sh = ShardedSubgridEulerSolver(f, spec, shear_ic, config=cfg,
                                   devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state().reshape(5, -1),
                               ref.conserved_state().reshape(5, -1),
                               rtol=2e-5, atol=2e-6)


def _subgrid_channel(level=3, ext=8):
    """x-walled subgrid channel at the plain tests' 64 cells/axis."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh

    f = Forest.uniform(level, dim=2, periodic=(False, True))
    return SubgridMesh.from_forest(f, SubgridSpec((ext, ext)))


def test_subgrid_noslip_channel_decay_exact():
    """EulerConfig(wall='noslip') on the SUBGRID path (the one-sided
    wall shear as additive side extras, viscous_wall_sides): the channel
    sin(pi x) mode decays at exactly nu pi^2; the slip wall conserves
    the mode's momentum instead."""
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    t_end = 0.5
    amps, mom = {}, {}
    for wall in ("noslip", "slip"):
        mesh = _subgrid_channel()
        s = SubgridCompressibleEulerSolver(
            mesh, _channel_ic, config=EulerConfig(mu=MU, wall=wall))
        vols = np.repeat(np.asarray(mesh.volumes) / mesh.spec.size,
                         mesh.spec.size)
        mom0 = float((s.conserved_state().reshape(5, -1)[2] * vols).sum())
        dt = s.compute_timestep()
        n = int(round(t_end / dt))
        s.iterate_many(n, t_end / n)
        u = s.conserved_state().reshape(5, -1)
        x = mesh.cell_centers()[:, 0]
        amps[wall] = 2.0 * np.mean((u[2] / u[0]) * np.sin(np.pi * x))
        mom[wall] = (float((u[2] * vols).sum()), mom0)
    exact = V0 * np.exp(-MU * np.pi ** 2 * t_end)
    assert abs(amps["noslip"] / exact - 1.0) < 0.01, (amps, exact)
    m1, m0 = mom["slip"]
    assert abs(m1 - m0) < 1e-5 * abs(m0), mom["slip"]
    m1, m0 = mom["noslip"]
    drained = m1 / m0
    assert abs(drained - np.exp(-MU * np.pi ** 2 * t_end)) < 5e-4, drained


def test_subgrid_moving_wall_couette_spinup_exact():
    """wall_velocity on the subgrid path: the resting channel spins up
    toward the y-moving walls; the deficit's sin(pi x) projection decays
    at exactly nu pi^2 and the walls do positive work."""
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    U = 1e-2

    def rest_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z,
                         np.full_like(rho, 1.0 / (GAMMA - 1))])

    mesh = _subgrid_channel()
    s = SubgridCompressibleEulerSolver(
        mesh, rest_ic, config=EulerConfig(mu=MU, wall="noslip",
                                          wall_velocity=(0.0, U, 0.0)))
    e0 = float(s.conserved_state().reshape(5, -1)[4].sum())
    t_end = 0.5
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state().reshape(5, -1)
    x = mesh.cell_centers()[:, 0]
    p1 = 2.0 * np.mean((u[2] / u[0] - U) * np.sin(np.pi * x))
    expected = (-U * 4 / np.pi) * np.exp(-MU * np.pi ** 2 * t_end)
    assert abs(p1 / expected - 1.0) < 0.01, (p1, expected)
    assert (u[2] / u[0]).mean() > 0.0
    assert float(u[4].sum()) > e0


def test_subgrid_isothermal_wall_conduction_exact():
    """wall_temperature on the subgrid path: the sin(pi x) temperature
    mode relaxes at exactly (nu/Pr) pi^2; adiabatic no-slip walls
    conserve total energy instead."""
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    A0 = 1e-2

    def hot_ic(c):
        T = (1.0 + A0 * np.sin(np.pi * c[:, 0])).astype(np.float32)
        p = np.ones(len(c), np.float32)
        rho = p / T
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z, p / (GAMMA - 1)])

    mesh = _subgrid_channel()
    s = SubgridCompressibleEulerSolver(
        mesh, hot_ic, config=EulerConfig(mu=MU, wall="noslip",
                                         wall_temperature=1.0))
    x = mesh.cell_centers()[:, 0]
    t_end = 0.4
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state().reshape(5, -1)
    ke = 0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / u[0]
    T = (GAMMA - 1) * (u[4] - ke) / u[0]
    amp = 2.0 * np.mean((T - 1.0) * np.sin(np.pi * x))
    expected = A0 * np.exp(-(MU / 0.72) * np.pi ** 2 * t_end)
    assert abs(amp / expected - 1.0) < 0.02, (amp, expected)

    s2 = SubgridCompressibleEulerSolver(
        _subgrid_channel(), hot_ic,
        config=EulerConfig(mu=MU, wall="noslip"))
    vols = np.repeat(np.asarray(s2.mesh.volumes) / s2.mesh.spec.size,
                     s2.mesh.spec.size)
    e0 = float((s2.conserved_state().reshape(5, -1)[4] * vols).sum())
    s2.iterate_many(n, t_end / n)
    e1 = float((s2.conserved_state().reshape(5, -1)[4] * vols).sum())
    # adiabatic walls add EXACTLY zero energy flux (work = 0, no heat);
    # the drift is the interior scheme's f32 accumulation over ~n steps
    # (same 1e-5 budget as test_subgrid_viscous_decay_and_conservation)
    assert abs(e1 - e0) < 1e-5 * abs(e0), (e0, e1)


def test_subgrid_noslip_fused_matches_stencil():
    """T8GPU_PALLAS=interpret (wall shear through the RK-fused kernel's
    extras input) == the XLA stencil path on a walled viscous channel."""
    import os

    import jax

    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    cfg = EulerConfig(mu=MU, wall="noslip", wall_velocity=(0.0, 5e-3, 0.0))
    mesh = _subgrid_channel(level=2)
    s0 = SubgridCompressibleEulerSolver(mesh, _channel_ic, config=cfg)
    for _ in range(3):
        s0.iterate(5e-4)
    u_ref = s0.conserved_state()

    os.environ["T8GPU_PALLAS"] = "interpret"
    jax.clear_caches()
    try:
        s1 = SubgridCompressibleEulerSolver(mesh, _channel_ic, config=cfg)
        for _ in range(3):
            s1.iterate(5e-4)
        u_kern = s1.conserved_state()
    finally:
        os.environ.pop("T8GPU_PALLAS", None)
        jax.clear_caches()
    np.testing.assert_allclose(u_kern.reshape(5, -1), u_ref.reshape(5, -1),
                               rtol=2e-5, atol=2e-6)


def test_sharded_subgrid_noslip_matches_single():
    """Sharded subgrid no-slip walls == single-device (the wall extras
    are local per shard; no extra halo round)."""
    import jax

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

    cfg = EulerConfig(mu=MU, wall="noslip", wall_temperature=1.0)
    spec = SubgridSpec((4, 4))
    f = Forest.uniform(3, dim=2, periodic=(False, True))
    ref = SubgridCompressibleEulerSolver(SubgridMesh.from_forest(f, spec),
                                         _channel_ic, config=cfg)
    sh = ShardedSubgridEulerSolver(f, spec, _channel_ic, config=cfg,
                                   devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state().reshape(5, -1),
                               ref.conserved_state().reshape(5, -1),
                               rtol=2e-5, atol=2e-6)


def test_subgrid_viscous_hanging_3d_free_stream_and_conserves():
    """3D hanging mesh with mu > 0: free stream exact, momentum/energy
    conserved (the dim-generic virtual-fine pass, 4 subfaces/face)."""
    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver

    def shear3(c):
        rho = np.ones(len(c), np.float32)
        vx = V0 * np.sin(2 * np.pi * c[:, 1]).astype(np.float32)
        z = np.zeros_like(rho)
        e = 1.0 / (GAMMA - 1) + 0.5 * rho * vx * vx
        return np.stack([rho, rho * vx, z, z, e])

    mesh = SubgridMesh.from_forest(_hanging_forest(dim=3, level=1),
                                   SubgridSpec((4, 4, 4)))
    assert any(mesh.conn.has_fine)
    s = SubgridCompressibleEulerSolver(mesh, shear3,
                                       config=EulerConfig(mu=MU))
    m0 = s.compute_integral()
    vols = np.repeat(np.asarray(mesh.volumes) / mesh.spec.size,
                     mesh.spec.size)
    u0 = s.conserved_state().reshape(5, -1) @ vols
    for _ in range(10):
        s.iterate(5e-4)
    u = s.conserved_state().reshape(5, -1)
    assert np.isfinite(u).all()
    uw = u @ vols
    assert s.compute_integral() == pytest.approx(m0, rel=1e-6)
    assert np.abs(uw[1:4] - u0[1:4]).max() < 1e-7


def _channel_ic(c):
    """vy(x) = V0 sin(pi x): the slowest no-slip Dirichlet mode of the
    x-walled channel (zero at both walls), uniform along periodic y."""
    rho = np.ones(len(c), np.float32)
    vy = V0 * np.sin(np.pi * c[:, 0]).astype(np.float32)
    p = np.ones(len(c), np.float32)
    e = p / (GAMMA - 1) + 0.5 * rho * vy * vy
    z = np.zeros_like(rho)
    return np.stack([rho, z, rho * vy, z, e])


def test_noslip_channel_decay_exact():
    """EulerConfig(wall='noslip') on a channel (periodic=(False, True)):
    the sin(pi x) mode decays at exactly nu pi^2 — the wall-shear
    one-sided closure reproduces the Dirichlet eigenvalue; the slip wall
    conserves the mode's momentum instead (no drag)."""
    from t8gpu_tpu.mesh.forest import Forest, ForestMesh

    t_end = 0.5
    amps = {}
    mom = {}
    for wall in ("noslip", "slip"):
        f = Forest.uniform(6, dim=2, periodic=(False, True))
        mesh = ForestMesh.from_forest(f)
        s = CompressibleEulerSolver(mesh, _channel_ic,
                                    config=EulerConfig(mu=MU, wall=wall))
        mom0 = float((s.conserved_state()[2] * np.asarray(
            s.volume)[: mesh.n_elements]).sum())
        dt = s.compute_timestep()
        n = int(round(t_end / dt))
        s.iterate_many(n, t_end / n)
        u = s.conserved_state()
        x = mesh.centers[:, 0]
        amps[wall] = 2.0 * np.mean((u[2] / u[0]) * np.sin(np.pi * x))
        mom[wall] = (float((u[2] * np.asarray(
            s.volume)[: mesh.n_elements]).sum()), mom0)
    exact = V0 * np.exp(-MU * np.pi ** 2 * t_end)
    assert abs(amps["noslip"] / exact - 1.0) < 0.01, (amps, exact)
    # slip: no wall drag => y-momentum conserved (f32 summation roundoff)
    m1, m0 = mom["slip"]
    assert abs(m1 - m0) < 1e-5 * abs(m0), mom["slip"]
    # noslip: wall shear drains it by the same exponential factor
    m1, m0 = mom["noslip"]
    drained = m1 / m0
    assert abs(drained - np.exp(-MU * np.pi ** 2 * t_end)) < 5e-4, drained


def test_sharded_noslip_channel_matches_single():
    import jax

    from t8gpu_tpu.mesh.forest import Forest, ForestMesh
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    cfg = EulerConfig(mu=MU, wall="noslip")
    f = Forest.uniform(4, dim=2, periodic=(False, True))
    ref = CompressibleEulerSolver(ForestMesh.from_forest(f), _channel_ic,
                                  config=cfg)
    sh = ShardedEulerSolver(f, _channel_ic, config=cfg,
                            devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state(),
                               ref.conserved_state()[:, : f.n_elements],
                               rtol=2e-5, atol=2e-6)


def test_sharded_per_face_lid_matches_single():
    """Callable (per-face) wall_velocity on the SHARDED path: the lid
    field is evaluated at install time and shipped with the
    connectivity (ShardedConnectivity.b_wall_vel) — sharded == single
    device on a driven-cavity start-up."""
    import jax

    from t8gpu_tpu.mesh.forest import Forest, ForestMesh
    from t8gpu_tpu.parallel.solver import ShardedEulerSolver

    U = 0.1

    def rest_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z,
                         np.full_like(rho, 1.0 / (GAMMA - 1))])

    def lid(face_centers):
        on_lid = (face_centers[:, 1] > 1.0 - 1e-6).astype(np.float32)
        vw = np.zeros((3, len(face_centers)), np.float32)
        vw[0] = U * on_lid
        return vw

    cfg = EulerConfig(mu=1e-3, wall="noslip", wall_velocity=lid)
    f = Forest.uniform(4, dim=2, periodic=False)
    ref = CompressibleEulerSolver(ForestMesh.from_forest(f), rest_ic,
                                  config=cfg)
    sh = ShardedEulerSolver(f, rest_ic, config=cfg,
                            devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    u_sh = sh.conserved_state()
    np.testing.assert_allclose(u_sh,
                               ref.conserved_state()[:, : f.n_elements],
                               rtol=2e-5, atol=2e-6)
    # and the lid actually drives the flow
    vx = u_sh[1] / u_sh[0]
    y = ForestMesh.from_forest(f).centers[:, 1]
    assert vx[y > 0.9].mean() > 1e-5


def test_gridscale_noise_stable_at_cfl_dt():
    """Grid-scale pressure noise + conduction at the solver's own CFL dt
    stays bounded: the diffusive rate is SUMMED into the CFL speed (the
    maxed fold was measurably unstable — the coupled acoustic+diffusive
    eigenvalue leaves the RK3 stability region)."""
    rng = np.random.default_rng(0)

    def noisy_ic(c):
        rho = np.ones(len(c), np.float32)
        p = (1.0 + 1e-4 * rng.standard_normal(len(c))).astype(np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z, p / (GAMMA - 1)])

    s = CompressibleEulerSolver(uniform_mesh(6, dim=2, periodic=True),
                                noisy_ic, config=EulerConfig(mu=2e-3))
    dt = s.compute_timestep()
    for _ in range(4):
        s.iterate_many(10, dt)
    u = s.conserved_state()
    assert np.isfinite(u).all()
    assert abs(u[0] - 1.0).max() < 5e-4       # noise decays, not grows


def test_sharded_subgrid_viscous_matches_single():
    """Sharded subgrid Navier-Stokes (layer gathers over the halo-
    extended axis) == single-device, and the summed-diffusive CFL dt
    agrees across the pmin/pmax reductions."""
    import jax

    from t8gpu_tpu.memory.subgrid import SubgridSpec
    from t8gpu_tpu.mesh.forest import Forest
    from t8gpu_tpu.mesh.subgrid import SubgridMesh
    from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
    from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

    cfg = EulerConfig(mu=MU)
    spec = SubgridSpec((4, 4))
    f = Forest.uniform(3, dim=2)
    ref = SubgridCompressibleEulerSolver(SubgridMesh.from_forest(f, spec),
                                         shear_ic, config=cfg)
    sh = ShardedSubgridEulerSolver(f, spec, shear_ic, config=cfg,
                                   devices=jax.devices()[:4])
    dt = 1e-3
    for _ in range(5):
        ref.iterate(dt)
        sh.iterate(dt)
    np.testing.assert_allclose(sh.conserved_state().reshape(5, -1),
                               ref.conserved_state().reshape(5, -1),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(sh.compute_timestep(), ref.compute_timestep(),
                               rtol=1e-6)


def test_moving_wall_couette_spinup_exact():
    """wall_velocity: a channel at rest between y-moving no-slip x-walls
    spins up toward the wall speed; the deficit's sin(pi x) projection
    decays at exactly nu pi^2 (the exact Couette start-up solution), and
    the wall does positive work (energy grows)."""
    from t8gpu_tpu.mesh.forest import Forest, ForestMesh

    U = 1e-2

    def rest_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z,
                         np.full_like(rho, 1.0 / (GAMMA - 1))])

    f = Forest.uniform(6, dim=2, periodic=(False, True))
    mesh = ForestMesh.from_forest(f)
    s = CompressibleEulerSolver(
        mesh, rest_ic, config=EulerConfig(mu=MU, wall="noslip",
                                          wall_velocity=(0.0, U, 0.0)))
    e0 = float(s.conserved_state()[4].sum())
    t_end = 0.5
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state()[:, : mesh.n_elements]
    x = mesh.centers[:, 0]
    p1 = 2.0 * np.mean((u[2] / u[0] - U) * np.sin(np.pi * x))
    expected = (-U * 4 / np.pi) * np.exp(-MU * np.pi ** 2 * t_end)
    assert abs(p1 / expected - 1.0) < 0.01, (p1, expected)
    assert (u[2] / u[0]).mean() > 0.0         # fluid entrained by the lid
    assert float(u[4].sum()) > e0             # the moving wall does work


def test_per_face_lid_velocity_cavity():
    """Callable wall_velocity (only the y=1 lid moves): the top cells
    are entrained in +x, a return flow develops beneath, the resting
    walls stay resting (bottom cells slower than the top's mirror), and
    mass is conserved exactly."""
    U = 0.1

    def rest_ic(c):
        rho = np.ones(len(c), np.float32)
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z,
                         np.full_like(rho, 1.0 / (GAMMA - 1))])

    def lid(face_centers):
        on_lid = (face_centers[:, 1] > 1.0 - 1e-6).astype(np.float32)
        vw = np.zeros((3, len(face_centers)), np.float32)
        vw[0] = U * on_lid
        return vw

    mesh = uniform_mesh(4, dim=2, periodic=False)
    s = CompressibleEulerSolver(
        mesh, rest_ic, config=EulerConfig(mu=1e-3, wall="noslip",
                                          wall_velocity=lid))
    m0 = s.compute_integral()
    dt = s.compute_timestep()
    s.iterate_many(int(round(1.0 / dt)), dt)
    u = s.conserved_state()
    vx = u[1] / u[0]
    y = mesh.centers[:, 1]
    top = vx[y > 0.9]
    bot = vx[y < 0.1]
    assert top.mean() > 1e-3                      # entrained by the lid
    assert abs(bot).max() < abs(top).max() / 3    # bottom wall rests
    assert np.isfinite(u).all()
    # f32 flux roundoff accumulates over the ~2.5x more steps the
    # axis-summed CFL dt takes to reach t=1.0 (measured ~1.1e-6)
    assert s.compute_integral() == pytest.approx(m0, rel=5e-6)


def test_isothermal_wall_conduction_exact():
    """wall_temperature: a temperature mode between isothermal x-walls
    relaxes at exactly (nu/Pr) pi^2 (the Dirichlet conduction
    eigenvalue); adiabatic walls conserve total energy instead."""
    from t8gpu_tpu.mesh.forest import Forest, ForestMesh

    A0 = 1e-2

    def hot_ic(c):
        T = (1.0 + A0 * np.sin(np.pi * c[:, 0])).astype(np.float32)
        p = np.ones(len(c), np.float32)
        rho = p / T
        z = np.zeros_like(rho)
        return np.stack([rho, z, z, z, p / (GAMMA - 1)])

    f = Forest.uniform(6, dim=2, periodic=(False, True))
    mesh = ForestMesh.from_forest(f)
    s = CompressibleEulerSolver(
        mesh, hot_ic, config=EulerConfig(mu=MU, wall="noslip",
                                         wall_temperature=1.0))
    x = mesh.centers[:, 0]
    t_end = 0.4
    dt = s.compute_timestep()
    n = int(round(t_end / dt))
    s.iterate_many(n, t_end / n)
    u = s.conserved_state()[:, : mesh.n_elements]
    ke = 0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / u[0]
    T = (GAMMA - 1) * (u[4] - ke) / u[0]
    amp = 2.0 * np.mean((T - 1.0) * np.sin(np.pi * x))
    expected = A0 * np.exp(-(MU / 0.72) * np.pi ** 2 * t_end)
    assert abs(amp / expected - 1.0) < 0.02, (amp, expected)

    # adiabatic contrast: same IC, no wall_temperature -> total energy
    # conserved to roundoff (no heat crosses the walls)
    s2 = CompressibleEulerSolver(
        ForestMesh.from_forest(f), hot_ic,
        config=EulerConfig(mu=MU, wall="noslip"))
    e0 = float((s2.conserved_state()[4]
                * np.asarray(s2.volume)[: mesh.n_elements]).sum())
    s2.iterate_many(n, t_end / n)
    e1 = float((s2.conserved_state()[4]
                * np.asarray(s2.volume)[: mesh.n_elements]).sum())
    assert abs(e1 - e0) / abs(e0) < 1e-5
