"""Tests for Morton utilities, uniform mesh construction and the
incidence/accumulation machinery."""

import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.mesh.morton import morton_decode, morton_encode
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.ops.fluxes import accumulate, flux_divergence


def test_morton_roundtrip():
    for dim in (2, 3):
        rng = np.random.default_rng(0)
        coords = rng.integers(0, 2**20 if dim == 2 else 2**15, (1000, dim))
        codes = morton_encode(coords, dim)
        back = morton_decode(codes, dim)
        np.testing.assert_array_equal(back, coords)


def test_morton_order_is_z_curve_2d():
    # First four codes at level 1: (0,0),(1,0),(0,1),(1,1)
    coords = morton_decode(np.arange(4, dtype=np.uint64), 2)
    np.testing.assert_array_equal(coords, [[0, 0], [1, 0], [0, 1], [1, 1]])


def test_uniform_mesh_counts():
    m = uniform_mesh(level=3, dim=2, periodic=True)
    assert m.n_elements == 64
    assert m.conn.n_faces == 2 * 64          # +x and +y face per element
    assert m.conn.n_boundary_faces == 0
    np.testing.assert_allclose(m.volumes.sum(), 1.0, rtol=1e-6)

    m3 = uniform_mesh(level=2, dim=3, periodic=True)
    assert m3.n_elements == 64
    assert m3.conn.n_faces == 3 * 64

    mw = uniform_mesh(level=3, dim=2, periodic=False)
    assert mw.conn.n_faces == 2 * 8 * 7      # interior faces
    assert mw.conn.n_boundary_faces == 4 * 8


def test_incidence_table_consistency():
    """Every interior face appears exactly twice (signs -1/+1), boundary
    faces once with sign -1; per-element signed area sums vanish (closed
    surface) on the periodic mesh."""
    m = uniform_mesh(level=3, dim=2, periodic=True)
    c = m.conn
    slots = np.asarray(c.inc_slot)
    signs = np.asarray(c.inc_sign)
    F = c.face_capacity
    counts = np.zeros(F + c.boundary_capacity + 1)
    for e in range(c.n_elements):
        for s, sg in zip(slots[e], signs[e]):
            if sg != 0:
                counts[s] += 1
    assert (counts[: c.n_faces] == 2).all()
    assert (counts[c.n_faces: F] == 0).all()


def test_accumulate_modes_agree():
    m = uniform_mesh(level=4, dim=2, periodic=True)
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.normal(size=(5, m.conn.face_capacity)).astype(np.float32))
    fb = jnp.zeros((5, 0), jnp.float32)
    a = accumulate(f, fb, m.conn, "gather")
    b = accumulate(f, fb, m.conn, "segment_sum")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_constant_state_is_steady():
    """Flux divergence of a uniform state on a periodic mesh is ~0 and its
    max wave speed matches |u|+a."""
    m = uniform_mesh(level=3, dim=2, periodic=True)
    cap = m.conn.inc_slot.shape[0]
    u = np.zeros((5, cap), np.float32)
    u[0] = 1.0
    u[1] = 0.3
    u[4] = 2.5 / 0.4 + 0.5 * 0.3**2
    div, speed = flux_divergence(jnp.asarray(u), m.conn)
    np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-4)
    a = np.sqrt(1.4 * 2.5)  # p = 2.5
    # faces normal to y see |un|=0, faces normal to x see 0.3
    assert abs(float(speed) - (0.3 + a)) < 1e-4


def test_reflective_wall_conserves_mass_not_momentum():
    """On a wall mesh, the boundary flux has zero mass component for the
    mirror state (un = 0 at the interface by symmetry)."""
    m = uniform_mesh(level=3, dim=2, periodic=False)
    cap = m.conn.inc_slot.shape[0]
    u = np.zeros((5, cap), np.float32)
    u[0] = 1.0
    u[1] = 0.5
    u[4] = 2.5 / 0.4 + 0.5 * 0.25
    div, _ = flux_divergence(jnp.asarray(u), m.conn)
    div = np.asarray(div)[:, : m.n_elements]
    # total mass is conserved: wall faces carry exactly zero mass flux
    # (mirror-state symmetry kills both the central and dissipation parts)
    assert abs(div[0].sum()) < 1e-4
    # but mass advects toward the +x wall: nonzero divergence near walls
    assert np.abs(div[0]).max() > 1e-3
    # x-momentum picks up wall pressure on the two x walls
    assert np.abs(div[1]).max() > 1e-3

    from t8gpu_tpu.ops.fluxes import boundary_face_fluxes

    fb, _ = boundary_face_fluxes(jnp.asarray(u), m.conn)
    np.testing.assert_allclose(
        np.asarray(fb)[0, : m.conn.n_boundary_faces], 0.0, atol=1e-6)


def test_gather_mode_state_matches_fields():
    """The measured-variant GATHER_MODE='state' (gather 5-row states,
    derive fields per face side) must agree with the default fields-gather
    path (BENCHMARKS.md records why fields-gather is the default)."""
    import jax

    from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
    from t8gpu_tpu.models.initial_conditions import kh_planar
    from t8gpu_tpu.ops import fluxes

    m = uniform_mesh(level=4, dim=2)
    ic = lambda c: kh_planar(c, dim=2)
    s1 = CompressibleEulerSolver(m, ic)
    for _ in range(3):
        s1.iterate(1e-3)
    u_ref = s1.conserved_state()

    fluxes.GATHER_MODE = "state"
    jax.clear_caches()
    try:
        s2 = CompressibleEulerSolver(m, ic)
        for _ in range(3):
            s2.iterate(1e-3)
        u_state = s2.conserved_state()
    finally:
        fluxes.GATHER_MODE = "fields"
        jax.clear_caches()

    np.testing.assert_allclose(u_state, u_ref, rtol=2e-5, atol=2e-6)
