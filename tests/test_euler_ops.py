"""Golden tests for the Euler flux kernels against an independent NumPy
float64 scalar implementation (tests/numpy_reference.py), plus structural
properties: consistency F(u,u)=F_phys(u), rotation invariance, symmetry.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from t8gpu_tpu.ops import euler
from tests import numpy_reference as ref


def random_states(n, seed=0):
    rng = np.random.default_rng(seed)
    rho = rng.uniform(0.5, 3.0, n)
    v = rng.uniform(-1.0, 1.0, (3, n))
    p = rng.uniform(0.5, 3.0, n)
    e = p / (ref.GAMMA - 1.0) + 0.5 * rho * (v**2).sum(axis=0)
    return np.stack([rho, rho * v[0], rho * v[1], rho * v[2], e])


class TestLnMean:
    def test_matches_exact_log_mean(self):
        a = np.array([1.0, 2.0, 0.5, 10.0], dtype=np.float32)
        b = np.array([3.0, 2.5, 0.7, 1.0], dtype=np.float32)
        got = np.asarray(euler.ln_mean(jnp.asarray(a), jnp.asarray(b)))
        want = [(bb - aa) / np.log(bb / aa) for aa, bb in zip(a, b)]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_equal_arguments_no_nan(self):
        a = jnp.asarray([1.0, 2.0, 1e-3])
        got = np.asarray(euler.ln_mean(a, a))
        np.testing.assert_allclose(got, np.asarray(a), rtol=1e-6)

    def test_near_equal_series_branch(self):
        # u < 1e-4 engages the series; compare against float64 exact mean.
        a = np.float64(1.0)
        for delta in [1e-3, 1e-4, 1e-5]:
            b = a + delta
            got = float(euler.ln_mean(jnp.float32(a), jnp.float32(b)))
            want = (b - a) / np.log(b / a)
            assert abs(got - want) < 1e-6 * want


class TestKepesFlux:
    def test_consistency(self):
        """F(u, u) must equal the exact physical flux."""
        u = random_states(64)
        flux, _ = euler.kepes_es_flux(jnp.asarray(u, jnp.float32), jnp.asarray(u, jnp.float32))
        flux = np.asarray(flux)
        for i in range(u.shape[1]):
            np.testing.assert_allclose(
                flux[:, i], ref.physical_flux(u[:, i]), rtol=2e-5, atol=2e-5)

    def test_golden_vs_numpy_reference(self):
        uL = random_states(128, seed=1)
        uR = random_states(128, seed=2)
        flux, speed = euler.kepes_es_flux(
            jnp.asarray(uL, jnp.float32), jnp.asarray(uR, jnp.float32))
        flux, speed = np.asarray(flux), np.asarray(speed)
        for i in range(uL.shape[1]):
            want, want_speed = ref.kepes_es_flux_ref(uL[:, i], uR[:, i])
            np.testing.assert_allclose(flux[:, i], want, rtol=5e-4, atol=5e-5)
            np.testing.assert_allclose(speed[i], want_speed, rtol=1e-5)

    def test_central_part_symmetric(self):
        """The KEPES central flux is symmetric in (L, R)."""
        uL = random_states(32, seed=3)
        uR = random_states(32, seed=4)
        fLR, _ = euler.kepes_flux(jnp.asarray(uL, jnp.float32), jnp.asarray(uR, jnp.float32))
        fRL, _ = euler.kepes_flux(jnp.asarray(uR, jnp.float32), jnp.asarray(uL, jnp.float32))
        np.testing.assert_allclose(np.asarray(fLR), np.asarray(fRL), rtol=1e-5, atol=1e-6)


class TestHLLFlux:
    def test_consistency(self):
        u = random_states(64, seed=5)
        flux, _ = euler.hll_flux(jnp.asarray(u, jnp.float32), jnp.asarray(u, jnp.float32))
        flux = np.asarray(flux)
        for i in range(u.shape[1]):
            np.testing.assert_allclose(
                flux[:, i], ref.physical_flux(u[:, i]), rtol=2e-5, atol=2e-5)

    def test_golden_vs_numpy_reference(self):
        uL = random_states(128, seed=6)
        uR = random_states(128, seed=7)
        flux, _ = euler.hll_flux(jnp.asarray(uL, jnp.float32), jnp.asarray(uR, jnp.float32))
        flux = np.asarray(flux)
        for i in range(uL.shape[1]):
            want = ref.hll_flux_ref(uL[:, i], uR[:, i])
            np.testing.assert_allclose(flux[:, i], want, rtol=5e-4, atol=5e-5)


class TestRotations:
    def test_basis_orthonormal(self):
        rng = np.random.default_rng(8)
        n = rng.normal(size=(3, 50))
        n /= np.linalg.norm(n, axis=0)
        nb, t1, t2 = euler.face_basis(jnp.asarray(n, jnp.float32))
        nb, t1, t2 = map(np.asarray, (nb, t1, t2))
        for a, b in [(nb, t1), (nb, t2), (t1, t2)]:
            np.testing.assert_allclose((a * b).sum(axis=0), 0.0, atol=1e-5)
        for a in (nb, t1, t2):
            np.testing.assert_allclose((a * a).sum(axis=0), 1.0, atol=1e-5)

    def test_rotate_roundtrip(self):
        rng = np.random.default_rng(9)
        n = rng.normal(size=(3, 40))
        n /= np.linalg.norm(n, axis=0)
        u = random_states(40, seed=10)
        basis = euler.face_basis(jnp.asarray(n, jnp.float32))
        u_rot = euler.rotate_state(jnp.asarray(u, jnp.float32), *basis)
        u_back = euler.inverse_rotate_state(u_rot, *basis)
        np.testing.assert_allclose(np.asarray(u_back), u, rtol=1e-4, atol=1e-5)

    def test_flux_rotation_invariance(self):
        """Rotating states, fluxing, rotating back == fluxing along x when
        the normal is x.  Sanity for the generic-normal path."""
        u = random_states(16, seed=11)
        n = np.zeros((3, 16), dtype=np.float32)
        n[0] = 1.0
        basis = euler.face_basis(jnp.asarray(n))
        u_rot = euler.rotate_state(jnp.asarray(u, jnp.float32), *basis)
        f_rot, _ = euler.kepes_es_flux(u_rot, u_rot)
        f = euler.inverse_rotate_state(f_rot, *basis)
        f_direct, _ = euler.kepes_es_flux(jnp.asarray(u, jnp.float32), jnp.asarray(u, jnp.float32))
        np.testing.assert_allclose(np.asarray(f), np.asarray(f_direct), rtol=1e-5, atol=1e-5)

    def test_reflect_state_negates_normal_momentum(self):
        u = random_states(8, seed=12)
        n = np.tile(np.array([[0.0], [1.0], [0.0]], dtype=np.float32), (1, 8))
        basis = euler.face_basis(jnp.asarray(n))
        r = np.asarray(euler.reflect_state(jnp.asarray(u, jnp.float32), *basis))
        rot = np.asarray(euler.rotate_state(jnp.asarray(u, jnp.float32), *basis))
        np.testing.assert_allclose(r[1], -rot[1], rtol=1e-6)
        np.testing.assert_allclose(r[[0, 2, 3, 4]], rot[[0, 2, 3, 4]], rtol=1e-6)


class TestEntropyStability:
    def test_dissipation_reduces_entropy_flux(self):
        """v_jump . (f_es - f_central) <= 0 for each face (entropy stability
        of the added dissipation term)."""
        uL = random_states(256, seed=13)
        uR = random_states(256, seed=14)
        jL, jR = jnp.asarray(uL, jnp.float32), jnp.asarray(uR, jnp.float32)
        f_es, _ = euler.kepes_es_flux(jL, jR)
        f_c, _ = euler.kepes_flux(jL, jR)
        dv = np.array([ref.entropy_vars(uR[:, i]) - ref.entropy_vars(uL[:, i])
                       for i in range(uL.shape[1])]).T
        contraction = (dv * (np.asarray(f_es) - np.asarray(f_c))).sum(axis=0)
        assert (contraction <= 1e-5).all()


@pytest.mark.parametrize("flux", ["kepes", "hll"])
def test_dispatch(flux):
    u = jnp.asarray(random_states(8), jnp.float32)
    out, speed = euler.numerical_flux(u, u, flux=flux)
    assert out.shape == (5, 8)
    assert np.isfinite(np.asarray(out)).all()


class TestCellFields:
    """The precomputed-fields hot path must match the per-face reference
    formulation (ops/euler.kepes_es_flux / hll_flux) to fp tolerance."""

    @pytest.mark.parametrize("flux", ["kepes", "hll"])
    def test_fields_flux_matches_state_flux(self, flux):
        uL = jnp.asarray(random_states(512, seed=21), jnp.float32)
        uR = jnp.asarray(random_states(512, seed=22), jnp.float32)
        qL = euler.cell_fields(uL, 1.4, flux)
        qR = euler.cell_fields(uR, 1.4, flux)
        assert qL.shape == (euler.N_FIELDS[flux], 512)
        f_ref, s_ref = euler.numerical_flux(uL, uR, gamma=1.4, flux=flux)
        f_new, s_new = euler.fields_flux(qL, qR, gamma=1.4, flux=flux)
        np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                                   rtol=5e-5, atol=5e-5)
        np.testing.assert_allclose(np.asarray(s_new), np.asarray(s_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_fields_flux_near_equal_states(self):
        """The ln_mean series/exact crossover must stay finite and accurate
        when states are nearly equal (the log-difference regime)."""
        u = random_states(64, seed=23)
        for delta in (0.0, 1e-6, 1e-4, 1e-2):
            uL = jnp.asarray(u, jnp.float32)
            uR = jnp.asarray(u * (1.0 + delta), jnp.float32)
            f_ref, _ = euler.kepes_es_flux(uL, uR)
            f_new, _ = euler.fields_flux(
                euler.cell_fields(uL, 1.4, "kepes"),
                euler.cell_fields(uR, 1.4, "kepes"), gamma=1.4, flux="kepes")
            assert np.isfinite(np.asarray(f_new)).all()
            np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                                       rtol=1e-4, atol=1e-4)

    def test_fields_axis_rotation_matches_general_basis(self):
        """Static row permutation == general-basis rotation for axis-aligned
        normals (the Cartesian fast path)."""
        u = jnp.asarray(random_states(64, seed=24), jnp.float32)
        q = euler.cell_fields(u, 1.4, "kepes")
        for axis in range(3):
            n = np.zeros((3, 64), np.float32)
            n[axis] = 1.0
            basis = euler.face_basis(jnp.asarray(n))
            f_gen, s_gen = euler.fields_flux(
                euler.fields_rotate(q, *basis), euler.fields_rotate(q, *basis),
                gamma=1.4, flux="kepes")
            f_gen = euler.inverse_rotate_state(f_gen, *basis)
            f_ax, s_ax = euler.fields_flux(
                euler.fields_axis_rotate(q, axis),
                euler.fields_axis_rotate(q, axis), gamma=1.4, flux="kepes")
            f_ax = euler.flux_axis_unrotate(f_ax, axis)
            np.testing.assert_allclose(np.asarray(f_ax), np.asarray(f_gen),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(s_ax), np.asarray(s_gen),
                                       rtol=1e-6)

    def test_fields_mirror_is_reflection(self):
        u = jnp.asarray(random_states(32, seed=25), jnp.float32)
        q = euler.cell_fields(u, 1.4, "kepes")
        m = euler.fields_mirror(q)
        np.testing.assert_allclose(np.asarray(m[1]), -np.asarray(q[1]))
        np.testing.assert_allclose(np.asarray(m[0]), np.asarray(q[0]))
        np.testing.assert_allclose(np.asarray(m[4:]), np.asarray(q[4:]))


def test_fast_log_matches_native():
    """ops/euler.fast_log (the in-kernel exponent-split log): same f32
    accuracy as the native log over the scheme's input range, exact
    handoff at x ~ 1 (the ln_mean series/exact boundary)."""
    import numpy as np

    from t8gpu_tpu.ops.euler import fast_log

    rng = np.random.default_rng(7)
    x = np.exp(rng.uniform(np.log(1e-4), np.log(1e4),
                           200_000)).astype(np.float32)
    got = np.asarray(jax.jit(fast_log)(x), np.float64)
    exact = np.log(x.astype(np.float64))
    err = np.abs(got - exact)
    # absolute near log=0, relative beyond (e*ln2 rounding scales with e)
    assert (err / np.maximum(np.abs(exact), 1.0)).max() < 5e-7, err.max()
    # powers of two are exact (mantissa 1.0, poly(0) = 0)
    p2 = np.float32([0.25, 0.5, 1.0, 2.0, 4.0])
    np.testing.assert_allclose(np.asarray(jax.jit(fast_log)(p2)),
                               np.log(p2), rtol=0, atol=3e-7)
