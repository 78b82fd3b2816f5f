"""A/B: KEPES eigen-dissipation as scalar algebra vs batched-matrix einsum.

VERDICT r3 item 3: the R diag(D) R^T entropy-jump contraction
(ops/euler.py kepes_fields_flux; ref kernels.cu:236-279) is ~50 VPU ops
per interface while the MXU idles.  This measures an einsum formulation
(R materialized [5, 5, N], two batched contractions over the 5-axis)
against the production scalar form on identical inputs, on-device, with
the slope protocol (iters I2 - I1 of a scan whose inputs depend on the
previous output, so XLA cannot hoist the work).

Expectation (recorded either way): per-interface 5x5 matrices share no
operand, so XLA lowers the batched einsum to VPU multiply-adds PLUS the
materialization of 25 R rows — more HBM traffic and more VPU issue than
the factored scalar algebra, which never forms R.  The MXU needs a
SHARED matrix operand to win; there is none in this contraction.

    python scripts/mxu_diss_ab.py [--n 2097152] [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from t8gpu_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.ops.euler import cell_fields_tuple, kepes_fields_flux

GAMMA = 1.4


def kepes_flux_einsum(q_l, q_r, gamma):
    """kepes_fields_flux with the dissipation as R diag(d) R^T dv via
    two batched einsum contractions (the 'MXU formulation')."""
    kappa_m1 = gamma - 1.0
    rho_l, u_l, v_l, w_l, p_l, rhop_l, lrho_l, lp_l, vent0_l, ke_l = q_l
    rho_r, u_r, v_r, w_r, p_r, rhop_r, lrho_r, lp_r, vent0_r, ke_r = q_r

    d_r = rho_r - rho_l
    s_r = rho_l + rho_r
    d_b = rhop_r - rhop_l
    s_b = rhop_l + rhop_r
    s_r2 = s_r * s_r
    s_b2 = s_b * s_b
    q2 = 1.0 / (s_r2 * s_b2)
    vsq_r = (d_r * d_r) * s_b2 * q2
    vsq_b = (d_b * d_b) * s_r2 * q2
    c_r = vsq_r < 1.0e-4
    c_b = vsq_b < 1.0e-4
    num_r = jnp.where(c_r, s_r * 52.5, d_r)
    den_r = jnp.where(
        c_r, 105.0 + vsq_r * (35.0 + vsq_r * (21.0 + vsq_r * 15.0)),
        lrho_r - lrho_l)
    num_b = jnp.where(c_b, s_b * 52.5, d_b)
    den_b = jnp.where(
        c_b, 105.0 + vsq_b * (35.0 + vsq_b * (21.0 + vsq_b * 15.0)),
        (lrho_r - lp_r) - (lrho_l - lp_l))
    Q = 1.0 / (den_r * num_b * s_b)
    nbsb = num_b * s_b
    rho_hat = num_r * nbsb * Q
    inv_bh = (2.0 * den_b * den_r * s_b) * Q
    p1_hat = s_r * den_r * num_b * Q

    u_hat = 0.5 * (u_l + u_r)
    v_hat = 0.5 * (v_l + v_r)
    w_hat = 0.5 * (w_l + w_r)
    a_hat = (jnp.sqrt((gamma * 0.5) * (p_l + p_r))
             * jax.lax.rsqrt(rho_hat))
    h_hat = (gamma / (2.0 * kappa_m1)) * inv_bh + 0.5 * (
        u_l * u_r + v_l * v_r + w_l * w_r)
    vel2_m = ke_l + ke_r

    f0 = rho_hat * u_hat
    f1 = f0 * u_hat + p1_hat
    f2 = f0 * v_hat
    f3 = f0 * w_hat
    f4 = (f0 * 0.5 * ((1.0 / kappa_m1) * inv_bh - vel2_m)
          + u_hat * f1 + v_hat * f2 + w_hat * f3)

    one = jnp.ones_like(u_hat)
    zero = jnp.zeros_like(u_hat)
    ek = 0.5 * (u_hat * u_hat + v_hat * v_hat + w_hat * w_hat)
    # eigenvector matrix R [5, 5, N] (ref kernels.cu:236-262)
    R = jnp.stack([
        jnp.stack([one, one, zero, zero, one]),
        jnp.stack([u_hat - a_hat, u_hat, zero, zero, u_hat + a_hat]),
        jnp.stack([v_hat, v_hat, one, zero, v_hat]),
        jnp.stack([w_hat, w_hat, zero, one, w_hat]),
        jnp.stack([h_hat - u_hat * a_hat, ek, v_hat, w_hat,
                   h_hat + u_hat * a_hat]),
    ])
    d0 = (0.5 / gamma) * jnp.abs(u_hat - a_hat) * rho_hat
    d1 = jnp.abs(u_hat) * (kappa_m1 / gamma) * rho_hat
    d2 = jnp.abs(u_hat) * p1_hat
    d4 = (0.5 / gamma) * jnp.abs(u_hat + a_hat) * rho_hat
    dvec = jnp.stack([d0, d1, d2, d2, d4])              # [5, N]

    dv = jnp.stack([
        vent0_r - vent0_l,
        rhop_r * u_r - rhop_l * u_l,
        rhop_r * v_r - rhop_l * v_l,
        rhop_r * w_r - rhop_l * w_l,
        -(rhop_r - rhop_l)])                            # [5, N]

    wv = jnp.einsum("ikn,in->kn", R, dv)                # R^T dv
    diss = jnp.einsum("ikn,kn->in", R, dvec * wv)       # R diag(d) (.)

    flux = jnp.stack([f0, f1, f2, f3, f4]) - 0.5 * diss
    speed = jnp.abs(u_hat) + a_hat
    return flux, speed


def bench(fn, q_l, q_r, iters):
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def run(q_l, q_r, n):
        def body(carry, _):
            s = carry * 1e-30
            ql = tuple(r + s for r in q_l)
            f, sp = fn(ql, q_r)
            return f[0].mean() + sp.max(), None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    for n in (50, 450):              # warm both lengths
        run(q_l, q_r, n).block_until_ready()
    ts = {}
    for n in (50, 450):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(q_l, q_r, n))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[450] - ts[50]) / 400


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 21)
    args = p.parse_args()
    print(f"backend={jax.default_backend()} interfaces={args.n}")
    rng = np.random.default_rng(0)

    def admissible(n):
        rho = (0.5 + np.abs(rng.standard_normal(n))).astype(np.float32)
        v = rng.standard_normal((3, n)).astype(np.float32)
        pr = (0.5 + np.abs(rng.standard_normal(n))).astype(np.float32)
        e = pr / (GAMMA - 1) + 0.5 * rho * (v ** 2).sum(0)
        return np.stack([rho, rho * v[0], rho * v[1], rho * v[2], e])

    q_l = cell_fields_tuple(jnp.asarray(admissible(args.n)), GAMMA, "kepes")
    q_r = cell_fields_tuple(jnp.asarray(admissible(args.n)), GAMMA, "kepes")
    q_l = tuple(jnp.asarray(x) for x in q_l)
    q_r = tuple(jnp.asarray(x) for x in q_r)

    # numerical agreement first
    f_a, _ = kepes_fields_flux(q_l, q_r, GAMMA)
    f_b, _ = kepes_flux_einsum(q_l, q_r, GAMMA)
    err = float(jnp.abs(f_a - f_b).max() / jnp.abs(f_a).max())
    print(f"max rel deviation scalar vs einsum: {err:.2e}")

    t_scalar = bench(lambda a, b: kepes_fields_flux(a, b, GAMMA),
                     q_l, q_r, None)
    t_einsum = bench(lambda a, b: kepes_flux_einsum(a, b, GAMMA),
                     q_l, q_r, None)
    print(f"scalar algebra : {t_scalar*1e3:.3f} ms/eval "
          f"({args.n/t_scalar/1e9:.2f} G interface/s)")
    print(f"einsum (R-form): {t_einsum*1e3:.3f} ms/eval "
          f"({args.n/t_einsum/1e9:.2f} G interface/s)")
    print(f"einsum/scalar = {t_einsum/t_scalar:.2f}x")


if __name__ == "__main__":
    main()
