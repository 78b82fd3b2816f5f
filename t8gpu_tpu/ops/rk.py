"""Shu-Osher SSP-RK3 time integration.

TPU-native counterpart of the reference RK kernels
(`t8gpu/timestepping/ssp_runge_kutta.inl:30-99` plain,
`:101-221` subgrid).  The reference launches one CUDA kernel per stage and
zeroes the flux accumulator in-place; here each stage is a pure elementwise
update that XLA fuses with the flux computation feeding it, and the
accumulator is rebuilt functionally each stage so nothing needs zeroing.

The same functions serve plain elements (state [5, N], inv_volume [N]) and
subgrid elements (state [5, E, bx, by(, bz)], inv_volume broadcastable):
they are shape-polymorphic elementwise ops.
"""

from __future__ import annotations


# Stage coefficients (ref ssp_runge_kutta.inl:6-26).  The reference stores
# 0.33333333333333f / 0.66666666666666f which round to the same float32
# values as 1/3 and 2/3.
STAGE_2 = (0.75, 0.25, 0.25)
STAGE_3 = (1.0 / 3.0, 2.0 / 3.0, 2.0 / 3.0)


def stage1(u_prev, flux, dt, inv_volume):
    """u1 = u0 + dt/V * F   (ref ssp_runge_kutta.inl:30-49)."""
    return u_prev + (dt * inv_volume) * flux


def stage2(u_prev, u1, flux, dt, inv_volume):
    """u2 = 3/4 u0 + 1/4 u1 + 1/4 dt/V * F   (ref inl:51-74)."""
    a, b, c = STAGE_2
    return a * u_prev + b * u1 + (c * dt * inv_volume) * flux


def stage3(u_prev, u2, flux, dt, inv_volume):
    """u_next = 1/3 u0 + 2/3 u2 + 2/3 dt/V * F   (ref inl:76-99)."""
    a, b, c = STAGE_3
    return a * u_prev + b * u2 + (c * dt * inv_volume) * flux


def ssp_rk3(u_prev, flux_fn, dt, inv_volume):
    """One full SSP-RK3 step: flux_fn(u) -> (flux_divergence, aux).

    Returns (u_next, aux_of_last_stage).  `aux` carries e.g. the max wave
    speed; only the first stage's aux is returned since that is what the
    reference uses for its CFL estimate (speed estimates are overwritten
    every flux launch, solver.cu:81-175 — the last launch wins there; any
    stage is an equally valid CFL proxy and stage 1 lets XLA overlap better).
    """
    f0, aux = flux_fn(u_prev)
    u1 = stage1(u_prev, f0, dt, inv_volume)
    f1, _ = flux_fn(u1)
    u2 = stage2(u_prev, u1, f1, dt, inv_volume)
    f2, _ = flux_fn(u2)
    u_next = stage3(u_prev, u2, f2, dt, inv_volume)
    return u_next, aux
