"""Source terms (beyond-reference: the reference integrates the
homogeneous Euler system only).

Gravity enters UNSPLIT: the RK stage update is u += dt/V * (F + V*S(u)),
so every SSP-RK3 stage sees the source at its own state — no operator
splitting error.  For a uniform body force g:

    d(rho v)/dt += rho g        d(rho E)/dt += (rho v) . g

Mass is untouched (exactly conserved); momentum/energy change by design
(the physical injection integral).
"""

from __future__ import annotations

import jax.numpy as jnp


def volume_from_inverse(inv):
    """Padded-slot-safe 1/inv: 0 where inv == 0 (capacity padding), so
    source terms vanish on guard slots."""
    return jnp.where(inv > 0, 1.0 / jnp.where(inv > 0, inv, 1.0), 0.0)


def has_gravity(gravity) -> bool:
    return any(float(c) != 0.0 for c in gravity)


def with_gravity(flux_fn, gravity, volume):
    """Wrap a (u -> (divergence, speed)) closure so every evaluation adds
    the gravity source scaled by the element/cell volume (the RK stages
    multiply by dt/V, so S must enter as V*S).

    `volume` broadcasts against the divergence's trailing element axes
    and is 0 on padded slots (keeping guard states quiescent)."""
    g = tuple(float(c) for c in gravity)

    def fn(u):
        d, speed = flux_fn(u)
        zero = jnp.zeros_like(u[0])
        src = jnp.stack([
            zero,
            u[0] * g[0] if g[0] else zero,
            u[0] * g[1] if g[1] else zero,
            u[0] * g[2] if g[2] else zero,
            u[1] * g[0] + u[2] * g[1] + u[3] * g[2],
        ])
        return d + src * volume, speed

    return fn
