"""Device-side time-series observables for fused step batches.

The reference exposes ONE on-demand diagnostic (compute_integral,
solver.cu:190-211) and every sample costs a device->host round trip.
Through this container's TPU tunnel a scalar fetch costs 0.5 s to
minutes (CLAUDE.md measurement protocol) — per-step Python-side
sampling is unusable.  `iterate_record` on the Euler solvers instead
carries the observables THROUGH the fused step batch: a `lax.scan`
computes the requested global reductions after every RK3 step and
stacks them into ONE [n_steps, K] device array — one fetch per batch,
exact per-step histories (kinetic-energy decay curves, entropy audits,
conservation drift) at fused-dispatch speed.

Every observable is a pure function (u, cell_volume, gamma) -> scalar
with u [5, ...cells] in conservative variables and cell_volume
broadcastable against a cell field; padded element slots carry zero
volume, so the reductions ignore them by construction.  The same
functions serve the plain ([5, N]) and subgrid ([5, *ext, E]) layouts.
"""

from __future__ import annotations

import jax.numpy as jnp


def _ke(u):
    return 0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / u[0]


def _pressure(u, gamma):
    return (gamma - 1.0) * (u[4] - _ke(u))


def mass(u, vol, gamma):
    return (u[0] * vol).sum()


def momentum_x(u, vol, gamma):
    return (u[1] * vol).sum()


def momentum_y(u, vol, gamma):
    return (u[2] * vol).sum()


def momentum_z(u, vol, gamma):
    return (u[3] * vol).sum()


def total_energy(u, vol, gamma):
    return (u[4] * vol).sum()


def kinetic_energy(u, vol, gamma):
    return (_ke(u) * vol).sum()


def internal_energy(u, vol, gamma):
    return ((u[4] - _ke(u)) * vol).sum()


def entropy(u, vol, gamma):
    """Entropy function U = -rho log(p rho^-gamma)/(gamma-1) dV —
    non-increasing in time under the entropy-stable KEPES flux (the
    property the reference's scheme is named after; guard-state padded
    slots are finite and carry zero volume)."""
    s = jnp.log(_pressure(u, gamma)) - gamma * jnp.log(u[0])
    return (-u[0] * s / (gamma - 1.0) * vol).sum()


def max_mach(u, vol, gamma):
    """Max cell Mach number over LIVE cells (vol > 0 masks padding)."""
    v2 = (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) / (u[0] * u[0])
    c2 = gamma * _pressure(u, gamma) / u[0]
    m2 = jnp.where(vol > 0, v2 / c2, 0.0)
    return jnp.sqrt(m2.max())


OBSERVABLES = {
    "mass": mass,
    "momentum_x": momentum_x,
    "momentum_y": momentum_y,
    "momentum_z": momentum_z,
    "total_energy": total_energy,
    "kinetic_energy": kinetic_energy,
    "internal_energy": internal_energy,
    "entropy": entropy,
    "max_mach": max_mach,
}


# how each observable's per-shard value combines across a device mesh
# (inside shard_map: "sum" -> lax.psum, "max" -> lax.pmax); every
# integral is a sum, extrema are maxes
REDUCERS = {name: "sum" for name in OBSERVABLES}
REDUCERS["max_mach"] = "max"


def resolve(names, registry=None) -> tuple:
    """Validate observable names -> tuple of functions (registry order
    is the caller's order).  Rejects an empty request up front — an
    empty jnp.stack would otherwise fail obscurely at trace time.

    `registry` defaults to the Euler OBSERVABLES; other model families
    pass their own dicts (models/advection.ADVECTION_OBSERVABLES,
    models/shallow_water.SW_OBSERVABLES) — every entry has the same
    (u, cell_volume, param) -> scalar contract."""
    if registry is None:
        registry = OBSERVABLES
    names = tuple(names)
    if not names:
        raise ValueError("iterate_record needs at least one observable; "
                         f"available: {sorted(registry)}")
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise ValueError(f"unknown observables {unknown}; "
                         f"available: {sorted(registry)}")
    return tuple(registry[n] for n in names)
