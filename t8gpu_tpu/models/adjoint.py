"""Differentiable rollouts: reverse-mode AD (adjoints) through the solvers.

A capability the reference architecture cannot express: its time step is a
sequence of in-place CUDA kernel launches with atomicAdd flux scatters and
MPI barriers between them (examples/compressible_euler/solver.cu:75-175),
so there is no adjoint short of hand-deriving one.  Here every step is a
pure function of the state, so `jax.grad` applies directly — enabling
sensitivity analysis, initial-condition/data assimilation, and
parameter-estimation workflows on top of the same flux/RK code the forward
solver runs.

Design notes
------------
- Rollouts are built with `lax.scan` (reverse-differentiable), NOT the
  `lax.fori_loop` the forward-only `iterate_many` uses (fori_loop has no
  reverse-mode rule).
- Each step is wrapped in `jax.checkpoint` by default so the backward pass
  rematerializes per-step intermediates: memory stays O(state + n_steps
  checkpoints) instead of O(n_steps x per-step flux temporaries).  Pass
  ``remat=False`` for short horizons where storing everything is faster.
- The fused Pallas kernels define no VJP; differentiable subgrid rollouts
  therefore force the XLA stencil path (``use_pallas=False``), which is
  equivalence-tested against the kernels (tests/test_pallas.py) so the
  primal trajectory matches the production path to fp tolerance.
- Gradients flow to ``u0`` and ``dt`` (and any closure parameter via
  standard JAX composition).  Padded capacity slots hold GUARD_STATE and
  do not couple to real elements, so their cotangents are discardable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from t8gpu_tpu.ops import rk

__all__ = [
    "rollout_plain",
    "rollout_subgrid",
    "rollout_sharded",
    "rollout",
    "loss_and_grad",
]


def _scan_rollout(step, u0, n_steps: int, remat: bool):
    if remat:
        step = jax.checkpoint(step)

    u_final, _ = jax.lax.scan(step, u0, xs=None, length=n_steps)
    return u_final


def rollout_plain(u0, dt, n_steps: int, conn, inv_volume, *,
                  gamma: float = 1.4, flux: str = "kepes",
                  mode: str = "gather", order: int = 1,
                  limiter: str = "bj", dim: int = 2,
                  gravity=(0.0, 0.0, 0.0), mu: float = 0.0,
                  prandtl: float = 0.72, remat: bool = True):
    """Differentiable n-step SSP-RK3 rollout on plain elements.

    Same flux path as CompressibleEulerSolver.iterate_many
    (ops/fluxes.flux_divergence, or the MUSCL reconstruction for
    order=2 — every piece is where-guarded, so reverse-mode stays
    NaN-free; the BJ limiter's min/clip kinks make gradients
    a.e.-exact like any limited scheme's).  Returns the final state
    [5, capacity].  Differentiable wrt ``u0`` and ``dt``.
    """
    from t8gpu_tpu.models.compressible_euler import _make_flux_fn

    flux_fn = _make_flux_fn(conn, inv_volume, gamma=gamma, flux=flux,
                            mode=mode, order=order, limiter=limiter,
                            dim=dim, gravity=tuple(gravity), mu=mu,
                            prandtl=prandtl)

    def step(u, _):
        u_next, _aux = rk.ssp_rk3(u, flux_fn, dt, inv_volume)
        return u_next, None

    return _scan_rollout(step, u0, n_steps, remat)


def rollout_subgrid(u0, dt, n_steps: int, volumes, conn, spec,
                    inv_cell_volume, *, gamma: float = 1.4,
                    flux: str = "kepes", order: int = 1,
                    limiter: str = "minmod", gravity=(0.0, 0.0, 0.0),
                    remat: bool = True):
    """Differentiable n-step rollout on subgrid elements ([5, *ext, Ecap]).

    Forces the XLA stencil path (the Pallas kernels have no VJP); the
    stencil is cell-exact against the kernels on the same mesh.  order=2
    rolls out the same MUSCL scheme the forward solver steps
    (ops/subgrid.flux_divergence_muscl).
    """
    from t8gpu_tpu.ops import subgrid as sg

    if order == 2:
        flux_fn = lambda v: sg.flux_divergence_muscl(
            v, volumes, conn, spec, gamma, flux, limiter=limiter)
    else:
        flux_fn = lambda v: sg.flux_divergence(v, volumes, conn, spec,
                                               gamma, flux,
                                               use_pallas=False)
    from t8gpu_tpu.models.subgrid_euler import _with_cell_gravity
    from t8gpu_tpu.ops.source import has_gravity
    if has_gravity(gravity):
        flux_fn = _with_cell_gravity(flux_fn, tuple(gravity),
                                     inv_cell_volume)

    def step(u, _):
        u_next, _aux = rk.ssp_rk3(u, flux_fn, dt, inv_cell_volume)
        return u_next, None

    return _scan_rollout(step, u0, n_steps, remat)


def rollout_sharded(solver, dt, n_steps: int, u0=None, remat: bool = True):
    """Differentiable rollout over the DEVICE MESH: the same shard_map
    step the sharded plain-element solvers run (halo ppermute rounds +
    per-shard flux divergence), built on `lax.scan` so reverse-mode AD
    applies — shard_map collectives carry transpose rules (the psum/
    ppermute adjoints ride the same ICI links backwards), so gradients
    of multi-chip rollouts need no single-device rebuild.

    `solver` is any ShardedEulerSolver-family instance (plain elements);
    returns the final sharded state [rows, S*CL].  Differentiate w.r.t.
    ``u0`` (defaults to the solver's current state) with jax.grad as
    usual.  The sharded SUBGRID solvers stay via the single-device
    rebuild recipe (docs/MIGRATING.md)."""
    import functools

    from jax.sharding import PartitionSpec as P

    from t8gpu_tpu.parallel import halo

    divergence = solver._flux_divergence_vol

    @functools.partial(
        jax.shard_map, mesh=solver.mesh_dev,
        in_specs=(P(None, halo.AXIS), P(halo.AXIS), P(halo.AXIS),
                  P(halo.AXIS), P()),
        out_specs=P(None, halo.AXIS))
    def roll(u, conn, inv_vol, vol, dt):
        conn = jax.tree.map(lambda x: x[0], conn)
        flux_fn = lambda v: divergence(v, conn, inv_vol, vol)

        def step(v, _):
            v_next, _speed = rk.ssp_rk3(v, flux_fn, dt, inv_vol)
            return v_next, None

        if remat:
            step = jax.checkpoint(step)
        u_final, _ = jax.lax.scan(step, u, xs=None, length=n_steps)
        return u_final

    u0 = solver.u if u0 is None else u0
    return roll(u0, solver.conn, solver.inv_volume, solver.volume,
                jnp.float32(dt))


def rollout(solver, dt, n_steps: int, u0=None, remat: bool = True):
    """Differentiable rollout using a live solver's mesh/connectivity.

    ``solver`` is a CompressibleEulerSolver or SubgridCompressibleEulerSolver;
    its current state is the default ``u0``.  The solver itself is NOT
    mutated — this returns the final state as a value.
    """
    if hasattr(solver, "n_shards"):
        if hasattr(solver, "spec"):      # sharded subgrid solvers
            raise NotImplementedError(
                "sharded SUBGRID rollouts are not differentiable in "
                "place (the halo plan mutates per adapt); rebuild a "
                "single-device solver from conserved_state() to "
                "differentiate — recipe in docs/MIGRATING.md")
        return rollout_sharded(solver, dt, n_steps, u0=u0, remat=remat)
    u0 = solver.u if u0 is None else u0
    cfg = solver.config
    if hasattr(solver, "spec"):          # subgrid solver
        return rollout_subgrid(
            u0, dt, n_steps, solver.volumes, solver.conn, solver.spec,
            solver.inv_cell_volume, gamma=cfg.gamma, flux=cfg.flux,
            order=getattr(cfg, "order", 1),
            limiter=solver._sg_limiter(),
            gravity=tuple(getattr(cfg, "gravity", (0.0, 0.0, 0.0))),
            remat=remat)
    return rollout_plain(
        u0, dt, n_steps, solver.conn, solver.inv_volume,
        gamma=cfg.gamma, flux=cfg.flux,
        order=getattr(cfg, "order", 1),
        limiter=getattr(cfg, "limiter", "bj"),
        dim=getattr(solver, "mesh_dim", 2),
        gravity=tuple(getattr(cfg, "gravity", (0.0, 0.0, 0.0))),
        mu=float(getattr(cfg, "mu", 0.0)),
        prandtl=float(getattr(cfg, "prandtl", 0.72)),
        remat=remat)


def loss_and_grad(solver, loss_fn, dt, n_steps: int, remat: bool = True):
    """(loss, d loss/d u0) for ``loss_fn(u_final) -> scalar`` after an
    n-step rollout from the solver's current state.

    One-shot convenience — each call traces afresh.  For optimization
    loops, jit your own objective once (see examples/adjoint_ic.py):
    ``jax.jit(jax.value_and_grad(lambda u0: loss_fn(rollout(...))))``.
    """

    def objective(u0):
        return loss_fn(rollout(solver, dt, n_steps, u0=u0, remat=remat))

    return jax.value_and_grad(objective)(solver.u)
