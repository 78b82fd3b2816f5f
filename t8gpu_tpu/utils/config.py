"""Runtime configuration.

The reference hardwires all of these as compile-time constants scattered
through the tree (gamma=1.4 in `examples/compressible_euler/kernels.cu:49`
with a TODO to remove it; cfl=0.7 in `examples/compressible_euler/solver.h:37`;
min/max refinement levels in `t8gpu/mesh/mesh_manager.h:241-242`; the
refinement threshold b in `t8gpu/mesh/mesh_manager.inl:141`).  Here they are
promoted to real config dataclasses; values that shape jitted computations
(capacity buckets, subgrid extents) remain static arguments to `jax.jit`.
"""

from __future__ import annotations

import dataclasses


def resolve_dtype(name):
    """`jnp.dtype` for a config dtype string, refusing silent downcasts:
    requesting a 64-bit dtype without jax x64 mode would otherwise run
    float32 while `solver.dtype` reports float64 (jnp.asarray downcasts
    silently).  Raise instead so the caller enables
    `jax.config.update('jax_enable_x64', True)` (or `jax.enable_x64`)."""
    import jax
    import jax.numpy as jnp

    dt = jnp.dtype(name)
    if dt.itemsize == 8 and not jax.config.jax_enable_x64:
        raise ValueError(
            f"config dtype {name!r} needs jax x64 mode, which is disabled "
            "— jax would silently downcast the state to 32-bit.  Enable it "
            "with jax.config.update('jax_enable_x64', True) or run inside "
            "`with jax.enable_x64(True):`.")
    return dt


@dataclasses.dataclass(frozen=True)
class EulerConfig:
    """Physics / scheme parameters for the compressible-Euler solvers."""

    gamma: float = 1.4          # ratio of specific heats (ref kernels.cu:49)
    cfl: float = 0.7            # CFL number (ref solver.h:37)
    flux: str = "kepes"         # "kepes" (entropy stable), "hll" (ref kernels.inl:264),
                                # or "hllc" (contact-restoring; beyond-reference)
    # State dtype for the plain-element solver.  The reference gates its
    # float type behind the variable_traits::float_type hook but only ever
    # instantiates float (memory_manager.h:27-42); here "float64" actually
    # works (requires jax x64 mode; CPU-practical — TPUs emulate f64).
    # The subgrid/Pallas kernels are float32-only (Mosaic has no f64).
    dtype: str = "float32"
    # Uniform body force (beyond-reference): adds rho*g to the momentum
    # equations and (rho v).g to the energy equation as an unsplit source
    # inside every RK stage — buoyancy-driven flows (Rayleigh-Taylor,
    # stratified KH).  Subgrid solvers with gravity use the XLA stencil
    # path (the fused kernels integrate the homogeneous system).
    gravity: tuple = (0.0, 0.0, 0.0)
    # Spatial order of the plain-element scheme: 1 = cell states at faces
    # (the reference scheme, kernels.cu:150-172); 2 = MUSCL reconstruction
    # from Green-Gauss gradients with a Barth-Jespersen limiter
    # (ops/reconstruct.py; beyond-reference).
    order: int = 1
    # Slope limiter for order=2: "bj" (Barth-Jespersen, strictly
    # monotone), "venkat" (Venkatakrishnan — smooth, keeps ~order 1.85 at
    # extrema, slight bounded overshoot), or "none" (unlimited,
    # convergence studies only).  The subgrid path maps bj/venkat to its
    # per-axis minmod variant.  A "-prim" suffix (e.g. "bj-prim")
    # selects PRIMITIVE-space reconstruction on the subgrid path:
    # slopes/limiting/positivity on (rho, v, p) rows instead of
    # conserved rows (ops/euler.prim_rows) — the same order of accuracy
    # (standard practice), cheaper guards and interface fields in the
    # fused kernel (the round-4 finding that the MUSCL kernel is
    # reconstruction-bound, BENCHMARKS.md); kepes flux only.
    limiter: str = "bj"
    # Dynamic viscosity (beyond-reference: compressible Navier-Stokes on
    # the plain-element path, any element class).  mu > 0 adds the full
    # Newtonian stress tensor + Fourier heat conduction as a diffusive
    # face flux (ops/viscous.py) and folds the diffusive dt limit into
    # the CFL speed.  Reflective walls stay free-slip adiabatic.
    mu: float = 0.0
    # Prandtl number: thermal conductivity kappa = mu*cp/Pr (cp =
    # gamma/(gamma-1) in the R = 1 nondimensionalization).
    prandtl: float = 0.72
    # Viscous wall model (mu > 0 only): "slip" = free-slip adiabatic
    # (zero viscous wall flux, matching the inviscid reflective walls);
    # "noslip" = wall shear from the one-sided normal derivative
    # (adiabatic) — channels, cavities, boundary layers.
    wall: str = "slip"
    # Velocity of no-slip walls (tangential projection per wall; the
    # normal component is ignored — impermeability stays reflective).
    # A moving lid drives cavity/Couette flows; its shear does work on
    # the fluid (energy injection through the wall).  Either a uniform
    # (vx, vy, vz) tuple, or a CALLABLE face_centroids [Fb, 3] ->
    # [3, Fb] for per-wall fields (e.g. only the cavity lid moving);
    # callables are single-device (checkpoint meta stores them as 0).
    wall_velocity: tuple = (0.0, 0.0, 0.0)
    # No-slip wall thermal condition: None = adiabatic (zero heat flux);
    # a float = isothermal wall at that temperature (T = p/rho units) —
    # the wall exchanges heat at kappa (T_wall - T)/dn.
    wall_temperature: float = None
    # Boundary model on non-periodic faces: "reflective" (the reference's
    # walls, kernels.cu:311-469) or "farfield" — open boundaries whose
    # ghost is the prescribed exterior primitive state `farfield` =
    # (rho, vx, vy, vz, p); the upwind flux sorts inflow from outflow
    # (use flux="hll"/"hllc"; plain-element path).  Waves exit without
    # reflecting; mass/momentum/energy exchange with the exterior.
    boundary: str = "reflective"
    farfield: tuple = None


@dataclasses.dataclass(frozen=True)
class AMRConfig:
    """Adaptive-refinement parameters.

    `refine_threshold` plays the role of `b` in the reference adapt callback
    (`mesh_manager.inl:141` uses b=10.0 for the plain solver;
    `subgrid_mesh_manager.inl:214` uses b=0.02 for the subgrid solver):
    refine when criteria > b, coarsen a family when its mean criteria < b.
    """

    min_level: int = 1
    max_level: int = 4
    refine_threshold: float = 10.0
    # Capacity growth factor for element buffers.  Mirrors the reference's
    # SharedDeviceVector 1.5x growth (shared_device_vector.inl:85); on TPU the
    # payoff is fewer XLA recompilations when the element count changes.
    growth_factor: float = 1.5


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Driver-level parameters (ref: hardcoded in examples/*/main*.cu)."""

    n_steps: int = 1000
    dt: float = 5.0e-4
    adapt_every: int = 100
    vtk_every: int = 0          # 0 disables VTK output
    output_prefix: str = "out"
