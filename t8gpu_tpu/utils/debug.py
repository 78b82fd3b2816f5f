"""Debug checks — the reference's error-macro layer, TPU-style.

The reference wraps every CUDA call in `T8GPU_CUDA_CHECK_ERROR` and, in
Debug builds, serializes kernel launches with `cudaDeviceSynchronize` to
surface async failures at the launch site (`t8gpu/utils/cuda.h:7-33`).
JAX surfaces device errors as exceptions, so the useful analogues are
NaN/Inf surveillance and launch-site synchronization:

    with debug_mode():            # jax_debug_nans + disable_jit-free sync
        solver.iterate(dt)

    check_finite(solver.u, "state after step")   # explicit assert
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


def check_finite(tree, what: str = "array") -> None:
    """Assert every leaf is finite (host sync; use in debug paths only)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{what}{jax.tree_util.keystr(path)}: {bad} non-finite values")


@contextlib.contextmanager
def debug_mode():
    """Raise on NaN production inside jitted code (the TPU analogue of the
    reference's Debug-build launch checking; noticeably slower)."""
    with jax.debug_nans(True):
        yield


def audit_determinism(solver, dt: float, n_steps: int = 3,
                      what: str = "step batch") -> None:
    """Race-detection, TPU-style: run the same step batch twice from the
    identical state and assert BITWISE-equal results.

    The reference accumulates fluxes with `atomicAdd` (kernels.cu:295-308),
    so its results are run-to-run nondeterministic by design and a data
    race is indistinguishable from reduction-order noise.  This framework
    has no atomics and fixed reduction orders, so determinism is an
    testable invariant: ANY scheduling-dependent behavior (a data race, a
    nondeterministic collective, an unsynchronized host mutation) trips
    this audit.  Leaves the solver stepped once (as if iterate_many had
    been called).  Works on any solver with a `u` state array and
    `iterate_many` (every model family, single-device and sharded)."""
    import jax.numpy as jnp

    u0 = jnp.array(solver.u, copy=True)       # survive donation
    solver.u = jnp.array(u0, copy=True)
    solver.iterate_many(n_steps, dt)
    a = np.asarray(solver.u)
    solver.u = jnp.array(u0, copy=True)
    solver.iterate_many(n_steps, dt)
    b = np.asarray(solver.u)
    if a.tobytes() != b.tobytes():            # bitwise, incl. NaN pattern
        # (tobytes, not array_equal: identical NaNs must compare equal —
        # a deterministically blown-up run is exactly when this tool is
        # reached for, and it must not cry race there)
        with np.errstate(invalid="ignore"):
            n_bad = int(((a != b) & ~(np.isnan(a) & np.isnan(b))).sum())
            worst = float(np.nanmax(np.abs(a - b)))
        raise AssertionError(
            f"nondeterministic {what}: ~{n_bad} values differ between two "
            f"identical runs (max |delta| {worst:.3e}) — scheduling-"
            "dependent behavior (data race / nondeterministic reduction)")
