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
