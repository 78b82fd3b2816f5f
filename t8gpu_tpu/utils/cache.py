"""Persistent XLA compilation cache setup.

Step programs here take 30-300 s to compile on TPU (big fused flux+RK
graphs); enabling JAX's persistent cache makes every process after the
first start instantly.  Called by bench.py and the example drivers; safe
to call multiple times.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "T8GPU_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "t8gpu_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
