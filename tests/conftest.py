"""Test harness configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic
(halo exchange, partition, pmax reductions) is exercised without a TPU
slice — the strategy SURVEY.md §4 prescribes.

The platform forcing lives in t8gpu_tpu_test_bootstrap.py (a -p plugin in
pyproject addopts): it re-execs pytest with a scrubbed environment because
the container's sitecustomize eagerly initializes a TPU backend before any
conftest runs, and it must act before pytest's fd capture starts.
"""

import jax

jax.config.update("jax_enable_x64", False)  # float32 like the reference (memory_manager.h:29)

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8, (
    "tests expect an 8-device virtual CPU mesh; got "
    f"{jax.default_backend()} x {len(jax.devices())}"
)
