"""Adaptive mesh manager: the orchestration layer tying the host forest to
device state across AMR cycles.

TPU-native counterpart of the reference `MeshManager<V,S,dim>`
(`t8gpu/mesh/mesh_manager.h:232`, `mesh_manager.inl:195-330`): owns the
forest, exposes `adapt` (criteria -> flags -> refine/coarsen -> 2:1 balance
-> device data remap -> fresh connectivity) and `partition` hooks.  The
reference rebuilds its face lists on the host after every adapt
(`compute_connectivity_information`, mesh_manager.inl:332-481); here the
host forest emits the same flat arrays and the device state is remapped by
a single gather program (ops/amr.apply_remap) instead of the
`adapt_variables_and_volume` CUDA kernel (mesh_manager.inl:164-193).

Element counts change across adapts; all device arrays are padded to
capacity buckets (memory/store.bucket_capacity) so XLA programs are reused
between adapts at the same bucket.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import bucket_capacity
from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.ops.amr import apply_remap, pad_remap
from t8gpu_tpu.utils.config import AMRConfig


class MeshManager:
    """Owns an adaptive forest + its device-facing mesh arrays."""

    def __init__(self, forest: Forest, amr: AMRConfig = AMRConfig()):
        self.forest = forest
        self.amr = amr
        self.mesh = ForestMesh.from_forest(forest)

    # -- queries --------------------------------------------------------------

    @property
    def dim(self) -> int:
        return self.forest.dim

    @property
    def n_elements(self) -> int:
        return self.forest.n_elements

    @property
    def max_level(self) -> int:
        return int(self.forest.level.max())

    # -- AMR cycle (ref mesh_manager.inl:195-330) ------------------------------

    def adapt(self, criteria: np.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """One adapt cycle: flags from criteria, refine/coarsen + balance the
        forest, remap `u` (shape [..., capacity]) onto the new elements, and
        refresh the mesh arrays.  Returns the remapped state (padded to the
        new capacity bucket)."""
        flags = self.forest.flags_from_criteria(
            np.asarray(criteria)[: self.n_elements],
            b=self.amr.refine_threshold,
            min_level=self.amr.min_level, max_level=self.amr.max_level)
        new_forest, remap = self.forest.adapt(flags)
        new_forest, remap2 = new_forest.balance()
        remap = remap.compose(remap2)

        cap_new = bucket_capacity(new_forest.n_elements,
                                  self.amr.growth_factor)
        start, count = pad_remap(remap.src_start, remap.src_count, cap_new)
        k = 1 << self.forest.dim
        u_new = apply_remap(u, start, count, k=k, capacity=cap_new)

        self.forest = new_forest
        self.mesh = ForestMesh.from_forest(new_forest, element_capacity=cap_new)
        return u_new

    # -- partition (multi-chip SFC rebalancing; ref mesh_manager.inl:645-723) --

    def partition_bounds(self, n_shards: int) -> np.ndarray:
        """Element-count split points for an SFC-contiguous partition into
        `n_shards` equal-weight chunks (the reference delegates to
        t8_forest_partition; elements here are already SFC-ordered so the
        partition is a prefix-sum split)."""
        n = self.n_elements
        return (np.arange(n_shards + 1) * n) // n_shards
