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

import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.store import bucket_capacity
from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.ops.amr import apply_remap_weighted, pad_remap
from t8gpu_tpu.utils.config import AMRConfig


class MeshManager:
    """Owns an adaptive forest + its device-facing mesh arrays.

    `mesh_factory(forest, element_capacity)` builds the device-facing mesh
    adapter — ForestMesh for plain elements (default) or SubgridMesh for the
    block-structured scheme (the reference's SubgridMeshManager analogue)."""

    def __init__(self, forest: Forest, amr: AMRConfig = AMRConfig(),
                 mesh_factory=None):
        self.forest = forest
        self.amr = amr
        self._factory = mesh_factory or ForestMesh.from_forest
        # Whether adapt-time connectivity rebuilds include the MUSCL
        # face-centroid displacements (order-2 only consumers).  Solvers
        # set this from their config; skipping it saves ~24 B/face of
        # host->device upload per adapt for first-order runs.
        self.recon_geometry = True
        import inspect
        try:
            self._factory_has_recon = ("recon_geometry" in
                                       inspect.signature(
                                           self._factory).parameters)
        except (TypeError, ValueError):   # builtins / odd callables
            self._factory_has_recon = False
        self.mesh = self._factory(forest, None)

    def _build_mesh(self, forest, cap):
        if not self.recon_geometry and self._factory_has_recon:
            return self._factory(forest, cap, recon_geometry=False)
        return self._factory(forest, cap)

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

    def adapt_forest(self, criteria: np.ndarray):
        """Host half of the adapt cycle: criteria -> flags -> pre-balanced
        single-pass adapt.  Updates the forest + mesh arrays and returns the
        (single-level) RemapSpec; callers remap their device state with it.

        Pre-balancing the FLAGS (forest.balance_flags) makes one adapt pass
        produce a 2:1 forest with every element changing by at most one
        level — the contract the subgrid data remap needs, and what the
        reference gets from its combined t8code adapt+balance commit
        (mesh_manager.inl:207-212)."""
        from t8gpu_tpu.utils.profiling import phase

        with phase("adapt/flags+balance"):
            flags = self.forest.flags_from_criteria(
                np.asarray(criteria)[: self.n_elements],
                b=self.amr.refine_threshold,
                min_level=self.amr.min_level, max_level=self.amr.max_level)
            flags = self.forest.balance_flags(flags)
        with phase("adapt/forest-adapt"):
            new_forest, remap = self.forest.adapt(flags)
        cap_new = bucket_capacity(new_forest.n_elements,
                                  self.amr.growth_factor)
        self.forest = new_forest
        # host face walk + connectivity build + device upload — the part
        # the reference does in compute_connectivity_information
        # (mesh_manager.inl:332-481, SURVEY §3.4 "the #1 CPU bottleneck")
        with phase("adapt/mesh-build+upload"):
            self.mesh = self._build_mesh(new_forest, cap_new)
        return remap

    def adapt(self, criteria: np.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """One full adapt cycle for plain-element state `u` [..., capacity]:
        adapt_forest + gather remap.  Returns the remapped state (padded to
        the new capacity bucket).

        The restriction is volume-weighted (ops/amr.apply_remap_weighted):
        exact mass conservation on meshes with unequal family-member
        volumes (shell prisms), identical to the plain mean on the
        Cartesian forest."""
        from t8gpu_tpu.utils.profiling import phase

        w_old = np.ones(u.shape[-1], np.float32)
        vols = np.asarray(self.mesh.volumes)
        w_old[: len(vols)] = vols
        remap = self.adapt_forest(criteria)
        cap_new = self.mesh.conn.inc_slot.shape[0]
        with phase("adapt/remap-dispatch"):
            start, count = pad_remap(remap.src_start, remap.src_count,
                                     cap_new)
            k = 1 << self.forest.dim
            return apply_remap_weighted(u, start, count,
                                        jnp.asarray(w_old),
                                        k=k, capacity=cap_new)

    # -- partition (multi-chip SFC rebalancing; ref mesh_manager.inl:645-723) --

    def partition_bounds(self, n_shards: int) -> np.ndarray:
        """Element-count split points for an SFC-contiguous partition into
        `n_shards` equal-weight chunks (the reference delegates to
        t8_forest_partition; elements here are already SFC-ordered so the
        partition is a prefix-sum split)."""
        n = self.n_elements
        return (np.arange(n_shards + 1) * n) // n_shards
