"""Plain elements as degenerate subgrid blocks: the uniform-mesh fast path.

The plain-element flux path is gather-latency-bound (~90 ns/element
regardless of mesh, BENCHMARKS.md "Plain-path status"): face gathers +
CSR accumulation dispatch many small ops whose latency dominates at
production mesh sizes.  On a UNIFORM periodic brick forest the mesh has
global Cartesian structure the gather formulation cannot see — but the
subgrid machinery can: Morton order nests, so the level-L plain elements
grouped 2^(dim*3) at a time ARE the 8x8(x8) z-ordered cells of the
level-(L-3) ancestors.  This module steps a plain uniform mesh as
`Subgrid<8,...>` blocks over the coarsened forest, riding the fused
Pallas RK kernels (ops/pallas_kernels.py) — the "plain meshes as
degenerate Subgrid" lever named in BENCHMARKS.md:91-94.

The discretization is IDENTICAL cell-for-cell (same KEPES faces, same
areas; the subgrid==plain equivalence is part of the test safety net);
only the element ordering changes internally, and it is restored on
readout.  The reference has no such distinction to make — its plain
per-face kernel is already fast on uniform meshes
(examples/compressible_euler/kernels.cu:135-309); on TPU the blocked
formulation is what makes the same mesh compute-bound instead of
latency-bound.

Scope: static uniform periodic brick forests (BASELINE config 1).  AMR
meshes refine single plain elements, which breaks the block grouping —
they keep the general gather path (models/compressible_euler.py).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from t8gpu_tpu.memory.subgrid import SubgridSpec
from t8gpu_tpu.mesh.forest import Forest
from t8gpu_tpu.mesh.morton import morton_decode
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.models.subgrid_euler import SubgridCompressibleEulerSolver
from t8gpu_tpu.utils.config import EulerConfig


def _zorder_to_raster(ext: int, dim: int) -> np.ndarray:
    """Permutation p with p[z] = C-order (x slowest) flat cell index of
    the z-th Morton cell of an ext^dim block."""
    B = ext**dim
    coords = morton_decode(np.arange(B, dtype=np.uint64), dim)  # [B, dim]
    flat = np.zeros(B, np.int64)
    for a in range(dim):                       # x slowest (C order)
        flat = flat * ext + coords[:, a]
    return flat


def can_block(forest, ext: int = 8) -> bool:
    """Whether a forest qualifies for the blocked fast path."""
    if not isinstance(forest, Forest) or not all(forest.periodic_axes):
        return False
    lv = forest.level
    if len(lv) == 0 or (lv != lv[0]).any():
        return False
    k = int(np.log2(ext))
    return int(lv[0]) >= k and (1 << (int(lv[0]) * forest.dim)) == len(lv)


class BlockedUniformEulerSolver:
    """Plain-element Euler solver on a uniform periodic brick forest,
    internally stepping `Subgrid<ext,...>` blocks (see module docstring).

    Drop-in for CompressibleEulerSolver's stepping surface: iterate /
    iterate_many / compute_integral / compute_timestep(_device) /
    n_elements / conserved_state (plain Morton element order restored).
    """

    dim = 3  # states carry 3 momentum components (ref solver.h:36)

    def __init__(self, forest: Forest, ic: Callable[[np.ndarray], np.ndarray],
                 config: EulerConfig = EulerConfig(), ext: int = 8):
        assert can_block(forest, ext), \
            "blocked path needs a uniform periodic brick forest"
        dim = forest.dim
        self.config = config
        self._n = forest.n_elements
        self._B = ext**dim
        self._perm = _zorder_to_raster(ext, dim)            # z -> raster
        k = int(np.log2(ext))
        coarse = Forest.uniform(int(forest.level[0]) - k, dim=dim,
                                max_refine_level=forest.L)
        spec = SubgridSpec((ext,) * dim)
        mesh = SubgridMesh.from_forest(coarse, spec)
        # the subgrid cells ARE the plain elements at permuted positions;
        # ic is positional, so feeding it the subgrid cell centers gives
        # the identical physical initial condition
        self._inner = SubgridCompressibleEulerSolver(mesh, ic, config=config)

    # -- stepping -------------------------------------------------------------

    def iterate(self, dt: float):
        self._inner.iterate(dt)

    def iterate_many(self, n_steps: int, dt: float):
        self._inner.iterate_many(n_steps, dt)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "kinetic_energy",
                                    "total_energy")):
        """Per-step observable history in one dispatch ([n_steps, K];
        see CompressibleEulerSolver.iterate_record).  Global reductions
        are permutation-invariant, so the blocked cell order needs no
        unpermuting."""
        return self._inner.iterate_record(n_steps, dt,
                                          observables=observables)

    # -- diagnostics ----------------------------------------------------------

    def compute_integral(self) -> float:
        return self._inner.compute_integral()

    def compute_timestep(self) -> float:
        return self._inner.compute_timestep()

    def compute_timestep_device(self):
        return self._inner.compute_timestep_device()

    @property
    def n_elements(self) -> int:
        return self._n

    @property
    def u(self):
        """The internal (blocked, element-minor) device state."""
        return self._inner.u

    def conserved_state(self) -> np.ndarray:
        """[5, N] in the plain forest's Morton element order."""
        sub = self._inner.conserved_state()                 # [5, E, *ext]
        flat = sub.reshape(5, -1, self._B)                  # raster cells
        return flat[:, :, self._perm].reshape(5, -1)        # z-order cells


class ShardedBlockedEulerSolver:
    """The blocked fast path over a device mesh: a uniform periodic brick
    forest of PLAIN elements, stepped as `Subgrid<ext,...>` blocks by
    `ShardedSubgridEulerSolver` (fused Pallas kernels inside shard_map,
    neighbor-scoped halo) — the multi-chip deployment of BASELINE
    config 1.  The reference's counterpart is its plain MPI solver on a
    uniform mesh (examples/compressible_euler/kernels.cu:135-309 under
    mpirun); here the same mesh rides the compute-bound kernel path
    instead of the gather path.

    Same stepping surface as ShardedEulerSolver; `conserved_state()`
    restores the plain forest's Morton element order.  Static meshes only
    (see module docstring); for AMR use ShardedEulerSolver.
    """

    dim = 3

    def __init__(self, forest: Forest, ic: Callable[[np.ndarray], np.ndarray],
                 devices=None, config: EulerConfig = EulerConfig(),
                 ext: int = 8):
        assert can_block(forest, ext), \
            "blocked path needs a uniform periodic brick forest"
        from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

        dim = forest.dim
        self.config = config
        self._n = forest.n_elements
        self._B = ext**dim
        self._perm = _zorder_to_raster(ext, dim)
        k = int(np.log2(ext))
        coarse = Forest.uniform(int(forest.level[0]) - k, dim=dim,
                                max_refine_level=forest.L)
        spec = SubgridSpec((ext,) * dim)
        self._inner = ShardedSubgridEulerSolver(coarse, spec, ic,
                                                devices=devices,
                                                config=config)

    def iterate(self, dt: float):
        self._inner.iterate(dt)

    def iterate_many(self, n_steps: int, dt: float):
        self._inner.iterate_many(n_steps, dt)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "kinetic_energy",
                                    "total_energy")):
        """Per-step observable history in one sharded dispatch
        ([n_steps, K] replicated; global reductions are
        permutation-invariant, so the blocked order needs no
        unpermuting)."""
        return self._inner.iterate_record(n_steps, dt,
                                          observables=observables)

    def compute_integral(self) -> float:
        return self._inner.compute_integral()

    def compute_timestep(self) -> float:
        return self._inner.compute_timestep()

    def compute_timestep_device(self):
        return self._inner.compute_timestep_device()

    @property
    def n_elements(self) -> int:
        return self._n

    @property
    def n_shards(self) -> int:
        return self._inner.n_shards

    @property
    def u(self):
        """The internal (blocked, element-minor, sharded) device state."""
        return self._inner.u

    def conserved_state(self) -> np.ndarray:
        """[5, N] in the plain forest's Morton element order."""
        sub = self._inner.conserved_state()                 # [5, E, *ext]
        flat = sub.reshape(5, -1, self._B)
        return flat[:, :, self._perm].reshape(5, -1)
