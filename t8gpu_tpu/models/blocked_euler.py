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

Scope of `BlockedUniformEulerSolver`: static uniform periodic brick
forests (BASELINE config 1).  For DYNAMIC AMR, `BlockedAMREulerSolver`
below keeps the same fast path on adapted meshes by adapting at BLOCK
granularity: the refinement quantum is one ext^dim group of plain
elements (the z-ordered cells of one coarse leaf), so the mesh is
always an ext-blocked forest and every step — including on meshes with
2:1 level boundaries — runs the RK-fused Pallas kernels (the subgrid
AMR scheme, ops/subgrid.py, with plain cells as the subgrid cells).
Stepping is cell-exact vs the gather path on the equivalent plain
forest (tests/test_solver_euler.py); the only semantic difference from
element-granular plain AMR is the refinement quantum.
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


    def __init__(self, forest: Forest, ic: Callable[[np.ndarray], np.ndarray],
                 config: EulerConfig = EulerConfig(), ext: int = 8):
        assert can_block(forest, ext), \
            "blocked path needs a uniform periodic brick forest"
        dim = self.dim = forest.dim
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


class BlockedAMREulerSolver:
    """Plain-element Euler with DYNAMIC AMR on the fused-kernel fast
    path — the fix for the plain-path AMR cliff (BASELINE config 2:
    the gather path steps adapted meshes at ~10.8 M elem-upd/s while
    this path keeps the blocked rate, BENCHMARKS.md).

    The mesh is an adaptive forest of ext^dim blocks of plain cells
    (internally `SubgridCompressibleEulerSolver` + `subgrid_manager`):
    refining a block splits its plain cells 2^dim-for-1 exactly like
    plain AMR (octant injection == copy-to-children; pooled restriction
    == volume-weighted average — uniform volumes within a block), and
    2:1 block boundaries step through the compact hanging-face kernels.
    The adaptation QUANTUM is one block (ext^dim plain elements); the
    criteria are the per-block density H1 seminorm (the reference's own
    subgrid criterion, subgrid/kernels.inl:1109-1168), thresholded by
    ``amr.refine_threshold`` on that scale (ref b=0.02).

    Constructor arguments speak PLAIN element levels: `forest` is the
    uniform starting plain forest (level L ≥ log2 ext), `amr` bounds the
    plain cell levels; both are translated to the coarse block forest
    internally.  `conserved_state()` returns plain Morton cell order of
    `plain_forest()` — the element-granular equivalent plain forest.
    """


    def __init__(self, forest: Forest, ic: Callable[[np.ndarray], np.ndarray],
                 amr, config: EulerConfig = EulerConfig(), ext: int = 8):
        from t8gpu_tpu.models.subgrid_euler import (
            SubgridCompressibleEulerSolver, subgrid_manager)
        from t8gpu_tpu.utils.config import AMRConfig

        dim = self.dim = forest.dim
        k = int(np.log2(ext))
        assert (1 << k) == ext, "ext must be a power of two"
        assert isinstance(forest, Forest), "blocked AMR needs a brick forest"
        lv = forest.level
        assert len(lv) and (lv == lv[0]).all() and int(lv[0]) >= k, \
            "start from a uniform plain forest at level >= log2(ext)"
        assert amr.min_level >= k, \
            f"amr.min_level must be >= log2(ext)={k} (plain levels)"
        self.config = config
        self.amr = amr
        self._B = ext**dim
        self._k = k
        self._perm = _zorder_to_raster(ext, dim)
        coarse_amr = AMRConfig(min_level=amr.min_level - k,
                               max_level=amr.max_level - k,
                               refine_threshold=amr.refine_threshold,
                               growth_factor=amr.growth_factor)
        coarse = Forest.uniform(int(lv[0]) - k, dim=dim,
                                periodic=tuple(forest.periodic_axes),
                                max_refine_level=forest.L)
        spec = SubgridSpec((ext,) * dim)
        manager = subgrid_manager(coarse, spec, coarse_amr)
        self._inner = SubgridCompressibleEulerSolver(manager, ic,
                                                     config=config)

    # -- stepping (fused kernels, incl. 2:1 block boundaries) -----------------

    def iterate(self, dt: float):
        self._inner.iterate(dt)

    def iterate_many(self, n_steps: int, dt: float):
        self._inner.iterate_many(n_steps, dt)

    def iterate_record(self, n_steps: int, dt: float,
                       observables=("mass", "kinetic_energy",
                                    "total_energy")):
        return self._inner.iterate_record(n_steps, dt,
                                          observables=observables)

    # -- AMR cycle ------------------------------------------------------------

    def adapt(self):
        self._inner.adapt()

    def adapt_prefetch(self):
        self._inner.adapt_prefetch()

    # -- diagnostics ----------------------------------------------------------

    def compute_integral(self) -> float:
        return self._inner.compute_integral()

    def compute_entropy(self) -> float:
        return self._inner.compute_entropy()

    def compute_timestep(self) -> float:
        return self._inner.compute_timestep()

    def compute_timestep_device(self):
        return self._inner.compute_timestep_device()

    @property
    def n_elements(self) -> int:
        """PLAIN element count (blocks x ext^dim)."""
        return self._inner.n_elements * self._B

    @property
    def n_blocks(self) -> int:
        return self._inner.n_elements

    @property
    def manager(self):
        return self._inner.manager

    @property
    def mesh(self):
        return self._inner.mesh

    @property
    def u(self):
        """Internal (blocked, element-minor) device state."""
        return self._inner.u

    def plain_forest(self) -> Forest:
        """The element-granular plain forest this blocked mesh equals:
        every coarse block leaf refined log2(ext) times (Morton order
        matches `conserved_state()` columns)."""
        f = self._inner.mesh.forest
        for _ in range(self._k):
            f, _ = f.adapt(np.ones(f.n_elements, np.int8))
        return f

    def plain_levels(self) -> np.ndarray:
        """Per-plain-element refinement level [N]."""
        return np.repeat(self._inner.mesh.forest.level + self._k, self._B)

    def conserved_state(self) -> np.ndarray:
        """[5, N] in `plain_forest()`'s Morton element order."""
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


    def __init__(self, forest: Forest, ic: Callable[[np.ndarray], np.ndarray],
                 devices=None, config: EulerConfig = EulerConfig(),
                 ext: int = 8):
        assert can_block(forest, ext), \
            "blocked path needs a uniform periodic brick forest"
        from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver

        dim = self.dim = forest.dim
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


class ShardedBlockedAMREulerSolver:
    """`BlockedAMREulerSolver` over a device mesh: plain-element dynamic
    AMR at block granularity, stepped by `ShardedSubgridEulerSolver`
    (fused kernels inside shard_map, neighbor-scoped halo, device-side
    sharded adapt remap).  Constructor speaks plain element levels like
    the single-device class; `conserved_state()` restores plain Morton
    cell order of the current adapted mesh."""


    def __init__(self, forest: Forest, ic: Callable[[np.ndarray], np.ndarray],
                 amr, devices=None, config: EulerConfig = EulerConfig(),
                 ext: int = 8):
        from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver
        from t8gpu_tpu.utils.config import AMRConfig

        dim = self.dim = forest.dim
        k = int(np.log2(ext))
        assert (1 << k) == ext
        lv = forest.level
        assert len(lv) and (lv == lv[0]).all() and int(lv[0]) >= k
        assert amr.min_level >= k
        self.config = config
        self.amr = amr
        self._B = ext**dim
        self._k = k
        self._perm = _zorder_to_raster(ext, dim)
        coarse_amr = AMRConfig(min_level=amr.min_level - k,
                               max_level=amr.max_level - k,
                               refine_threshold=amr.refine_threshold,
                               growth_factor=amr.growth_factor)
        coarse = Forest.uniform(int(lv[0]) - k, dim=dim,
                                periodic=tuple(forest.periodic_axes),
                                max_refine_level=forest.L)
        spec = SubgridSpec((ext,) * dim)
        self._inner = ShardedSubgridEulerSolver(coarse, spec, ic,
                                                devices=devices,
                                                config=config,
                                                amr=coarse_amr)

    def iterate(self, dt: float):
        self._inner.iterate(dt)

    def iterate_many(self, n_steps: int, dt: float):
        self._inner.iterate_many(n_steps, dt)

    def adapt(self):
        self._inner.adapt()

    def adapt_prefetch(self):
        self._inner.adapt_prefetch()

    def compute_integral(self) -> float:
        return self._inner.compute_integral()

    def compute_timestep(self) -> float:
        return self._inner.compute_timestep()

    def compute_timestep_device(self):
        return self._inner.compute_timestep_device()

    @property
    def n_elements(self) -> int:
        """PLAIN element count (blocks x ext^dim)."""
        return self._inner.forest.n_elements * self._B

    @property
    def n_blocks(self) -> int:
        return self._inner.forest.n_elements

    @property
    def n_shards(self) -> int:
        return self._inner.n_shards

    @property
    def u(self):
        return self._inner.u

    def plain_forest(self) -> Forest:
        f = self._inner.forest
        for _ in range(self._k):
            f, _ = f.adapt(np.ones(f.n_elements, np.int8))
        return f

    def conserved_state(self) -> np.ndarray:
        """[5, N] in `plain_forest()`'s Morton element order."""
        sub = self._inner.conserved_state()                 # [5, E, *ext]
        flat = sub.reshape(5, -1, self._B)
        return flat[:, :, self._perm].reshape(5, -1)
