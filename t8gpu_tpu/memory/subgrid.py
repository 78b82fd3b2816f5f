"""Subgrid block descriptor.

TPU-native counterpart of the reference compile-time `Subgrid<extents...>`
descriptor (`t8gpu/memory/subgrid_memory_manager.h:36-68`): each leaf
element of the forest carries a dense Cartesian block of cells.  On the
GPU the block maps 1:1 to a CUDA thread block; here the block becomes the
trailing dense axes of the state array `[vars, elements, *extents]` —
inner-flux stencils are then pure shifted elementwise ops over those axes
(ideal VPU work, batched over elements) and XLA fuses them with the RK
stage updates.

The spec is a frozen dataclass of ints so it can be a static jit argument.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SubgridSpec:
    """Dense block of `extents` cells per forest leaf element.

    Like the reference examples, extents must be equal powers of two
    (the 2:1 hanging-face stitching and the coarsening octant bit tricks
    rely on it, ref subgrid_mesh_manager.inl:318-355, kernels.inl:710-758).
    """

    extents: Tuple[int, ...]

    def __post_init__(self):
        assert len(self.extents) in (2, 3)
        e0 = self.extents[0]
        assert all(e == e0 for e in self.extents), "extents must be equal"
        assert e0 >= 2 and (e0 & (e0 - 1)) == 0, "extent must be a power of 2"

    @property
    def dim(self) -> int:
        return len(self.extents)

    @property
    def extent(self) -> int:
        return self.extents[0]

    @property
    def size(self) -> int:
        return math.prod(self.extents)

    @property
    def log2_extent(self) -> int:
        return self.extent.bit_length() - 1

    def flat_index(self, coords) -> int:
        """C-order flat cell index within a block (x slowest, z fastest --
        the state array is [vars, elem, x, y(, z)])."""
        idx = 0
        for c, e in zip(coords, self.extents):
            idx = idx * e + c
        return idx


SUBGRID_4x4 = SubgridSpec((4, 4))
SUBGRID_4x4x4 = SubgridSpec((4, 4, 4))
