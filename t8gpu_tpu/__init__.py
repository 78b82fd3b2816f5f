"""t8gpu_tpu — TPU-native finite-volume AMR framework.

A from-scratch JAX/XLA rebuild of the capabilities of DLR-AMR/t8gpu
(see README.md for the component map and SURVEY.md for the reference
analysis).  Public API:

    from t8gpu_tpu import (
        # meshes
        Forest, ForestMesh, MeshManager, uniform_mesh, shell_mesh,
        shell_manager, tri_manager, tet_manager, SubgridMesh, SubgridSpec,
        # solvers (single device)
        CompressibleEulerSolver, SubgridCompressibleEulerSolver,
        subgrid_manager,
        # solvers (multi-chip)
        ShardedEulerSolver, ShardedSubgridEulerSolver,
        # config + storage + io
        EulerConfig, AMRConfig, RunConfig, VariableStore,
        save_solver, restore_solver, write_vtu,
    )
"""

from t8gpu_tpu.io.checkpoint import restore_solver, save_solver
from t8gpu_tpu.io.vtk import write_mesh_vtu, write_vtu
from t8gpu_tpu.memory.store import VariableStore
from t8gpu_tpu.memory.subgrid import SUBGRID_4x4, SUBGRID_4x4x4, SubgridSpec
from t8gpu_tpu.mesh.forest import Forest, ForestMesh
from t8gpu_tpu.mesh.manager import MeshManager
from t8gpu_tpu.mesh.shell import shell_mesh
from t8gpu_tpu.mesh.shell_forest import shell_manager
from t8gpu_tpu.mesh.subgrid import SubgridMesh
from t8gpu_tpu.mesh.tet import tet_manager
from t8gpu_tpu.mesh.tri import tri_manager
from t8gpu_tpu.mesh.uniform import uniform_mesh
from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
from t8gpu_tpu.models.subgrid_euler import (SubgridCompressibleEulerSolver,
                                            subgrid_manager)
from t8gpu_tpu.parallel.solver import ShardedEulerSolver
from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver
from t8gpu_tpu.utils.config import AMRConfig, EulerConfig, RunConfig

__all__ = [
    "AMRConfig", "CompressibleEulerSolver", "EulerConfig", "Forest",
    "ForestMesh", "MeshManager", "RunConfig", "SUBGRID_4x4",
    "SUBGRID_4x4x4", "ShardedEulerSolver", "ShardedSubgridEulerSolver",
    "SubgridCompressibleEulerSolver", "SubgridMesh", "SubgridSpec",
    "VariableStore", "restore_solver", "save_solver", "shell_mesh",
    "shell_manager", "subgrid_manager", "tet_manager", "tri_manager",
    "uniform_mesh", "write_mesh_vtu", "write_vtu",
]
