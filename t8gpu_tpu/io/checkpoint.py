"""Checkpoint / resume: forest + state serialization.

The reference has NO persistence beyond one-way VTK output
(SURVEY.md §5: "no checkpoint-based restart"); long runs cannot resume.
Here a checkpoint is a single .npz capturing the adaptive forest (anchors,
levels, anchor resolution, periodicity), the conservative state, and a
JSON metadata blob (configs, step counter, dt, subgrid extents), enough to
reconstruct any solver exactly.

    save_checkpoint("run.npz", forest, u, meta={"step": 100, ...})
    forest, u, meta = load_checkpoint("run.npz")

Solvers expose save()/restore() built on these.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import numpy as np

from t8gpu_tpu.mesh.forest import Forest

FORMAT_VERSION = 1


def save_checkpoint(path: str, forest: Forest, u: np.ndarray,
                    meta: dict | None = None) -> str:
    """u: unpadded state with element axis last-but-blocks
    ([5, N] plain or [5, N, *ext] subgrid)."""
    np.savez_compressed(
        path,
        version=np.int64(FORMAT_VERSION),
        dim=np.int64(forest.dim),
        L=np.int64(forest.L),
        periodic=np.int64(forest.periodic),
        level=np.asarray(forest.level, np.int8),
        anchor=np.asarray(forest.anchor, np.int64),
        u=np.asarray(u, np.float32),
        meta=np.frombuffer(json.dumps(meta or {}).encode(), np.uint8),
    )
    return path


def load_checkpoint(path: str) -> Tuple[Forest, np.ndarray, dict]:
    with np.load(path) as z:
        assert int(z["version"]) <= FORMAT_VERSION, "newer checkpoint format"
        forest = Forest(int(z["dim"]), z["level"], z["anchor"], int(z["L"]),
                        periodic=bool(int(z["periodic"])))
        u = z["u"]
        meta = json.loads(bytes(z["meta"]).decode() or "{}")
    return forest, u, meta


def _config_meta(config, amr) -> dict:
    return {"config": dataclasses.asdict(config), "amr": dataclasses.asdict(amr)}


def save_solver(path: str, solver, step: int = 0) -> str:
    """Checkpoint a plain or subgrid Euler solver (forest-backed mesh)."""
    forest = (solver.manager.forest if solver.manager is not None
              else getattr(solver.mesh, "forest", None))
    if forest is None:
        raise ValueError("checkpointing requires a forest-backed mesh "
                         "(ForestMesh / MeshManager), not a UniformMesh")
    meta = _config_meta(solver.config, solver.amr)
    meta["step"] = step
    spec = getattr(solver, "spec", None)
    if spec is not None:
        meta["extents"] = list(spec.extents)
    return save_checkpoint(path, forest, solver.conserved_state(), meta)


def restore_solver(path: str):
    """Rebuild a solver from a checkpoint.  Returns (solver, meta); the
    solver type (plain vs subgrid) is inferred from the metadata."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

    forest, u, meta = load_checkpoint(path)
    config = EulerConfig(**meta["config"])
    amr = AMRConfig(**meta["amr"])

    if "extents" in meta:
        from t8gpu_tpu.memory.subgrid import SubgridSpec
        from t8gpu_tpu.models.subgrid_euler import (
            SubgridCompressibleEulerSolver, subgrid_manager)
        spec = SubgridSpec(tuple(meta["extents"]))
        manager = subgrid_manager(forest, spec, amr)
        solver = SubgridCompressibleEulerSolver(
            manager, lambda _c: u.reshape(u.shape[0], -1), config=config)
    else:
        from t8gpu_tpu.models.compressible_euler import CompressibleEulerSolver
        manager = MeshManager(forest, amr)
        solver = CompressibleEulerSolver(manager, lambda _c: u, config=config)
    return solver, meta
