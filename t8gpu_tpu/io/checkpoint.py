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
import threading
from typing import Tuple

import numpy as np

from t8gpu_tpu.mesh.forest import Forest

FORMAT_VERSION = 2


def _forest_payload(forest) -> dict:
    """Serialize any forest kind (Morton quad/hex, shell prism, planar
    tri, tet) into npz-compatible arrays."""
    from t8gpu_tpu.mesh.shell_forest import PrismForest
    from t8gpu_tpu.mesh.tet import TetForest
    from t8gpu_tpu.mesh.tri import TriForest

    if isinstance(forest, Forest):
        return dict(kind=np.int64(0), dim=np.int64(forest.dim),
                    L=np.int64(forest.L),
                    # 0/1 = all axes (legacy encoding); 2 + bitmask =
                    # per-axis periodicity (mixed, e.g. channels)
                    periodic=np.int64(
                        int(forest.periodic_axes[0])
                        if len(set(forest.periodic_axes)) == 1 else
                        2 + sum(1 << i for i, q
                                in enumerate(forest.periodic_axes) if q)),
                    level=np.asarray(forest.level, np.int8),
                    anchor=np.asarray(forest.anchor, np.int64))
    if isinstance(forest, PrismForest):
        return dict(kind=np.int64(1),
                    r_verts=forest.roots.verts, r_tris=forest.roots.tris,
                    r_radii=forest.roots.radii,
                    root=forest.root, level=forest.level, fpath=forest.path)
    if isinstance(forest, TriForest):
        return dict(kind=np.int64(2),
                    r_verts=forest.roots.verts, r_tris=forest.roots.tris,
                    root=forest.root, level=forest.level, fpath=forest.path)
    if isinstance(forest, TetForest):
        return dict(kind=np.int64(3),
                    r_verts=forest.roots.verts, r_tets=forest.roots.tets,
                    root=forest.root, level=forest.level, fpath=forest.path,
                    leaf_verts=forest.verts)
    raise TypeError(f"unsupported forest type: {type(forest)!r}")


def _forest_from_payload(z):
    kind = int(z["kind"]) if "kind" in z else 0
    if kind == 0:
        return Forest(int(z["dim"]), z["level"], z["anchor"], int(z["L"]),
                      periodic=(bool(enc) if (enc := int(z["periodic"])) < 2
                                else tuple(bool((enc - 2) >> i & 1)
                                           for i in range(int(z["dim"])))))
    if kind == 1:
        from t8gpu_tpu.mesh.shell_forest import PrismForest, ShellRoots

        tris = z["r_tris"]
        edge_id = {}
        for a, b, c in tris:
            for u, w in ((a, b), (b, c), (c, a)):
                key = (min(u, w), max(u, w))
                if key not in edge_id:
                    edge_id[key] = len(edge_id)
        roots = ShellRoots(verts=z["r_verts"], tris=tris,
                           radii=z["r_radii"], edge_id=edge_id)
        return PrismForest(roots, z["root"], z["level"], z["fpath"])
    if kind == 2:
        from t8gpu_tpu.mesh.tri import TriForest, TriRoots

        tris = z["r_tris"]
        edge_id = {}
        for a, b, c in tris:
            for u, w in ((a, b), (b, c), (c, a)):
                key = (min(u, w), max(u, w))
                if key not in edge_id:
                    edge_id[key] = len(edge_id)
        roots = TriRoots(verts=z["r_verts"], tris=tris, edge_id=edge_id)
        return TriForest(roots, z["root"], z["level"], z["fpath"])
    if kind == 3:
        from t8gpu_tpu.mesh.tet import TetForest, TetRoots, _root_tables

        tets = z["r_tets"]
        face_id, edge_id = _root_tables(z["r_verts"], tets)
        roots = TetRoots(verts=z["r_verts"], tets=tets, face_id=face_id,
                         edge_id=edge_id)
        return TetForest(roots, z["root"], z["level"], z["fpath"],
                         z["leaf_verts"])
    raise ValueError(f"unknown forest kind {kind}")


def save_checkpoint(path: str, forest, u: np.ndarray,
                    meta: dict | None = None) -> str:
    """u: unpadded state with element axis last-but-blocks
    ([5, N] plain or [5, N, *ext] subgrid).  `forest` may be any forest
    kind (Morton quad/hex, shell prism, planar tri, tet).

    The write is ATOMIC (tmp + rename): a crash mid-write leaves the
    previous checkpoint intact, so retry wrappers can always resume."""
    import os
    tmp = f"{path}.tmp"
    np.savez_compressed(
        tmp,
        version=np.int64(FORMAT_VERSION),
        u=np.asarray(u),   # keep the solver dtype: f64 restarts stay exact
        meta=np.frombuffer(json.dumps(meta or {}).encode(), np.uint8),
        **_forest_payload(forest),
    )
    # np.savez appends .npz to paths without an extension
    os.replace(tmp if os.path.exists(tmp) else f"{tmp}.npz", path)
    return path


def load_checkpoint(path: str):
    with np.load(path) as z:
        assert int(z["version"]) <= FORMAT_VERSION, "newer checkpoint format"
        forest = _forest_from_payload(z)
        u = z["u"]
        meta = json.loads(bytes(z["meta"]).decode() or "{}")
    return forest, u, meta


def _config_meta(config, amr) -> dict:
    cfg = dataclasses.asdict(config)
    if callable(cfg.get("wall_velocity")):
        # per-face callables are not serializable; restarts rebuild the
        # solver with an explicit config (documented in EulerConfig)
        cfg["wall_velocity"] = (0.0, 0.0, 0.0)
    return {"config": cfg, "amr": dataclasses.asdict(amr)}


def save_solver(path: str, solver, step: int = 0) -> str:
    """Checkpoint a plain or subgrid Euler solver — single-device or
    sharded (the sharded solvers gather their state via conserved_state;
    only the O(state) host copy at checkpoint time crosses the chips)."""
    manager = getattr(solver, "manager", None)
    if manager is not None:
        forest = manager.forest
    else:
        forest = getattr(solver, "forest", None)       # sharded solvers
        if forest is None:
            forest = getattr(getattr(solver, "mesh", None), "forest", None)
    if forest is None:
        raise ValueError("checkpointing requires a forest-backed mesh "
                         "(ForestMesh / MeshManager), not a UniformMesh")
    meta = _model_meta(solver)
    meta["step"] = step
    spec = getattr(solver, "spec", None)
    if spec is not None:
        meta["extents"] = list(spec.extents)
    u = solver.conserved_state() if hasattr(solver, "conserved_state") \
        else np.asarray(solver.state())[None]
    return save_checkpoint(path, forest, u, meta)


def _model_meta(solver) -> dict:
    """Model tag + the parameters needed to rebuild the solver class —
    restore_solver dispatches on `model` (the Euler solvers carry the full
    EulerConfig; the other families carry their own physics constants)."""
    name = type(solver).__name__
    if "ShallowWater" in name:
        order = getattr(solver, "order", None)
        limiter = getattr(solver, "limiter", None)
        if order is None:   # sharded SWE routes them through its EulerConfig
            order, limiter = solver.config.order, solver.config.limiter
        return {"model": "shallow_water", "g": solver.g, "cfl": solver.cfl,
                "order": int(order), "limiter": str(limiter),
                "amr": dataclasses.asdict(solver.amr)}
    if "Advection" in name:
        vel = np.asarray(getattr(solver, "_vel_host"))
        order = getattr(solver, "order", None)
        limiter = getattr(solver, "limiter", None)
        if order is None:   # the sharded variant routes via EulerConfig
            order, limiter = solver.config.order, solver.config.limiter
        return {"model": "advection", "velocity": [float(v) for v in vel],
                "cfl": solver.cfl, "order": int(order),
                "limiter": str(limiter),
                "amr": dataclasses.asdict(solver.amr)}
    if "MHD" in name:
        # ShardedMHDSolver routes order/limiter through its EulerConfig;
        # every other MHD class stores them as attributes
        order = getattr(solver, "order", None)
        limiter = getattr(solver, "limiter", None)
        if order is None:
            order, limiter = solver.config.order, solver.config.limiter
        return {"model": "mhd", "gamma": solver.gamma,
                "glm_alpha": solver.glm_alpha,
                "cfl": getattr(solver, "cfl", None) or solver.config.cfl,
                "order": int(order), "limiter": str(limiter),
                "amr": dataclasses.asdict(solver.amr)}
    if "BlockedShellAMR" in name:
        return dict(_config_meta(solver.config, solver.amr),
                    model="blocked_shell_amr")
    return dict(_config_meta(solver.config, solver.amr), model="euler")


def save_solver_async(path: str, solver, step: int = 0):
    """Checkpoint WITHOUT stalling the run: snapshot the state with one
    cheap on-device copy, then gather + compress + write from a
    background thread while stepping continues.  The device->host gather
    of a multi-MB state can take minutes through a slow host link (it
    stalled a 20k-step endurance run ~7 minutes per checkpoint when done
    synchronously); asynchronously it overlaps the next step batch.

    The snapshot is consistent: the solver object is shallow-copied so
    later adapt()/iterate() calls rebind (never mutate) its arrays, and
    the state buffer is duplicated on device so later donation cannot
    invalidate it.  Returns the writer thread — join() it before process
    exit or before reading the file; a failed write is reported to stderr
    at failure time and re-raised by join() so it cannot pass silently."""
    import copy

    import jax.numpy as jnp

    snap = copy.copy(solver)
    if hasattr(solver, "us"):          # blocked-shell-AMR lattice tuple
        snap.us = tuple(jnp.copy(a) for a in solver.us)
    else:
        snap.u = jnp.copy(solver.u)    # donation-proof device snapshot
    manager = getattr(solver, "manager", None)
    if manager is not None:
        # capture the CURRENT forest binding (manager.forest rebinds on
        # adapt; the shallow copy freezes this checkpoint's view)
        snap.manager = copy.copy(manager)
    t = _CheckpointThread(target=save_solver, args=(path, snap, step),
                          daemon=True)
    t.start()
    return t


class _CheckpointThread(threading.Thread):
    """Writer thread whose failure is loud: the exception is printed when
    it happens and re-raised from join(), so a run that 'checkpointed'
    into a ValueError or a full disk finds out instead of resuming from
    nothing."""

    exc: BaseException | None = None

    def run(self):
        import sys
        import traceback
        try:
            super().run()
        except BaseException as e:           # noqa: BLE001 — must not die silently
            self.exc = e
            print("async checkpoint FAILED:", file=sys.stderr)
            traceback.print_exc()

    def join(self, timeout=None):
        super().join(timeout)
        if self.exc is not None and not self.is_alive():
            raise RuntimeError("async checkpoint write failed") from self.exc


def restore_solver(path: str):
    """Rebuild a solver from a checkpoint.  Returns (solver, meta); the
    solver type (plain vs subgrid) is inferred from the metadata."""
    from t8gpu_tpu.mesh.manager import MeshManager
    from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

    forest, u, meta = load_checkpoint(path)
    amr = AMRConfig(**meta["amr"])
    model = meta.get("model", "euler")

    if model == "shallow_water":
        from t8gpu_tpu.models.shallow_water import ShallowWaterSolver
        manager = MeshManager(forest, amr, mesh_factory=_factory_for(forest))
        return ShallowWaterSolver(manager, lambda _c: u, g=meta["g"],
                                  cfl=meta["cfl"],
                                  order=meta.get("order", 1),
                                  limiter=meta.get("limiter", "bj")), meta
    if model == "advection":
        from t8gpu_tpu.models.advection import AdvectionSolver
        manager = MeshManager(forest, amr, mesh_factory=_factory_for(forest))
        return AdvectionSolver(manager, lambda _c: u[0],
                               velocity=meta["velocity"],
                               cfl=meta["cfl"], order=meta.get("order", 1),
                               limiter=meta.get("limiter", "bj")), meta
    if model == "mhd":
        if "extents" in meta:
            from t8gpu_tpu.memory.subgrid import SubgridSpec
            from t8gpu_tpu.models.subgrid_euler import subgrid_manager
            from t8gpu_tpu.models.subgrid_mhd import SubgridMHDSolver
            spec = SubgridSpec(tuple(meta["extents"]))
            manager = subgrid_manager(forest, spec, amr)
            return SubgridMHDSolver(
                manager, lambda _c: u.reshape(u.shape[0], -1),
                gamma=meta["gamma"], glm_alpha=meta["glm_alpha"],
                cfl=meta["cfl"], order=meta.get("order", 1),
                limiter=meta.get("limiter", "minmod")), meta
        from t8gpu_tpu.models.mhd import MHDSolver
        manager = MeshManager(forest, amr, mesh_factory=_factory_for(forest))
        return MHDSolver(manager, lambda _c: u, gamma=meta["gamma"],
                         glm_alpha=meta["glm_alpha"],
                         cfl=meta["cfl"], order=meta.get("order", 1),
                         limiter=meta.get("limiter", "bj")), meta

    config = EulerConfig(**meta["config"])
    if model == "blocked_shell_amr":
        from t8gpu_tpu.models.blocked_shell_amr import BlockedShellAMRSolver
        return BlockedShellAMRSolver(forest, lambda _c: u, amr=amr,
                                     config=config), meta
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
        manager = MeshManager(forest, amr, mesh_factory=_factory_for(forest))
        solver = CompressibleEulerSolver(manager, lambda _c: u, config=config)
    return solver, meta


def restore_sharded_solver(path: str, devices=None):
    """Rebuild a SHARDED solver (parallel/solver.py, parallel/subgrid.py)
    from a checkpoint written by save_solver — the multi-chip resume the
    reference lacks entirely (SURVEY §5: no persistence).  The state is
    re-sharded over `devices` (default: all) by construction; checkpoints
    are layout-portable between single-device and sharded runs.
    Returns (solver, meta)."""
    from t8gpu_tpu.utils.config import AMRConfig, EulerConfig

    forest, u, meta = load_checkpoint(path)
    amr = AMRConfig(**meta["amr"])
    model = meta.get("model", "euler")

    if model == "shallow_water":
        from t8gpu_tpu.parallel.shallow_water import ShardedShallowWaterSolver
        return ShardedShallowWaterSolver(
            forest, lambda _c: u, g=meta["g"], devices=devices, amr=amr,
            cfl=meta["cfl"], order=meta.get("order", 1),
            limiter=meta.get("limiter", "bj")), meta
    if model == "advection":
        from t8gpu_tpu.parallel.advection import ShardedAdvectionSolver
        return ShardedAdvectionSolver(
            forest, lambda _c: u[0], velocity=meta["velocity"],
            devices=devices, amr=amr, cfl=meta["cfl"],
            order=meta.get("order", 1),
            limiter=meta.get("limiter", "bj")), meta
    if model == "mhd":
        if "extents" in meta:
            from t8gpu_tpu.memory.subgrid import SubgridSpec
            from t8gpu_tpu.parallel.subgrid_mhd import ShardedSubgridMHDSolver
            spec = SubgridSpec(tuple(meta["extents"]))
            return ShardedSubgridMHDSolver(
                forest, spec, lambda _c: u.reshape(u.shape[0], -1),
                devices=devices, gamma=meta["gamma"],
                glm_alpha=meta["glm_alpha"], amr=amr,
                cfl=meta["cfl"], order=meta.get("order", 1),
                limiter=meta.get("limiter", "minmod")), meta
        from t8gpu_tpu.parallel.mhd import ShardedMHDSolver
        return ShardedMHDSolver(
            forest, lambda _c: u, gamma=meta["gamma"],
            glm_alpha=meta["glm_alpha"], devices=devices, amr=amr,
            cfl=meta["cfl"], order=meta.get("order", 1),
            limiter=meta.get("limiter", "bj")), meta

    config = EulerConfig(**meta["config"])
    if model == "blocked_shell_amr":
        from t8gpu_tpu.models.blocked_shell_amr import BlockedShellAMRSolver
        return BlockedShellAMRSolver(forest, lambda _c: u, amr=amr,
                                     config=config), meta
    if "extents" in meta:
        from t8gpu_tpu.memory.subgrid import SubgridSpec
        from t8gpu_tpu.parallel.subgrid import ShardedSubgridEulerSolver
        spec = SubgridSpec(tuple(meta["extents"]))
        solver = ShardedSubgridEulerSolver(
            forest, spec, lambda _c: u.reshape(u.shape[0], -1),
            devices=devices, config=config, amr=amr)
    else:
        from t8gpu_tpu.parallel.solver import ShardedEulerSolver
        solver = ShardedEulerSolver(forest, lambda _c: u,
                                    devices=devices, config=config, amr=amr)
    return solver, meta


def _factory_for(forest):
    """MeshManager mesh_factory matching the forest kind (None = the
    default ForestMesh for Morton forests)."""
    from t8gpu_tpu.mesh.shell_forest import PrismForest, ShellForestMesh
    from t8gpu_tpu.mesh.tet import TetForest, TetForestMesh
    from t8gpu_tpu.mesh.tri import TriForest, TriForestMesh

    if isinstance(forest, PrismForest):
        return ShellForestMesh.from_forest
    if isinstance(forest, TriForest):
        return TriForestMesh.from_forest
    if isinstance(forest, TetForest):
        return TetForestMesh.from_forest
    return None
