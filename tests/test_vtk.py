"""io/vtk.py roundtrip tests: parse the written .vtu back (base64-inline
XML) and verify points / connectivity / cell fields; check the .pvtu
multi-piece index for sharded runs (ref VTK export,
mesh_manager.inl:515-623)."""

import base64
import struct
import xml.etree.ElementTree as ET

import numpy as np

from t8gpu_tpu.io.vtk import (write_mesh_vtu, write_pvtu, write_sharded_vtu,
                              write_vtu)


def _decode(node, dtype):
    raw = base64.b64decode(node.text.strip())
    (nbytes,) = struct.unpack("<I", raw[:4])
    assert nbytes == len(raw) - 4
    return np.frombuffer(raw[4:], dtype=dtype)


def _read_vtu(path):
    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    arrays = {}
    for da in piece.iter("DataArray"):
        name = da.get("Name") or "points"
        dtype = {"Float32": np.float32, "Int32": np.int32,
                 "UInt8": np.uint8}[da.get("type")]
        arrays[name] = _decode(da, dtype)
    return piece, arrays


def test_vtu_roundtrip_2d(tmp_path):
    n = 7
    rng = np.random.default_rng(0)
    centers = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    sizes = np.full(n, 0.125, np.float32)
    rho = rng.uniform(0.5, 2.0, n).astype(np.float32)
    mom = rng.normal(size=(3, n)).astype(np.float32)
    path = str(tmp_path / "out.vtu")
    write_vtu(path, centers, sizes, {"rho": rho, "momentum": mom}, dim=2)

    piece, arrays = _read_vtu(path)
    assert int(piece.get("NumberOfCells")) == n
    assert int(piece.get("NumberOfPoints")) == 4 * n
    pts = arrays["points"].reshape(-1, 3)
    # cell 0's corners: center +- half size on the first two axes, z == 0
    quad = pts[:4]
    np.testing.assert_allclose(quad.mean(axis=0)[:2], centers[0], atol=1e-6)
    np.testing.assert_allclose(quad[:, 2], 0.0)
    assert np.ptp(quad[:, 0]) == np.float32(0.125)
    # fields roundtrip
    np.testing.assert_array_equal(arrays["rho"], rho)
    np.testing.assert_allclose(arrays["momentum"].reshape(-1, 3).T, mom)
    # connectivity covers every generated point once
    assert int(arrays["types"][0]) == 9
    np.testing.assert_array_equal(np.sort(arrays["connectivity"]),
                                  np.arange(4 * n))
    np.testing.assert_array_equal(arrays["offsets"], 4 * np.arange(1, n + 1))


def test_vtu_hex_3d(tmp_path):
    n = 3
    centers = np.zeros((n, 3), np.float32)
    centers[:, 0] = np.arange(n)
    sizes = np.ones(n, np.float32)
    path = str(tmp_path / "out3.vtu")
    write_vtu(path, centers, sizes, {"x": centers[:, 0]}, dim=3)
    piece, arrays = _read_vtu(path)
    assert int(piece.get("NumberOfCells")) == n
    assert int(arrays["types"][0]) == 12  # VTK_HEXAHEDRON
    pts = arrays["points"].reshape(n, 8, 3)
    np.testing.assert_allclose(pts.mean(axis=1), centers, atol=1e-6)
    np.testing.assert_allclose(pts[:, :, 2].max(axis=1)
                               - pts[:, :, 2].min(axis=1), 1.0)


def test_mesh_vtu_debug_fields(tmp_path):
    from t8gpu_tpu.mesh.forest import Forest, ForestMesh

    forest = Forest.uniform(2, dim=2)
    flags = np.zeros(forest.n_elements, np.int8)
    flags[0] = 1
    forest, _ = forest.adapt(forest.balance_flags(flags))
    mesh = ForestMesh.from_forest(forest)
    bounds = np.array([0, mesh.n_elements // 2, mesh.n_elements])
    path = str(tmp_path / "mesh.vtu")
    write_mesh_vtu(path, mesh, shard_bounds=bounds)
    _, arrays = _read_vtu(path)
    np.testing.assert_array_equal(arrays["level"],
                                  forest.level.astype(np.float32))
    assert set(np.unique(arrays["shard"])) == {0.0, 1.0}


def test_pvtu_sharded_export(tmp_path):
    n = 16
    rng = np.random.default_rng(1)
    centers = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    sizes = np.full(n, 0.25, np.float32)
    rho = rng.uniform(0.5, 2.0, n).astype(np.float32)
    mom = rng.normal(size=(3, n)).astype(np.float32)
    bounds = np.array([0, 5, 11, 16])
    prefix = str(tmp_path / "run")
    pvtu = write_sharded_vtu(prefix, centers, sizes,
                             {"rho": rho, "momentum": mom}, dim=2,
                             bounds=bounds)

    root = ET.parse(pvtu).getroot()
    assert root.get("type") == "PUnstructuredGrid"
    pieces = root.findall(".//Piece")
    assert len(pieces) == 3
    names = [da.get("Name") for da in root.iter("PDataArray")
             if da.get("Name")]
    assert "rho" in names and "momentum" in names

    # pieces concatenate back to the global field
    got = []
    for s, piece in enumerate(pieces):
        _, arrays = _read_vtu(str(tmp_path / piece.get("Source")))
        got.append(arrays["rho"])
        assert len(arrays["rho"]) == bounds[s + 1] - bounds[s]
    np.testing.assert_array_equal(np.concatenate(got), rho)
