"""VTK XML unstructured-grid export (.vtu), dependency-free.

Counterpart of the reference VTK paths (`t8gpu/mesh/mesh_manager.inl:515-623`
`save_variables_to_vtk` via t8code's writer; the rebuild writes .vtu
directly).  Cell-centered scalar/vector fields over axis-aligned quad/hex
cells reconstructed from (center, size) pairs — the natural representation
for the Morton forest.  Output opens in ParaView, the reference's de-facto
acceptance tool (README.md:3-6).
"""

from __future__ import annotations

import base64
import struct
from typing import Mapping

import numpy as np

_VTK_QUAD = 9
_VTK_HEXA = 12


def _b64(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode()


def _xml_attr(name: str) -> str:
    """Escape a string for use inside a double-quoted XML attribute (field
    names containing &, <, > or quotes would otherwise produce files
    ParaView rejects)."""
    from xml.sax.saxutils import escape

    return escape(str(name), {'"': "&quot;"})


def write_vtu(path: str,
              centers: np.ndarray,       # [N, dim]
              sizes: np.ndarray,         # [N] edge lengths
              cell_data: Mapping[str, np.ndarray],
              dim: int) -> str:
    """Write cells as axis-aligned squares/cubes with cell-centered data.

    cell_data values may be [N] scalars or [k, N] vectors (k<=3).
    Returns the path written.
    """
    n = len(sizes)
    half = np.asarray(sizes, np.float64)[:, None] * 0.5
    c = np.zeros((n, 3))
    c[:, :centers.shape[1]] = centers

    if dim == 2:
        offs = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float64)
        ctype = _VTK_QUAD
    else:
        offs = np.array([
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float64)
        ctype = _VTK_HEXA
    k = len(offs)

    # corner = center + off * half (only the first `dim` axes move)
    scale = np.zeros((1, 1, 3))
    scale[..., :dim] = 1.0
    points = c[:, None, :] + offs[None] * half[:, None, :] * scale
    points = points.reshape(-1, 3).astype(np.float32)

    connectivity = np.arange(n * k, dtype=np.int32)
    offsets = (np.arange(1, n + 1, dtype=np.int32) * k)
    types = np.full(n, ctype, np.uint8)

    parts = []
    parts.append('<?xml version="1.0"?>')
    parts.append('<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">')
    parts.append('<UnstructuredGrid>')
    parts.append(f'<Piece NumberOfPoints="{n * k}" NumberOfCells="{n}">')
    parts.append('<Points><DataArray type="Float32" NumberOfComponents="3" format="binary">')
    parts.append(_b64(points))
    parts.append('</DataArray></Points>')
    parts.append('<Cells>')
    parts.append('<DataArray type="Int32" Name="connectivity" format="binary">')
    parts.append(_b64(connectivity))
    parts.append('</DataArray>')
    parts.append('<DataArray type="Int32" Name="offsets" format="binary">')
    parts.append(_b64(offsets))
    parts.append('</DataArray>')
    parts.append('<DataArray type="UInt8" Name="types" format="binary">')
    parts.append(_b64(types))
    parts.append('</DataArray>')
    parts.append('</Cells>')
    parts.append('<CellData>')
    for name, values in cell_data.items():
        values = np.asarray(values, np.float32)
        if values.ndim == 1:
            parts.append(f'<DataArray type="Float32" Name="{_xml_attr(name)}"'
                         ' format="binary">')
            parts.append(_b64(values))
        else:
            comps = np.zeros((3, values.shape[1]), np.float32)
            comps[: values.shape[0]] = values
            parts.append(
                f'<DataArray type="Float32" Name="{_xml_attr(name)}" '
                'NumberOfComponents="3" format="binary">')
            parts.append(_b64(comps.T.copy()))
        parts.append('</DataArray>')
    parts.append('</CellData>')
    parts.append('</Piece></UnstructuredGrid></VTKFile>')

    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def write_pvtu(path: str, piece_paths, cell_data_names, vector_names=()) -> str:
    """Write a .pvtu multi-piece index referencing per-shard .vtu pieces —
    the multi-rank export the reference gets from t8code's parallel VTK
    writer (mesh_manager.inl:515-623 under MPI).  `piece_paths` are the
    per-shard .vtu files (written with write_vtu); names are the cell-data
    arrays they contain (vector_names listed with 3 components)."""
    import os

    parts = []
    parts.append('<?xml version="1.0"?>')
    parts.append('<VTKFile type="PUnstructuredGrid" version="0.1" '
                 'byte_order="LittleEndian">')
    parts.append('<PUnstructuredGrid GhostLevel="0">')
    parts.append('<PPoints><PDataArray type="Float32" NumberOfComponents="3"/>'
                 '</PPoints>')
    parts.append('<PCellData>')
    for name in cell_data_names:
        if name in vector_names:
            parts.append(f'<PDataArray type="Float32" Name="{_xml_attr(name)}" '
                         'NumberOfComponents="3"/>')
        else:
            parts.append(f'<PDataArray type="Float32" Name="{_xml_attr(name)}"/>')
    parts.append('</PCellData>')
    for p in piece_paths:
        parts.append(f'<Piece Source="{_xml_attr(os.path.basename(p))}"/>')
    parts.append('</PUnstructuredGrid></VTKFile>')
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def write_sharded_vtu(prefix: str, centers: np.ndarray, sizes: np.ndarray,
                      cell_data: Mapping[str, np.ndarray], dim: int,
                      bounds: np.ndarray) -> str:
    """Write one .vtu piece per SFC shard plus the .pvtu index.
    `bounds` are the element split points (parallel/partition.py).
    Returns the .pvtu path."""
    pieces = []
    for s in range(len(bounds) - 1):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        piece = f"{prefix}_p{s:04d}.vtu"
        data_s = {k: np.asarray(v)[..., lo:hi] for k, v in cell_data.items()}
        write_vtu(piece, np.asarray(centers)[lo:hi], np.asarray(sizes)[lo:hi],
                  data_s, dim=dim)
        pieces.append(piece)
    vectors = tuple(k for k, v in cell_data.items()
                    if np.asarray(v).ndim > 1)
    return write_pvtu(f"{prefix}.pvtu", pieces, list(cell_data.keys()),
                      vectors)


def write_mesh_vtu(path: str, mesh, shard_bounds=None) -> str:
    """Export the mesh itself with debug fields (ref writes treeid /
    mpirank / level / element_id into its VTK output,
    mesh_manager.inl:531-541): per element its refinement level, SFC
    index, and owning shard (when an SFC partition is given)."""
    import numpy as np

    forest = getattr(mesh, "forest", None)
    n = mesh.n_elements
    level = (np.asarray(forest.level, np.float32) if forest is not None
             else np.zeros(n, np.float32))
    fields = {
        "level": level,
        "element_id": np.arange(n, dtype=np.float32),
    }
    if shard_bounds is not None:
        owner = np.searchsorted(shard_bounds, np.arange(n), side="right") - 1
        fields["shard"] = owner.astype(np.float32)
    dim = mesh.dim
    h = np.asarray(mesh.volumes) ** (1.0 / dim)
    centers = (mesh.centers if hasattr(mesh, "centers")
               else forest.centers().astype(np.float32))
    return write_vtu(path, np.asarray(centers), h, fields, dim=dim)
