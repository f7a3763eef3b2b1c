"""Checkpointing and visualization output.

TPU-native replacement for the reference's external IO stack
(ADIOS2 ``.bp`` via dolfinx.io / io4dolfinx, used in its demos e.g.
``demos/pace_train.py:179-189,222-249``):

* :class:`CheckpointWriter` / ``load_checkpoint`` — time-indexed voltage
  (or any dof-array) snapshots in a single compressed ``.npz`` plus the
  mesh arrays, supporting resume and postprocessing.
* :class:`VTUWriter` — legacy-free VTU (XML unstructured grid) time series
  + a ``.pvd`` collection file readable by ParaView, replacing
  ``dolfinx.io.VTXWriter``.
"""

from __future__ import annotations

import base64
import struct
from dataclasses import dataclass
from pathlib import Path
from typing import NamedTuple

import numpy as np

from .mesh import CellType, Mesh

__all__ = ["CheckpointWriter", "CheckpointData", "load_checkpoint", "VTUWriter"]


class CheckpointData(NamedTuple):
    times: np.ndarray  # [nt]
    values: np.ndarray  # [nt, ndofs]
    coords: np.ndarray
    cells: np.ndarray
    cell_type: str


@dataclass
class CheckpointWriter:
    """Accumulates (t, dof-array) snapshots; ``save`` writes one npz."""

    path: str | Path
    mesh: Mesh

    def __post_init__(self):
        self._times: list[float] = []
        self._values: list[np.ndarray] = []

    def write(self, t: float, values: np.ndarray) -> None:
        self._times.append(float(t))
        self._values.append(np.asarray(values, dtype=np.float32).copy())

    def save(self) -> Path:
        path = Path(self.path).with_suffix(".npz")
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path,
            times=np.asarray(self._times),
            values=np.stack(self._values) if self._values else np.zeros((0, 0)),
            coords=self.mesh.coords,
            cells=self.mesh.cells,
            cell_type=self.mesh.cell_type.name,
        )
        return path

    # context-manager convenience
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.save()
        return False


def load_checkpoint(path: str | Path) -> CheckpointData:
    with np.load(Path(path).with_suffix(".npz"), allow_pickle=False) as f:
        return CheckpointData(
            times=f["times"],
            values=f["values"],
            coords=f["coords"],
            cells=f["cells"],
            cell_type=str(f["cell_type"]),
        )


_VTK_CELL_TYPES = {
    CellType.interval: 3,  # VTK_LINE
    CellType.triangle: 5,  # VTK_TRIANGLE
    CellType.tetrahedron: 10,  # VTK_TETRA
}


def _b64(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    return base64.b64encode(struct.pack("<I", len(raw)) + raw).decode()


class VTUWriter:
    """Writes a ParaView-readable time series: one .vtu per frame + .pvd."""

    def __init__(self, path: str | Path, mesh: Mesh, name: str = "v"):
        self.base = Path(path)
        self.base.mkdir(parents=True, exist_ok=True)
        self.mesh = mesh
        self.name = name
        self._frames: list[tuple[float, str]] = []

    def write(self, t: float, values) -> None:
        """Write one frame. ``values`` is a dof array (named ``self.name``)
        or a dict ``{field_name: dof_array}`` of point-data fields."""
        mesh = self.mesh
        n_pts, n_cells = mesh.num_vertices, mesh.num_cells
        coords3 = np.zeros((n_pts, 3), dtype=np.float32)
        coords3[:, : mesh.gdim] = mesh.coords
        conn = mesh.cells.astype(np.int32)
        offsets = (np.arange(1, n_cells + 1) * conn.shape[1]).astype(np.int32)
        ctype = np.full(n_cells, _VTK_CELL_TYPES[mesh.cell_type], dtype=np.uint8)
        if not isinstance(values, dict):
            values = {self.name: values}
        fields = {k: np.asarray(v, dtype=np.float32) for k, v in values.items()}
        scalars = next(iter(fields))

        def _array_xml(k, v):
            # [n_pts, ncomp] (or flat n_pts*ncomp from a blocked Function)
            # becomes a multi-component DataArray (vector fields: fibers)
            ncomp = v.shape[1] if v.ndim == 2 else v.size // n_pts
            comp_attr = f' NumberOfComponents="{ncomp}"' if ncomp > 1 else ""
            return (
                f'    <DataArray type="Float32" Name="{k}"{comp_attr} '
                f'format="binary">{_b64(v)}</DataArray>'
            )

        point_data = "\n".join(_array_xml(k, v) for k, v in fields.items())

        fname = f"frame_{len(self._frames):06d}.vtu"
        xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
 <UnstructuredGrid>
  <Piece NumberOfPoints="{n_pts}" NumberOfCells="{n_cells}">
   <Points>
    <DataArray type="Float32" NumberOfComponents="3" format="binary">{_b64(coords3)}</DataArray>
   </Points>
   <Cells>
    <DataArray type="Int32" Name="connectivity" format="binary">{_b64(conn)}</DataArray>
    <DataArray type="Int32" Name="offsets" format="binary">{_b64(offsets)}</DataArray>
    <DataArray type="UInt8" Name="types" format="binary">{_b64(ctype)}</DataArray>
   </Cells>
   <PointData Scalars="{scalars}">
{point_data}
   </PointData>
  </Piece>
 </UnstructuredGrid>
</VTKFile>
"""
        (self.base / fname).write_text(xml)
        self._frames.append((float(t), fname))

    def close(self) -> Path:
        entries = "\n".join(
            f'  <DataSet timestep="{t}" part="0" file="{f}"/>' for t, f in self._frames
        )
        pvd = f"""<?xml version="1.0"?>
<VTKFile type="Collection" version="0.1" byte_order="LittleEndian">
 <Collection>
{entries}
 </Collection>
</VTKFile>
"""
        out = self.base / "series.pvd"
        out.write_text(pvd)
        return out
