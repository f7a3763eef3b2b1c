"""Checkpoint / VTU writer tests (reference does IO through external
ADIOS2/io4dolfinx, ``demos/pace_train.py:179-189,222-249`` — here in-repo)."""

import numpy as np

from fenicsx_beat_tpu import mesh as meshmod
from fenicsx_beat_tpu.io import CheckpointWriter, VTUWriter, load_checkpoint


def test_checkpoint_roundtrip(tmp_path):
    mesh = meshmod.create_unit_square(None, 4, 4)
    path = tmp_path / "run"
    with CheckpointWriter(path, mesh) as w:
        for k in range(3):
            w.write(0.5 * k, np.full(mesh.num_vertices, float(k)))

    data = load_checkpoint(path)
    assert data.times.tolist() == [0.0, 0.5, 1.0]
    assert data.values.shape == (3, mesh.num_vertices)
    np.testing.assert_allclose(data.values[2], 2.0)
    np.testing.assert_allclose(data.coords, mesh.coords)
    np.testing.assert_array_equal(data.cells, mesh.cells)
    assert data.cell_type == "triangle"


def test_vtu_writer_produces_readable_xml(tmp_path):
    mesh = meshmod.create_unit_square(None, 3, 3)
    w = VTUWriter(tmp_path / "viz", mesh)
    v = np.linspace(-85.0, 40.0, mesh.num_vertices)
    w.write(0.0, {"v": v})
    w.write(1.0, {"v": v + 1})
    pvd = w.close()

    assert pvd.is_file()
    text = pvd.read_text()
    assert "VTKFile" in text
    vtus = sorted(pvd.parent.glob("*.vtu"))
    assert len(vtus) == 2
    import xml.etree.ElementTree as ET

    root = ET.parse(vtus[0]).getroot()
    assert root.tag == "VTKFile"
