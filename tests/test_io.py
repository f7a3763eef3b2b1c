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


def test_checkpoint_portable_across_padding():
    """Checkpoints must be written UNPADDED so a padded (TPU kernel
    alignment) fused solver and an unpadded CPU solver can exchange them
    (regression: save_state used to write the padded state and load_state
    demanded exact padded-shape equality)."""
    import numpy as np

    from fenicsx_beat_tpu.benchmarks.niederer import _build_solver

    padded = _build_solver(dx=0.5, use_pallas_ode=True)  # interpret mode pads
    plain = _build_solver(dx=0.5, use_pallas_ode=False)
    assert padded._n_pad > padded._n, "test needs a padded solver"
    assert plain._n_pad == plain._n

    padded.solve((0.0, 0.5), dt=0.05)
    path = padded.save_state("/tmp/ckpt-pad-roundtrip", t=0.5)
    t = plain.load_state(path)
    assert t == 0.5
    np.testing.assert_allclose(
        np.asarray(plain.states[:, : plain._n]),
        np.asarray(padded.states[:, : padded._n]),
        rtol=1e-6,
        atol=1e-7,
    )
    # and back: unpadded checkpoint into the padded solver
    path2 = plain.save_state("/tmp/ckpt-plain-roundtrip", t=1.0)
    assert padded.load_state(path2) == 1.0
    np.testing.assert_allclose(
        np.asarray(padded.states[:, : padded._n]),
        np.asarray(plain.states[:, : plain._n]),
        rtol=1e-6,
        atol=1e-7,
    )
