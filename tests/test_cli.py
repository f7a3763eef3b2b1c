"""CLI smoke tests — mirror of reference ``tests/test_cli.py``."""

import fenicsx_beat_tpu as beat
import fenicsx_beat_tpu.cli


def test_version(capsys):
    ret = beat.cli.main(["version"])
    assert ret == 0
    out = capsys.readouterr().out
    assert f"fenicsx-beat-tpu: {beat.__version__}" in out


def test_help_exits_cleanly():
    import pytest

    with pytest.raises(SystemExit) as exc:
        beat.cli.main(["--help"])
    assert exc.value.code == 0


def test_run_mesh_file(tmp_path, capsys):
    """`run --mesh file.msh` runs on a user mesh (closes the reference's
    NotImplemented `run` stub AND round-3's slab-only limitation): the
    tagged region is stimulated, snapshots land where `ecg`/`post` can
    consume them."""
    from tests.test_io import MSH41

    p = tmp_path / "sq.msh"
    p.write_text(MSH41)
    ret = beat.cli.main([
        "run", "--mesh", str(p), "--model", "fitzhughnagumo",
        "-T", "1.0", "--dt", "0.1", "--save-freq", "5",
        "--stim-amplitude", "500",
        "--outdir", str(tmp_path / "out"),
    ])
    assert ret == 0
    out = capsys.readouterr().out
    assert "nodes activated" in out
    assert (tmp_path / "out" / "voltage.npz").exists()

    # post consumes the snapshots
    ret = beat.cli.main(["post", str(tmp_path / "out" / "voltage.npz")])
    assert ret == 0
    assert "activated nodes" in capsys.readouterr().out

    # a bad marker fails loudly, not silently
    import pytest

    with pytest.raises(SystemExit, match="stim-marker"):
        beat.cli.main([
            "run", "--mesh", str(p), "--model", "fitzhughnagumo",
            "--stim-marker", "99", "-T", "0.2", "--dt", "0.1",
            "--outdir", str(tmp_path / "out2"),
        ])
