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
