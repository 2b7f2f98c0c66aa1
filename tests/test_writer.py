"""Cloud writers: bit-exact round-trip through the loaders, and byte
parity between the native C++ writer and the Python fallback (the same
oracle relationship the loader pair has)."""

import numpy as np
import pytest

from tpuslam.data.loader import load_cloud
from tpuslam.data.writer import (
    _save_obj_python,
    _save_off_python,
    save_cloud,
)
from tpuslam.native import bindings


def tricky_points(rng, n=257):
    """Values that stress decimal round-tripping: subnormals, huge and
    tiny magnitudes, negative zero, exact integers, and random data."""
    vals = np.array(
        [
            0.0, -0.0, 1.0, -1.0, 1e-38, -1e-38, 1.17549435e-38,
            1e-45, 3.4e38, -3.4e38, 1.0 / 3.0, np.pi, 123456789.0,
            0.1, 2.0 ** -24, 1.0 + 2.0 ** -23,
        ],
        dtype=np.float32,
    )
    pts = (rng.standard_normal((n, 3)) * 10.0 ** rng.integers(
        -30, 30, size=(n, 3))).astype(np.float32)
    pts.flat[: vals.size] = vals
    return pts


@pytest.mark.parametrize("ext", [".obj", ".off"])
def test_roundtrip_bit_exact(tmp_path, rng, ext):
    pts = tricky_points(rng)
    path = str(tmp_path / f"cloud{ext}")
    assert save_cloud(path, pts)
    back = load_cloud(path)
    assert back.shape == pts.shape
    np.testing.assert_array_equal(back, pts)  # bitwise


@pytest.mark.parametrize("ext", [".obj", ".off"])
def test_native_and_python_writers_byte_identical(tmp_path, rng, ext):
    if not bindings.available():
        pytest.skip("no native toolchain")
    pts = tricky_points(rng, n=513)
    p_native = str(tmp_path / f"n{ext}")
    p_python = str(tmp_path / f"p{ext}")
    writer = bindings.write_obj if ext == ".obj" else bindings.write_off
    assert writer(p_native, pts)
    if ext == ".obj":
        _save_obj_python(p_python, pts)
    else:
        _save_off_python(p_python, pts)
    assert open(p_native, "rb").read() == open(p_python, "rb").read()


def test_save_cloud_contract(tmp_path, rng):
    pts = (rng.random((8, 3))).astype(np.float32)
    # unknown extension and unwritable path fail without raising
    assert not save_cloud(str(tmp_path / "x.ply"), pts)
    assert not save_cloud(str(tmp_path / "nodir" / "x.obj"), pts)
    # empty cloud round-trips to empty
    empty = np.zeros((0, 3), np.float32)
    path = str(tmp_path / "empty.off")
    assert save_cloud(path, empty)
    assert load_cloud(path).shape == (0, 3)
    with pytest.raises(ValueError):
        save_cloud(str(tmp_path / "bad.obj"), np.zeros((4, 2)))


def test_cli_save_output(tmp_path, capsys):
    """save-output-path through the CLI: the written cloud equals the
    transformed before-cloud the run reports."""
    import json

    from tpuslam.harness.cli import main

    out = str(tmp_path / "registered.obj")
    cfg = {
        "method": "icp",
        "before-path": "data/bunny.obj",
        "after-path": "data/bunny.obj",
        "cloud-before-resize": 200,
        "cloud-after-resize": 200,
        "random-seed": 7,
        "rotation-range": 0.2,
        "translation-range": 1.0,
        "max-iterations": 5,
        "save-output-path": out,
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    assert main(["--platform", "cpu", str(path)]) == 0
    assert "Transformed cloud saved" in capsys.readouterr().out
    written = load_cloud(out)
    assert written.shape == (200, 3)
    assert np.all(np.isfinite(written))
