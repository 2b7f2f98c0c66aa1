"""Native C++ loader vs the Python loader (the behavioral oracle) on
every bundled model, plus edge cases."""

import glob
import os

import numpy as np
import pytest

from tpuslam.data.loader import _load_obj_python, _load_off
from tpuslam.native import bindings

pytestmark = pytest.mark.skipif(
    not bindings.available(), reason="no native toolchain"
)

DATA = "/root/reference/data"


@pytest.mark.parametrize(
    "name", sorted(os.path.basename(p) for p in glob.glob(f"{DATA}/*.obj"))
)
def test_obj_parity(name):
    path = os.path.join(DATA, name)
    want = _load_obj_python(path)
    got = bindings.load_obj(path)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "name", sorted(os.path.basename(p) for p in glob.glob(f"{DATA}/*.off"))
)
def test_off_parity(name):
    path = os.path.join(DATA, name)
    want = _load_off(path)
    got = bindings.load_off(path)
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_known_merge_counts():
    # the reference's observed merged sizes (testset.cpp:22, SURVEY §2.8)
    assert len(bindings.load_obj(f"{DATA}/bunny.obj")) == 14904
    assert len(bindings.load_obj(f"{DATA}/bird.obj")) == 35008
    assert len(bindings.load_off(f"{DATA}/noise_00_bunny.off")) == 11146


def test_missing_file_empty():
    assert bindings.load_obj("/nonexistent.obj").shape == (0, 3)
    assert bindings.load_off("/nonexistent.off").shape == (0, 3)


def test_negative_indices_and_quads(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3 4\n"  # quad: 4 corners emitted, no fan split
        "f -1 -2 -3\n"
    )
    want = _load_obj_python(str(p))
    got = bindings.load_obj(str(p))
    assert len(got) == 7
    np.testing.assert_array_equal(got, want)


def test_face_free_obj_is_vertex_list(tmp_path):
    p = tmp_path / "pts.obj"
    p.write_text("v 1 2 3\nv 4 5 6\n")
    got = bindings.load_obj(str(p))
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6]])


def test_malformed_off_header_is_empty_not_crash(tmp_path):
    # ADVICE r1: `OFF 99999999999 0 0` used to bad_alloc through the C ABI
    # and terminate the process; must yield the empty-cloud contract.
    p = tmp_path / "bad.off"
    p.write_text("OFF 99999999999 0 0\n1 2 3\n")
    assert bindings.load_off(str(p)).shape == (0, 3)


def test_face_over_64_corners_keeps_python_parity(tmp_path):
    # ADVICE r1: faces used to be truncated at 64 corners in the native
    # parser while the Python oracle keeps all of them.
    p = tmp_path / "big.obj"
    lines = [f"v {i} {i} {i}" for i in range(100)]
    lines.append("f " + " ".join(str(i + 1) for i in range(100)))
    p.write_text("\n".join(lines) + "\n")
    want = _load_obj_python(str(p))
    got = bindings.load_obj(str(p))
    assert got.shape == (100, 3)
    np.testing.assert_array_equal(got, want)
