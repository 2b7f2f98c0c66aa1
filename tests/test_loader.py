"""Loader tests: the Assimp merged-vertex semantics must be reproduced
exactly (``loader.cpp:30-66``; counts from ``testset.cpp:19-38``)."""

import os

import numpy as np
import pytest

from tpuslam.data.loader import load_cloud

DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference data not mounted"
)


def test_bunny_merged_count():
    # 2503 unique `v` lines, 4968 triangles -> 14904 per-face-corner points
    cloud = load_cloud(f"{DATA}/bunny.obj")
    assert cloud.shape == (14904, 3)
    # every merged point must be one of the unique vertices
    uniq = np.unique(cloud, axis=0)
    assert len(uniq) <= 2503


def test_bird_merged_count():
    cloud = load_cloud(f"{DATA}/bird.obj")
    assert cloud.shape == (35008, 3)  # testset.cpp:25 size table


def test_off_vertex_count():
    cloud = load_cloud(f"{DATA}/noise_00_bunny.off")
    assert cloud.shape == (11146, 3)  # header: 11146 22174 66522


def test_off_first_vertex_value():
    cloud = load_cloud(f"{DATA}/noise_00_bunny.off")
    np.testing.assert_allclose(
        cloud[0], [-0.032497, 0.174231, -0.002390], rtol=1e-6
    )


def test_missing_file_returns_empty():
    cloud = load_cloud(f"{DATA}/does-not-exist.obj")
    assert cloud.shape == (0, 3)


def test_obj_merged_order_is_face_order(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
        "f 1 2 3\nf 4/1 3/2 2/3\n"
    )
    cloud = load_cloud(str(p))
    np.testing.assert_allclose(
        cloud,
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0]],
    )


def test_obj_quad_keeps_corner_duplication(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n"
    )
    cloud = load_cloud(str(p))
    # Assimp emits one vertex per face-corner reference: 4 corners
    assert cloud.shape == (4, 3)
