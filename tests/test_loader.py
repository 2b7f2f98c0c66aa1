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


def test_synthetic_cloud_has_no_lattice_ghosts():
    """Round-5 fixture de-alias (docs/CONVERGENCE_HOLES.md): shifting
    the de-aliased synthetic cloud by one lattice period must NOT
    self-overlap — the round-<=4 periodic variant overlapped ~50% of
    its points at 60k, handing cold-start ICP a family of wrong ghost
    optima.  Measured as the fraction of shifted points whose nearest
    original point is within 10% of the median NN spacing."""
    import numpy as np

    from tpuslam.data.loader import load_cloud, synthetic_cloud

    base = load_cloud("data/bunny.obj")
    if len(base) == 0:  # uniform fallback has no lattice at all
        return
    spread = base.max(axis=0) - base.min(axis=0)
    period = spread * 1.1  # the tiling period (synthetic_cloud)

    def ghost_overlap(pts):
        rng = np.random.default_rng(0)
        sel = pts[rng.permutation(len(pts))[:1500]]
        shifted = sel + np.array([period[0], 0, 0], np.float32)
        # brute-force NN of shifted points against a subsample
        ref = pts[rng.permutation(len(pts))[:20000]]
        d2 = (
            np.sum(shifted**2, 1)[:, None]
            + np.sum(ref**2, 1)[None, :]
            - 2.0 * shifted @ ref.T
        )
        dmin = np.sqrt(np.maximum(d2.min(axis=1), 0))
        # scale: typical point spacing of the subsampled reference
        spacing = np.median(
            np.sqrt(np.maximum(np.partition(d2, 1, axis=1)[:, 1], 0))
        )
        return float(np.mean(dmin < 0.1 * max(spacing, 1e-6)))

    lattice = synthetic_cloud(60000, lattice=True)
    dealias = synthetic_cloud(60000)
    ov_lat = ghost_overlap(lattice)
    ov_de = ghost_overlap(dealias)
    # the periodic variant reproduces the diagnosed ghost (~0.33
    # measured); the de-aliased fixture must sit far below it (the
    # residual few % is chance proximity to a differently-rotated
    # neighboring tile, not a coherent optimum)
    assert ov_lat > 0.2, ov_lat
    assert ov_de < min(ov_lat / 5, 0.08), (ov_de, ov_lat)
