"""Visualization artifacts: the interactive WebGL export (capability
equivalent of the reference's GLFW renderer, ``renderer.cpp``) and the
static PNG fallback must both be producible headless."""

import base64
import json
import re

import numpy as np
import pytest


def _extract_data(html: str) -> dict:
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA object missing"
    return json.loads(m.group(1))


def test_webgl_export_embeds_all_four_clouds(tmp_path, rng):
    from tpuslam.viz.webgl import export_html

    before = (rng.random((500, 3)) * 10).astype(np.float32)
    after = (rng.random((400, 3)) * 10).astype(np.float32)
    transformed = before + 0.1
    origin = np.zeros((1, 3), np.float32)
    path = str(tmp_path / "reg.html")
    out = export_html(before, after, transformed, origin, path=path)
    html = open(out).read()

    data = _extract_data(html)
    names = [c["name"] for c in data["clouds"]]
    # reference toggle order = color order red/green/yellow/blue
    # (renderer.cpp:128-155, :440-450)
    assert names == ["before", "after", "transformed", "origin"]
    colors = [tuple(c["color"]) for c in data["clouds"]]
    assert colors == [
        (1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (1.0, 1.0, 0.0),
        (0.0, 0.0, 1.0),
    ]
    # embedded points round-trip exactly
    pts = np.frombuffer(
        base64.b64decode(data["clouds"][0]["b64"]), np.float32
    ).reshape(-1, 3)
    np.testing.assert_array_equal(pts, before)

    # the viewer carries the reference's observable behaviors
    assert "0.5,0.8,0.95" in html  # clear color, renderer.cpp:360
    assert "gl_PointCoord" in html  # sphere impostor shading
    assert "requestAnimationFrame" in html
    # single self-contained file: no external resources
    assert "http://" not in html and "https://" not in html


def test_webgl_export_subsamples_huge_clouds(tmp_path, rng):
    from tpuslam.viz.webgl import MAX_POINTS_EMBED, export_html

    n = MAX_POINTS_EMBED + 50_000
    cloud = rng.random((n, 3)).astype(np.float32)
    out = export_html(before=cloud, path=str(tmp_path / "big.html"))
    data = _extract_data(open(out).read())
    m = len(base64.b64decode(data["clouds"][0]["b64"])) // 12
    assert m <= MAX_POINTS_EMBED


def test_webgl_export_skips_missing_clouds(tmp_path, rng):
    from tpuslam.viz.webgl import export_html

    before = rng.random((10, 3)).astype(np.float32)
    out = export_html(before=before, path=str(tmp_path / "one.html"))
    data = _extract_data(open(out).read())
    assert [c["name"] for c in data["clouds"]] == ["before"]


def test_png_fallback_still_works(tmp_path, rng):
    from tpuslam.viz.view import show_registration

    before = rng.random((100, 3)).astype(np.float32)
    path = show_registration(
        before, before + 1.0, save_path=str(tmp_path / "reg.png"),
        show=False,
    )
    assert path and (tmp_path / "reg.png").exists()
