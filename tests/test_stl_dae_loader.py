"""STL and Collada (.dae) ingestion — the rest of the reference's
Assimp format surface (``loader.cpp:30-66``).  Semantics under test:
3 duplicated corners per STL facet (no JoinIdenticalVertices), binary
detection by record arithmetic (not the 'solid' prefix), and DAE
positions read untransformed (the reference ignores node transforms).
"""

import struct

import numpy as np

from tpuslam.data.loader import load_cloud

TRI = [
    (0.0, 0.0, 0.0),
    (1.0, 0.0, 0.0),
    (0.0, 1.0, 0.0),
]
TRI2 = [
    (0.0, 1.0, 0.0),
    (1.0, 0.0, 0.0),
    (1.0, 1.0, 0.0),
]


def write_binary_stl(path, facets, header=b"\0" * 80):
    with open(path, "wb") as fh:
        fh.write(header[:80].ljust(80, b"\0"))
        fh.write(struct.pack("<I", len(facets)))
        for tri in facets:
            fh.write(struct.pack("<3f", 0.0, 0.0, 1.0))  # normal
            for v in tri:
                fh.write(struct.pack("<3f", *v))
            fh.write(struct.pack("<H", 0))


def test_ascii_stl_three_corners_per_facet(tmp_path):
    p = tmp_path / "tri.stl"
    p.write_text(
        "solid tri\n"
        " facet normal 0 0 1\n"
        "  outer loop\n"
        "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
        "  endloop\n"
        " endfacet\n"
        " facet normal 0 0 1\n"
        "  outer loop\n"
        "   vertex 0 1 0\n   vertex 1 0 0\n   vertex 1 1 0\n"
        "  endloop\n"
        " endfacet\n"
        "endsolid tri\n"
    )
    cloud = load_cloud(str(p))
    # shared edge corners stay duplicated: 2 facets -> 6 points
    np.testing.assert_allclose(cloud, np.array(TRI + TRI2, np.float32))


def test_binary_stl_roundtrip(tmp_path):
    p = tmp_path / "tri.stl"
    write_binary_stl(p, [TRI, TRI2])
    cloud = load_cloud(str(p))
    np.testing.assert_allclose(cloud, np.array(TRI + TRI2, np.float32))


def test_binary_stl_with_solid_prefix_header(tmp_path):
    # binary exporters often write headers starting with 'solid' —
    # detection must use the record arithmetic, not the prefix
    p = tmp_path / "tricky.stl"
    write_binary_stl(p, [TRI], header=b"solid exported-by-cad")
    cloud = load_cloud(str(p))
    np.testing.assert_allclose(cloud, np.array(TRI, np.float32))


def test_truncated_binary_stl_returns_empty_or_parses_ascii(tmp_path):
    p = tmp_path / "bad.stl"
    p.write_bytes(b"\0" * 84)  # count=0, size matches 84 + 50*0
    cloud = load_cloud(str(p))
    assert cloud.shape == (0, 3)


DAE_TMPL = """<?xml version="1.0" encoding="utf-8"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <library_geometries>
  {geoms}
 </library_geometries>
 <library_visual_scenes>
  <visual_scene id="Scene">
   <node id="n0">
    <matrix>1 0 0 5 0 1 0 5 0 0 1 5 0 0 0 1</matrix>
    <instance_geometry url="#g0"/>
   </node>
  </visual_scene>
 </library_visual_scenes>
</COLLADA>
"""

GEOM_TMPL = """<geometry id="{gid}"><mesh>
 <source id="{gid}-pos">
  <float_array id="{gid}-pos-array" count="{count}">{vals}</float_array>
  <technique_common>
   <accessor source="#{gid}-pos-array" count="{n}" stride="3">
    <param name="X" type="float"/><param name="Y" type="float"/>
    <param name="Z" type="float"/>
   </accessor>
  </technique_common>
 </source>
 <vertices id="{gid}-verts">
  <input semantic="POSITION" source="#{gid}-pos"/>
 </vertices>
 <triangles count="1">
  <input semantic="VERTEX" source="#{gid}-verts" offset="0"/>
  <p>0 1 2</p>
 </triangles>
</mesh></geometry>"""


def make_geom(gid, pts):
    vals = " ".join(f"{c:g}" for p in pts for c in p)
    return GEOM_TMPL.format(
        gid=gid, vals=vals, count=3 * len(pts), n=len(pts)
    )


def test_dae_positions_untransformed(tmp_path):
    # the scene places g0 at +5,+5,+5 — the reference ignores node
    # transforms (loader.cpp ProcessNode), so must we
    p = tmp_path / "tri.dae"
    p.write_text(DAE_TMPL.format(geoms=make_geom("g0", TRI)))
    cloud = load_cloud(str(p))
    np.testing.assert_allclose(cloud, np.array(TRI, np.float32))


def test_dae_multi_geometry_concatenated_in_order(tmp_path):
    p = tmp_path / "two.dae"
    p.write_text(
        DAE_TMPL.format(
            geoms=make_geom("g0", TRI) + make_geom("g1", TRI2)
        )
    )
    cloud = load_cloud(str(p))
    np.testing.assert_allclose(cloud, np.array(TRI + TRI2, np.float32))


def test_dae_malformed_returns_empty(tmp_path):
    p = tmp_path / "broken.dae"
    p.write_text("<COLLADA><unclosed>")
    cloud = load_cloud(str(p))
    assert cloud.shape == (0, 3)


def test_unsupported_format_still_rejected(tmp_path, capsys):
    p = tmp_path / "cloud.3ds"
    p.write_bytes(b"\0" * 10)
    cloud = load_cloud(str(p))
    assert cloud.shape == (0, 3)
    assert "unsupported cloud format" in capsys.readouterr().err
